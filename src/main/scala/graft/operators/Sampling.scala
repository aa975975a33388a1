package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment — the selection operators a
  * training-data pipeline runs before anything else.
  *
  * All selections key off `md5(doc_id)` rather than an RNG: reproducible
  * across engines (oracle-checkable), across reruns, and across cluster
  * sizes — `sample()`'s per-partition RNG gives a different corpus every
  * time the partitioning changes, which is poison for dataset lineage.
  * Narrow per-row maps: no shuffle, scales linearly with input splits.
  */
object Sampling {

  /** Hash of an id's md5 first byte as an integer 0..255. */
  private[operators] def hashByteOf(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 2), 16, 10).cast("int")
  private def hashByte = hashByteOf(col("doc_id"))
  private[operators] def hashByteSqlOf(expr: String) =
    s"('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 2))::INT"
  private[operators] val hashByteSql = hashByteSqlOf("doc_id")

  /** The split CASE expression over an id, shared with the contamination
    * and leakage-free-split oracles. */
  private[operators] def splitCaseSqlOf(expr: String) =
    s"""CASE WHEN ${hashByteSqlOf(expr)} < 205 THEN 'train'
       |     WHEN ${hashByteSqlOf(expr)} < 230 THEN 'val'
       |     ELSE 'test' END""".stripMargin
  private[operators] val splitCaseSql = splitCaseSqlOf("doc_id")

  /** The split CASE as a Column, keyed on an arbitrary id column. */
  private[operators] def splitCaseOf(c: org.apache.spark.sql.Column) = {
    val hb = hashByteOf(c)
    when(hb < 205, "train").when(hb < 230, "val").otherwise("test")
  }

  /** Deterministic ~1/16 sample: md5 first byte < 16. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("hb", hashByte)
      .filter(col("hb") < 16)
      .select(col("doc_id"), col("lang"), col("source"))

  /** Train/val/test ≈ 80/10/10 split, stable under resharding/reruns. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("hb", hashByte)
      .select(col("doc_id"),
        when(col("hb") < 205, "train")
          .when(col("hb") < 230, "val")
          .otherwise("test").as("split"))

  /** Stratified (per-source) sampling: each source gets its own keep-rate,
    * derived here from the source id's hash (16..128 of 256) — the corpus
    * rebalancing pass (downweight crawl, upweight books) as one narrow
    * filter; rates in a real run come from a config map, same plan. */
  private def sourceThreshold =
    (conv(substring(md5(col("source")), 1, 2), 16, 10).cast("int") % 113) + 16
  private val sourceThresholdSql =
    "(('0x' || substr(md5(source), 1, 2))::INT % 113) + 16"

  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("hb", hashByte)
      .filter(col("hb") < sourceThreshold)
      .select(col("doc_id"), col("source"))

  val queries: Seq[Q] = Seq(
    Q("q_sample_stratified", sampleStratified, Some(
      s"""SELECT doc_id, source FROM documents
         |WHERE $hashByteSql < $sourceThresholdSql""".stripMargin)),
    Q("q_sample_hash", sampleHash, Some(
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE $hashByteSql < 16""".stripMargin)),
    Q("q_split_assign", splitAssign, Some(
      s"""SELECT doc_id, $splitCaseSql AS split
         |FROM documents""".stripMargin)),
  )
}
