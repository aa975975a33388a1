package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the LLM-training-data
  * extensions beyond the reference's surface (BASELINE.json north_star).
  *
  * Scale notes (100 TB):
  *  - Exact dedup is a hash-groupBy on md5(text): the shuffle key is the
  *    16-byte digest, never the document body, so shuffle volume is
  *    O(rows·16B) not O(corpus). At cluster scale the same plan holds.
  *  - Candidate-pair near-dup (MinHash/SimHash in NearDup.scala) bounds the
  *    quadratic blow-up by banding/bucketing before any pairwise compare.
  */
object Dedup {

  /** Normalize a doc for fingerprinting: lower-case + collapse whitespace.
    * Kept to operations with identical semantics in DuckDB for the oracle. */
  private def normText(c: org.apache.spark.sql.Column) =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact dedup: group on content hash, keep the lowest doc_id per group. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Normalized-content dedup: same, but whitespace/case-insensitive. */
  def exactNormalized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(normText(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  val queries: Seq[Q] = Seq(
    Q("q_dedup_exact", exact, Some(
      """SELECT md5(text) AS fp, min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin)),
    Q("q_dedup_exact_norm", exactNormalized, Some(
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |       min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin)),
  ) ++ NearDup.queries
}
