package graft.streaming

import graft.operators.NearDup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The COMPOSED continuous pipeline — ingest → near-dup gate → keyed KPI
  * upsert chained through ONE checkpointed streaming query, the end-to-end
  * shape the per-stage twins (DocIngest, NearDupStream, UpsertSink) are
  * individually spec'd for:
  *
  *  - **Ingest**: file-source stream over a watched documents directory
  *    (the S3-arrival model; checkpoint makes file pickup exactly-once).
  *  - **Near-dup gate** (per micro-batch): arriving docs probe the
  *    STANDING corpus through the LSH band index — the same asymmetric
  *    band-bucket → shingle-verify plan as NearDupStream, O(batch ·
  *    collisions), never corpus² — and verified near-dups are dropped.
  *  - **KPI upsert**: the survivors' per-(lang, source) doc/char counts
  *    are merged ADDITIVELY into a keyed store via the UpsertSink swap
  *    (crash-safe two-rename publish).
  *
  * Exactly-once on top of foreachBatch's at-least-once: `foreachBatch`
  * REPLAYS the in-flight batch after a restart, and an additive merge is
  * not idempotent — so every published state row carries the batch id
  * that produced it, and a replayed batch (id ≤ the stored high-water
  * mark) is skipped. The id rides the SAME atomic rename as the data, so
  * no crash window separates "merged" from "recorded" — the transactional
  * pattern a production deployment gets from a Delta/Iceberg MERGE, here
  * on plain parquet.
  *
  * Scale notes: the stream side never holds state (the gate's joins are
  * batch-local inside foreachBatch; `dropDuplicates` there dedups one
  * micro-batch's candidate pairs, not history); the corpus index is built
  * once and persisted; the KPI store is O(distinct lang × source), read
  * and rewritten per batch — swap the merge body for a transactional
  * MERGE INTO when the key space is large. */
object IngestPipeline {

  val KpiKeys: Seq[String] = Seq("lang", "source")

  /** Start the composed pipeline. `corpusDocs` is the standing corpus the
    * near-dup gate screens against (static side of every join). */
  def run(spark: SparkSession, srcDir: String, corpusDocs: DataFrame,
      stateDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val corpusShingles = NearDup.shingleTableOf(corpusDocs)
    val index = NearDup.bandedOf(corpusShingles)
      .select(col("doc_id").as("id_b"), col("band")).persist()
    val corpusSh = corpusShingles
      .select(col("doc_id").as("id_b"), col("sh").as("sh_b")).persist()
    DocIngest.docsStream(spark, srcDir, maxFilesPerTrigger)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, index, corpusSh, stateDir)
      }
      .start()
  }

  /** High-water batch id in the published state (−1 when absent), after
    * recovering any interrupted swap. */
  private[graft] def lastAppliedBatch(spark: SparkSession, stateDir: String): Long = {
    UpsertSink.recoverState(stateDir)
    if (!new java.io.File(stateDir).exists()) -1L
    else {
      val r = spark.read.parquet(stateDir).agg(max(col("last_batch"))).collect()(0)
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
  }

  /** One micro-batch: near-dup gate then additive KPI merge. Public to the
    * package so the spec can force a REPLAY of an already-applied id. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
      index: DataFrame, corpusSh: DataFrame, stateDir: String): Unit = {
    val spark = batch.sparkSession
    if (lastAppliedBatch(spark, stateDir) >= batchId) return // replayed batch
    val probe = NearDup.bandedOf(NearDup.shingleTableOf(batch), carrySh = true)
      .select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("band"))
    val dupIds = probe.join(index, "band")
      .select(col("id_a"), col("sh_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b") // batch-local multi-band candidate fold
      .join(corpusSh, "id_b")
      .filter(NearDup.jaccardOf(col("sh_a"), col("sh_b")) >= NearDup.JaccardThreshold)
      .select(col("id_a").as("doc_id")).distinct()
    val kept = batch.join(dupIds, Seq("doc_id"), "left_anti")
    val delta = kept.groupBy(KpiKeys.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    mergeAdd(delta, batchId, stateDir)
  }

  /** Additive keyed merge: existing counts + this batch's delta, published
    * with the batch id under one atomic swap (UpsertSink's two-rename with
    * crash recovery). */
  private def mergeAdd(delta: DataFrame, batchId: Long, stateDir: String): Unit = {
    val spark = delta.sparkSession
    val existing =
      if (!new java.io.File(stateDir).exists()) None
      else Some(spark.read.parquet(stateDir).drop("last_batch"))
    val merged = existing.fold(delta)(_.unionByName(delta))
      .groupBy(KpiKeys.map(col): _*)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn("last_batch", lit(batchId))
    val tmp = stateDir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    UpsertSink.swapInto(tmp, stateDir)
  }
}
