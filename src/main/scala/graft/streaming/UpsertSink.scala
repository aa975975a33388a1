package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming keyed-upsert sink via `foreachBatch` — the Spark-native form of
  * the reference's per-run DynamoDB overwrite (transform.py:149-202 put_items
  * keyed (category, order_date) / (order_date); SURVEY.md §1.3): each
  * micro-batch's updated groups replace the rows with the same key in the
  * keyed store, other rows persist.
  *
  * State layout here is a plain parquet directory merged read-modify-write
  * per batch (local-filesystem demo; production swaps the merge body for a
  * transactional table format's MERGE or a KV store's batch put — via
  * [[graft.pipeline.KeyedSink.foreachPartitionUpsert]] — without touching
  * the streaming plan). Merge = anti-join current state against the batch
  * keys + union, executed distributed.
  */
object UpsertSink {

  /** Start an update-mode stream writing keyed upserts into `stateDir`. */
  def keyedParquetUpsert(df: DataFrame, keys: Seq[String], stateDir: String,
      checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch, keys, stateDir)
      }
      .start()

  /** One merge step: rows in `state` whose key appears in `batch` are
    * replaced; executed as anti-join + union, all distributed. */
  private[graft] def upsertBatch(batch: DataFrame, keys: Seq[String],
      stateDir: String): Unit = {
    val spark = batch.sparkSession
    val dir = new java.io.File(stateDir)
    val merged =
      if (!dir.exists()) batch
      else spark.read.parquet(stateDir)
        .join(batch.select(keys.map(org.apache.spark.sql.functions.col): _*),
          keys, "left_anti")
        .unionByName(batch)
    // materialize BEFORE touching stateDir (can't overwrite what we read)
    val tmp = stateDir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swapInto(tmp, stateDir)
  }

  /** Publish `tmpDir` as `destDir` via rename, displacing any previous
    * contents. Renames are CHECKED — a false return (stale `.old` from a
    * crash mid-swap, cross-filesystem tmp, permissions) throws instead of
    * silently publishing nothing; a leftover `.old` from a prior crash is
    * cleared first so the swap self-heals. The dest is momentarily absent
    * between the two renames — callers that need read-while-publish use a
    * manifest pointer (sources.ManifestSink) instead; here the only
    * readers are the next foreachBatch and post-stop consumers. */
  private[graft] def swapInto(tmpDir: String, destDir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    val dest = new java.io.File(destDir)
    val old = new java.io.File(destDir + ".old")
    if (old.exists()) rm(old) // crash leftover from a previous swap
    if (dest.exists() && !dest.renameTo(old))
      throw new java.io.IOException(s"swapInto: cannot displace $destDir")
    if (!new java.io.File(tmpDir).renameTo(dest))
      throw new java.io.IOException(s"swapInto: cannot publish $tmpDir -> $destDir")
    if (old.exists()) rm(old)
  }

  /** File-source stream over a directory of parquet files, schema taken
    * from the files already present (the S3-arrival model shared by the
    * drift/transition/basket monitors). */
  private[graft] def fileStream(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
}
