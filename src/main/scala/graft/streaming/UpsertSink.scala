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
    val old = new java.io.File(stateDir + ".old")
    if (dir.exists()) { dir.renameTo(old) }
    new java.io.File(tmp).renameTo(dir)
    if (old.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(old)
    }
  }
}
