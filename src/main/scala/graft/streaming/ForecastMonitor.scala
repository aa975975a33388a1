package graft.streaming

import graft.operators.Seasonal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Live Holt forecast monitor — the streaming twin of `q_stats_holt`:
  * after every micro-batch the published forecast table equals the batch
  * query over all events seen so far (the RevenueMonitor contract).
  *
  * State design: identical to RevenueMonitor — the stream maintains only
  * the (day, cents) totals, an update-mode built-in aggregate whose key
  * space is the CALENDAR (bounded by days observed, no cap knob, no TTL
  * debate); daily sums are additive and order-free so arrival order is
  * irrelevant. Each batch overwrite-upserts the day store, then the Holt
  * recursion reruns from the store with the BATCH arithmetic verbatim
  * (Seasonal.holtFromDaily) — day-count-sized work, never event-sized —
  * and swap-publishes. Replaying the recursion from the seed each batch
  * (rather than carrying (l, b) as streaming state) is what makes late
  * and out-of-order days exact instead of approximated: a backfilled day
  * changes every later level/trend, and the replay picks that up for
  * free. */
object ForecastMonitor {

  /** Start the monitor: day totals in `stateDir`_days, the Holt
    * fit+forecast table published at `stateDir`_holt and the
    * Holt-Winters one at `stateDir`_hw. */
  def monitor(spark: SparkSession, srcDir: String, stateDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1,
      schema: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val raw = UpsertSink.fileStream(spark, srcDir, maxFilesPerTrigger, schema)
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast(org.apache.spark.sql.types.TimestampType)
      case _ => col("ts")
    }
    val daily = raw
      .filter(col("event_type") === "purchase")
      .select(to_date(ts).as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("day"))
      .agg(sum(col("cents")).as("c"))
    daily.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        UpsertSink.upsertBatch(batch, Seq("day"), stateDir + "_days")
        val days = batch.sparkSession.read.parquet(stateDir + "_days")
        val tmp = stateDir + "_holt.tmp"
        Seasonal.holtFromDaily(days).write.mode("overwrite").parquet(tmp)
        UpsertSink.swapInto(tmp, stateDir + "_holt")
        val tmpHw = stateDir + "_hw.tmp"
        Seasonal.holtWintersFromDaily(days).write.mode("overwrite").parquet(tmpHw)
        UpsertSink.swapInto(tmpHw, stateDir + "_hw")
      }
      .start()
  }
}
