package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermark semantics pinned explicitly: an event older than the
  * watermark is DROPPED by the streaming aggregation (state eviction is
  * what makes unbounded streams feasible), while the batch twin of the
  * same data includes it — the documented, deliberate batch/streaming
  * divergence every pipeline owner must know about. */
class WatermarkSpec extends SparkSuite {

  test("late event behind the watermark is dropped in streaming, kept in batch") {
    val spark0 = spark
    import spark0.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    def ts(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $m:00")

    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      // batch 1: two on-time events + one far-future event that advances
      // the watermark past the first window
      input.addData((ts("10:01"), "a"), (ts("10:04"), "a"), (ts("11:30"), "b"))
      q.processAllAvailable()
      // batch 2: a LATE event for the (closed) 10:00 window — behind the
      // watermark (11:30 - 10m = 11:20), must be dropped from state
      input.addData((ts("10:06"), "a"))
      q.processAllAvailable()
      // batch 3: push the watermark far enough to finalize everything
      input.addData((ts("12:30"), "b"))
      q.processAllAvailable()

      val streamed = spark.table("wm_out")
        .select(col("window.start").cast("string").as("w"), col("k"), col("n"))
        .as[(String, String, Long)].collect()
        .map { case (w, k, n) => ((w, k), n) }.toMap
      // the 10:00 window counts ONLY the two on-time events
      assert(streamed(("2024-01-01 10:00:00", "a")) === 2L)

      // the batch twin over the SAME rows counts all three
      val batch = Seq((ts("10:01"), "a"), (ts("10:04"), "a"), (ts("11:30"), "b"),
        (ts("10:06"), "a"), (ts("12:30"), "b"))
        .toDF("ts", "k")
        .groupBy(window(col("ts"), "10 minutes"), col("k"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("string"), col("k"), col("n"))
        .as[(String, String, Long)].collect()
        .map { case (w, k, n) => ((w, k), n) }.toMap
      assert(batch(("2024-01-01 10:00:00", "a")) === 3L)
    } finally q.stop()
  }
}
