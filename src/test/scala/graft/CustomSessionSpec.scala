package graft

import graft.streaming.Stateful
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Custom sessionizer (flatMapGroupsWithState + event-time timeout,
  * streaming/Stateful.scala): sessions finalize exactly when the
  * watermark passes their close, out-of-order events merge retroactively,
  * and the emitted sessions equal the built-in session_window's on the
  * same rows. */
class CustomSessionSpec extends SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")

  test("append-mode sessions: watermark-gated finalize, out-of-order merge") {
    val spark0 = spark
    import spark0.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)](spark)
    val events = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "10 minutes")
      .as[Stateful.SessEvent]
    val q = Stateful.customSessions(spark, events)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData((ts("10:00"), 1L, 1.0), (ts("10:10"), 1L, 2.0),
        (ts("10:05"), 2L, 5.0), (ts("10:12"), 99L, 0.0))
      q.processAllAvailable()
      // out-of-order event for user 1 merges into the 10:00 session: it is
      // above the watermark (10:12 - 10m = 10:02), so the stateful operator
      // still accepts it — later than this and Spark's late-row filter
      // would drop it before the operator (WatermarkSpec pins that)
      input.addData((ts("10:05"), 1L, 0.5), (ts("11:30"), 1L, 1.0))
      q.processAllAvailable()
      input.addData((ts("11:45"), 1L, 2.0))
      q.processAllAvailable()
      // two watermark pushes: one to pass session B's close, one more
      // batch so the timeout actually fires
      input.addData((ts("14:00"), 99L, 0.0))
      q.processAllAvailable()
      input.addData((ts("15:00"), 99L, 0.0))
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .filter(col("user_id") =!= 99L)
        .as[(Long, Long, Long, Double)].collect()
        .map { case (u, startUs, n, v) => (u, startUs / 1000000, n, v) }.toSet
      def epoch(s: String) = ts(s).getTime / 1000
      assert(got === Set(
        (1L, epoch("10:00"), 3L, 3.5), // merged out-of-order 10:05
        (1L, epoch("11:30"), 2L, 3.0),
        (2L, epoch("10:05"), 1L, 5.0)))
    } finally q.stop()
  }

  test("equals the built-in session_window on the same (closed) rows") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (ts("10:00"), 1L, 1.0), (ts("10:10"), 1L, 2.0), (ts("10:05"), 1L, 0.5),
      (ts("11:30"), 1L, 1.0), (ts("11:45"), 1L, 2.0), (ts("10:05"), 2L, 5.0))
    val batch = rows.toDF("ts", "user_id", "value")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("user_id"), unix_timestamp(col("sw.start")).as("start_s"),
        col("n"), col("v"))
      .as[(Long, Long, Long, Double)].collect().toSet

    val input = MemoryStream[(java.sql.Timestamp, Long, Double)](spark)
    val events = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "1 minute")
      .as[Stateful.SessEvent]
    val q = Stateful.customSessions(spark, events)
      .writeStream.format("memory").queryName("sess_eq")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((ts("20:00"), 99L, 0.0)) // push watermark past every close
      q.processAllAvailable()
      input.addData((ts("23:00"), 99L, 0.0)) // fire remaining timeouts
      q.processAllAvailable()
      val got = spark.table("sess_eq")
        .filter(col("user_id") =!= 99L)
        .as[(Long, Long, Long, Double)].collect()
        .map { case (u, startUs, n, v) => (u, startUs / 1000000, n, v) }.toSet
      assert(got === batch)
    } finally q.stop()
  }
}
