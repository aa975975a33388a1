package graft

import graft.operators.Seasonal
import graft.streaming.ForecastMonitor
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the Holt forecast monitor: daily sums are
  * additive and order-free, and the recursion REPLAYS from the day store
  * each batch, so shuffled replay and checkpoint restart (including a
  * late-arriving first half that changes every later level/trend) must
  * land exactly on the batch q_stats_holt table. */
class ForecastMonitorSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streamed holt equals batch after shuffled replay") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("fc_src").toString
    graft.sources.Tables.events(spark, dir)
      .repartition(5).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("fc_state").toString + "/fc"
    val q = ForecastMonitor.monitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("fc_ck").toString)
    q.processAllAvailable()
    q.stop()
    assert(canon(spark.read.parquet(stateDir + "_holt")) ===
      canon(Seasonal.holt(spark, dir)))
    assert(canon(spark.read.parquet(stateDir + "_hw")) ===
      canon(Seasonal.holtWinters(spark, dir)))
  }

  test("restart from checkpoint: a late backfilled half reshapes the whole fit") {
    val dir = SparkSpec.sf0001
    val ev = graft.sources.Tables.events(spark, dir).cache()
    val src = java.nio.file.Files.createTempDirectory("fc2_src").toString
    // first run sees only half the events, so day totals (and with them
    // the seed and every recursion step) are wrong until the backfill
    ev.filter(col("event_id") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("fc2_state").toString + "/fc"
    val ck = java.nio.file.Files.createTempDirectory("fc2_ck").toString
    val q1 = ForecastMonitor.monitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()
    ev.filter(col("event_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    ev.unpersist()
    val q2 = ForecastMonitor.monitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()
    assert(canon(spark.read.parquet(stateDir + "_holt")) ===
      canon(Seasonal.holt(spark, dir)))
    assert(canon(spark.read.parquet(stateDir + "_hw")) ===
      canon(Seasonal.holtWinters(spark, dir)))
  }
}
