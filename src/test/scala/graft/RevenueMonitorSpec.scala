package graft

import graft.operators.Trend
import graft.streaming.RevenueMonitor
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the revenue EWMA/CUSUM monitor: daily sums are
  * additive and order-free, so shuffled replay and checkpoint restart
  * must land exactly on the batch q_stats_ewma / q_stats_cusum tables. */
class RevenueMonitorSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streamed ewma and cusum equal batch after shuffled replay") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("rev_src").toString
    graft.sources.Tables.events(spark, dir)
      .repartition(5).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("rev_state").toString + "/rev"
    val q = RevenueMonitor.monitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("rev_ck").toString)
    q.processAllAvailable()
    q.stop()

    assert(canon(spark.read.parquet(stateDir + "_ewma")) ===
      canon(Trend.ewma(spark, dir)))
    assert(canon(spark.read.parquet(stateDir + "_cusum")) ===
      canon(Trend.cusum(spark, dir)))
  }

  test("restart from checkpoint: late days still converge to batch") {
    val dir = SparkSpec.sf0001
    val ev = graft.sources.Tables.events(spark, dir).cache()
    val src = java.nio.file.Files.createTempDirectory("rev2_src").toString
    ev.filter(col("event_id") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("rev2_state").toString + "/rev"
    val ck = java.nio.file.Files.createTempDirectory("rev2_ck").toString
    val q1 = RevenueMonitor.monitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()

    ev.filter(col("event_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    ev.unpersist()
    val q2 = RevenueMonitor.monitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    assert(canon(spark.read.parquet(stateDir + "_ewma")) ===
      canon(Trend.ewma(spark, dir)))
    assert(canon(spark.read.parquet(stateDir + "_cusum")) ===
      canon(Trend.cusum(spark, dir)))
  }
}
