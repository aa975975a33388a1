package graft

import graft.operators.Inference
import graft.streaming.AbtestMonitor
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the A/B monitor: the per-user conversion flag is
  * monotone, so shuffled replay must land on the batch statistic exactly,
  * and a checkpoint restart must keep converging. */
class AbtestMonitorSpec extends SparkSuite {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streamed abtest equals batch q_events_abtest after shuffled replay") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("ab_src").toString
    graft.sources.Tables.events(spark, dir)
      .repartition(5).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("ab_state").toString + "/abtest"
    val q = AbtestMonitor.monitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("ab_ck").toString)
    q.processAllAvailable()
    q.stop()

    assert(canon(spark.read.parquet(stateDir)) ===
      canon(Inference.abtest(spark, dir)))
  }

  test("restart from checkpoint: late conversions still converge to batch") {
    val dir = SparkSpec.sf0001
    val ev = graft.sources.Tables.events(spark, dir).cache()
    val src = java.nio.file.Files.createTempDirectory("ab2_src").toString
    // first run withholds the high-value purchases — conversions arrive late
    ev.filter(!(col("event_type") === "purchase" &&
        col("value") >= Inference.ConvThreshold))
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("ab2_state").toString + "/abtest"
    val ck = java.nio.file.Files.createTempDirectory("ab2_ck").toString
    val q1 = AbtestMonitor.monitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()
    // before the conversions land, every rate must be 0
    val mid = spark.read.parquet(stateDir).collect().head
    assert(mid.getAs[Double]("rate_c") === 0.0 && mid.getAs[Double]("rate_t") === 0.0)

    ev.filter(col("event_type") === "purchase" &&
        col("value") >= Inference.ConvThreshold)
      .repartition(2).write.mode("append").parquet(src)
    ev.unpersist()
    val q2 = AbtestMonitor.monitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    assert(canon(spark.read.parquet(stateDir)) ===
      canon(Inference.abtest(spark, dir)))
  }
}
