package graft

import graft.operators.Scans
import graft.streaming.DriftMonitor
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the KS drift monitor: replay the events table
  * file by file; the final published one-row KS table must equal the
  * one-shot batch `q_stats_ks`, including across a mid-replay stop and
  * checkpoint restart. */
class KsMonitorSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streaming KS equals batch q_stats_ks after full replay") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("ks_src").toString
    spark.read.parquet(s"$dir/events.parquet")
      .repartition(4).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("ks_state").toString + "/ks"
    val q = DriftMonitor.ksMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("ks_ck").toString)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(stateDir).drop("metric")
    assert(canon(streamed) === canon(Scans.ksDrift(spark, dir)))
  }

  test("restart from checkpoint: late files after a stop still converge to batch") {
    val dir = SparkSpec.sf0001
    val ev = spark.read.parquet(s"$dir/events.parquet").cache()
    val src = java.nio.file.Files.createTempDirectory("ks2_src").toString
    ev.filter(col("event_id") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("ks2_state").toString + "/ks"
    val ck = java.nio.file.Files.createTempDirectory("ks2_ck").toString
    val q1 = DriftMonitor.ksMonitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()

    ev.filter(col("event_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    val q2 = DriftMonitor.ksMonitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    val streamed = spark.read.parquet(stateDir).drop("metric")
    assert(canon(streamed) === canon(Scans.ksDrift(spark, dir)))
    ev.unpersist()
  }
}
