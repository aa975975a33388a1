package graft

import graft.functions.KmvSketch
import graft.sources.Tables
import graft.streaming.KmvMonitor
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the KMV distinct-users monitor: replay the
  * events table in file-sized micro-batches; the final keyed state must
  * equal the batch weekly sketch + estimate bit-for-bit, and per-key
  * state is bounded by K hashes. */
class KmvMonitorSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private def batchExpected(dir: String) = {
    val kmv = udaf(KmvSketch.aggregator)
    Tables.events(spark, dir)
      .select(graft.operators.Sketches.weekKey.as("wk"), col("event_type"),
        md5(col("user_id").cast("string")).as("h"))
      .groupBy(col("wk"), col("event_type")).agg(kmv(col("h")).as("kmv"))
      .select(col("wk"), col("event_type"),
        concat_ws(",", col("kmv")).as("kmv_csv"),
        graft.operators.Sketches.kmvEstimate(col("kmv")).as("est_users"))
  }

  test("streaming weekly sketches equal batch after replay, with K-bounded state") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("kmv_src").toString
    Tables.events(spark, dir).repartition(4).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("kmv_state").toString + "/kmv"
    val q = KmvMonitor.kmvMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("kmv_ck").toString)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(stateDir)
    assert(canon(got) === canon(batchExpected(dir)))
    // per-key state bound: the sketch holds at most K hashes
    got.collect().foreach { r =>
      val csv = r.getAs[String]("kmv_csv")
      assert(csv.split(",").length <= KmvSketch.K)
    }
  }

  test("restart from checkpoint: late files still converge to batch") {
    val dir = SparkSpec.sf0001
    val ev = Tables.events(spark, dir).cache()
    val src = java.nio.file.Files.createTempDirectory("kmv2_src").toString
    ev.filter(col("event_id") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("kmv2_state").toString + "/kmv"
    val ck = java.nio.file.Files.createTempDirectory("kmv2_ck").toString
    val q1 = KmvMonitor.kmvMonitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()

    ev.filter(col("event_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    ev.unpersist()
    val q2 = KmvMonitor.kmvMonitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    assert(canon(spark.read.parquet(stateDir)) === canon(batchExpected(dir)))
  }
}
