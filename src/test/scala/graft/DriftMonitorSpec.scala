package graft

import graft.operators.Scans
import graft.streaming.DriftMonitor
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the PSI drift monitor: replay the lineitem table
  * file by file against the same table pinned as baseline; the final
  * published PSI state must equal the one-shot batch `q_stats_psi`. Also
  * pins mid-stream sanity: the state dir always holds one row per group
  * with the batch's exact schema. */
class DriftMonitorSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streaming PSI equals batch q_stats_psi after full replay") {
    val dir = SparkSpec.sf0001
    // split the current window across several files so the monitor takes
    // multiple micro-batches (the replay actually exercises the upsert)
    val src = java.nio.file.Files.createTempDirectory("psi_src").toString
    spark.read.parquet(s"$dir/lineitem.parquet")
      .repartition(4).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("psi_state").toString + "/psi"
    val q = DriftMonitor.psiMonitor(spark, src, dir, stateDir,
      java.nio.file.Files.createTempDirectory("psi_ck").toString)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(stateDir)
    val batch = Scans.psiDrift(spark, dir)
    assert(canon(streamed) === canon(batch))
    // one row per group, batch column set
    assert(streamed.select("l_returnflag").distinct().count() === streamed.count())
    assert(streamed.columns.sorted.toSeq ===
      Seq("l_returnflag", "n_base", "n_cur", "psi_contrib"))
  }

  test("restart from checkpoint: late files after a stop still converge to batch") {
    val dir = SparkSpec.sf0001
    val li = spark.read.parquet(s"$dir/lineitem.parquet").cache()
    val src = java.nio.file.Files.createTempDirectory("psi2_src").toString
    // phase 1: an arbitrary half of the table arrives, monitor STOPS
    li.filter(org.apache.spark.sql.functions.col("l_orderkey") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("psi2_state").toString + "/psi"
    val ck = java.nio.file.Files.createTempDirectory("psi2_ck").toString
    val q1 = DriftMonitor.psiMonitor(spark, src, dir, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()

    // phase 2: the rest lands while nothing runs; a NEW query on the SAME
    // checkpoint + state resumes the counts exactly (upsert idempotent
    // under the replayed uncommitted batch)
    li.filter(org.apache.spark.sql.functions.col("l_orderkey") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    li.unpersist()
    val q2 = DriftMonitor.psiMonitor(spark, src, dir, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    assert(canon(spark.read.parquet(stateDir)) === canon(Scans.psiDrift(spark, dir)))
  }
}
