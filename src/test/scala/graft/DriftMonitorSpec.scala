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

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    }
    val streamed = spark.read.parquet(stateDir)
    val batch = Scans.psiDrift(spark, dir)
    assert(canon(streamed) === canon(batch))
    // one row per group, batch column set
    assert(streamed.select("l_returnflag").distinct().count() === streamed.count())
    assert(streamed.columns.sorted.toSeq ===
      Seq("l_returnflag", "n_base", "n_cur", "psi_contrib"))
  }
}
