package graft

import graft.operators.Sketches
import graft.sources.Tables
import graft.streaming.CmsMonitor
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the Count-Min monitor: replay the documents
  * table file by file; the final cell state must equal the batch sketch
  * and the probe estimates must equal the batch estimator on it. */
class CmsMonitorSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streaming CMS cells and probe estimates equal batch after replay") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("cms_src").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(4).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("cms_state").toString + "/cms"
    val q = CmsMonitor.cmsMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("cms_ck").toString)
    q.processAllAvailable()
    q.stop()

    val batchCells = Sketches.cmsCellsOf(Tables.documents(spark, dir))
    assert(canon(spark.read.parquet(stateDir + "_cells")) === canon(batchCells))
    // cell count never exceeds the D×W bound — the whole point of the
    // sketch as STREAM STATE
    assert(spark.read.parquet(stateDir + "_cells").count()
      <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)

    import spark.implicits._
    val batchEst = Sketches.cmsEstimateOf(batchCells,
      CmsMonitor.DefaultProbes.toDF("word"))
    assert(canon(spark.read.parquet(stateDir)) === canon(batchEst))
  }

  test("restart from checkpoint: late files still converge to batch") {
    val dir = SparkSpec.sf0001
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    val src = java.nio.file.Files.createTempDirectory("cms2_src").toString
    docs.filter(col("doc_id") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("cms2_state").toString + "/cms"
    val ck = java.nio.file.Files.createTempDirectory("cms2_ck").toString
    val q1 = CmsMonitor.cmsMonitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()

    docs.filter(col("doc_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    docs.unpersist()
    val q2 = CmsMonitor.cmsMonitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    assert(canon(spark.read.parquet(stateDir + "_cells"))
      === canon(Sketches.cmsCellsOf(Tables.documents(spark, dir))))
  }
}
