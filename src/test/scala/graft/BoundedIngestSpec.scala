package graft

import graft.operators.TextAnalysis
import graft.streaming.DocIngest
import org.apache.spark.sql.functions._

/** Bounded-state ingest dedup (dropDuplicatesWithinWatermark): within the
  * horizon it is indistinguishable from the corpus-forever form; past the
  * horizon the fingerprint is evicted and a late duplicate is re-admitted
  * — the documented semantics trade, pinned both ways. */
class BoundedIngestSpec extends SparkSuite {
  import spark.implicits._

  private val good1 = "the quick brown fox jumps over the lazy dog and then runs far away home"
  private val good2 = "a completely different story about the catalyst optimizer and its many clever rules"

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def start(srcDir: String, horizon: String, name: String) =
    DocIngest.ingestBounded(spark, srcDir, horizon).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"${name}_ck").toString)
      .start()

  test("within the horizon, bounded dedup equals the corpus-forever form") {
    val srcDir = java.nio.file.Files.createTempDirectory("bnd_src1").toString
    def land(rows: Seq[(Long, String)]): Unit =
      docsDf(rows).repartition(1).write.mode("append").parquet(srcDir)
    land(Seq(1L -> good1, 2L -> good2))
    land(Seq(3L -> good1, 4L -> good1.toUpperCase)) // dups of 1 across batches
    val q = start(srcDir, "10 minutes", "bnd_within")
    q.processAllAvailable(); q.stop()
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    }
    val batch = TextAnalysis.ingestChunksOf(spark.read.parquet(srcDir))
    assert(canon(spark.table("bnd_within")) === canon(batch))
    assert(spark.table("bnd_within").select("fp").distinct().count() === 2)
  }

  test("past the horizon the fingerprint is evicted and a late duplicate re-admits") {
    val srcDir = java.nio.file.Files.createTempDirectory("bnd_src2").toString
    def land(rows: Seq[(Long, String)]): Unit =
      docsDf(rows).repartition(1).write.mode("append").parquet(srcDir)
    val q = start(srcDir, "1 millisecond", "bnd_past")
    land(Seq(1L -> good1))
    q.processAllAvailable()
    Thread.sleep(300)
    // an unrelated batch advances the watermark past doc 1's expiry
    land(Seq(2L -> good2))
    q.processAllAvailable()
    Thread.sleep(300)
    land(Seq(3L -> good1)) // same content, past the horizon
    q.processAllAvailable(); q.stop()
    val perFp = spark.table("bnd_past").groupBy("fp", "chunk_idx")
      .count().select(max(col("count"))).collect()(0).getLong(0)
    assert(perFp === 2L,
      "late duplicate should re-admit after its fingerprint's horizon passed")
  }
}
