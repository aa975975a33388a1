package graft

import graft.operators.TextAnalysis
import graft.streaming.DocIngest
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the document-ingest pipeline: replay the same
  * corpus file by file through the streaming path and assert the final
  * chunk set matches the one-shot batch result. */
class DocIngestSpec extends SparkSuite {
  import spark.implicits._

  private val good1 = "the quick brown fox jumps over the lazy dog and then runs far away home"
  private val good2 = "a completely different story about the catalyst optimizer and its many clever rules"
  private val junk = "short junk" // fails the >= 10 tokens gate

  private def writeDocs(rows: Seq[(Long, String)], parts: Int): String = {
    val src = java.nio.file.Files.createTempDirectory("doc_src").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(parts).write.mode("overwrite").parquet(src)
    src
  }

  test("streaming ingest equals batch ingest after file-by-file replay") {
    // duplicate content under different ids, plus junk that must be gated out
    val src = writeDocs(Seq(
      (1L, good1), (2L, good2), (3L, good1), (4L, junk),
      (5L, good1.toUpperCase) // case-folds to the same normalized content
    ), parts = 3)

    val q = DocIngest.ingest(spark, src).writeStream
      .format("memory").queryName("ingest_stream").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck_ingest").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    }
    val streamed = spark.table("ingest_stream")
    val batch = TextAnalysis.ingestChunksOf(spark.read.parquet(src))
    assert(canon(streamed) === canon(batch))
    // 2 distinct surviving contents (good1 family dedups to one), junk gated
    assert(streamed.select("fp").distinct().count() === 2)
    assert(streamed.count() > 0)
  }
}
