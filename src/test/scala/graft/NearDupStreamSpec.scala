package graft

import graft.operators.NearDup
import graft.sources.Tables
import graft.streaming.NearDupStream
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for incremental near-dedup: the new-batch docs
  * (doc_id % 5 == 0, the batch twin's split) arrive file by file — with a
  * kill + checkpoint restart in the middle — and the verified pair set
  * must equal `q_dedup_incremental_near` over the same corpus. */
class NearDupStreamSpec extends SparkSuite {
  import spark.implicits._

  private val base1 =
    "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
  private val base2 =
    "a completely different story about the catalyst optimizer and its many clever rules indeed"

  // corpus = ids % 5 != 0; arriving batch = ids % 5 == 0
  private val allDocs = Seq(
    1L -> base1,
    2L -> base2,
    3L -> "unrelated text about nothing in particular with many random words here",
    5L -> base1.replace("tonight", "today"), // near-dup of 1
    10L -> base2,                            // exact dup of 2
    15L -> "totally disjoint set of tokens nobody else uses anywhere around these parts")

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("id_a"), col("id_b"), col("jaccard")).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("file-by-file replay with mid-stream restart equals the batch incremental query") {
    val dir = fixtureDir("documents" -> docsDf(allDocs))
    val corpus = Tables.documents(spark, dir).filter(col("doc_id") % 5 =!= 0)

    val srcDir = Files.createTempDirectory("neardup_src").toString
    val outDir = Files.createTempDirectory("neardup_out").toString + "/pairs"
    val ck = Files.createTempDirectory("neardup_ck").toString
    def land(ids: Long*): Unit =
      docsDf(allDocs.filter(d => ids.contains(d._1))).repartition(1)
        .write.mode("append").parquet(srcDir)
    def run() = NearDupStream.pairsStream(spark, srcDir, corpus).writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ck).outputMode("append").start()

    land(5L)
    val q1 = run(); q1.processAllAvailable(); q1.stop()
    land(10L); land(15L)
    val q2 = run(); q2.processAllAvailable(); q2.stop()

    val streamed = spark.read.parquet(outDir)
    val batch = NearDup.incrementalNearPairs(spark, dir)
    assert(canon(streamed) === canon(batch))
    val pairs = streamed.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((5L, 1L)) && pairs.contains((10L, 2L))) // near + exact
    assert(!pairs.exists(_._1 == 15L)) // the disjoint doc matches nothing
  }
}
