package graft

import graft.operators.{Multimodal, Similarity, Skew, TextAnalysis}
import org.apache.spark.sql.functions._

/** Specs for the round's extension operators: BPE tokenizer, multi-probe
  * LSH, salted join, multimodal resize/frame-sample. */
class ExtensionOpsSpec extends SparkSuite {
  import spark.implicits._

  test("BPE-ish tokenizer splits letter runs, digit runs, punctuation") {
    val dir = fixtureDir("documents" -> Seq(
      (1L, "Hello, world! 42 cats", "en", "s", 21L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = TextAnalysis.tokenCountBpe(spark, dir).head()
    // norm: "hello, world! 42 cats" -> hello , world ! 42 cats
    assert(r.getAs[Int]("n_bpe_tokens") === 6)
    assert(r.getAs[Int]("n_number_tokens") === 1)
    assert(r.getAs[Int]("n_punct_tokens") === 2)
    assert(r.getAs[Int]("n_distinct_tokens") === 6)
  }

  test("multi-probe LSH recall >= single-bucket LSH recall, same ranking rules") {
    val mp = Similarity.knnLshMultiProbe(spark, SparkSpec.sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sp = Similarity.knnLsh(spark, SparkSpec.sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.knnBrute(spark, SparkSpec.sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(s: Set[(Long, Long)]) = (s intersect brute).size.toDouble / brute.size
    assert(recall(mp) >= recall(sp))
    assert(mp.nonEmpty)
  }

  test("salted join equals the plain join relation") {
    val salted = Skew.joinSalted(spark, SparkSpec.sf0001)
    val plain = graft.operators.Kpis.joinItemsOrders(spark, SparkSpec.sf0001)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty)
    assert(plain.exceptAll(salted).isEmpty)
  }

  test("resize preserves aspect ratio within the target box") {
    val rows = Multimodal.resizeFeatures(spark, SparkSpec.sf0001, 32, 32).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.out_w <= 32 && r.out_h <= 32 && r.out_w >= 1 && r.out_h >= 1)
      // the longer source side maps to the longer output side
      assert((r.src_w >= r.src_h) == (r.out_w >= r.out_h) ||
        r.out_w == 32 || r.out_h == 32)
    }
    // deterministic
    val again = Multimodal.resizeFeatures(spark, SparkSpec.sf0001, 32, 32).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("frame sampling emits every k-th frame with stable hashes") {
    val frames = Multimodal.sampleFrames(spark, SparkSpec.sf0001, everyK = 4).collect()
    val byDoc = frames.groupBy(_.doc_id)
    val feats = Multimodal.decodeFeatures(spark, SparkSpec.sf0001).collect()
      .map(f => f.doc_id -> f).toMap
    byDoc.foreach { case (id, fs) =>
      val expected = (0 until feats(id).n_frames by 4).toSeq
      assert(fs.map(_.frame_idx).sorted.toSeq === expected)
      assert(fs.forall(_.frame_hash.length === 32))
    }
  }
}
