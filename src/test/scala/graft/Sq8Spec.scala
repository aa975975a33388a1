package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Int8 scalar quantization + exact-rerank ANN (operators/Similarity). */
class Sq8Spec extends SparkSuite {
  import spark.implicits._

  test("quantization round-trip error is bounded by scale/2 per component") {
    val rows = Similarity.sq8Vectors(spark, SparkSpec.sf0001)
      .select("v", "scale", "qv").limit(50).collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val scale = r.getDouble(1)
      val qv = r.getSeq[Double](2)
      v.zip(qv).foreach { case (x, q) =>
        assert(math.abs(q * scale - x) <= scale / 2 + 1e-12,
          s"component error ${math.abs(q * scale - x)} > ${scale / 2}")
        assert(math.abs(q) <= 127.0)
      }
    }
  }

  test("quantized cosine approximates exact cosine closely") {
    // compare asim vs exact sim over all bucket-mate pairs at sf0.001
    val vecs = Similarity.sq8Vectors(spark, SparkSpec.sf0001).limit(100)
    val q = vecs.alias("q"); val c = vecs.alias("c")
    def vdot(a: String, b: String) =
      call_function("vec_dot", col(a), col(b))
    val pairs = q.join(c, col("q.vec_id") < col("c.vec_id"))
      .select(
        (vdot("q.v", "c.v") / (col("q.nrm") * col("c.nrm"))).as("exact"),
        ((col("q.scale") * col("c.scale") * vdot("q.qv", "c.qv")) /
          (col("q.qnrm") * col("c.qnrm"))).as("approx"))
      .select(max(abs(col("exact") - col("approx"))).as("maxerr"))
      .head().getDouble(0)
    // 64-dim int8: worst-case relative error ~ O(1/127); generous bound
    assert(pairs < 0.05, s"max |exact - approx| = $pairs")
  }

  test("sq8 rerank recall@5 matches the same-bucket LSH path") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.knnBrute(spark, SparkSpec.sf0001))
    def recall(got: Set[(Long, Long)]): Double =
      got.intersect(truth).size.toDouble / truth.size
    val rLsh = recall(pairs(Similarity.knnLsh(spark, SparkSpec.sf0001)))
    val rSq8 = recall(pairs(Similarity.knnSq8(spark, SparkSpec.sf0001)))
    info(f"recall@5 — lsh(exact): $rLsh%.3f, sq8+rerank: $rSq8%.3f")
    // same candidate buckets; int8 ranking only perturbs WHICH RerankK=2K
    // candidates reach the exact stage, so recall should be ~equal — allow
    // one borderline swap per ~20 queries
    assert(rSq8 >= rLsh - 0.05)
  }
}
