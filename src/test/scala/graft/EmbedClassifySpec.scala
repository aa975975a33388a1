package graft

import graft.operators.EmbedClassify
import org.apache.spark.sql.functions._

/** Centroid pooling + classification on a hand-built two-cluster fixture:
  * label 0 vectors point along axis 0, label 1 along axis 32, each member
  * perturbed by 0.1 on its own distinct axis — cosines are ~1 within a
  * cluster and ~0 across, so every classification outcome is forced. */
class EmbedClassifySpec extends SparkSuite {
  import spark.implicits._

  private def member(axis: Int, perturbAxis: Int): Array[Float] = {
    val v = Array.fill(64)(0.0f)
    v(axis) = 1.0f
    v(perturbAxis) = 0.1f
    v
  }

  // 4 members per cluster: majority vote is safe (3 same-cluster among
  // top-5 neighbors) even if both clusters share an LSH bucket.
  private lazy val dir = fixtureDir(
    "embeddings" -> Seq(
      (0L, member(0, 1), 0), (1L, member(0, 2), 0),
      (2L, member(0, 3), 0), (3L, member(0, 4), 0),
      (10L, member(32, 33), 1), (11L, member(32, 34), 1),
      (12L, member(32, 35), 1), (13L, member(32, 36), 1)
    ).toDF("vec_id", "embedding", "label"))

  test("centroids: shared axis pools to 1.0, each perturbation to 0.1/4") {
    val cents = EmbedClassify.centroids(spark, dir).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("dim")) -> r).toMap
    assert(cents((0, 1)).getAs[Double]("cent") === 1.0) // axis 0 -> dim 1
    assert(cents((0, 2)).getAs[Double]("cent") === 0.025)
    assert(cents((0, 5)).getAs[Double]("cent") === 0.025)
    assert(cents((0, 6)).getAs[Double]("cent") === 0.0)
    assert(cents((1, 33)).getAs[Double]("cent") === 1.0) // axis 32 -> dim 33
    assert(cents((0, 1)).getAs[Long]("n") === 4)
    assert(cents.size === 2 * 64)
  }

  test("nearest centroid classifies both clusters perfectly") {
    val out = EmbedClassify.nearestCentroid(spark, dir).collect()
    assert(out.length === 8)
    assert(out.forall(_.getAs[Boolean]("correct")))
    // cluster cosine to own centroid is high, cross is near zero
    assert(out.forall(_.getAs[Double]("sim") > 0.9))
  }

  test("kNN eval: majority vote is perfect per label") {
    val rows = EmbedClassify.knnEval(spark, dir).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(rows.keySet === Set(0, 1))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n") === 4)
      assert(r.getAs[Long]("n_correct") === 4)
      assert(r.getAs[Double]("accuracy") === 1.0)
    }
  }
}
