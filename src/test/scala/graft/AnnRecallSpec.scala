package graft

import graft.operators.Similarity

/** Quantifies ANN recall@K against the brute-force ground truth at
  * sf0.001 and checks the theorem-backed ordering: a superset candidate
  * pool can only raise recall, so multiprobe >= single-probe LSH. */
class AnnRecallSpec extends SparkSuite {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("recall@5 vs brute force: multiprobe >= single-probe; all paths nonzero") {
    val dir = SparkSpec.sf0001
    val truth = pairs(Similarity.knnBrute(spark, dir))
    def recall(got: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0 else got.intersect(truth).size.toDouble / truth.size
    val rLsh = recall(pairs(Similarity.knnLsh(spark, dir)))
    val rMulti = recall(pairs(Similarity.knnLshMultiProbe(spark, dir)))
    val rIvf = recall(pairs(Similarity.knnIvf(spark, dir)))
    info(f"recall@5 — lsh: $rLsh%.3f, multiprobe: $rMulti%.3f, ivf: $rIvf%.3f")
    // candidate pool of multiprobe is a superset of single-probe LSH:
    // a true neighbor present in the smaller pool is only ever displaced
    // by other true neighbors, so recall cannot drop
    assert(rMulti >= rLsh)
    assert(rLsh > 0.0 && rIvf > 0.0)
  }

  test("trained-centroid IVF: recall@5 >= training-free IVF on the same queries") {
    val dir = SparkSpec.sf0001
    val truth = pairs(Similarity.knnBrute(spark, dir))
    def recall(got: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0 else got.intersect(truth).size.toDouble / truth.size
    val rSeed = recall(pairs(Similarity.knnIvf(spark, dir)))
    val rTrained = recall(pairs(Similarity.knnIvfTrained(spark, dir)))
    info(f"recall@5 — ivf(seed): $rSeed%.3f, ivf(kmeans): $rTrained%.3f")
    // Lloyd centroids partition the corpus by actual density instead of
    // arbitrary seed rows; with the same probe budget the candidate lists
    // a query probes are tighter around it, so recall must not drop.
    assert(rTrained >= rSeed, f"trained $rTrained%.3f < seed $rSeed%.3f")
    assert(rTrained > 0.0)
  }
}
