package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The scale invariant behind the adaptive embedding-LSH path: plane count
  * grows with the corpus so bucket population stays bounded — candidate
  * volume is O(corpus · TargetBucketRows), never O(corpus²/2^const). */
class AdaptiveLshSpec extends SparkSuite {
  import spark.implicits._

  test("planesFor holds mean bucket population near the target across scales") {
    assert(Similarity.planesFor(1000) == Similarity.NumPlanes) // floor
    // 1M rows / 2^p ≈ 64 → p = 14
    assert(Similarity.planesFor(1L << 20) == 14)
    // 100 TB-ish: 10^11 docs → still int-bucketed, capped at 30
    assert(Similarity.planesFor(100_000_000_000L) == 30)
    // mean pop = n / 2^p stays within [TargetBucketRows/2, TargetBucketRows]
    Seq(10_000L, 1_000_000L, 100_000_000L).foreach { n =>
      val mean = n.toDouble / (1L << Similarity.planesFor(n))
      assert(mean <= Similarity.TargetBucketRows && mean > Similarity.TargetBucketRows / 4.0,
        s"n=$n mean=$mean")
    }
  }

  test("sf0.1: at least 64 buckets and max bucket population bounded") {
    val dir = "/root/testdata/sf0.1"
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    val pops = Similarity.bucketPopulations(spark, dir)
      .select(col("count")).as[Long].collect()
    assert(1L << Similarity.planesFor(n) >= 64)
    val mean = n.toDouble / (1L << Similarity.planesFor(n))
    // random hyperplanes over near-isotropic embeddings: allow 8× skew
    assert(pops.max <= math.max(8.0 * mean, 32.0),
      s"n=$n buckets=${pops.length} max=${pops.max} mean=$mean")
  }

  test("adaptive kNN returns dense ranks with self excluded") {
    val dir = SparkSpec.sf0001
    val out = Similarity.knnLshAdaptive(spark, dir)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (q, nb, _) => q != nb })
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
  }
}
