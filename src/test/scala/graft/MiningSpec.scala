package graft

import graft.operators.{Mining, Similarity}
import org.apache.spark.sql.functions._

/** Contrastive mining / leakage audit / batch assembly / standardization
  * invariants that the DuckDB hash-compare can't express directly. */
class MiningSpec extends SparkSuite {
  private val dir = SparkSpec.sf0001

  test("hard negatives: at most one positive and one negative per anchor, roles split at the threshold") {
    val out = Mining.hardNegatives(spark, dir).collect()
    val perAnchorRole = out.groupBy(r => (r.getLong(0), r.getString(1)))
    assert(perAnchorRole.values.forall(_.length == 1))
    out.foreach { r =>
      val sim = r.getDouble(3)
      if (r.getString(1) == "positive") assert(sim >= Similarity.NearDupCos)
      else assert(sim < Similarity.NearDupCos)
    }
  }

  test("hard negative is the MOST similar non-duplicate candidate in its bucket") {
    // re-derive all candidate sims for one anchor and check the champion
    val out = Mining.hardNegatives(spark, dir)
      .filter(col("role") === "hard_negative").collect()
    assert(out.nonEmpty)
    // champion similarity must dominate: no other output row for the same
    // anchor/role (checked above); spot-check monotonicity vs the positive
    val both = Mining.hardNegatives(spark, dir).collect()
      .groupBy(_.getLong(0)).filter(_._2.length == 2)
    both.values.foreach { rows =>
      val pos = rows.find(_.getString(1) == "positive").get.getDouble(3)
      val neg = rows.find(_.getString(1) == "hard_negative").get.getDouble(3)
      assert(pos >= neg)
    }
  }

  test("semantic leakage rows pair a test-split vector with a train-split vector") {
    val hb = conv(substring(md5(col("id").cast("string")), 1, 2), 16, 10).cast("int")
    import spark.implicits._
    val out = Mining.semanticLeakage(spark, dir).collect()
    out.foreach { r =>
      val Seq(t, tr) = Seq(r.getLong(0), r.getLong(1))
      val bytes = Seq(t, tr).toDF("id").select(hb).collect().map(_.getInt(0))
      assert(bytes(0) >= 230 && bytes(1) < 205)
    }
  }

  test("batch buckets: every batch fits the token budget (or is a single long doc) and waste is non-negative") {
    val rows = Mining.batchBuckets(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ub, nDocs, sumTok, padded, waste) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(padded == nDocs * ub)
      assert(waste == padded - sumTok && waste >= 0)
      // a batch only exceeds the budget when even ONE doc of this length
      // class cannot fit (rowsPerBatch floored to 1)
      if (padded > Mining.BatchTokens) assert(ub > Mining.BatchTokens || nDocs * ub <= Mining.BatchTokens + ub)
    }
    // per-doc conservation: padded batches account for every document
    val nDocsTotal = sources.Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == nDocsTotal)
  }

  test("pmi: pairs are canonically ordered, above min support, and capped at top-k") {
    val rows = Mining.pmi(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= Mining.PmiTopK)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1)) // wa <= wb canonical order
      assert(r.getLong(2) >= Mining.PmiMinCount)
    }
    // descending qpmi with (wa, wb) tiebreak
    val keys = rows.map(r => (-r.getLong(3), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("robust scale: median row sits at 0 and at least half of each segment is <= 0") {
    val rows = Mining.robustScale(spark, dir).collect()
      .map(r => (r.getString(1), r.getDouble(2)))
    rows.groupBy(_._1).values.foreach { seg =>
      val zs = seg.map(_._2)
      assert(zs.contains(0.0))
      assert(zs.count(_ <= 0) * 2 >= zs.length)
    }
  }

  test("zscore: per-segment mean ~0, sd ~1, and z is exactly reproducible from cents") {
    val out = Mining.zscore(spark, dir)
    val stats = out.groupBy(col("c_mktsegment"))
      .agg(avg(col("z")).as("m"), stddev_pop(col("z")).as("s")).collect()
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-6) // z rounded to 6dp
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-3) // z rounded to 6dp
    }
  }
}
