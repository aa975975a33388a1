package graft

import graft.operators.{Analytics, Mining}
import org.apache.spark.sql.functions._

/** Invariants for the round-6 third wave: JL projection distortion and
  * incremental join-view maintenance. */
class Round6OpsSpec extends SparkSuite {

  private val dir = SparkSpec.sf0001

  test("rp distortion: JL estimator is unbiased-ish and the plan is narrow") {
    val rows = Mining.rpDistortion(spark, dir).collect()
    assert(rows.nonEmpty)
    val ds = rows.flatMap(r => Option(r.getAs[java.lang.Double]("distortion")).map(_.toDouble))
    val mean = ds.sum / ds.length
    // ±1 rows give E[d2_rp] = d2; with k=16 the mean over hundreds of
    // pairs concentrates well inside [0.7, 1.3]
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean")
    // every projected distance is non-negative and finite
    assert(rows.forall(_.getAs[Double]("d2_rp") >= 0))
  }

  test("rp matrix is deterministic ±1 with the pinned shape") {
    assert(Mining.rpMatrix.length === Mining.RpDim)
    assert(Mining.rpMatrix.forall(_.length === 64))
    assert(Mining.rpMatrix.flatten.forall(x => x == 1.0 || x == -1.0))
    // not degenerate: both signs appear in every row
    assert(Mining.rpMatrix.forall(r => r.contains(1.0) && r.contains(-1.0)))
  }

  test("mv join incremental: all four delta-rule branches are non-empty") {
    // the union equals the full join (oracle-checked); here pin that the
    // md5 delta gate actually exercises every branch of the rule
    import org.apache.spark.sql.Column
    def isDelta(k: Column): Column =
      conv(substring(md5(k.cast("string")), 1, 2), 16, 10).cast("int") < 26
    val o = graft.sources.Tables.orders(spark, dir)
    val l = graft.sources.Tables.lineitem(spark, dir)
    val lKey = concat_ws(":", col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string"))
    val oD = o.filter(isDelta(col("o_orderkey")))
    val lD = l.filter(isDelta(lKey))
    val oB = o.filter(!isDelta(col("o_orderkey")))
    val lB = l.filter(!isDelta(lKey))
    assert(oD.count() > 0 && lD.count() > 0)
    val on = col("o_orderkey") === col("l_orderkey")
    assert(oD.join(lB, on).count() > 0) // ΔO ⋈ base
    assert(oB.join(lD, on).count() > 0) // base ⋈ ΔL
    assert(oD.join(lD, on).count() > 0) // ΔO ⋈ ΔL (both sides new)
    // and the composed view matches the plain join row-for-row
    val full = o.join(l, on).count()
    assert(Analytics.mvJoinIncremental(spark, dir).count() === full)
  }

  test("mv join incremental: delta terms broadcast the delta side") {
    val plan = Analytics.mvJoinIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
