package graft

import graft.pipeline.Observed
import org.apache.spark.sql.functions._

/** Observation-API metrics (pipeline/Observed.scala): collected in the
  * same pass as the consuming action, values exact. */
class ObservedSpec extends SparkSuite {

  test("quality metrics ride the job's single pass and match recomputation") {
    val base = sources.Tables.orders(spark, SparkSpec.sf0001)
    val (df, obs) = Observed.withQualityMetrics(
      base, "orders_quality", Seq("o_custkey", "o_orderstatus"), "o_totalprice")
    // ONE action drives both the "real work" (a count here) and the metrics
    val nRows = df.count()
    val m = obs.get
    assert(m("n_rows") === nRows)
    assert(m("nulls_o_custkey") === 0L)
    assert(m("nulls_o_orderstatus") === 0L)
    val wantSum = base.agg(sum(col("o_totalprice"))).head().getDouble(0)
    assert(math.abs(m(s"sum_o_totalprice").asInstanceOf[Double] - wantSum) < 1e-6)
  }

  test("the metrics node is in-plan (CollectMetrics), not a second scan") {
    val (df, _) = Observed.withQualityMetrics(
      sources.Tables.orders(spark, SparkSpec.sf0001), "m2", Seq("o_custkey"),
      "o_totalprice")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CollectMetrics"), s"expected in-plan metrics:\n$plan")
  }
}
