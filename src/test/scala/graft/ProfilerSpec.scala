package graft

import graft.operators.Profiler
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** The catalog profiler's contract is ONE scan for the whole schema —
  * and a sketch estimate that tracks the exact NDV audit. */
class ProfilerSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  private val dir = SparkSpec.sf0001

  test("profiles every column in a single table scan") {
    val df = Profiler.catalogProfile(spark, dir)
    df.collect()
    val scans = collect(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected 1 scan, got ${scans.length}")
  }

  test("NDV estimate is exact below K and within KMV error above it") {
    val rows = Profiler.catalogProfile(spark, dir).collect()
    assert(rows.length == 11)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(3), r.getDouble(4))
      assert(r.getLong(2) == 0L) // no nulls in harness data
      if (exact < graft.functions.KmvSketch.K) assert(est == exact.toDouble)
      else assert(est / exact > 1.0 / 3 && est / exact < 3.0, // K=16 => ~26%
        // relative sigma, so individual columns can land ~2x off; the
        // bound is the 3-sigma-ish envelope, not the typical case
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }
}
