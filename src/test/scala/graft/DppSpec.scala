package graft

import graft.sources.Dpp
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The q_join_dpp plan must actually PRUNE: the fact scan's partition
  * filters carry a runtime DynamicPruningExpression fed by the dimension
  * filter, and the scan reads only the selected months' directories. */
class DppSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  private val dir = SparkSpec.sf0001

  test("fact scan carries a dynamic pruning partition filter") {
    val df = Dpp.q1RevenueByMonth(spark, dir)
    df.collect() // finalize adaptive plan
    val scans = collect(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec if s.output.exists(_.name == "l_month") => s
    }
    assert(scans.nonEmpty, "no partitioned fact scan in the plan")
    val pf = scans.head.partitionFilters.map(_.toString).mkString(";")
    assert(pf.contains("dynamicpruning"),
      s"fact scan has no dynamic pruning filter; partitionFilters=$pf")
  }

  test("pruned scan reads only the dim-selected months") {
    val df = Dpp.q1RevenueByMonth(spark, dir)
    val months = df.collect().map(_.getString(0))
    assert(months.nonEmpty && months.forall(m => m.substring(5, 7).toInt <= 3))
    // every month directory that survives pruning is a Q1 month; the
    // partitioned copy itself holds all 12 month groups
    val allMonths = Dpp.partitionedFact(spark, dir)
      .select(col("l_month")).distinct().collect().map(_.getString(0))
    assert(allMonths.exists(m => m.substring(5, 7).toInt > 3),
      "fixture degenerate: partitioned copy has no non-Q1 months")
  }

  test("result matches the unpartitioned straight computation") {
    val got = Dpp.q1RevenueByMonth(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val li = sources.Tables.lineitem(spark, dir)
      .select(substring(col("l_shipdate"), 1, 7).as("m"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    val dim = sources.Tables.orders(spark, dir)
      .select(substring(col("o_orderdate"), 1, 7).as("month")).distinct()
      .filter(substring(col("month"), 6, 2).cast("int") <= 3)
    val exp = li.join(dim, col("m") === col("month"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n"), (sum(col("cents")).cast("double") / 100.0).as("rev"))
      .orderBy(col("m")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === exp)
  }
}
