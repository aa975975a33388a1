package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native top-k-per-group operator (plans/TopK.scala): physical shape and
  * equivalence with the window-function formulation. */
class TopKPlanSpec extends SparkSuite {

  private def li = sources.Tables.lineitem(spark, SparkSpec.sf0001).select(
    col("l_returnflag").as("g"), col("l_orderkey").as("o"),
    col("l_linenumber").as("n"), col("l_extendedprice").as("p"))

  test("equivalent to the row_number window form") {
    val native = TopK.topK(li, Seq("g"),
      Seq(("p", true), ("o", false), ("n", false)), 5)
    val w = Window.partitionBy(col("g"))
      .orderBy(col("p").desc, col("o"), col("n"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty)
  }

  test("plans partial + exchange + survivor sort + streaming final, no Window") {
    val native = TopK.topK(li, Seq("g"), Seq(("p", true), ("o", false)), 5)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPartial"), s"missing partial exec:\n$plan")
    assert(plan.contains("GraftTopKFinal"), s"missing final exec:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(g"), s"missing group-key exchange:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into the native plan:\n$plan")
    // the final pass streams over (group, order)-sorted input; the Sort must
    // sit BETWEEN final and partial — i.e. it sorts the k·groups·partitions
    // partial survivors, never the raw relation (tree prints top-down)
    val (iFinal, iSort, iPartial) =
      (plan.indexOf("GraftTopKFinal"), plan.indexOf("Sort "), plan.indexOf("GraftTopKPartial"))
    assert(iSort >= 0, s"missing survivor sort under the final exec:\n$plan")
    assert(iFinal < iSort && iSort < iPartial,
      s"sort is not between final and partial:\n$plan")
  }

  test("k larger than any group returns every row") {
    val native = TopK.topK(li, Seq("g"), Seq(("p", true), ("o", false), ("n", false)),
      10 * 1000 * 1000)
    assert(native.count() === li.count())
  }

  test("global top-k (empty group) gathers to a single champion set") {
    val native = TopK.topK(li, Seq.empty, Seq(("p", true), ("o", false), ("n", false)), 7)
    val expected = li.orderBy(col("p").desc, col("o"), col("n")).limit(7)
    assert(native.exceptAll(expected).isEmpty && expected.exceptAll(native).isEmpty)
  }

  test("asc ordering keeps the cheapest rows") {
    val spark0 = spark
    import spark0.implicits._
    val native = TopK.topK(li, Seq("g"), Seq(("p", false), ("o", false), ("n", false)), 1)
    val got = native.select(col("g"), col("p")).as[(String, Double)]
      .collect().toMap
    val want = li.groupBy(col("g")).agg(min(col("p"))).as[(String, Double)]
      .collect().toMap
    assert(got === want)
  }
}
