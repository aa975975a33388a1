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

  /** Every node of the executed plan, descending through AQE wrappers and
    * query-stage leaves (collect() alone stops at stage boundaries). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  private def partialExec(df: org.apache.spark.sql.DataFrame): graft.plans.GraftTopKExec =
    allNodes(df.queryExecution.executedPlan).collectFirst {
      case e: graft.plans.GraftTopKExec if e.partial => e
    }.getOrElse(fail("no GraftTopKPartial in plan"))

  test("forced tiny-group passthrough still matches the window form") {
    // checkEvery=1 makes the ratio check fire on the very first row of every
    // partition (1 group / 1 row), exercising the degrade path that fixed the
    // 93s near-unique-key regression — on a small dataset a spec can reach it
    spark.conf.set("spark.graft.topk.checkEvery", "1")
    try {
      val native = TopK.topK(li, Seq("g"),
        Seq(("p", true), ("o", false), ("n", false)), 5)
      val w = Window.partitionBy(col("g"))
        .orderBy(col("p").desc, col("o"), col("n"))
      val windowed = li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).drop("rn")
      assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty)
      val probed = TopK.topK(li, Seq("g"), Seq(("p", true), ("o", false)), 5)
      probed.collect()
      assert(partialExec(probed).metrics("passthroughParts").value > 0,
        "degrade never fired despite checkEvery=1")
    } finally spark.conf.unset("spark.graft.topk.checkEvery")
  }

  test("absolute retained-row budget degrades mid-density partitions") {
    // 10 groups x 10 rows in ONE partition, k=2, budget 4 retained rows:
    // the ratio check never fires (10 rows/group) but admitting a 3rd group
    // would exceed the budget — the map stops growing and the partition
    // forwards the remainder; the final sorted scan still emits exactly k
    spark.conf.set("spark.graft.topk.maxRetainedRows", "4")
    try {
      val df = spark.range(100).select(
        (col("id") % 10).as("g"), col("id").as("o")).repartition(1)
      val native = TopK.topK(df, Seq("g"), Seq(("o", true)), 2)
      val w = Window.partitionBy(col("g")).orderBy(col("o").desc)
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
      assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty)
      native.collect()
      assert(partialExec(native).metrics("passthroughParts").value > 0,
        "budget degrade never fired despite maxRetainedRows=4")
    } finally spark.conf.unset("spark.graft.topk.maxRetainedRows")
  }

  test("rewrite path: final exec's declared ordering elides the Window's sort") {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("p").desc, col("o"), col("n"))
    val q = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKFinal"), s"rewrite did not fire:\n$plan")
    // exactly ONE sort: the survivor sort between final and partial. The
    // parent Window's (partition, order) requirement is satisfied by the
    // final exec's declared outputOrdering — a second sort above the final
    // exec would be pure waste over the k·|groups| survivors
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(sorts == 1, s"expected exactly 1 sort, got $sorts:\n$plan")
    val (iFinal, iSort, iPartial) =
      (plan.indexOf("GraftTopKFinal"), plan.indexOf("Sort ["), plan.indexOf("GraftTopKPartial"))
    assert(iFinal < iSort && iSort < iPartial,
      s"the single sort is not the survivor sort:\n$plan")
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
