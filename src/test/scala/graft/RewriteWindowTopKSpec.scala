package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RewriteWindowTopK (plans/RewriteWindowTopK.scala): the row_number<=k
  * idiom plans through the native heap operator, guards hold, results
  * are unchanged. */
class RewriteWindowTopKSpec extends SparkSuite {

  private def li = sources.Tables.lineitem(spark, SparkSpec.sf0001).select(
    col("l_returnflag").as("g"), col("l_orderkey").as("o"),
    col("l_linenumber").as("n"), col("l_extendedprice").as("p"))

  private def windowTopK(k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("p").desc, col("o"), col("n"))
    li.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("row_number <= k plans through GraftTopK and keeps identical results") {
    val df = windowTopK(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPartial"), s"rewrite did not fire:\n$plan")
    // ground truth with the rewrite disabled
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try {
      val want = windowTopK(5)
      assert(!want.queryExecution.executedPlan.toString.contains("GraftTopK"))
      assert(df.exceptAll(want).isEmpty && want.exceptAll(df).isEmpty)
    } finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  test("rn = 1 (dedup-keeper form) also routes through the heap") {
    val w = Window.partitionBy(col("g")).orderBy(col("p").desc, col("o"), col("n"))
    val df = li.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPartial"), s"rewrite did not fire:\n$plan")
    val rows = df.collect()
    assert(rows.length === li.select(col("g")).distinct().count())
    rows.foreach(r => assert(r.getAs[Int]("rn") === 1))
  }

  test("rank() is NOT rewritten (ties can exceed k rows)") {
    val w = Window.partitionBy(col("g")).orderBy(col("p").desc)
    val df = li.withColumn("rk", rank().over(w)).filter(col("rk") <= 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftTopK"), s"rank() must not use the heap:\n$plan")
  }

  test("extra conjuncts survive the rewrite") {
    val w = Window.partitionBy(col("g")).orderBy(col("p").desc, col("o"), col("n"))
    val df = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("g") =!= "Z")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPartial"), s"rewrite did not fire:\n$plan")
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try {
      val want = li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 && col("g") =!= "Z")
      assert(df.exceptAll(want).isEmpty && want.exceptAll(df).isEmpty)
    } finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  test("registry window-top-k queries now plan through the heap (and stay green via oracle)") {
    val mode = operators.Scans.modeQty(spark, SparkSpec.sf0001)
    assert(mode.queryExecution.executedPlan.toString.contains("GraftTopKPartial"))
  }

  test("mirrored literal-on-left bound (k >= rn) also rewrites, with equal results") {
    val w = Window.partitionBy(col("g")).orderBy(col("p").desc, col("o"), col("n"))
    val df = li.withColumn("rn", row_number().over(w)).filter(lit(5) >= col("rn"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPartial"), s"mirrored form did not rewrite:\n$plan")
    val want = windowTopK(5)
    assert(df.exceptAll(want).isEmpty && want.exceptAll(df).isEmpty)
  }

  test("enable flag is case-insensitive: TRUE keeps the rewrite on, FALSE turns it off") {
    for ((v, expectHeap) <- Seq("TRUE" -> true, "False" -> false)) {
      spark.conf.set("spark.graft.topkRewrite.enabled", v)
      try {
        val plan = windowTopK(3).queryExecution.executedPlan.toString
        assert(plan.contains("GraftTopKPartial") === expectHeap,
          s"enabled=$v expected heap=$expectHeap:\n$plan")
      } finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    }
  }
}
