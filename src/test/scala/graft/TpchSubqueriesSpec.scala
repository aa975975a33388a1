package graft

import graft.operators.TpchSubqueries
import org.apache.spark.sql.functions._

/** The subquery-shaped TPC-H analogues (operators/TpchSubqueries.scala):
  * result invariants at sf0.001 plus the decorrelation plan properties
  * each query exists to demonstrate — no correlated per-row execution,
  * semi/anti joins where the SQL says IN/NOT-IN, and shuffle reuse where
  * several consumers hash on the same key. */
class TpchSubqueriesSpec extends SparkSuite {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.count() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("mincost: every row carries its part's minimum regional cost") {
    val rows = TpchSubqueries.minCostSupplier(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    // per part, all reported costs equal the per-part min of reported costs
    rows.groupBy(_.getAs[Long]("partkey")).foreach { case (_, rs) =>
      val costs = rs.map(_.getAs[Double]("cost"))
      assert(costs.forall(_ == costs.min))
    }
  }

  test("mincost: the correlated MIN runs as a join-back, reusing one offers exchange") {
    val plan = executedPlan(TpchSubqueries.minCostSupplier(spark, SparkSpec.sf0001))
    // the offers aggregate feeds both the best-cost gate and the final
    // join from a single shuffle — decorrelation without double compute
    assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
      s"expected the offers exchange to be reused:\n$plan")
  }

  test("profit: cents arithmetic ties out against a direct recompute") {
    val out = TpchSubqueries.profitByNationYear(spark, SparkSpec.sf0001)
    val total = out.agg(sum(col("profit"))).collect()(0).getDouble(0)
    // independent recompute of the grand total in one pass
    val li = sources.Tables.lineitem(spark, SparkSpec.sf0001)
      .join(sources.Tables.part(spark, SparkSpec.sf0001),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_name").contains("bolt"))
      .select((functions.Rounding.roundN(
        col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0).cast("long") -
        functions.Rounding.roundN(
          lit(0.6) * col("p_retailprice") * col("l_quantity") * 100, 0).cast("long"))
        .as("pc"))
      .agg(sum(col("pc"))).collect()(0).getLong(0)
    assert(math.abs(total - li.toDouble / 100.0) < 1e-6)
  }

  test("stock: every surviving part clears the cross-multiplied share gate") {
    val rows = TpchSubqueries.importantStock(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    val values = rows.map(_.getAs[Double]("value"))
    // each reported value is > (sum over ALL parts)/1000, so in particular
    // the smallest survivor times 1000 exceeds the reported total
    assert(values.min * 1000 > values.sum,
      "survivors alone already exceed the gate numerator — gate must hold " +
        "against the full total, which is at least the survivor sum")
  }

  test("shipdelay: bands partition the year slice exactly") {
    val rows = TpchSubqueries.shipDelayReport(spark, SparkSpec.sf0001).collect()
    val total = rows.map(r =>
      r.getAs[Long]("critical_count") + r.getAs[Long]("other_count")).sum
    val expected = sources.Tables.lineitem(spark, SparkSpec.sf0001)
      .filter(to_date(col("l_shipdate")) >= lit("1997-01-01") &&
        to_date(col("l_shipdate")) < lit("1998-01-01")).count()
    assert(total === expected)
  }

  test("suppcnt: the NOT-IN exclusion runs as a broadcast anti join") {
    val plan = executedPlan(TpchSubqueries.supplierCountByPart(spark, SparkSpec.sf0001))
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  test("promosupp: the IN-subquery runs as a semi join over the HAVING aggregate") {
    val plan = executedPlan(TpchSubqueries.promoSuppliers(spark, SparkSpec.sf0001))
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
  }

  test("waiting: sole-late semantics hold against a direct recompute") {
    val dir = SparkSpec.sf0001
    val out = TpchSubqueries.waitingSuppliers(spark, dir).collect()
    assert(out.nonEmpty)
    // independent recompute: for each F order with >1 suppliers and exactly
    // one late supplier, that supplier accrues one wait
    val lo = sources.Tables.lineitem(spark, dir)
      .join(sources.Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 120))
          .as("late"))
      .collect()
    val byOrder = lo.groupBy(_.getLong(0))
    val expected = byOrder.toSeq.flatMap { case (_, rs) =>
      val supps = rs.map(_.getLong(1)).distinct
      val lateSupps = rs.filter(_.getBoolean(2)).map(_.getLong(1)).distinct
      if (supps.length > 1 && lateSupps.length == 1) lateSupps else Nil
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = out.map(r => r.getAs[String]("name") -> r.getAs[Long]("numwait")).toMap
    val suppName = sources.Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expectedByName = expected.map { case (k, v) => suppName(k) -> v }
    assert(got === expectedByName)
  }

  test("waiting: single scan of lineitem — window decorrelation, no self-join") {
    val df = TpchSubqueries.waitingSuppliers(spark, SparkSpec.sf0001)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    val lineitemScans = "lineitem".r.findAllIn(plan).length
    assert(plan.contains("Window"), s"expected window decorrelation:\n$plan")
    // one FileScan referencing the lineitem path (column refs don't
    // mention the table name; only the scan's location string does)
    assert(lineitemScans <= 2, s"lineitem scanned more than once:\n$plan")
  }
}
