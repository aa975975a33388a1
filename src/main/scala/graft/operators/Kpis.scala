package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's analytics core: the two-join star query and the two KPI
  * aggregations (reference transform.py:94-147; SURVEY.md §2.3-§2.4 keys
  * J3-J5, A3-A7, F1-F4, O1-O2), bound to the harness star schema
  * (order_items->lineitem, orders->orders, products->part — Tables.scala).
  *
  * Semantic quirks preserved verbatim (SURVEY.md §2.9):
  *  - `return_rate` counts post-join fan-out ROWS in the numerator over
  *    countDistinct(orders) in the denominator (transform.py:140-142) — it
  *    can exceed 100 and that is the contract.
  *  - `avg_order_value` is the average ITEM price (transform.py:114).
  *  - round(x, 2) stays outermost, exactly as transform.py:113-117,138-142.
  *
  * Scale notes (100 TB):
  *  - `part` is a genuine dimension → explicit broadcast hint; the
  *    fact-to-header join (lineitem x orders) shuffles on the order key and
  *    is left to AQE (both sides are fact-sized at scale, so SMJ on the key
  *    is the right plan; at bench SF AQE converts it to broadcast).
  *  - Aggregations are declarative groupBy/agg → Catalyst plans partial
  *    (map-side) + final HashAggregate; the two countDistinct columns in
  *    the order KPI go through the Expand rewrite automatically.
  *  - Only the needed columns are selected before the joins so parquet
  *    scans prune to the 4-6 referenced columns.
  */
object Kpis {

  /** lineitem ⋈ orders (fact-to-header; reference transform.py:97-101). */
  def joinItemsOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).alias("li")
    val o = Tables.orders(spark, dir).alias("o")
    li.join(o, col("li.l_orderkey") === col("o.o_orderkey"), "inner")
      .select(
        col("li.l_orderkey"), col("li.l_linenumber"), col("li.l_extendedprice"),
        col("o.o_custkey"), col("o.o_orderstatus"))
  }

  /** (lineitem ⋈ orders) ⋈ part — the full star (transform.py:102-106). */
  def joinStar(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).alias("li")
    val o = Tables.orders(spark, dir).alias("o")
    val p = Tables.part(spark, dir).alias("p")
    li.join(o, col("li.l_orderkey") === col("o.o_orderkey"), "inner")
      .join(broadcast(p), col("li.l_partkey") === col("p.p_partkey"), "inner")
      .select(
        col("li.l_orderkey"), col("li.l_linenumber"), col("li.l_extendedprice"),
        col("o.o_custkey"), col("p.p_brand"))
  }

  /** orders ⋈ lineitem — same relation, header-first build side
    * (transform.py:126-130). */
  def joinOrdersItems(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).alias("o")
    val li = Tables.lineitem(spark, dir).alias("li")
    o.join(li, col("o.o_orderkey") === col("li.l_orderkey"), "inner")
      .select(
        col("o.o_orderkey"), to_date(col("o.o_orderdate")).as("order_date"),
        col("li.l_linenumber"), col("li.l_quantity"))
  }

  /** Derived-column operator on its own (P4/F1: withColumn + to_date,
    * transform.py:110) — distinct ship dates. */
  def toDateDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("ship_date", to_date(col("l_shipdate")))
      .select(col("ship_date")).distinct()

  /** Category KPIs (reference transform.py:94-121, notebook cell 13):
    * groupBy(category, order_date) over the star join. */
  def kpiCategory(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).alias("li")
    val o = Tables.orders(spark, dir).alias("o")
    val p = Tables.part(spark, dir).alias("p")
    li.join(o, col("li.l_orderkey") === col("o.o_orderkey"), "inner")
      .join(broadcast(p), col("li.l_partkey") === col("p.p_partkey"), "inner")
      .withColumn("order_date", to_date(col("li.l_shipdate")))
      .groupBy(col("p.p_brand").as("category"), col("order_date"))
      .agg(
        roundN(sum(col("li.l_extendedprice")), 2).as("daily_revenue"),
        roundN(avg(col("li.l_extendedprice")), 2).as("avg_order_value"),
        roundN(count(when(col("li.l_returnflag") === "R", 1)) / count(lit(1)) * 100, 2)
          .as("avg_return_rate"))
      .orderBy(col("category"), col("order_date"))
  }

  /** Order KPIs (reference transform.py:123-147, notebook cell 17):
    * two exact countDistinct + plain aggs; the fan-out return_rate quirk
    * (SURVEY.md §2.9.1) is kept. */
  def kpiOrder(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).alias("o")
    val li = Tables.lineitem(spark, dir).alias("li")
    o.join(li, col("o.o_orderkey") === col("li.l_orderkey"), "inner")
      .withColumn("order_date", to_date(col("o.o_orderdate")))
      .groupBy(col("order_date"))
      .agg(
        countDistinct(col("o.o_orderkey")).as("total_orders"),
        roundN(sum(col("li.l_extendedprice")), 2).as("total_revenue"),
        sum(col("li.l_quantity")).as("total_items_sold"),
        roundN(count(when(col("o.o_orderstatus") === "F", 1)) /
          countDistinct(col("o.o_orderkey")) * 100, 2).as("return_rate"),
        countDistinct(col("o.o_custkey")).as("unique_customers"))
      .orderBy(col("order_date"))
  }

  /** Approximate order KPIs: the 100 TB path for A4's three exact
    * countDistincts. Exact multi-distinct forces the Expand rewrite (input
    * replicated once per distinct column before the shuffle); HLL sketches
    * (approx_count_distinct, rsd 1%) aggregate in one pass with fixed-size
    * state and merge associatively across partitions. No DuckDB oracle —
    * sketch estimates are implementation-specific — so the driver records
    * the weaker rows-only check; the spec bounds the estimate error vs the
    * exact result instead. */
  /** Shared agg body (no orderBy — streaming update mode forbids sorting;
    * the batch wrapper adds it). HLL register state is order-insensitive
    * (per-register max, merge = elementwise max), so the incremental
    * streaming fixpoint equals the batch result EXACTLY, not just within
    * the error bound — tested by StreamingSinkSpec's replay. */
  private[graft] def orderKpiApproxAgg(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.alias("o")
      .join(lineitem.alias("li"), col("o.o_orderkey") === col("li.l_orderkey"), "inner")
      .withColumn("order_date", to_date(col("o.o_orderdate")))
      .groupBy(col("order_date"))
      .agg(
        approx_count_distinct(col("o.o_orderkey"), 0.01).as("total_orders"),
        roundN(sum(col("li.l_extendedprice")), 2).as("total_revenue"),
        sum(col("li.l_quantity")).as("total_items_sold"),
        approx_count_distinct(col("o.o_custkey"), 0.01).as("unique_customers"))

  def kpiOrderApprox(spark: SparkSession, dir: String): DataFrame =
    orderKpiApproxAgg(Tables.orders(spark, dir), Tables.lineitem(spark, dir))
      .orderBy(col("order_date"))

  /** Deep snowflake: revenue by region/market segment through the full
    * dimension chain lineitem→orders→customer→nation→region. Every
    * dimension is broadcast (region 5 rows … customer smallest fact-side
    * dim); only the fact-to-header join shuffles. Exercises Catalyst's join
    * ordering over a 5-relation tree and sums BIGINT-cast cents-free
    * doubles via roundN. */
  def snowflakeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).alias("li")
    val o = Tables.orders(spark, dir).alias("o")
    val c = Tables.customer(spark, dir).alias("c")
    val n = Tables.nation(spark, dir).alias("n")
    val r = Tables.region(spark, dir).alias("r")
    li.join(o, col("li.l_orderkey") === col("o.o_orderkey"), "inner")
      .join(broadcast(c), col("o.o_custkey") === col("c.c_custkey"), "inner")
      .join(broadcast(n), col("c.c_nationkey") === col("n.n_nationkey"), "inner")
      .join(broadcast(r), col("n.n_regionkey") === col("r.r_regionkey"), "inner")
      .groupBy(col("r.r_name").as("region"), col("c.c_mktsegment").as("segment"))
      .agg(
        roundN(sum(col("li.l_extendedprice") * (lit(1) - col("li.l_discount"))), 2)
          .as("revenue"),
        countDistinct(col("o.o_custkey")).as("n_customers"),
        count(lit(1)).as("n_items"))
  }

  /** Revenue by supplier nation — covers the last dimension chain
    * (lineitem→supplier→nation); both dims broadcast, no fact shuffle
    * before the partial aggregate. */
  def supplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).alias("li")
    val s = Tables.supplier(spark, dir).alias("s")
    val n = Tables.nation(spark, dir).alias("n")
    li.join(broadcast(s), col("li.l_suppkey") === col("s.s_suppkey"), "inner")
      .join(broadcast(n), col("s.s_nationkey") === col("n.n_nationkey"), "inner")
      .groupBy(col("n.n_name").as("nation"))
      .agg(
        roundN(sum(col("li.l_extendedprice") * (lit(1) - col("li.l_discount"))), 2)
          .as("revenue"),
        countDistinct(col("s.s_suppkey")).as("n_suppliers"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_kpi_order_approx", kpiOrderApprox, None),
    Q("q_join_supplier_nation", supplierRevenue, Some(
      s"""SELECT n_name AS nation,
         |  ${roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue,
         |  count(DISTINCT s_suppkey) AS n_suppliers
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1""".stripMargin)),
    Q("q_join_snowflake", snowflakeRevenue, Some(
      s"""SELECT r_name AS region, c_mktsegment AS segment,
         |  ${roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue,
         |  count(DISTINCT o_custkey) AS n_customers, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2""".stripMargin), bench = true),
    Q("q_withcolumn_todate", toDateDistinct, Some(
      "SELECT DISTINCT CAST(l_shipdate AS DATE) AS ship_date FROM lineitem")),
    Q("q_join_inner_items_orders", joinItemsOrders, Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_custkey, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin)),
    Q("q_join_inner_star", joinStar, Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_custkey, p_brand
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey""".stripMargin)),
    Q("q_join_inner_orders_items", joinOrdersItems, Some(
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, l_linenumber, l_quantity
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin)),
    Q("q_kpi_category", kpiCategory, Some(
      s"""SELECT p_brand AS category, CAST(l_shipdate AS DATE) AS order_date,
        |  ${roundNSql("sum(l_extendedprice)", 2)} AS daily_revenue,
        |  ${roundNSql("avg(l_extendedprice)", 2)} AS avg_order_value,
        |  ${roundNSql("count(CASE WHEN l_returnflag = 'R' THEN 1 END) / count(*) * 100", 2)} AS avg_return_rate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2""".stripMargin), bench = true),
    Q("q_kpi_order", kpiOrder, Some(
      s"""SELECT CAST(o_orderdate AS DATE) AS order_date,
        |  count(DISTINCT o_orderkey) AS total_orders,
        |  ${roundNSql("sum(l_extendedprice)", 2)} AS total_revenue,
        |  sum(l_quantity) AS total_items_sold,
        |  ${roundNSql("count(CASE WHEN o_orderstatus = 'F' THEN 1 END) / count(DISTINCT o_orderkey) * 100", 2)} AS return_rate,
        |  count(DISTINCT o_custkey) AS unique_customers
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin), bench = true),
  )
}
