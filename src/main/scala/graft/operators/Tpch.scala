package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic warehouse benchmark shapes (TPC-H Q1/Q3/Q5/Q6 analogues) over the
  * harness star schema — the completeness proof that the engine handles the
  * canonical decision-support patterns a reference user would eventually
  * write, beyond the reference's own two KPIs (transform.py:94-147).
  *
  * Scale notes (100 TB):
  *  - Q1 (pricing summary) is the pure scan→partial-agg shape: the date
  *    filter pushes to the parquet scan (row-group stats skip), grouping
  *    cardinality is tiny (flag × status), so the plan is one map-side
  *    combine + a 6-row final agg — no data-volume shuffle at any SF.
  *  - Q3 (shipping priority) filters BOTH fact sides before the join, keeps
  *    the customer dimension broadcast, and takes top-k through a
  *    rank-pushdown sort (WindowGroupLimit/TakeOrderedAndProject) — never a
  *    global sort of the full aggregate.
  *  - Q5 (local supplier volume) is the join-order stress: the
  *    customer-nation = supplier-nation equality is a SECOND join predicate
  *    on the fact row, not a dimension lookup, and all dimensions stay
  *    broadcast so the only shuffle is lineitem⋈orders.
  *  - Q6 (forecast revenue delta) is the pushdown showcase: every predicate
  *    (date range, discount band, quantity cap) reaches PushedFilters, and
  *    the aggregate is a single double sum — the whole query is one
  *    codegen'd scan stage.
  *
  * Integer-valued measures sum as BIGINT (partial-agg order can't perturb
  * them); money sums round through roundN so Spark and DuckDB do identical
  * IEEE-754 ops (functions/Rounding.scala).
  */
object Tpch {

  /** Q1 analogue: pricing summary report at a ship-date cutoff. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) <= lit("2000-12-01"))
      .select(
        col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"),
        col("l_quantity").cast("long").as("q"), col("l_extendedprice").as("price"),
        col("l_discount").as("disc"), col("l_tax").as("tax"))
      .groupBy(col("returnflag"), col("linestatus"))
      .agg(
        sum(col("q")).as("sum_qty"),
        roundN(sum(col("price")), 2).as("sum_base_price"),
        roundN(sum(col("price") * (lit(1) - col("disc"))), 2).as("sum_disc_price"),
        roundN(sum(col("price") * (lit(1) - col("disc")) * (lit(1) + col("tax"))), 2)
          .as("sum_charge"),
        roundN(avg(col("q")), 2).as("avg_qty"),
        roundN(avg(col("price")), 2).as("avg_price"),
        roundN(avg(col("disc")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("returnflag"), col("linestatus"))

  private val pricingSummarySql =
    s"""SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       |  ${roundNSql("sum(l_extendedprice)", 2)} AS sum_base_price,
       |  ${roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS sum_disc_price,
       |  ${roundNSql("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 2)} AS sum_charge,
       |  ${roundNSql("avg(CAST(l_quantity AS BIGINT))", 2)} AS avg_qty,
       |  ${roundNSql("avg(l_extendedprice)", 2)} AS avg_price,
       |  ${roundNSql("avg(l_discount)", 4)} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
       |GROUP BY 1, 2""".stripMargin

  /** Q3 analogue: top-10 open-revenue orders for one market segment.
    * Both fact filters run BEFORE the join; l_orderkey breaks revenue ties
    * so the limit is deterministic on both engines. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) > lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(o, col("l_orderkey") === col("o_orderkey"), "inner")
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("l_orderkey").as("orderkey"),
        to_date(col("o_orderdate")).as("orderdate"),
        col("o_orderpriority").as("priority"))
      .agg(roundN(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("orderkey"))
      .limit(10)
  }

  private val shippingPrioritySql =
    s"""SELECT l_orderkey AS orderkey, CAST(o_orderdate AS DATE) AS orderdate,
       |  o_orderpriority AS priority,
       |  ${roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
       |  AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, orderkey
       |LIMIT 10""".stripMargin

  /** Q5 analogue: revenue by nation where the supplying and buying nations
    * coincide, restricted to one region and a date window. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).alias("li")
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
        to_date(col("o_orderdate")) < lit("1998-01-01")).alias("o")
    val c = Tables.customer(spark, dir).alias("c")
    val s = Tables.supplier(spark, dir).alias("s")
    val n = Tables.nation(spark, dir).alias("n")
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA").alias("r")
    li.join(o, col("li.l_orderkey") === col("o.o_orderkey"), "inner")
      .join(broadcast(c), col("o.o_custkey") === col("c.c_custkey"), "inner")
      .join(broadcast(s), col("li.l_suppkey") === col("s.s_suppkey") &&
        col("c.c_nationkey") === col("s.s_nationkey"), "inner")
      .join(broadcast(n), col("s.s_nationkey") === col("n.n_nationkey"), "inner")
      .join(broadcast(r), col("n.n_regionkey") === col("r.r_regionkey"), "inner")
      .groupBy(col("n.n_name").as("nation"))
      .agg(roundN(sum(col("li.l_extendedprice") * (lit(1) - col("li.l_discount"))), 2)
        .as("revenue"))

  }

  private val localSupplierVolumeSql =
    s"""SELECT n_name AS nation,
       |  ${roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
       |GROUP BY 1""".stripMargin

  /** Q6 analogue: forecast revenue change — single-table scan with every
    * predicate pushed, one global sum. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) >= lit("1997-01-01") &&
        to_date(col("l_shipdate")) < lit("1998-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(roundN(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  private val forecastRevenueSql =
    s"""SELECT ${roundNSql("sum(l_extendedprice * l_discount)", 2)} AS revenue,
       |  count(*) AS n_rows
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07
       |  AND l_quantity < 24""".stripMargin

  /** Q14 analogue: promo revenue share — two-branch conditional aggregate
    * over the part⋈lineitem join, part broadcast. The ratio divides two
    * rounded sums (identical inputs → identical quotient both engines). */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) >= lit("1997-01-01") &&
        to_date(col("l_shipdate")) < lit("1997-07-01"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        roundN(sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0))), 2)
          .as("promo_revenue"),
        roundN(sum(rev), 2).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        roundN(lit(100.0) * col("promo_revenue") / col("total_revenue"), 4)
          .as("promo_pct"))
  }

  private val promoRevenueSql = {
    val promo = roundNSql(
      "sum(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)", 2)
    val total = roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)
    s"""SELECT $promo AS promo_revenue, $total AS total_revenue,
       |  ${roundNSql(s"100.0 * ($promo) / ($total)", 4)} AS promo_pct
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1997-07-01'""".stripMargin
  }

  /** Q18 analogue: large-volume orders — a HAVING over an integer fact
    * aggregate gates which orders re-join the header/customer side. The
    * quantity sums are BIGINT (order-insensitive), so the gate is exact;
    * the keeper set is order-count-sized and the second join broadcasts
    * at any SF where big orders are rare (AQE decides). */
  val BigOrderQty = 250L

  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > BigOrderQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey").as("orderkey"),
        to_date(col("o_orderdate")).as("orderdate"),
        col("o_totalprice").as("totalprice"), col("total_qty"))
  }

  private val bigOrdersSql =
    s"""WITH big AS (
       |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
       |  FROM lineitem GROUP BY 1
       |  HAVING sum(CAST(l_quantity AS BIGINT)) > $BigOrderQty)
       |SELECT c_name, o_orderkey AS orderkey, CAST(o_orderdate AS DATE) AS orderdate,
       |  o_totalprice AS totalprice, total_qty
       |FROM orders
       |JOIN big ON o_orderkey = big.l_orderkey
       |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** Q17 analogue: small-quantity revenue — the correlated-scalar-subquery
    * shape (each lineitem gated by 0.2× its PART's average quantity),
    * decorrelated the way Catalyst does it: per-part aggregate + equi-join
    * back to the fact. The threshold derives from exact integer sums
    * (sum(qty)/count as double — identical division both engines), so the
    * gate cannot drift. One fact shuffle on l_partkey; at scale AQE turns
    * the agg side into the broadcast build when it's small enough. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val avgQty = li.groupBy(col("l_partkey").as("p_key"))
      .agg((sum(col("l_quantity").cast("long")).cast("double") / count(lit(1)))
        .as("avg_qty"))
    li.join(avgQty, col("l_partkey") === col("p_key"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(roundN(sum(col("l_extendedprice")), 2).as("small_qty_revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val smallQtyRevenueSql =
    s"""WITH a AS (
       |  SELECT l_partkey AS p_key,
       |    CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty
       |  FROM lineitem GROUP BY 1)
       |SELECT ${roundNSql("sum(l_extendedprice)", 2)} AS small_qty_revenue,
       |  count(*) AS n_rows
       |FROM lineitem JOIN a ON l_partkey = a.p_key
       |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  /** Q4 analogue: order priority checking — the EXISTS/semi-join shape.
    * Each order counts once no matter how many of its lineitems shipped
    * late (> 7 days after the order date), which is exactly a LEFT SEMI
    * join: the fact side never fans out the header. At scale the orders
    * side shuffles once on o_orderkey and the semi probe short-circuits
    * on first match (no dedup pass, unlike an inner join + distinct). */
  def priorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) >= lit("1997-01-01") &&
        to_date(col("o_orderdate")) < lit("1998-01-01"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 7),
        "left_semi")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("priority"))
  }

  private val priorityCheckSql =
    """SELECT o_orderpriority AS priority, count(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 7)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Q13 analogue: customer order-count distribution. The ON-clause
    * predicate (`o_orderpriority <> '1-URGENT'`) belongs to the JOIN, not
    * a WHERE — moving it to WHERE would silently drop order-less customers,
    * the classic outer-join trap; this query pins the correct semantics.
    * count(o_orderkey) (not count(*)) keeps the no-match rows at 0.
    * Scale: one shuffle of each side on the customer key; the second agg
    * groups on the tiny order-count domain — map-side combinable. */
  def custDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"),
      col("o_orderpriority"))
    c.join(o,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val custDistributionSql =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY 1)
      |GROUP BY 1
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q19 analogue: disjunctive brand/size/quantity predicate — the
    * OR-of-conjunctions shape that stresses predicate normalization.
    * Catalyst extracts the common `l_partkey = p_partkey` equi-key (the
    * join stays hash-based, never nested-loop) and pushes the per-side
    * residuals (`p_size`, `l_quantity` bounds from OR-branch union) into
    * the scans. part stays broadcast; the OR evaluates post-join. */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"),
      col("p_size"))
    val branch1 = col("p_brand") === "Brand#13" &&
      col("p_size").between(1, 10) && col("l_quantity").between(1, 20)
    val branch2 = col("p_brand") === "Brand#20" &&
      col("p_size").between(5, 25) && col("l_quantity").between(10, 40)
    val branch3 = col("p_brand") === "Brand#9" &&
      col("p_size").between(10, 50) && col("l_quantity").between(20, 60)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(roundN(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val brandRevenueSql =
    s"""SELECT ${roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue,
       |  count(*) AS n_rows
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
       |       AND l_quantity BETWEEN 1 AND 20)
       |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 5 AND 25
       |       AND l_quantity BETWEEN 10 AND 40)
       |   OR (p_brand = 'Brand#9' AND p_size BETWEEN 10 AND 50
       |       AND l_quantity BETWEEN 20 AND 60)""".stripMargin

  /** Q10 analogue: returned-item reporting — which customers returned the
    * most revenue in a quarter. Fact filters (date via the header join,
    * returnflag on the scan) run before the aggregate; nation stays
    * broadcast; top-20 goes through TakeOrderedAndProject, never a global
    * sort. c_custkey breaks ties so the limit is deterministic. */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) >= lit("1997-01-01") &&
        to_date(col("o_orderdate")) < lit("1997-07-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("n_name").as("nation"), col("c_acctbal").as("acctbal"))
      .agg(roundN(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("custkey"))
      .limit(20)
  }

  private val returnedItemsSql =
    s"""SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
       |  c_acctbal AS acctbal,
       |  ${roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
       |  AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, custkey
       |LIMIT 20""".stripMargin

  /** Q15 analogue: top supplier — the scalar-MAX-subquery shape,
    * decorrelated the way Catalyst executes it: the per-supplier revenue
    * aggregate is computed once, its 1-row global max is cross-joined
    * (broadcast) back as a gate. Revenue is compared AFTER roundN on both
    * sides, so the equality gate is exact on both engines. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) >= lit("1997-01-01") &&
        to_date(col("l_shipdate")) < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(roundN(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_rev"))
    val best = rev.agg(max(col("total_rev")).as("max_rev"))
    Tables.supplier(spark, dir)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(best), col("total_rev") === col("max_rev"))
      .select(col("s_suppkey").as("suppkey"), col("s_name").as("name"),
        col("total_rev"))
      .orderBy(col("suppkey"))
  }

  private val topSupplierSql =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    ${roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS total_rev
       |  FROM lineitem
       |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
       |    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey AS suppkey, s_name AS name, total_rev
       |FROM supplier JOIN rev ON s_suppkey = l_suppkey
       |WHERE total_rev = (SELECT max(total_rev) FROM rev)
       |ORDER BY 1""".stripMargin

  /** Q22 analogue: high-balance customers who never placed an URGENT
    * order, grouped by nation. Two classic shapes in one: a global scalar
    * aggregate gate and a NOT EXISTS → left-anti join.
    *
    * The gate (`c_acctbal` above the average positive balance) is computed
    * in integer cents and compared cross-multiplied
    * (`cents * n > sum_cents`), so the threshold can never drift between
    * engines no matter the summation order — the repo-wide fixed-point
    * pattern (PLANS.md). At scale: the 1-row gate broadcasts; the anti
    * join shuffles only (custkey) pairs of the urgent subset. */
  def noUrgentHighBalance(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .withColumn("cents", roundN(col("c_acctbal") * 100, 0).cast("long"))
    val gate = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(broadcast(gate))
      .filter(col("cents") * col("n_pos") > col("sum_cents"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("numcust"),
        (sum(col("cents")).cast("double") / 100.0).as("totacctbal"))
      .orderBy(col("nationkey"))
  }

  private val noUrgentHighBalanceSql =
    s"""WITH c AS (
       |  SELECT *, CAST(${roundNSql("c_acctbal * 100", 0)} AS BIGINT) AS cents
       |  FROM customer),
       |gate AS (
       |  SELECT CAST(sum(cents) AS BIGINT) AS sum_cents, count(*) AS n_pos
       |  FROM c WHERE c_acctbal > 0.0)
       |SELECT c_nationkey AS nationkey, count(*) AS numcust,
       |  CAST(sum(cents) AS DOUBLE) / 100.0 AS totacctbal
       |FROM c, gate
       |WHERE cents * n_pos > sum_cents
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** Q7 analogue: volume shipping between two nations, by direction and
    * year. The nation filter applies to BOTH role-playing dimension copies
    * (supplier's nation and customer's nation join the same table under
    * different aliases) — the role-playing-dimension pattern. Both
    * dimension chains broadcast; the only volume shuffle is
    * lineitem⋈orders. The symmetric-pair predicate evaluates post-join on
    * two broadcast-joined columns. */
  def nationVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
        to_date(col("l_shipdate")) < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter(
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(roundN(sum(col("volume")), 2).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val nationVolumeSql =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  year(l_shipdate) AS l_year,
       |  ${roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
       |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  /** Q8 analogue: one supplying nation's market share inside a region's
    * purchases of one part type, by order year — the
    * conditional-numerator-over-total ratio computed in ONE aggregate pass
    * (no second scan, no self-join). Share divides two rounded sums, so
    * both engines divide identical doubles. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
        to_date(col("o_orderdate")) < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val p = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val nC = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val r = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
      .select(col("r_regionkey"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val nS = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nS), col("s_nationkey") === col("sn_key"))
      .groupBy(col("o_year"))
      .agg(
        roundN(sum(when(col("supp_nation") === "NATION_5", col("volume"))
          .otherwise(lit(0.0))), 2).as("nation_volume"),
        roundN(sum(col("volume")), 2).as("total_volume"))
      .select(col("o_year"), col("nation_volume"), col("total_volume"),
        roundN(col("nation_volume") / col("total_volume"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val marketShareSql = {
    val nv = roundNSql(
      "sum(CASE WHEN ns.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)", 2)
    val tv = roundNSql("sum(l_extendedprice * (1 - l_discount))", 2)
    s"""SELECT year(o_orderdate) AS o_year, $nv AS nation_volume,
       |  $tv AS total_volume, ${roundNSql(s"($nv) / ($tv)", 6)} AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation nc ON c_nationkey = nc.n_nationkey
       |JOIN region ON nc.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ns ON s_nationkey = ns.n_nationkey
       |WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
       |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_tpch_smallqty", smallQtyRevenue, Some(smallQtyRevenueSql)),
    Q("q_tpch_promo", promoRevenue, Some(promoRevenueSql)),
    Q("q_tpch_bigorders", bigOrders, Some(bigOrdersSql)),
    Q("q_tpch_pricing", pricingSummary, Some(pricingSummarySql), bench = true),
    Q("q_tpch_shipping", shippingPriority, Some(shippingPrioritySql)),
    Q("q_tpch_volume", localSupplierVolume, Some(localSupplierVolumeSql)),
    Q("q_tpch_forecast", forecastRevenue, Some(forecastRevenueSql)),
    Q("q_tpch_priority", priorityCheck, Some(priorityCheckSql)),
    Q("q_tpch_custdist", custDistribution, Some(custDistributionSql)),
    Q("q_tpch_brandrev", brandRevenue, Some(brandRevenueSql)),
    Q("q_tpch_returned", returnedItems, Some(returnedItemsSql)),
    Q("q_tpch_topsupplier", topSupplier, Some(topSupplierSql)),
    Q("q_tpch_nourgent", noUrgentHighBalance, Some(noUrgentHighBalanceSql)),
    Q("q_tpch_nationvolume", nationVolume, Some(nationVolumeSql)),
    Q("q_tpch_mktshare", marketShare, Some(marketShareSql)),
  )
}
