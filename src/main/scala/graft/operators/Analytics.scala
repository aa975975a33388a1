package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic operator classes beyond the reference's surface: window
  * aggregates, rollup subtotals, pivot, set operations, JSON extraction —
  * the rest of the relational toolbox a warehouse user expects, each with a
  * DuckDB oracle.
  *
  * Scale notes: the running-total window partitions by brand (parallel
  * across brands, sequential scan within — the unavoidable shape of a
  * cumulative metric); rollup computes all grouping sets in one Expand pass
  * (one shuffle, not one per level); pivot with EXPLICIT values compiles to
  * conditional aggregates (one pass — never use inferred pivot values at
  * scale, that's an extra distinct job); set ops hash on the full row.
  * Integer-valued measures are summed as BIGINT so partial-aggregation
  * order can't perturb results (same trick as q_summary_stats).
  */
object Analytics {

  /** Cumulative daily revenue per brand (window agg over an aggregate). */
  def runningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .withColumn("ship_date", to_date(col("l_shipdate")))
      .groupBy(col("p_brand").as("brand"), col("ship_date"))
      .agg(roundN(sum(col("l_extendedprice")), 2).as("daily_revenue"))
    val w = Window.partitionBy(col("brand")).orderBy(col("ship_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_revenue", roundN(sum(col("daily_revenue")).over(w), 2))
  }

  private val runningRevenueSql =
    s"""WITH d AS (
       |  SELECT p_brand AS brand, CAST(l_shipdate AS DATE) AS ship_date,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS daily_revenue
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2)
       |SELECT brand, ship_date, daily_revenue,
       |  ${roundNSql(
        "sum(daily_revenue) OVER (PARTITION BY brand ORDER BY ship_date ROWS UNBOUNDED PRECEDING)", 2)}
       |    AS cum_revenue
       |FROM d""".stripMargin

  /** Day-over-day revenue delta per brand (lag/lead over the daily
    * aggregate — the trend-analysis window shape; same partition-parallel
    * scale profile as the running total). */
  def revenueDelta(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .withColumn("ship_date", to_date(col("l_shipdate")))
      .groupBy(col("p_brand").as("brand"), col("ship_date"))
      .agg(roundN(sum(col("l_extendedprice")), 2).as("daily_revenue"))
    val w = Window.partitionBy(col("brand")).orderBy(col("ship_date"))
    daily.select(col("brand"), col("ship_date"), col("daily_revenue"),
      roundN(col("daily_revenue")
        - coalesce(lag(col("daily_revenue"), 1).over(w), lit(0.0)), 2).as("delta_prev"),
      lead(col("ship_date"), 1).over(w).as("next_active_date"))
  }

  private val revenueDeltaSql =
    s"""WITH d AS (
       |  SELECT p_brand AS brand, CAST(l_shipdate AS DATE) AS ship_date,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS daily_revenue
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2)
       |SELECT brand, ship_date, daily_revenue,
       |  ${roundNSql(
          "daily_revenue - coalesce(lag(daily_revenue, 1) OVER (PARTITION BY brand ORDER BY ship_date), 0.0)", 2)} AS delta_prev,
       |  lead(ship_date, 1) OVER (PARTITION BY brand ORDER BY ship_date) AS next_active_date
       |FROM d""".stripMargin

  /** Explicit GROUPING SETS — (brand), (returnflag), () in ONE Expand pass
    * (cube/rollup's general form; never union separate aggregations). */
  def groupingSetsQty(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"), col("l_returnflag").as("returnflag"),
        col("l_quantity").cast("long").as("q"))
      .groupingSets(Seq(Seq(col("brand")), Seq(col("returnflag")), Seq()),
        col("brand"), col("returnflag"))
      .agg(sum(col("q")).as("sum_qty"),
        grouping(col("brand")).cast("int").as("g_brand"),
        grouping(col("returnflag")).cast("int").as("g_flag"))

  private val groupingSetsQtySql =
    """SELECT p_brand AS brand, l_returnflag AS returnflag,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(GROUPING(p_brand) AS INT) AS g_brand,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY GROUPING SETS ((p_brand), (l_returnflag), ())""".stripMargin

  /** Rollup subtotals over (brand, returnflag) with exact integer sums. */
  def rollupQty(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"), col("l_returnflag").as("returnflag"),
        col("l_quantity").cast("long").as("q"))
      .rollup(col("brand"), col("returnflag"))
      .agg(sum(col("q")).as("sum_qty"), count(lit(1)).as("n_rows"))

  private val rollupQtySql =
    """SELECT p_brand AS brand, l_returnflag AS returnflag,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  count(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY ROLLUP (p_brand, l_returnflag)""".stripMargin

  /** Pivot returnflag × linestatus (explicit pivot values → single pass). */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("q")))

  private val pivotStatusSql =
    """SELECT l_returnflag AS returnflag,
      |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS F,
      |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS O
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Set intersection: customers with both fulfilled and open orders. */
  def customersBoth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
  }

  /** Set difference: customers with fulfilled but no open orders. */
  def customersOnlyF(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
  }

  /** MULTISET set ops — `exceptAll`/`intersectAll` keep duplicate
    * multiplicity (the bag semantics a dedup ledger needs: "how many
    * F-status order rows per customer are NOT matched one-for-one by an
    * O-status row"). Spark plans both as a count-and-replicate
    * aggregate+generate — no sort, scale-safe; oracle is ANSI
    * EXCEPT ALL / INTERSECT ALL. Aggregated to (custkey, n) so the
    * comparison is order-free. */
  def customersOnlyFAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .exceptAll(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
  }

  def customersBothAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersectAll(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
  }

  /** JSON extraction from the events `props` column (semi-structured path:
    * get_json_object in the engine; the oracle reaches the same value
    * through a regex so it doesn't depend on DuckDB's json extension). */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
        count(when(col("k").isNull, 1)).as("n_missing"))

  private val eventsJsonSql =
    """SELECT event_type,
      |  CAST(sum(TRY_CAST(regexp_extract(props, '"k": *(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(TRY_CAST(regexp_extract(props, '"k": *(-?\d+)', 1) AS BIGINT)) AS max_k,
      |  count(CASE WHEN TRY_CAST(regexp_extract(props, '"k": *(-?\d+)', 1) AS BIGINT) IS NULL THEN 1 END) AS n_missing
      |FROM events GROUP BY 1""".stripMargin

  /** The same extraction through Spark 4's VARIANT type — the
    * open-schema semi-structured path (`parse_json` → binary variant →
    * typed `try_variant_get`), successor to string get_json_object: parse
    * once, extract many times, no per-access re-parse. Oracle unchanged
    * (regex over the raw string), so the check proves VARIANT decode
    * equals the string path. `try_` matches the oracle's
    * TRY_CAST-null-on-failure semantics: a non-numeric `k` counts as
    * missing instead of throwing mid-query. */
  def eventsVariant(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        try_variant_get(col("v"), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
        count(when(col("k").isNull, 1)).as("n_missing"))

  /** Cube over (returnflag, linestatus) with grouping indicators — all four
    * grouping sets in one Expand pass; `grouping()` disambiguates real
    * NULLs from subtotal rows. */
  def cubeQty(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("returnflag"),
        col("l_linestatus").as("linestatus"),
        col("l_quantity").cast("long").as("q"))
      .cube(col("returnflag"), col("linestatus"))
      .agg(sum(col("q")).as("sum_qty"),
        grouping(col("returnflag")).cast("int").as("g_flag"),
        grouping(col("linestatus")).cast("int").as("g_status"))

  private val cubeQtySql =
    """SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** Top-3 parts by revenue within each brand — the canonical top-k-per-
    * group. Aggregate first (one hash shuffle), then rank: row_number over
    * (brand) runs under WindowGroupLimit, so each partition keeps only k
    * rows per brand before the final exchange — never a global sort of the
    * full aggregate. Revenue rounds via roundN before it becomes a sort
    * key; ties break on partkey so both engines rank identically. */
  def topPartsPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("p_partkey"))
      .agg(roundN(sum(col("l_extendedprice")), 2).as("revenue"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  private val topPartsPerBrandSql =
    s"""WITH a AS (
       |  SELECT p_brand AS brand, p_partkey,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS revenue
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2)
       |SELECT brand, p_partkey, revenue,
       |  CAST(row_number() OVER (PARTITION BY brand ORDER BY revenue DESC, p_partkey) AS INT) AS rank
       |FROM a QUALIFY rank <= 3""".stripMargin

  /** Unpivot (melt) the lineitem measures to long form — the inverse of
    * pivot, the other half of the reshape toolbox. Spark's `unpivot`
    * compiles to an Expand (each row emitted once per measure, no shuffle
    * at all); the oracle reaches the same relation through UNION ALL. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "v")

  private val unpivotSql =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(m =>
      s"SELECT l_orderkey, l_linenumber, '$m' AS measure, $m AS v FROM lineitem")
      .mkString("\nUNION ALL ")

  /** Quartile assignment per brand by part revenue (ntile window): the
    * bucketing form of top-k-per-group — same WindowGroupLimit-free ranked
    * pass over the pre-aggregated (brand, part) relation, with ntile's
    * earlier-buckets-get-extras semantics identical in both engines under
    * a total order (revenue desc, partkey). */
  def revenueQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("p_partkey"))
      .agg(roundN(sum(col("l_extendedprice")), 2).as("revenue"))
      .withColumn("quartile", ntile(4).over(w))
  }

  private val revenueQuartilesSql =
    s"""WITH a AS (
       |  SELECT p_brand AS brand, p_partkey,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS revenue
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2)
       |SELECT brand, p_partkey, revenue,
       |  CAST(ntile(4) OVER (PARTITION BY brand ORDER BY revenue DESC, p_partkey) AS INT) AS quartile
       |FROM a""".stripMargin

  /** Rank-statistic window completeness: rank / dense_rank /
    * percent_rank / cume_dist over the same aggregate-first per-part
    * revenue base as the quartile query. The (revenue DESC, p_partkey)
    * order makes every rank unique, so the two ratio statistics are
    * exact-integer divisions — identical doubles in both engines with no
    * rounding step. Window is brand-partitioned over the part-level
    * aggregate (dimension-bounded), never the raw fact table. */
  def rankStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("p_partkey"))
      .agg(roundN(sum(col("l_extendedprice")), 2).as("revenue"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
  }

  private val rankStatsSql =
    s"""WITH a AS (
       |  SELECT p_brand AS brand, p_partkey,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS revenue
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2)
       |SELECT brand, p_partkey, revenue,
       |  CAST(rank() OVER w AS INT) AS rnk,
       |  CAST(dense_rank() OVER w AS INT) AS drnk,
       |  percent_rank() OVER w AS pr,
       |  cume_dist() OVER w AS cd
       |FROM a
       |WINDOW w AS (PARTITION BY brand ORDER BY revenue DESC, p_partkey)""".stripMargin

  /** Time-series gap filling: daily revenue re-sampled onto a complete
    * date spine (no missing days). The spine is sequence()-generated from
    * the observed min/max — metadata-sized, broadcast — and left-joins the
    * daily aggregate; absent days surface as zero with is_active=false.
    * The standard resample step before any windowed trend computation. */
  def dailyRevenueFilled(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .withColumn("d", to_date(col("l_shipdate")))
      .groupBy(col("d")).agg(roundN(sum(col("l_extendedprice")), 2).as("revenue"))
    val spine = Tables.lineitem(spark, dir)
      .agg(min(to_date(col("l_shipdate"))).as("lo"), max(to_date(col("l_shipdate"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    spine.join(daily, col("day") === col("d"), "left_outer")
      .select(col("day"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        col("d").isNotNull.as("is_active"))
  }

  private val dailyRevenueFilledSql =
    s"""WITH daily AS (
       |  SELECT CAST(l_shipdate AS DATE) AS d,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS revenue
       |  FROM lineitem GROUP BY 1),
       |mm AS (SELECT min(CAST(l_shipdate AS DATE)) AS lo,
       |              max(CAST(l_shipdate AS DATE)) AS hi FROM lineitem),
       |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM mm)
       |SELECT s.day, coalesce(d.revenue, 0.0) AS revenue,
       |  d.d IS NOT NULL AS is_active
       |FROM spine s LEFT JOIN daily d ON s.day = d.d""".stripMargin

  /** 7-day moving average of daily revenue per brand (RANGE frame over
    * integer days — event-time-correct across gaps, unlike a ROWS frame
    * which would span 7 ROWS regardless of missing days) plus percent_rank
    * of each day within its brand. Frame evaluation is partition-parallel
    * over brands; the aggregate input is group-cardinality-sized. */
  def movingAvgRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .withColumn("d", datediff(to_date(col("l_shipdate")), lit("1995-01-01").cast("date")))
      .groupBy(col("p_brand").as("brand"), col("d"))
      .agg(roundN(sum(col("l_extendedprice")), 2).as("daily_revenue"))
    val wAvg = Window.partitionBy(col("brand")).orderBy(col("d"))
      .rangeBetween(-6, Window.currentRow)
    val wRank = Window.partitionBy(col("brand")).orderBy(col("daily_revenue"), col("d"))
    daily.select(col("brand"), col("d").as("day_idx"), col("daily_revenue"),
      roundN(avg(col("daily_revenue")).over(wAvg), 4).as("ma7"),
      roundN(percent_rank().over(wRank), 6).as("pct_rank"))
  }

  private val movingAvgRevenueSql =
    s"""WITH daily AS (
       |  SELECT p_brand AS brand,
       |    date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS d,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS daily_revenue
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2)
       |SELECT brand, d AS day_idx, daily_revenue,
       |  ${roundNSql(
          "avg(daily_revenue) OVER (PARTITION BY brand ORDER BY d RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)", 4)} AS ma7,
       |  ${roundNSql(
          "percent_rank() OVER (PARTITION BY brand ORDER BY daily_revenue, d)", 6)} AS pct_rank
       |FROM daily""".stripMargin

  /** Incremental materialized-view maintenance: the view (orders count +
    * revenue by priority) updates by MERGING the delta batch's partial
    * aggregate into the stored state — never rescanning the base. Works
    * because count/sum are commutative monoids: re-aggregating the two
    * partial states is exactly the full aggregate (what streaming
    * foreachBatch upserts exploit; here the batch algebra is registered
    * and oracle-checked against the full recompute — the equality IS the
    * correctness of incremental maintenance). Money rides as exact cents
    * so the merged sum is bit-equal to the scratch sum. */
  def mvIncremental(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01")
    def partial(df: DataFrame): DataFrame = df
      .select(col("o_orderpriority").as("priority"),
        roundN(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val orders = Tables.orders(spark, dir)
    val baseState = partial(orders.filter(to_date(col("o_orderdate")) < cut))
    val deltaState = partial(orders.filter(to_date(col("o_orderdate")) >= cut))
    baseState.unionByName(deltaState)
      .groupBy(col("priority"))
      .agg(sum(col("n")).as("n_orders"),
        (sum(col("sum_cents")).cast("double") / 100.0).as("total_price"))
      .orderBy(col("priority"))
  }

  /** Oracle: the full recompute — incremental maintenance is correct iff
    * it equals this. */
  private val mvIncrementalSql =
    s"""SELECT o_orderpriority AS priority, count(*) AS n_orders,
       |  CAST(sum(CAST(${roundNSql("o_totalprice * 100", 0)} AS BIGINT)) AS DOUBLE) / 100.0
       |    AS total_price
       |FROM orders
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** Market-basket affinity — support/confidence-free LIFT over order
    * baskets: lift(a,b) = P(a,b)/(P(a)·P(b)) = n_pair·n_orders/(n_a·n_b),
    * computed entirely from exact integer counts (one double division at
    * the end — identical both engines). Pair generation is the per-order
    * self-join (bounded by basket size, never a global cross product —
    * the co-purchase-graph shape); item and order totals broadcast back.
    * MinSupport keeps the output to statistically meaningful pairs. */
  val MinSupport = 3L

  def basketAffinity(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    val nOrders = items.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCounts = items.groupBy(col("part")).agg(count(lit(1)).as("n_item"))
    val pairs = items.alias("a")
      .join(items.alias("b"),
        col("a.okey") === col("b.okey") && col("a.part") < col("b.part"))
      .groupBy(col("a.part").as("part_a"), col("b.part").as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= MinSupport)
    pairs
      .join(itemCounts.select(col("part").as("part_a"), col("n_item").as("n_a")), "part_a")
      .join(itemCounts.select(col("part").as("part_b"), col("n_item").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_pair"),
        roundN(col("n_pair").cast("double") * col("n_orders") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("part_a"), col("part_b"))
  }

  /** Skew-guarded basket lift (round-3 verdict ask #6): per-basket pair
    * fan-out is O(|basket|²), so one pathological mega-basket (a crawler
    * account, a bulk order) turns into a single task computing billions of
    * pairs. The guard: only the BasketCap deterministically-ranked items
    * of each basket (md5-hash order — reshard-stable, no RNG) enter pair
    * generation, bounding every basket's contribution to C(BasketCap, 2)
    * pairs. Item/order totals stay UNCAPPED (they are linear aggregates
    * with no skew exposure), so only n_pair is approximated — the
    * standard reservoir-style bound. BasketCap = 8 bites on this fixture
    * (baskets reach 13 distinct parts), so the oracle actually checks the
    * truncation; production would tune it to the p99.9 basket. */
  val BasketCap = 8

  def basketAffinityCapped(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val itemsAll = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    val w = Window.partitionBy(col("okey"))
      .orderBy(md5(col("part").cast("string")), col("part"))
    val items = itemsAll
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= BasketCap).drop("rn")
    val nOrders = itemsAll.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCounts = itemsAll.groupBy(col("part")).agg(count(lit(1)).as("n_item"))
    val pairs = items.alias("a")
      .join(items.alias("b"),
        col("a.okey") === col("b.okey") && col("a.part") < col("b.part"))
      .groupBy(col("a.part").as("part_a"), col("b.part").as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= MinSupport)
    pairs
      .join(itemCounts.select(col("part").as("part_a"), col("n_item").as("n_a")), "part_a")
      .join(itemCounts.select(col("part").as("part_b"), col("n_item").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_pair"),
        roundN(col("n_pair").cast("double") * col("n_orders") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("part_a"), col("part_b"))
  }

  private val basketAffinityCappedSql =
    s"""WITH items0 AS (
       |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
       |items AS (
       |  SELECT okey, part FROM (
       |    SELECT okey, part, row_number() OVER (PARTITION BY okey
       |      ORDER BY md5(CAST(part AS VARCHAR)), part) AS rn
       |    FROM items0)
       |  WHERE rn <= $BasketCap),
       |n AS (SELECT count(DISTINCT okey) AS n_orders FROM items0),
       |ic AS (SELECT part, count(*) AS n_item FROM items0 GROUP BY 1),
       |p AS (
       |  SELECT a.part AS part_a, b.part AS part_b, count(*) AS n_pair
       |  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $MinSupport)
       |SELECT part_a, part_b, n_pair,
       |  ${roundNSql("CAST(n_pair AS DOUBLE) * n.n_orders / (ia.n_item * ib.n_item)", 6)} AS lift
       |FROM p
       |JOIN ic ia ON ia.part = p.part_a
       |JOIN ic ib ON ib.part = p.part_b
       |CROSS JOIN n
       |ORDER BY 1, 2""".stripMargin

  private val basketAffinitySql =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
       |n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
       |ic AS (SELECT part, count(*) AS n_item FROM items GROUP BY 1),
       |p AS (
       |  SELECT a.part AS part_a, b.part AS part_b, count(*) AS n_pair
       |  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $MinSupport)
       |SELECT part_a, part_b, n_pair,
       |  ${roundNSql("CAST(n_pair AS DOUBLE) * n.n_orders / (ia.n_item * ib.n_item)", 6)} AS lift
       |FROM p
       |JOIN ic ia ON ia.part = p.part_a
       |JOIN ic ib ON ib.part = p.part_b
       |CROSS JOIN n
       |ORDER BY 1, 2""".stripMargin

  /** Frequent triple itemsets — the Apriori L2→L3 step on top of the
    * basket-affinity pairs: candidate triples are generated ONLY from
    * frequent pairs (join on the shared first item, third sub-pair checked
    * by a semi-join), then support is counted by re-enumerating triples
    * exclusively over items that appear in some candidate — so the
    * triple fan-out is bounded by the candidate surface, never by raw
    * basket size cubed. This is the standard distributed Apriori shape:
    * every downward-closure prune is a (broadcastable) semi-join.
    *
    * Output: (p1 < p2 < p3, n_orders) for triples at or above the pair
    * MinSupport. */
  /** Triple support floor — 2, and the PAIR prefilter must use the SAME
    * floor (Apriori downward closure: a support-2 triple only guarantees
    * support-2 sub-pairs; pruning pairs at 3 would silently lose it). */
  val TripleSupport = 2

  def basketTriples(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
      .persist() // read by the pair join (twice) and the support count
    // persisted: `cand` references fp THREE times — without it Spark
    // re-runs the whole pair aggregation per reference (the exact analog
    // of the DuckDB MATERIALIZED lesson below; measured 3.1 s → ~1 s)
    val fp = items.alias("a")
      .join(items.alias("b"),
        col("a.okey") === col("b.okey") && col("a.part") < col("b.part"))
      .groupBy(col("a.part").as("pa"), col("b.part").as("pb"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= TripleSupport)
      .select(col("pa"), col("pb"))
      .persist()
    // candidates: (p1,p2) ⋈ (p1,p3), p2 < p3, with (p2,p3) also frequent
    val cand = fp.select(col("pa").as("p1"), col("pb").as("p2"))
      .join(fp.select(col("pa").as("p1"), col("pb").as("p3")), "p1")
      .filter(col("p2") < col("p3"))
      .join(fp.select(col("pa").as("p2"), col("pb").as("p3")), Seq("p2", "p3"), "left_semi")
      .select(col("p1"), col("p2"), col("p3"))
    val candParts = cand.select(col("p1").as("part"))
      .unionByName(cand.select(col("p2").as("part")))
      .unionByName(cand.select(col("p3").as("part")))
      .distinct()
    val fitems = items.join(broadcast(candParts), Seq("part"), "left_semi")
    val triples = fitems.alias("x")
      .join(fitems.alias("y"),
        col("x.okey") === col("y.okey") && col("x.part") < col("y.part"))
      .join(fitems.alias("z"),
        col("y.okey") === col("z.okey") && col("y.part") < col("z.part"))
      .select(col("x.part").as("p1"), col("y.part").as("p2"), col("z.part").as("p3"))
      .join(broadcast(cand), Seq("p1", "p2", "p3"), "left_semi")
      .groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= TripleSupport)
    triples.orderBy(col("p1"), col("p2"), col("p3"))
  }

  /** MATERIALIZED CTE hints matter here: DuckDB otherwise inlines `fp`
    * into each of `cand`'s three references and recomputes the whole pair
    * join per reference — measured 12.7 s → 0.6 s at sf0.01. */
  private val basketTriplesSql =
    s"""WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
       |fp AS MATERIALIZED (SELECT a.part AS pa, b.part AS pb
       |       FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
       |       GROUP BY 1, 2 HAVING count(*) >= $TripleSupport),
       |cand AS MATERIALIZED (SELECT x.p1, x.p2, y.p3
       |         FROM (SELECT pa AS p1, pb AS p2 FROM fp) x
       |         JOIN (SELECT pa AS p1, pb AS p3 FROM fp) y USING (p1)
       |         JOIN (SELECT pa AS p2, pb AS p3 FROM fp) z USING (p2, p3)
       |         WHERE x.p2 < y.p3),
       |cp AS (SELECT p1 AS part FROM cand UNION
       |       SELECT p2 FROM cand UNION SELECT p3 FROM cand),
       |fi AS MATERIALIZED (SELECT i.* FROM items i JOIN cp USING (part)),
       |t AS (SELECT x.part AS p1, y.part AS p2, z.part AS p3
       |      FROM fi x JOIN fi y ON x.okey = y.okey AND x.part < y.part
       |                JOIN fi z ON y.okey = z.okey AND y.part < z.part
       |      JOIN cand c ON c.p1 = x.part AND c.p2 = y.part AND c.p3 = z.part)
       |SELECT p1, p2, p3, count(*) AS n_orders
       |FROM t GROUP BY 1, 2, 3 HAVING count(*) >= $TripleSupport
       |ORDER BY 1, 2, 3""".stripMargin

  /** Incremental JOIN-view maintenance — the delta rule for V = O ⋈ L:
    * with base/delta partitions O = Oᵦ ∪ ΔO and L = Lᵦ ∪ ΔL,
    *   V_new = (Oᵦ⋈Lᵦ) ∪ (ΔO⋈Lᵦ) ∪ (Oᵦ⋈ΔL) ∪ (ΔO⋈ΔL)
    * and correctness is V_new ≡ the full recompute (the oracle). The
    * aggregate-monoid half of view maintenance is `q_mv_incremental`;
    * this is the join half a warehouse needs when the view materializes
    * a denormalization, not a rollup.
    *
    * Deltas are the engine's standard md5-byte gate (~10% of rows) on
    * each side's own key, so every branch of the rule is non-empty and
    * the ΔO⋈ΔL corner (both sides new) is actually exercised.
    *
    * Scale shape: the standing view (Oᵦ⋈Lᵦ) is computed once here to
    * seed the fixture — production READS it; per-refresh work is the
    * three delta terms, each with the small delta side explicitly
    * `broadcast` — cost ∝ |Δ| · match rate, independent of the base
    * view's size. No shuffle touches the base fact except the one
    * already needed to build it. */
  def mvJoinIncremental(spark: SparkSession, dir: String): DataFrame = {
    def isDelta(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(k.cast("string")), 1, 2), 16, 10).cast("int") < 26
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val lKey = concat_ws(":", col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string"))
    val (oB, oD) = (o.filter(!isDelta(col("o_orderkey"))),
      o.filter(isDelta(col("o_orderkey"))))
    val (lB, lD) = (l.filter(!isDelta(lKey)), l.filter(isDelta(lKey)))
    val on = col("o_orderkey") === col("l_orderkey")
    val base = oB.join(lB, on) // the standing view (seeded once)
    val refresh = broadcast(oD).join(lB, on)
      .unionByName(oB.join(broadcast(lD), on))
      .unionByName(broadcast(oD).join(broadcast(lD), on))
    base.unionByName(refresh)
      .select(col("o_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("l_extendedprice"))
  }

  private val mvJoinIncrementalSql =
    """SELECT o_orderkey, l_linenumber, o_custkey, l_extendedprice
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_mv_join_incremental", mvJoinIncremental, Some(mvJoinIncrementalSql)),
    Q("q_basket_triples", basketTriples, Some(basketTriplesSql)),
    Q("q_basket_affinity", basketAffinity, Some(basketAffinitySql)),
    Q("q_basket_affinity_capped", basketAffinityCapped, Some(basketAffinityCappedSql)),
    Q("q_mv_incremental", mvIncremental, Some(mvIncrementalSql)),
    Q("q_window_moving_avg", movingAvgRevenue, Some(movingAvgRevenueSql)),
    Q("q_unpivot", unpivotMeasures, Some(unpivotSql)),
    Q("q_window_ntile", revenueQuartiles, Some(revenueQuartilesSql)),
    Q("q_window_rankstats", rankStats, Some(rankStatsSql)),
    Q("q_timeseries_fill", dailyRevenueFilled, Some(dailyRevenueFilledSql)),
    Q("q_topk_per_group", topPartsPerBrand, Some(topPartsPerBrandSql)),
    Q("q_cube", cubeQty, Some(cubeQtySql)),
    Q("q_grouping_sets", groupingSetsQty, Some(groupingSetsQtySql)),
    Q("q_window_running", runningRevenue, Some(runningRevenueSql)),
    Q("q_window_lag", revenueDelta, Some(revenueDeltaSql)),
    Q("q_rollup", rollupQty, Some(rollupQtySql)),
    Q("q_pivot", pivotStatus, Some(pivotStatusSql)),
    Q("q_set_intersect", customersBoth, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin)),
    Q("q_set_except", customersOnlyF, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin)),
    Q("q_set_except_all", customersOnlyFAll, Some(
      """SELECT o_custkey, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY 1""".stripMargin)),
    Q("q_set_intersect_all", customersBothAll, Some(
      """SELECT o_custkey, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY 1""".stripMargin)),
    Q("q_events_json", eventsJson, Some(eventsJsonSql)),
    Q("q_events_variant", eventsVariant, Some(eventsJsonSql)),
  )
}
