package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend fitting over a time series —
  * the "is revenue growing and how fast, per nation" report. The closed
  * form needs only the five sufficient statistics (n, Σx, Σy, Σxy, Σx²),
  * so the whole fit is ONE map-side-combinable aggregate per group over
  * the monthly rollup; no window, no sort, no iteration.
  *
  * Portability/scale contract:
  *  - y is exact integer cents (floor(price·(1−disc)·100 + 0.5)); x is an
  *    integer month index anchored at the corpus min month (1-row
  *    broadcast). All five statistics are integer sums — order-independent
  *    and bit-identical across engines; slope and intercept are then ONE
  *    float division each from exact integer numerators/denominators,
  *    quantized to 1e-4.
  *  - Overflow budget: Σxy ≤ x_max·Σy; with a 100-year series
  *    (x ≤ 1200) Σy per group may reach ~7.7e15 cents before n·Σxy
  *    approaches 2^63 — beyond any per-nation monthly revenue.
  *  - Degenerate groups (a single month: denominator 0) yield NULL
  *    slope/intercept in both engines rather than a division error.
  */
object Trend {

  /** Monthly revenue OLS trend per nation: slope (cents/month) and
    * intercept (cents at the anchor month) of the least-squares line. */
  /** (c_nationkey, x = month index from the corpus min month, y = exact
    * revenue cents) — the monthly base shared by the OLS and Theil-Sen
    * fits. */
  private def monthlyByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val cents =
      floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
        .cast("long")
    val f = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"),
        date_trunc("month", col("o_orderdate")).as("mon"), cents.as("cents"))
    val anchor = broadcast(f.agg(min(col("mon")).as("m0")))
    f.crossJoin(anchor)
      .groupBy(col("c_nationkey"),
        months_between(col("mon"), col("m0")).cast("long").as("x"))
      .agg(sum(col("cents")).as("y"))
  }

  def revenueTrend(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val monthly = monthlyByNation(spark, dir)
    val s = monthly.groupBy(col("c_nationkey")).agg(
      count(lit(1)).as("n_months"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val den = col("n_months") * col("sxx") - col("sx") * col("sx")
    val out = s
      .withColumn("slope", when(den === 0, lit(null).cast("double")).otherwise(
        roundN((col("n_months") * col("sxy") - col("sx") * col("sy"))
          / den.cast("double"), 4)))
      .withColumn("intercept", when(den === 0, lit(null).cast("double")).otherwise(
        roundN((col("sy") * col("sxx") - col("sx") * col("sxy"))
          / den.cast("double"), 4)))
    out.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("n_months"),
        col("slope"), col("intercept"))
      .orderBy(col("nation"))
  }

  private val revenueTrendSql =
    s"""WITH f AS (SELECT c.c_nationkey, date_trunc('month', o.o_orderdate) AS mon,
       |             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
       |               AS BIGINT) AS cents
       |           FROM lineitem l
       |           JOIN orders o ON l.l_orderkey = o.o_orderkey
       |           JOIN customer c ON o.o_custkey = c.c_custkey),
       |a AS (SELECT min(mon) AS m0 FROM f),
       |m AS (SELECT c_nationkey, date_diff('month', a.m0, mon) AS x,
       |        CAST(sum(cents) AS BIGINT) AS y
       |      FROM f CROSS JOIN a GROUP BY 1, 2),
       |s AS (SELECT c_nationkey, count(*) AS n_months,
       |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |        CAST(sum(x * y) AS BIGINT) AS sxy,
       |        CAST(sum(x * x) AS BIGINT) AS sxx
       |      FROM m GROUP BY 1)
       |SELECT n.n_name AS nation, s.n_months,
       |  CASE WHEN n_months * sxx - sx * sx = 0 THEN NULL
       |       ELSE ${roundNSql(
                "(n_months * sxy - sx * sy) / CAST(n_months * sxx - sx * sx AS DOUBLE)", 4)}
       |  END AS slope,
       |  CASE WHEN n_months * sxx - sx * sx = 0 THEN NULL
       |       ELSE ${roundNSql(
                "(sy * sxx - sx * sxy) / CAST(n_months * sxx - sx * sx AS DOUBLE)", 4)}
       |  END AS intercept
       |FROM s JOIN nation n ON s.c_nationkey = n.n_nationkey
       |ORDER BY nation""".stripMargin

  // --------------------------------------------------------- seasonal index

  /** Multiplicative seasonal index per calendar month: the mean monthly
    * revenue of each calendar month divided by the overall monthly mean.
    * index > 1 = a seasonally strong month. Everything up to the final
    * ratio is exact integer cents — per-(year, month) totals, then
    * calendar-month sums — and the index is ONE float division of exact
    * integer products (s_m·C vs c_m·S), quantized to 1e-4. Two map-side
    * combinable aggregates; the 12-row calendar join is driver-trivial. */
  def seasonalIndex(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cents =
      floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
        .cast("long")
    val ym = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).cast("int").as("m"))
      .agg(sum(cents).as("c"))
    val perMonth = ym.groupBy(col("m"))
      .agg(count(lit(1)).as("n_months"), sum(col("c")).as("s"))
    val overall = broadcast(ym.agg(count(lit(1)).as("nn"), sum(col("c")).as("ss")))
    perMonth.crossJoin(overall)
      .select(col("m").as("month"), col("n_months"),
        roundN((col("s") * col("nn")).cast("double")
          / (col("n_months") * col("ss")).cast("double"), 4).as("index"))
      .orderBy(col("month"))
  }

  private val seasonalIndexSql =
    s"""WITH f AS (SELECT year(o.o_orderdate) AS y,
       |             CAST(month(o.o_orderdate) AS INT) AS m,
       |             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
       |               AS BIGINT) AS cents
       |           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |ym AS (SELECT y, m, CAST(sum(cents) AS BIGINT) AS c FROM f GROUP BY 1, 2),
       |pm AS (SELECT m, count(*) AS n_months, CAST(sum(c) AS BIGINT) AS s
       |       FROM ym GROUP BY 1),
       |o AS (SELECT count(*) AS nn, CAST(sum(c) AS BIGINT) AS ss FROM ym)
       |SELECT pm.m AS month, pm.n_months,
       |  ${roundNSql(
            "CAST(pm.s * o.nn AS DOUBLE) / CAST(pm.n_months * o.ss AS DOUBLE)", 4)}
       |    AS index
       |FROM pm CROSS JOIN o ORDER BY month""".stripMargin

  // ------------------------------------------------------ open-order months

  /** Orders in flight per calendar month: each lineitem is "open" from its
    * order month through its ship month, and the report counts open line
    * items per month — the interval-to-calendar-grid flatten. The explode
    * fanout is bounded by the max order→ship lag in months (a small
    * constant, TPC-H ~4), the DAU/WAU contribution trick applied to
    * intervals: never a range-join, never a per-month distinct scan. */
  def openByMonth(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate")) // guard empty ranges
      .select(explode(sequence(
        date_trunc("month", col("o_orderdate")),
        date_trunc("month", col("l_shipdate")),
        expr("interval 1 month"))).as("month"))
      .groupBy(col("month")).agg(count(lit(1)).as("n_open"))
      .orderBy(col("month"))
  }

  private val openByMonthSql =
    """WITH f AS (SELECT date_trunc('month', o.o_orderdate) AS m0,
      |             date_trunc('month', l.l_shipdate) AS m1
      |           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |           WHERE l.l_shipdate >= o.o_orderdate),
      |x AS (SELECT unnest(generate_series(m0, m1, INTERVAL 1 MONTH)) AS month
      |      FROM f)
      |SELECT month::TIMESTAMP AS month, count(*) AS n_open
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ ewma

  /** EWMA lag horizon: weights beyond K lags are dropped (≤ 2^-21 of the
    * mass — far below the 1e-4 output quantum). */
  val EwmaLagK = 20

  /** Exponentially weighted moving average (α = 1/2) of daily purchase
    * revenue — the smoothed daily-trend line ops teams watch. Dyadic
    * weights make it EXACT: each day's contribution to day t is
    * cents·2^(K−lag), an integer, so numerator and the present-weight
    * denominator are order-free BIGINT sums and the only float op is one
    * final division (normalized truncated form — robust to calendar gaps,
    * identical in both engines).
    *
    * Scale shape: the day series is calendar-bounded; expansion is the
    * constant-(K+1)× contribution trick (each day pushes its weighted
    * value forward to the next K days — the DAU/WAU pattern), then one
    * (day)-keyed aggregate and an inner join back to existing days.
    * Overflow budget: daily cents < 2^42 (≈ $44B/day) before
    * cents·2^20·(K+1) approaches 2^63. */
  def ewma(spark: SparkSession, dir: String): DataFrame =
    ewmaOf(Tables.events(spark, dir))

  def ewmaOf(ev: DataFrame): DataFrame = ewmaFromDaily(dailyCents(ev))

  /** (day, c) daily purchase cents — the shared base of the smoothing and
    * change-point scans, and the store shape the streaming revenue
    * monitor maintains ([[graft.streaming.RevenueMonitor]]). */
  private[graft] def dailyCents(ev: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    ev.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(cents).as("c"))
  }

  private[graft] def ewmaFromDaily(daily: DataFrame): DataFrame = {
    val contrib = daily
      .select(col("day"), col("c"),
        explode(sequence(lit(0), lit(EwmaLagK))).as("lag"))
      .select(date_add(col("day"), col("lag")).as("day"),
        (col("c") * expr(s"shiftleft(CAST(1 AS BIGINT), $EwmaLagK - lag)")).as("wc"),
        expr(s"shiftleft(CAST(1 AS BIGINT), $EwmaLagK - lag)").as("w"))
      .groupBy(col("day"))
      .agg(sum(col("wc")).as("swc"), sum(col("w")).as("sw"))
    daily.join(contrib, "day")
      .select(col("day"),
        roundN(col("c").cast("double") / 100.0, 2).as("revenue"),
        roundN(col("swc").cast("double") / col("sw") / 100.0, 4).as("ewma"))
  }

  private val ewmaSql =
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |x AS (SELECT day + to_days(CAST(lag AS INT)) AS day,
       |        c * (1::BIGINT << ($EwmaLagK - lag)) AS wc,
       |        (1::BIGINT << ($EwmaLagK - lag)) AS w
       |      FROM d CROSS JOIN (SELECT unnest(range(0, ${EwmaLagK + 1})) AS lag)),
       |s AS (SELECT day, CAST(sum(wc) AS BIGINT) AS swc, CAST(sum(w) AS BIGINT) AS sw
       |      FROM x GROUP BY 1)
       |SELECT d.day, ${roundNSql("CAST(c AS DOUBLE) / 100.0", 2)} AS revenue,
       |  ${roundNSql("CAST(swc AS DOUBLE) / sw / 100.0", 4)} AS ewma
       |FROM d JOIN s USING (day)""".stripMargin

  // ----------------------------------------------------------------- cusum

  /** CUSUM change-point scan over daily purchase revenue: the running sum
    * of deviations from the grand mean, S_t = Σ_{i≤t}(x_i − x̄), peaks at
    * the most likely level-shift day. Everything rides exact integers by
    * clearing the denominator: n·S_t = n·prefix_t − t·Total is a BIGINT
    * identity (n = #days, Total = Σcents), so both engines agree
    * bit-for-bit and the one float division happens per emitted row.
    * `is_peak` marks the argmax of |S_t| (earliest day on ties).
    *
    * Scale shape: the corpus-sized pass is the per-day aggregate; the
    * cumulative window walks the DAY series — calendar-bounded, the
    * whitelisted class. Overflow budget: #days · total cents < 2^63
    * (≈ $3.4T·day⁻¹-years before it matters). */
  def cusum(spark: SparkSession, dir: String): DataFrame =
    cusumOf(Tables.events(spark, dir))

  def cusumOf(ev: DataFrame): DataFrame = cusumFromDaily(dailyCents(ev))

  private[graft] def cusumFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.orderBy(col("day"))
    val cum = daily
      .withColumn("t", row_number().over(win).cast("long"))
      .withColumn("prefix", sum(col("c")).over(win))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("n"), sum(col("c")).as("total"))))
      .withColumn("ns", col("n") * col("prefix") - col("t") * col("total"))
    // earliest-day argmax of |S_t| via two 1-row broadcasts (no extra window)
    val peak = cum.agg(max(abs(col("ns"))).as("peak_ns"))
    val peakT = cum.crossJoin(broadcast(peak))
      .filter(abs(col("ns")) === col("peak_ns"))
      .agg(min(col("t")).as("peak_t"))
    cum.crossJoin(broadcast(peakT))
      .withColumn("is_peak", (col("t") === col("peak_t")).cast("boolean"))
      .select(col("day"),
        roundN(col("c").cast("double") / 100.0, 2).as("revenue"),
        roundN(col("ns").cast("double") / col("n") / 100.0, 4).as("cusum"),
        col("is_peak"))
  }

  private val cusumSql =
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |g AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS total FROM d),
       |x AS (SELECT day, c,
       |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
       |        CAST(sum(c) OVER (ORDER BY day) AS BIGINT) AS prefix
       |      FROM d),
       |y AS (SELECT day, c, t, n * prefix - t * total AS ns, n FROM x CROSS JOIN g),
       |p AS (SELECT max(abs(ns)) AS peak_ns FROM y),
       |pt AS (SELECT min(t) AS peak_t FROM y CROSS JOIN p WHERE abs(ns) = peak_ns)
       |SELECT day, ${roundNSql("CAST(c AS DOUBLE) / 100.0", 2)} AS revenue,
       |  ${roundNSql("CAST(ns AS DOUBLE) / n / 100.0", 4)} AS cusum,
       |  (t = peak_t) AS is_peak
       |FROM y CROSS JOIN pt""".stripMargin

  // -------------------------------------------------------------- autocorr

  /** Autocorrelation lags reported (1 day and the weekly cycle). */
  val AutocorrLags = Seq(1, 7)

  /** Lag-k autocorrelation of daily purchase revenue — the seasonality
    * detector (r₇ high ⇒ weekly cycle) that decides whether the seasonal
    * index (`q_stats_seasonal_index`) applies. Pearson r over the
    * (x_t, x_{t+k}) paired series, computed per lag from six exact BIGINT
    * sums of cents — the lag pairing is an equi-join on day+k over the
    * calendar-bounded day table, no window at all; one sqrt per lag at
    * the end. Degenerate series (constant ⇒ zero variance) release NULL
    * in both engines. */
  def autocorr(spark: SparkSession, dir: String): DataFrame =
    autocorrOf(Tables.events(spark, dir))

  def autocorrOf(ev: DataFrame): DataFrame = {
    val daily = dailyCents(ev)
    val lagged = AutocorrLags.map { k =>
      val a = daily.alias("a")
      val b = daily.alias("b")
      a.join(b, date_add(col("a.day"), k) === col("b.day"))
        .select(lit(k).as("lag"), col("a.c").as("x"), col("b.c").as("y"))
    }.reduce(_ unionByName _)
    val s = lagged.groupBy(col("lag")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    val num = col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")
    val dx = col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")
    val dy = col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy")
    s.select(col("lag"), col("n").as("n_pairs"),
      when(dx === 0 || dy === 0, lit(null).cast("double"))
        .otherwise(roundN(num / sqrt(dx * dy), 6)).as("r"))
      .orderBy(col("lag"))
  }

  private val autocorrSql = {
    val branches = AutocorrLags.map(k =>
      s"""SELECT $k AS lag, a.c AS x, b.c AS y
         |FROM d a JOIN d b ON a.day + to_days($k) = b.day""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |l AS ($branches),
       |s AS (SELECT lag, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
       |        CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
       |      FROM l GROUP BY 1)
       |SELECT lag, n AS n_pairs,
       |  CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx = 0
       |         OR CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy = 0 THEN NULL
       |       ELSE ${roundNSql(
        "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
          "sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * " +
          "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))", 6)} END AS r
       |FROM s ORDER BY lag""".stripMargin
  }

  // ------------------------------------------------------------- theil-sen

  /** Theil-Sen robust slope per nation — the median of all pairwise
    * monthly slopes, immune to the single-month outliers that swing OLS
    * (`q_stats_trend_ols` is the efficiency baseline; a large OLS/TS gap
    * flags contaminated months). Pairs form within a nation over the
    * MONTHLY rollup, so the pair table is #nations × C(months, 2) —
    * calendar²-bounded, never row-bounded. Each slope is one double
    * division of exact integers (identical both engines); the median is
    * the type-1 histogram-cumulative pick partitioned by nation over the
    * distinct slope values. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nat = Tables.nation(spark, dir)
    val m = monthlyByNation(spark, dir)
    val pairs = m.alias("a")
      .join(m.alias("b"),
        col("a.c_nationkey") === col("b.c_nationkey") && col("a.x") < col("b.x"))
      .select(col("a.c_nationkey").as("nk"),
        ((col("b.y") - col("a.y")).cast("double") / (col("b.x") - col("a.x")) / 100.0)
          .as("slope"))
    val hist = pairs.groupBy(col("nk"), col("slope")).agg(count(lit(1)).as("cnt"))
    val byN = Window.partitionBy(col("nk"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(byN.orderBy(col("slope"))))
      .withColumn("n", sum(col("cnt")).over(byN))
    cum.groupBy(col("nk"))
      .agg(max(col("n")).as("n_pairs"),
        roundN(min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("slope"))), 4)
          .as("slope_monthly"))
      .join(broadcast(nat), col("nk") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("n_pairs"), col("slope_monthly"))
      .orderBy(col("nation"))
  }

  private val theilSenSql = {
    val cents = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
    s"""WITH f AS (
       |  SELECT c_nationkey, date_trunc('month', o_orderdate) AS mon, $cents AS cents
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey),
       |a0 AS (SELECT min(mon) AS m0 FROM f),
       |m AS (SELECT c_nationkey,
       |        CAST(date_diff('month', m0, mon) AS BIGINT) AS x,
       |        CAST(sum(cents) AS BIGINT) AS y
       |      FROM f CROSS JOIN a0 GROUP BY 1, 2),
       |p AS (SELECT a.c_nationkey AS nk,
       |        CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) / 100.0 AS slope
       |      FROM m a JOIN m b ON a.c_nationkey = b.c_nationkey AND a.x < b.x),
       |h AS (SELECT nk, slope, count(*) AS cnt FROM p GROUP BY 1, 2),
       |c AS (SELECT nk, slope,
       |        sum(cnt) OVER (PARTITION BY nk ORDER BY slope) AS cum,
       |        sum(cnt) OVER (PARTITION BY nk) AS n
       |      FROM h),
       |s AS (SELECT nk, CAST(max(n) AS BIGINT) AS n_pairs,
       |        ${roundNSql("min(CASE WHEN cum >= ceil(0.5 * n) THEN slope END)", 4)}
       |          AS slope_monthly
       |      FROM c GROUP BY 1)
       |SELECT n_name AS nation, n_pairs, slope_monthly
       |FROM s JOIN nation ON nk = n_nationkey
       |ORDER BY nation""".stripMargin
  }

  // ------------------------------------------------------------- runs test

  /** Wald-Wolfowitz runs test on daily revenue vs its median — "is the
    * series random or does it trend/oscillate": too FEW runs of
    * above/below-median days ⇒ momentum, too MANY ⇒ mean reversion.
    * The median is the type-1 histogram pick over distinct day-cents
    * (calendar-bounded); runs count via a lag over the day series (same
    * whitelisted window class as CUSUM); n1/n2/runs are exact integers
    * and the normal-approximation z is a single-row double, token-
    * identical both engines. Days AT the median count as "below" (a
    * pinned convention — both engines must tie-break identically). */
  def runsTest(spark: SparkSession, dir: String): DataFrame =
    runsTestOf(Tables.events(spark, dir))

  def runsTestOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailyCents(ev)
    val hist = daily.groupBy(col("c")).agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("c"))))
      .crossJoin(broadcast(hist.agg(sum(col("cnt")).as("n"))))
    val med = cum.agg(
      min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("c"))).as("med"))
    val signs = daily.crossJoin(broadcast(med))
      .select(col("day"), when(col("c") > col("med"), 1).otherwise(0).as("s"))
    val win = Window.orderBy(col("day"))
    val runs = signs
      .withColumn("brk",
        when(lag(col("s"), 1).over(win).isNull ||
          col("s") =!= lag(col("s"), 1).over(win), 1).otherwise(0))
      .agg(sum(col("brk")).as("runs"),
        sum(col("s")).cast("long").as("n1"),
        sum(lit(1) - col("s")).cast("long").as("n2"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val mu = lit(1.0) + lit(2.0) * n1 * n2 / (n1 + n2)
    val vr = (mu - lit(1.0)) * (mu - lit(2.0)) / (n1 + n2 - lit(1.0))
    runs.select(col("runs"), col("n1"), col("n2"),
      roundN(mu, 4).as("expected_runs"),
      when(col("n1") === 0 || col("n2") === 0, lit(null).cast("double"))
        .otherwise(roundN((col("runs") - mu) / sqrt(vr), 4)).as("z"))
  }

  private val runsTestSql = {
    val mu = "(1.0 + 2.0 * CAST(n1 AS DOUBLE) * n2 / (n1 + n2))"
    val vr = s"(($mu - 1.0) * ($mu - 2.0) / (CAST(n1 AS DOUBLE) + n2 - 1.0))"
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |h AS (SELECT c, count(*) AS cnt FROM d GROUP BY 1),
       |cu AS (SELECT c, sum(cnt) OVER (ORDER BY c) AS cum, sum(cnt) OVER () AS n FROM h),
       |med AS (SELECT min(CASE WHEN cum >= ceil(0.5 * n) THEN c END) AS med FROM cu),
       |s AS (SELECT day, CASE WHEN c > med THEN 1 ELSE 0 END AS s
       |      FROM d CROSS JOIN med),
       |r AS (SELECT CAST(sum(CASE WHEN prev IS NULL OR s != prev THEN 1 ELSE 0 END) AS BIGINT) AS runs,
       |        CAST(sum(s) AS BIGINT) AS n1, CAST(sum(1 - s) AS BIGINT) AS n2
       |      FROM (SELECT s, lag(s) OVER (ORDER BY day) AS prev FROM s))
       |SELECT runs, n1, n2,
       |  ${roundNSql(mu, 4)} AS expected_runs,
       |  CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
       |       ELSE ${roundNSql(s"(runs - $mu) / sqrt($vr)", 4)} END AS z
       |FROM r""".stripMargin
  }

  // ----------------------------------------------------------- changepoint

  /** Single-changepoint detection on daily purchase revenue — the first
    * split of binary segmentation (Scott-Knott / CUSUM's offline
    * counterpart): the day boundary τ that maximizes the between-segment
    * sum-of-squares reduction
    * gain(k) = (N·S_k − k·T)² / (N·k·(N−k)) (in cents², reported in
    * dollars²), over the zero-filled min→max calendar (absence = zero
    * revenue, the holt spine). Reports the last day of the left segment,
    * both segment means, and the gain; ties take the earliest day.
    *
    * Exactness: S_k, T, N are exact BIGINTs; dnum = N·S_k − k·T stays
    * exact (≤ days × total-cents, ~1e15 at decades of days); the square
    * and division are a fixed double tree on identical integers, so both
    * engines rank identical gain doubles; the argmax runs max → equality
    * filter → min-day (the cusum broadcast pattern — no rank window).
    *
    * Scale shape: one corpus-collapsing day aggregate; the prefix window
    * walks the calendar-bounded day series (the q_stats_cusum whitelist
    * class); the argmax is two 1-row broadcasts. */
  def changepoint(spark: SparkSession, dir: String): DataFrame =
    changepointFromDaily(dailyCents(Tables.events(spark, dir)))

  private[graft] def changepointFromDaily(daily0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = daily0.localCheckpoint()
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val full = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("y"))
      .localCheckpoint()
    val win = Window.orderBy(col("day"))
    val cum = full
      .withColumn("k", row_number().over(win).cast("long"))
      .withColumn("s", sum(col("y")).over(win))
      .crossJoin(broadcast(full.agg(count(lit(1)).as("n"), sum(col("y")).as("t"))))
      .filter(col("k") < col("n"))
      .withColumn("dnum", (col("n") * col("s") - col("k") * col("t")).cast("double"))
      // the k < n filter already excludes den = 0; the when() guard keeps
      // the division ANSI-safe under any predicate/projection reordering
      .withColumn("den", (col("n") * col("k") * (col("n") - col("k"))).cast("double"))
      .withColumn("gain", when(col("den") > 0, col("dnum") * col("dnum") / col("den")))
    val peak = cum.agg(max(col("gain")).as("peak_gain"))
    val peakDay = cum.crossJoin(broadcast(peak))
      .filter(col("gain") === col("peak_gain"))
      .agg(min(col("day")).as("peak_day"))
    cum.crossJoin(broadcast(peakDay))
      .filter(col("day") === col("peak_day"))
      .select(col("day").as("split_day"), col("n").as("n_days"),
        roundN(col("s").cast("double") / col("k") / 100.0, 4).as("mean_before"),
        when(col("n") > col("k"), roundN(
          (col("t") - col("s")).cast("double") / (col("n") - col("k")) / 100.0, 4))
          .as("mean_after"),
        roundN(col("gain") / lit(1e4), 4).as("gain"))
  }

  private val changepointSql =
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |bo AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
       |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
       |          FROM bo),
       |f AS (SELECT s.day, coalesce(d.c, 0) AS y FROM spine s LEFT JOIN d USING (day)),
       |tot AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS t FROM f),
       |c AS (SELECT day, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
       |        CAST(sum(y) OVER (ORDER BY day) AS BIGINT) AS s FROM f),
       |g AS (SELECT day, k, s, n, t, CAST(n * s - k * t AS DOUBLE) AS dnum
       |      FROM c CROSS JOIN tot WHERE k < n),
       |g2 AS (SELECT *, dnum * dnum / CAST(n * k * (n - k) AS DOUBLE) AS gain FROM g),
       |pk AS (SELECT max(gain) AS peak_gain FROM g2),
       |pd AS (SELECT min(day) AS peak_day FROM g2 CROSS JOIN pk
       |       WHERE gain = peak_gain)
       |SELECT day AS split_day, CAST(n AS BIGINT) AS n_days,
       |  ${roundNSql("CAST(s AS DOUBLE) / k / 100.0", 4)} AS mean_before,
       |  ${roundNSql("CAST(t - s AS DOUBLE) / (n - k) / 100.0", 4)} AS mean_after,
       |  ${roundNSql("gain / 1e4", 4)} AS gain
       |FROM g2 CROSS JOIN pd WHERE day = peak_day""".stripMargin

  // ----------------------------------------------------------- mann-kendall

  /** Mann-Kendall trend test on daily purchase revenue — the
    * non-parametric "is there a monotone trend" companion of the OLS /
    * Theil-Sen fits (the hypothesis test; Theil-Sen is the estimator):
    * S = Σ_{i<j} sgn(y_j − y_i) over day pairs, with the tie-corrected
    * variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 and the
    * continuity-corrected z = (S∓1)/√Var(S).
    *
    * Exactness: S and both variance terms are exact BIGINTs (the n³-ish
    * numerator is ~5e10 at a decade of days); the /18, sqrt and final
    * division are one fixed double tree; S = 0 pins z = 0 and a zero
    * variance yields NULL.
    *
    * Scale shape: the corpus collapses to the day series; the pair sweep
    * is the q_stats_kendall calendar-bounded broadcast BNLJ
    * (whitelisted); the tie term is a day-keyed aggregate, no pairs. */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val d = dailyCents(Tables.events(spark, dir)).localCheckpoint()
    val nd = broadcast(d.agg(count(lit(1)).as("n_days")))
    val s = d.alias("a")
      .join(broadcast(d.alias("b")), col("a.day") < col("b.day"))
      .agg(coalesce(sum(
        when(col("b.c") > col("a.c"), 1L)
          .when(col("b.c") < col("a.c"), -1L).otherwise(0L)), lit(0L)).as("s"))
    val ties = d.groupBy(col("c")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(when(col("t") >= 2L,
        col("t") * (col("t") - 1) * (col("t") * 2L + 5))), lit(0L)).as("tie_term"))
    val vnum = (col("n_days") * (col("n_days") - 1) * (col("n_days") * 2L + 5)
      - col("tie_term"))
    val v = vnum.cast("double") / 18.0
    s.crossJoin(nd).crossJoin(broadcast(ties))
      .select(col("n_days"), col("s"),
        when(vnum <= 0L, lit(null).cast("double"))
          .otherwise(roundN(
            when(col("s") > 0L, (col("s") - 1).cast("double") / sqrt(v))
              .when(col("s") < 0L, (col("s") + 1).cast("double") / sqrt(v))
              .otherwise(lit(0.0)), 6)).as("z"))
  }

  private val mannKendallSql = {
    val vnum = "(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term)"
    val v = s"(CAST($vnum AS DOUBLE) / 18.0)"
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |nd AS (SELECT count(*) AS n_days FROM d),
       |sgn AS (SELECT CAST(coalesce(sum(CASE WHEN b.c > a.c THEN 1
       |                 WHEN b.c < a.c THEN -1 ELSE 0 END), 0) AS BIGINT) AS s
       |        FROM d a JOIN d b ON a.day < b.day),
       |ties AS (SELECT CAST(coalesce(sum(CASE WHEN t >= 2
       |                  THEN t * (t - 1) * (2 * t + 5) END), 0) AS BIGINT) AS tie_term
       |         FROM (SELECT c, count(*) AS t FROM d GROUP BY 1))
       |SELECT n_days, s,
       |  CASE WHEN $vnum <= 0 THEN NULL
       |       ELSE ${roundNSql(
                 s"CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt($v) " +
                   s"WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt($v) ELSE 0.0 END",
                 6)}
       |  END AS z
       |FROM sgn CROSS JOIN nd CROSS JOIN ties""".stripMargin
  }

  // ----------------------------------------------------------- periodogram

  /** Periods scanned by the periodogram: the weekly cycle, its
    * neighborhood, and the fortnight. */
  val PeriodogramPeriods: Seq[Int] = Seq(2, 3, 4, 5, 6, 7, 14)

  /** Σ|dev| ceiling that keeps every Σ dev·(cos·1e4) term inside BIGINT:
    * Σ|dev·cq| ≤ Σ|dev|·1e4 < 2^63. */
  val PeriodogramAbsDevBudget = 920000000000000L // 9.2e14 cents

  /** (period, k mod period, cos(2πr/p)·1e4, sin(2πr/p)·1e4) — computed
    * ONCE here and embedded as IDENTICAL literals in both engines, so no
    * cross-engine transcendental is ever evaluated (the train_quantile
    * step-schedule convention). cos/sin depend on k only through
    * k mod p, so the whole trig surface is these Σp ≈ 41 constants. */
  private[graft] val periodogramTable: Seq[(Int, Int, Long, Long)] =
    PeriodogramPeriods.flatMap { p =>
      (0 until p).map { r =>
        val a = 2.0 * math.Pi * r / p
        (p, r, math.floor(math.cos(a) * 1e4 + 0.5).toLong,
          math.floor(math.sin(a) * 1e4 + 0.5).toLong)
      }
    }

  /** Discrete-frequency periodogram of daily purchase revenue — the
    * frequency-domain "WHICH cycle length dominates" companion of the
    * seasonal-index/Holt-Winters fits (those assume the weekly period;
    * this one measures it against its neighbors): for each candidate
    * period p, power(p) = (C² + S²)/n with C = Σ_k dev_k·cos(2πk/p),
    * S = Σ_k dev_k·sin(2πk/p) over the zero-filled calendar spine,
    * dev_k = y_k − ⌊T/n⌋ (the exact-floor mean, so centering is
    * bit-identical cross-engine and the DC term cannot leak into the
    * scanned frequencies).
    *
    * Exactness: dev is exact cents; cos/sin come from the Scala-computed
    * literal table above (1e-4 quantized), so C and S are order-free
    * BIGINT sums — guarded by [[PeriodogramAbsDevBudget]] on Σ|dev|
    * (assert_true filter / error() CASE, the Gram convention); power is
    * one fixed double tree per period, in dollars².
    *
    * Scale shape: one keyed daily aggregate collapses the corpus; the
    * spine explodes from a 1-row bounds aggregate; the trig table is a
    * 41-row broadcast equi-join on (p, k mod p); one day-bounded
    * 7-group aggregate finishes. */
  def periodogram(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark; import spark2.implicits._
    val daily = dailyCents(Tables.events(spark, dir))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val full = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"), col("d0"))
      .join(daily, Seq("day"), "left")
      .select(datediff(col("day"), col("d0")).cast("long").as("k"),
        coalesce(col("c"), lit(0L)).as("y"))
    val tot = broadcast(full.agg(sum(col("y")).as("t"), count(lit(1)).as("n")))
    val dev = full.crossJoin(tot)
      .select(col("k"), col("n"), (col("y") - expr("t div n")).as("dev"))
      .localCheckpoint()
    val guard = broadcast(dev.agg(sum(abs(col("dev"))).as("sg")))
    val tbl = broadcast(periodogramTable.toDF("p", "r", "cq", "sq"))
    dev.crossJoin(guard)
      .filter(assert_true(col("sg") < PeriodogramAbsDevBudget,
        lit("periodogram BIGINT overflow budget: sum |dev| too large; " +
          "rerun on DECIMAL(38,0)")).isNull)
      .select(col("n"), col("dev"),
        explode(typedLit(PeriodogramPeriods)).as("p"), col("k"))
      .withColumn("r", pmod(col("k"), col("p").cast("long")).cast("int"))
      .join(tbl, Seq("p", "r"))
      .groupBy(col("p")).agg(max(col("n")).as("n_days"),
        sum(col("dev") * col("cq")).as("cs"),
        sum(col("dev") * col("sq")).as("ss"))
      .select(col("p").as("period"), col("n_days"),
        roundN(((col("cs").cast("double") / 1e6) * (col("cs").cast("double") / 1e6)
          + (col("ss").cast("double") / 1e6) * (col("ss").cast("double") / 1e6))
          / col("n_days"), 4).as("power"))
      .orderBy(col("period"))
  }

  private val periodogramSql = {
    val tvals = periodogramTable
      .map { case (p, r, cq, sq) => s"($p, $r, $cq, $sq)" }.mkString(", ")
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
       |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day, d0
       |          FROM b),
       |fl AS (SELECT CAST(datediff('day', d0, day) AS BIGINT) AS k,
       |         coalesce(c, 0) AS y
       |       FROM spine s LEFT JOIN d USING (day)),
       |tot AS (SELECT CAST(sum(y) AS BIGINT) AS t, count(*) AS n FROM fl),
       |dv AS (SELECT k, n, CAST(y - (t // n) AS BIGINT) AS dev
       |       FROM fl CROSS JOIN tot),
       |sg AS (SELECT CAST(sum(abs(dev)) AS BIGINT) AS sg FROM dv),
       |dvg AS (SELECT k, n,
       |          CASE WHEN sg < $PeriodogramAbsDevBudget THEN dev
       |               ELSE CAST(error('periodogram BIGINT overflow budget') AS BIGINT)
       |          END AS dev
       |        FROM dv CROSS JOIN sg),
       |tbl(p, r, cq, sq) AS (VALUES $tvals),
       |g AS (SELECT p, max(n) AS n_days,
       |        CAST(sum(dev * cq) AS BIGINT) AS cs,
       |        CAST(sum(dev * sq) AS BIGINT) AS ss
       |      FROM dvg JOIN tbl ON tbl.r = dvg.k % tbl.p
       |      GROUP BY 1)
       |SELECT p AS period, n_days,
       |  ${roundNSql(
             "((CAST(cs AS DOUBLE) / 1e6) * (CAST(cs AS DOUBLE) / 1e6) " +
               "+ (CAST(ss AS DOUBLE) / 1e6) * (CAST(ss AS DOUBLE) / 1e6)) / n_days",
             4)} AS power
       |FROM g ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------ pacf

  /** Lags computed by the partial-autocorrelation scan (covers the weekly
    * cycle the autocorr query watches). */
  val PacfMaxLag = 7

  /** Partial autocorrelation function of daily revenue via
    * Durbin-Levinson — the AR-order diagnostic (a PACF cutoff at lag p
    * says AR(p) captures the series; the companion of `q_stats_autocorr`
    * exactly as PACF complements ACF in Box-Jenkins). Autocorrelations
    * use the common-mean, common-denominator sample form
    * r_k = Σ(x_t−x̄)(x_{t+k}−x̄)/Σ(x_t−x̄)² over the zero-filled
    * calendar; the recursion is
    * φ_kk = (r_k − Σφ_{k-1,j}r_{k-j}) / (1 − Σφ_{k-1,j}r_j),
    * φ_kj = φ_{k-1,j} − φ_kk·φ_{k-1,k-j}.
    *
    * Exactness: the six per-lag sums are exact BIGINTs (cents² at a
    * decade of days ≈ 4e16, inside the budget); r quantizes to
    * micro-units through one fixed double tree; the WHOLE recursion then
    * runs in integer µ-arithmetic — products stay < 9e15 so the one
    * explicit floor-division per update and the one true division per
    * lag are bit-identical in both engines (floor(), never `div`/`//`,
    * because truncation differs on negatives — the documented
    * CAST-vs-floor rule). Degenerate input (zero variance, short
    * series) yields NULL r for the affected lags and NULL propagates
    * through the recursion identically in both engines (the Scala fold
    * mirrors SQL three-valued logic by hand).
    *
    * Scale shape: the corpus collapses to the day series once; the
    * seven lag pairings are calendar-bounded equi-joins; the recursion
    * itself is a DRIVER-SIZED model (7 integers — the MarkovAttribution
    * value-iteration pattern), so 100 TB of events costs one day-series
    * scan. */
  /** (lag, r_mu, n) common-mean autocorrelations in micro-units over
    * the zero-filled daily-revenue calendar, lags 1..[[PacfMaxLag]] —
    * the sample-ACF frame shared by [[pacf]] (collected into the
    * Durbin-Levinson recursion) and [[ljungBox]] (consumed in-engine).
    * A lag with no pairs (series shorter than the lag) emits NO row;
    * zero-variance series carry NULL r_mu. */
  private def rMuFrame(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(Tables.events(spark, dir)).localCheckpoint()
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val full = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("x"))
      .localCheckpoint()
    val glob = full.agg(count(lit(1)).as("n"), sum(col("x")).as("t"),
      sum(col("x") * col("x")).as("sxx"))
    val lagged = (1 to PacfMaxLag).map { k =>
      full.alias("a")
        .join(full.alias("b"), date_add(col("a.day"), k) === col("b.day"))
        .select(lit(k).as("lag"), col("a.x").as("xa"), col("b.x").as("xb"))
    }.reduce(_ unionByName _)
    val per = lagged.groupBy(col("lag")).agg(count(lit(1)).as("mk"),
      sum(col("xa")).as("sh"), sum(col("xb")).as("st"),
      sum(col("xa") * col("xb")).as("sxy"))
    val xbar = col("t").cast("double") / col("n")
    val den = col("sxx").cast("double") - xbar * col("t")
    val num = (col("sxy").cast("double") - xbar * (col("sh") + col("st"))) +
      col("mk") * (xbar * xbar)
    per.crossJoin(broadcast(glob))
      .select(col("lag"),
        when(den <= 0, lit(null).cast("long"))
          .otherwise(floor(num / den * 1e6 + 0.5).cast("long")).as("r_mu"),
        col("n"))
  }

  def pacf(spark: SparkSession, dir: String): DataFrame = {
    val rRows = Guard.boundedCollect(
      rMuFrame(spark, dir).select(col("lag"), col("r_mu")),
      PacfMaxLag, "pacf autocorrelation frame (one row per lag)")
    val rMu: Map[Int, Long] = rRows.filterNot(_.isNullAt(1))
      .map(r => r.getAs[Int]("lag") -> r.getLong(1)).toMap
    val r: Int => Option[Long] = k => rMu.get(k)
    // integer Durbin-Levinson in µ units; None mirrors SQL NULL
    def dot(a: Seq[Option[Long]], b: Seq[Option[Long]]): Option[Long] =
      a.zip(b).foldLeft(Option(0L)) { case (acc, (x, y)) =>
        for (s <- acc; xv <- x; yv <- y) yield s + xv * yv
      }
    var phi: Vector[Option[Long]] = Vector(r(1))
    val out = scala.collection.mutable.ArrayBuffer[(Int, Option[Double], Option[Double])]()
    out += ((1, r(1).map(_ / 1e6), r(1).map(_ / 1e6)))
    for (k <- 2 to PacfMaxLag) {
      val num2 = for {
        rv <- r(k)
        s <- dot(phi, (1 until k).map(j => r(k - j)))
      } yield rv * 1000000L - s
      val den2 = dot(phi, (1 until k).map(j => r(j))).map(1000000000000L - _)
      val phikk = (num2, den2) match {
        case (Some(n2), Some(d2)) if d2 != 0 =>
          Some(math.floor(n2.toDouble / d2 * 1e6 + 0.5).toLong)
        case _ => None
      }
      phi = phi.zipWithIndex.map { case (pj, idx) =>
        val j = idx + 1
        for (p <- pj; kk <- phikk; pk <- phi(k - j - 1))
          yield p - math.floor((kk * pk).toDouble / 1e6).toLong
      } :+ phikk
      out += ((k, r(k).map(_ / 1e6), phikk.map(_ / 1e6)))
    }
    spark.createDataFrame(out.toSeq).toDF("lag", "r", "pacf")
      .orderBy(col("lag"))
  }

  /** Oracle CTE chain mirroring [[rMuFrame]]: `rr(lag, r_mu)` over the
    * zero-filled calendar plus `gstat(n, t, sxx)` and the `lg` lag
    * spine — shared by the pacf and ljungbox oracles. */
  private val rMuCtesSql =
    s"""e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |bo AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
       |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
       |          FROM bo),
       |f AS (SELECT s.day, coalesce(d.c, 0) AS x FROM spine s LEFT JOIN d USING (day)),
       |gstat AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS t,
       |           CAST(sum(x * x) AS BIGINT) AS sxx FROM f),
       |lg AS (SELECT CAST(unnest(range(1, ${PacfMaxLag + 1})) AS INTEGER) AS lag),
       |per AS (SELECT lg.lag, count(*) AS mk,
       |          CAST(sum(a.x) AS BIGINT) AS sh, CAST(sum(b.x) AS BIGINT) AS st,
       |          CAST(sum(a.x * b.x) AS BIGINT) AS sxy
       |        FROM lg, f a, f b WHERE b.day = a.day + lg.lag
       |        GROUP BY 1),
       |rr AS (SELECT lag,
       |         CASE WHEN den <= 0 THEN NULL
       |              ELSE CAST(floor(num / den * 1e6 + 0.5) AS BIGINT) END AS r_mu
       |       FROM (SELECT lag,
       |               (CAST(sxy AS DOUBLE) - (CAST(t AS DOUBLE) / n) * (sh + st))
       |                 + mk * ((CAST(t AS DOUBLE) / n) * (CAST(t AS DOUBLE) / n)) AS num,
       |               CAST(sxx AS DOUBLE) - (CAST(t AS DOUBLE) / n) * t AS den
       |             FROM per CROSS JOIN gstat))""".stripMargin

  private val pacfSql = {
    val steps = (2 to PacfMaxLag).map { k =>
      s"""s$k AS (
         |  SELECT list_append(
         |           (SELECT list(s.phi[j.j]
         |              - CAST(floor(CAST(pk.v * s.phi[$k - j.j] AS DOUBLE) / 1e6) AS BIGINT)
         |              ORDER BY j.j)
         |            FROM range(1, $k) j(j)),
         |           pk.v) AS phi,
         |         list_append(s.pc, pk.v) AS pc
         |  FROM s${k - 1} s, rlist r, LATERAL (
         |    SELECT CASE WHEN q.den2 = 0 THEN NULL
         |                ELSE CAST(floor(CAST(q.num2 AS DOUBLE) / q.den2 * 1e6 + 0.5) AS BIGINT)
         |           END AS v
         |    FROM (SELECT
         |            r.r[$k] * 1000000 - (SELECT CAST(sum(s.phi[j.j] * r.r[$k - j.j]) AS BIGINT)
         |                                 FROM range(1, $k) j(j)) AS num2,
         |            1000000000000 - (SELECT CAST(sum(s.phi[j.j] * r.r[j.j]) AS BIGINT)
         |                             FROM range(1, $k) j(j)) AS den2) q
         |  ) pk)""".stripMargin
    }.mkString(",\n")
    s"""WITH $rMuCtesSql,
       |rl AS (SELECT lg.lag, rr.r_mu FROM lg LEFT JOIN rr USING (lag)),
       |rlist AS (SELECT list(r_mu ORDER BY lag) AS r FROM rl),
       |s1 AS (SELECT [r.r[1]] AS phi, [r.r[1]] AS pc FROM rlist r),
       |$steps
       |SELECT CAST(rl.lag AS INTEGER) AS lag, rl.r_mu / 1e6 AS r,
       |  p.pc[rl.lag] / 1e6 AS pacf
       |FROM rl, s$PacfMaxLag p
       |ORDER BY lag""".stripMargin
  }

  // ------------------------------------------------------------ ljung-box

  /** χ²_{0.95}(df) critical values for df = 1..[[PacfMaxLag]] — standard
    * table constants (Abramowitz & Stegun 26.8) embedded as identical
    * literals in both engines. */
  private val Chi2Crit95: Seq[Double] =
    Seq(3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067)

  /** Ljung-Box portmanteau test (Ljung & Box 1978) over the daily-revenue
    * sample ACF — the "is there ANY autocorrelation up to lag m" gate a
    * forecasting read (holt, seasonal index) should pass before trusting
    * residual whiteness: Q(m) = n(n+2)·Σ_{k≤m} r_k²/(n−k), compared per m
    * to χ²_{0.95}(m). One row per m ∈ 1..[[PacfMaxLag]].
    *
    * Exactness: r_k comes micro-quantized from the shared [[rMuFrame]];
    * each lag's term quantizes as the exact integer division
    * r_mu² div (n−k) (non-negative operands, truncation identical
    * cross-engine), so Σ_{k≤m} is an order-free BIGINT sum; Q is one
    * fixed double tree over exact integers and the reject comparison
    * runs on identically-computed doubles. A lag with NULL r (zero
    * variance) or no pairs at all makes every m ≥ that lag NULL
    * (navail < m — the incomplete-ACF guard), never significant.
    *
    * Scale shape: the corpus collapses to the day series inside
    * [[rMuFrame]]; everything after runs on the ≤[[PacfMaxLag]]-row ACF
    * table — the m-expansion is an explode(sequence(lag, max)) fanout
    * and a ≤max²-row aggregate, no window, no join. */
  def ljungBox(spark: SparkSession, dir: String): DataFrame = {
    val terms = rMuFrame(spark, dir)
      .select(col("lag"), col("n"),
        when(col("r_mu").isNull, lit(null).cast("long"))
          .otherwise(expr("(r_mu * r_mu) div (n - lag)")).as("term"))
    val contrib = terms.select(col("n"), col("term"),
      explode(sequence(col("lag"), lit(PacfMaxLag))).as("m"))
    val g = contrib.groupBy(col("m")).agg(max(col("n")).as("n"),
      count(col("term")).as("navail"), sum(col("term")).as("ssum"))
    val q = expr("CAST(n * (n + 2) AS DOUBLE)") * col("ssum") / 1e12
    val crit = element_at(
      array(Chi2Crit95.map(lit): _*), col("m").cast("int"))
    g.select(col("m").cast("int").as("m"), col("n"),
        when(col("navail") < col("m"), lit(null).cast("double"))
          .otherwise(roundN(q, 6)).as("q"),
        crit.as("crit_95"),
        when(col("navail") < col("m"), lit(null).cast("boolean"))
          .otherwise(q > crit).as("reject_white"))
      .orderBy(col("m"))
  }

  private val ljungBoxSql = {
    val critList = Chi2Crit95.mkString("[", ", ", "]")
    s"""WITH $rMuCtesSql,
       |tm AS (SELECT rr.lag, gstat.n,
       |         CASE WHEN r_mu IS NULL THEN NULL
       |              ELSE (r_mu * r_mu) // (n - rr.lag) END AS term
       |       FROM rr CROSS JOIN gstat),
       |ct AS (SELECT n, term, unnest(range(lag, ${PacfMaxLag + 1})) AS m FROM tm),
       |g AS (SELECT m, max(n) AS n, count(term) AS navail,
       |        CAST(sum(term) AS BIGINT) AS ssum
       |      FROM ct GROUP BY 1)
       |SELECT CAST(m AS INTEGER) AS m, n,
       |  CASE WHEN navail < m THEN NULL
       |       ELSE ${roundNSql("CAST(n * (n + 2) AS DOUBLE) * ssum / 1e12", 6)}
       |  END AS q,
       |  ($critList)[m] AS crit_95,
       |  CASE WHEN navail < m THEN NULL
       |       ELSE CAST(n * (n + 2) AS DOUBLE) * ssum / 1e12 > ($critList)[m]
       |  END AS reject_white
       |FROM g ORDER BY m""".stripMargin
  }

  // --------------------------------------------------------------- kendall

  /** Kendall tau-b rank correlation between daily traffic (event count)
    * and daily purchase revenue — the tie-robust companion of
    * `q_stats_spearman` (tau-b's variance is well-behaved under the
    * heavy count ties a zero-inflated series produces). All day pairs
    * are classified concordant / discordant / tied; tau-b =
    * (C − D) / √((n₀−n₁)(n₀−n₂)) with the standard tie corrections.
    *
    * Exactness: counts and cents are exact; every pair class is an
    * integer aggregate; the only doubles are one sqrt of an exact BIGINT
    * product and one division. Degenerate (all-tied) series yield NULL.
    *
    * Scale shape: the corpus collapses to the per-day series first; the
    * pair classification is a day×day broadcast nested-loop join —
    * calendar-bounded at (years·365)² pairs by construction (the
    * tripwire-whitelisted bounded-BNLJ class; a decade is ~6.6M tiny
    * rows), nothing corpus-sized ever joins. */
  def kendall(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val d = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(when(col("event_type") === "purchase", cents).otherwise(0L)).as("y"))
      .localCheckpoint()
    val nDays = d.agg(count(lit(1)).as("n_days"))
    val pr = d.alias("a")
      .join(broadcast(d.alias("b")), col("a.day") < col("b.day"))
      .select(col("a.x").as("xa"), col("b.x").as("xb"),
        col("a.y").as("ya"), col("b.y").as("yb"))
    val ag = pr.agg(
      coalesce(sum(when((col("xb") > col("xa") && col("yb") > col("ya")) ||
        (col("xb") < col("xa") && col("yb") < col("ya")), 1L).otherwise(0L)), lit(0L))
        .as("concordant"),
      coalesce(sum(when((col("xb") > col("xa") && col("yb") < col("ya")) ||
        (col("xb") < col("xa") && col("yb") > col("ya")), 1L).otherwise(0L)), lit(0L))
        .as("discordant"),
      coalesce(sum(when(col("xb") === col("xa") && col("yb") =!= col("ya"), 1L)
        .otherwise(0L)), lit(0L)).as("ties_x"),
      coalesce(sum(when(col("yb") === col("ya") && col("xb") =!= col("xa"), 1L)
        .otherwise(0L)), lit(0L)).as("ties_y"),
      coalesce(sum(when(col("xb") === col("xa") && col("yb") === col("ya"), 1L)
        .otherwise(0L)), lit(0L)).as("ties_xy"),
      count(lit(1)).as("n_pairs"))
    val tx = col("n_pairs") - col("ties_x") - col("ties_xy")
    val ty = col("n_pairs") - col("ties_y") - col("ties_xy")
    ag.crossJoin(broadcast(nDays))
      .select(col("n_days"), col("n_pairs"), col("concordant"), col("discordant"),
        col("ties_x"), col("ties_y"),
        when(tx === 0L || ty === 0L, lit(null).cast("double"))
          .otherwise(roundN((col("concordant") - col("discordant")).cast("double")
            / sqrt((tx * ty).cast("double")), 6)).as("tau_b"))
  }

  private val kendallSql = {
    val tx = "(n_pairs - ties_x - ties_xy)"
    val ty = "(n_pairs - ties_y - ties_xy)"
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x,
       |        CAST(sum(CASE WHEN event_type = 'purchase'
       |          THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
       |      FROM e GROUP BY 1),
       |nd AS (SELECT count(*) AS n_days FROM d),
       |p AS (SELECT a.x AS xa, b.x AS xb, a.y AS ya, b.y AS yb
       |      FROM d a JOIN d b ON a.day < b.day),
       |ag AS (SELECT
       |         CAST(coalesce(sum(CASE WHEN (xb > xa AND yb > ya)
       |           OR (xb < xa AND yb < ya) THEN 1 ELSE 0 END), 0) AS BIGINT) AS concordant,
       |         CAST(coalesce(sum(CASE WHEN (xb > xa AND yb < ya)
       |           OR (xb < xa AND yb > ya) THEN 1 ELSE 0 END), 0) AS BIGINT) AS discordant,
       |         CAST(coalesce(sum(CASE WHEN xb = xa AND yb != ya THEN 1 ELSE 0 END), 0)
       |           AS BIGINT) AS ties_x,
       |         CAST(coalesce(sum(CASE WHEN yb = ya AND xb != xa THEN 1 ELSE 0 END), 0)
       |           AS BIGINT) AS ties_y,
       |         CAST(coalesce(sum(CASE WHEN xb = xa AND yb = ya THEN 1 ELSE 0 END), 0)
       |           AS BIGINT) AS ties_xy,
       |         count(*) AS n_pairs
       |       FROM p)
       |SELECT n_days, n_pairs, concordant, discordant, ties_x, ties_y,
       |  CASE WHEN $tx = 0 OR $ty = 0 THEN NULL
       |       ELSE ${roundNSql(
                 s"CAST(concordant - discordant AS DOUBLE) / sqrt(CAST($tx * $ty AS DOUBLE))",
                 6)}
       |  END AS tau_b
       |FROM ag CROSS JOIN nd""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("q_stats_runs", runsTest, Some(runsTestSql)),
    Q("q_stats_changepoint", changepoint, Some(changepointSql)),
    Q("q_stats_kendall", kendall, Some(kendallSql)),
    Q("q_stats_mannkendall", mannKendall, Some(mannKendallSql)),
    Q("q_stats_periodogram", periodogram, Some(periodogramSql)),
    Q("q_stats_pacf", pacf, Some(pacfSql)),
    Q("q_stats_ljungbox", ljungBox, Some(ljungBoxSql)),
    Q("q_stats_trend_theilsen", theilSen, Some(theilSenSql)),
    Q("q_stats_autocorr", autocorr, Some(autocorrSql)),
    Q("q_stats_cusum", cusum, Some(cusumSql)),
    Q("q_stats_ewma", ewma, Some(ewmaSql)),
    Q("q_stats_trend_ols", revenueTrend, Some(revenueTrendSql)),
    Q("q_stats_seasonal_index", seasonalIndex, Some(seasonalIndexSql)),
    Q("q_stats_open_by_month", openByMonth, Some(openByMonthSql)))
}
