package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series structure over the daily revenue KPI: classical additive
  * decomposition (trend / weekday seasonal / residual) and Spearman rank
  * correlation between the revenue and volume series — the monotone
  * dependence check that is robust where `q_stats_corr`'s Pearson is
  * leverage-dominated.
  *
  * Scale design: both queries collapse the corpus to the per-DAY series
  * in one keyed aggregate; every window after that runs over the
  * calendar-bounded day table (the whitelisted q_events_cum_users
  * class). Weekday seasonal means are a 7-group aggregate.
  *
  * Exactness:
  *  - Decomposition works in integer MICRO-dollars: the centered 7-day
  *    trend quantizes floor(Σ7·10⁴/7 + 0.5) once, the weekday seasonal
  *    quantizes its mean once, residual = exact integer subtraction —
  *    both engines do the identical double division between identical
  *    BIGINTs at each of the two quantization points.
  *  - Spearman doubles the average ranks to stay integral
  *    (a2 = 2·cntBefore + cntEq + 1), then Pearson on BIGINT rank sums:
  *    one sqrt per side at the very end.
  */
object Seasonal {

  // ----------------------------------------------------------- decompose

  /** Additive decomposition of daily purchase revenue. Trend is the
    * centered 7-day moving average (NULL on the 3-day edges), seasonal
    * the per-weekday mean of the detrended series, residual the exact
    * remainder. */
  def decompose(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    // persisted: the trend table feeds BOTH the weekday-seasonal
    // aggregate and the final join — without it the events scan and
    // day aggregate plan twice
    val day = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day")).agg(sum(cents).as("v"))
      .persist()
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val tr = day
      .withColumn("s7", sum(col("v")).over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("t_mu",
        when(col("c7") === 7L,
          floor(col("s7").cast("double") * 10000.0 / 7.0 + 0.5).cast("long")))
      .withColumn("d_mu", col("v") * 10000L - col("t_mu"))
      .withColumn("dow", dayofweek(col("day")))
    val seas = tr.filter(col("t_mu").isNotNull)
      .groupBy(col("dow"))
      .agg(floor(sum(col("d_mu")).cast("double") / count(lit(1)) + 0.5)
        .cast("long").as("s_mu"))
    tr.join(broadcast(seas), Seq("dow"), "left_outer")
      .select(col("day"),
        roundN(col("v").cast("double") / 100.0, 6).as("revenue"),
        roundN(col("t_mu").cast("double") / 1000000.0, 6).as("trend"),
        roundN(col("s_mu").cast("double") / 1000000.0, 6).as("seasonal"),
        roundN((col("d_mu") - col("s_mu")).cast("double") / 1000000.0, 6).as("residual"))
      .orderBy(col("day"))
  }

  private val decomposeSql =
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |t AS (SELECT day, v,
       |        sum(v) OVER w7 AS s7, count(*) OVER w7 AS c7,
       |        dayofweek(day) + 1 AS dow
       |      FROM d WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |tm AS (SELECT day, v, dow,
       |         CASE WHEN c7 = 7 THEN
       |           CAST(floor(CAST(s7 AS DOUBLE) * 10000.0 / 7.0 + 0.5) AS BIGINT)
       |         END AS t_mu
       |       FROM t),
       |td AS (SELECT *, v * 10000 - t_mu AS d_mu FROM tm),
       |se AS (SELECT dow,
       |         CAST(floor(CAST(sum(d_mu) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS s_mu
       |       FROM td WHERE t_mu IS NOT NULL GROUP BY 1)
       |SELECT td.day,
       |  ${roundNSql("CAST(td.v AS DOUBLE) / 100.0", 6)} AS revenue,
       |  ${roundNSql("CAST(td.t_mu AS DOUBLE) / 1000000.0", 6)} AS trend,
       |  ${roundNSql("CAST(se.s_mu AS DOUBLE) / 1000000.0", 6)} AS seasonal,
       |  ${roundNSql("CAST(td.d_mu - se.s_mu AS DOUBLE) / 1000000.0", 6)} AS residual
       |FROM td LEFT JOIN se USING (dow)
       |ORDER BY td.day""".stripMargin

  // ------------------------------------------------------------ spearman

  /** Spearman rank correlation between daily revenue and daily event
    * volume (average ranks for ties, doubled to stay integral). */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val day = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase", cents).otherwise(0L)).as("r"),
        count(lit(1)).as("v"))
    def a2(c: String) = {
      val w = Window.orderBy(col(c))
      // doubled average rank: 2·cntBefore + cntEq + 1
      lit(2) * (coalesce(count(lit(1)).over(
        w.rangeBetween(Window.unboundedPreceding, -1)), lit(0L))) +
        count(lit(1)).over(w.rangeBetween(0, 0)) + lit(1)
    }
    val ranked = day.select(a2("r").as("x"), a2("v").as("y"))
    ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
      .select(col("n").as("n_days"),
        when(
          (col("n") * col("sxx") - col("sx") * col("sx")) === 0L ||
            (col("n") * col("syy") - col("sy") * col("sy")) === 0L,
          lit(null).cast("double"))
          .otherwise(roundN(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6))
          .as("spearman_rho"))
  }

  private val spearmanSql =
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CASE WHEN event_type = 'purchase'
       |          THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS r,
       |        count(*) AS v
       |      FROM e GROUP BY 1),
       |rk AS (SELECT
       |         2 * (count(*) OVER (ORDER BY r RANGE BETWEEN UNBOUNDED PRECEDING
       |              AND 1 PRECEDING)) +
       |           count(*) OVER (ORDER BY r RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
       |           + 1 AS x,
       |         2 * (count(*) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING
       |              AND 1 PRECEDING)) +
       |           count(*) OVER (ORDER BY v RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
       |           + 1 AS y
       |       FROM d),
       |a AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
       |        CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * y) AS BIGINT) AS sxy
       |      FROM rk)
       |SELECT n AS n_days,
       |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
       |       ELSE ${roundNSql(
        "CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))", 6)}
       |  END AS spearman_rho
       |FROM a""".stripMargin

  // ---------------------------------------------------------- entry/exit

  /** Session entry/exit matrix: which event type opens and closes each
    * 30-minute-gap session, plus single-event bounces per cell. */
  def entryExit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(
        min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("entry_type"),
        max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("exit_type"),
        count(lit(1)).as("n_events"))
    sess.groupBy(col("entry_type"), col("exit_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounce"))
      .orderBy(col("entry_type"), col("exit_type"))
  }

  private val entryExitSql =
    """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type FROM events),
      |x AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x),
      |z AS (SELECT *,
      |        row_number() OVER (PARTITION BY user_id, sid
      |          ORDER BY ts, event_id) AS rna,
      |        row_number() OVER (PARTITION BY user_id, sid
      |          ORDER BY ts DESC, event_id DESC) AS rnd
      |      FROM y),
      |s AS (SELECT user_id, sid,
      |        max(CASE WHEN rna = 1 THEN event_type END) AS entry_type,
      |        max(CASE WHEN rnd = 1 THEN event_type END) AS exit_type,
      |        count(*) AS n_events
      |      FROM z GROUP BY 1, 2)
      |SELECT entry_type, exit_type, count(*) AS n_sessions,
      |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------- xcorr

  /** Cross-correlation lags checked (0..K days). */
  val XcorrMaxLag = 7

  /** Lead-lag cross-correlation: Pearson r between signup volume on day
    * t and purchase volume on day t+k for k = 0..[[XcorrMaxLag]] — the
    * "how long after a signup wave does the revenue wave arrive"
    * question. The lag pairing is an equi-join on day+k over the
    * calendar-bounded day series (the q_stats_autocorr class — no
    * window at all); r comes from six exact BIGINT sums per lag. */
  def xcorr(spark: SparkSession, dir: String): DataFrame = {
    val day = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    // lag fanout via explode (the EWMA contribution trick) — a constant
    // (K+1)× expansion of the calendar-bounded day table, no cross join
    val a = day.select(col("day"), col("x"),
      explode(sequence(lit(0), lit(XcorrMaxLag))).as("lag"))
    val b = day.select(col("day").as("day2"), col("y"))
    val pairs = a.join(b, date_add(col("day"), col("lag")) === col("day2"))
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("lag"), col("n").as("n_pairs"),
        when((col("n") * col("sxx") - col("sx") * col("sx")) <= 0L ||
          (col("n") * col("syy") - col("sy") * col("sy")) <= 0L,
          lit(null).cast("double"))
          .otherwise(roundN(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6))
          .as("r"))
      .orderBy(col("lag"))
  }

  private val xcorrSql =
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type FROM events),
       |d AS (SELECT CAST(ts AS DATE) AS day,
       |        CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS x,
       |        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
       |      FROM e GROUP BY 1),
       |lg AS (SELECT unnest(range(0, ${XcorrMaxLag + 1})) AS lag),
       |p AS (SELECT lg.lag, a.x, b.y
       |      FROM d a CROSS JOIN lg
       |      JOIN d b ON b.day = a.day + to_days(CAST(lg.lag AS INT))),
       |g AS (SELECT lag, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
       |        CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * y) AS BIGINT) AS sxy
       |      FROM p GROUP BY 1)
       |SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
       |  CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN NULL
       |       ELSE ${roundNSql(
        "CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))", 6)}
       |  END AS r
       |FROM g ORDER BY 1""".stripMargin

  // ---------------------------------------------------------- abandonment

  /** Session-level cart abandonment per day: of the 30-minute-gap
    * sessions that contain a click (the add-to-cart proxy in this
    * event vocabulary), the share that closes WITHOUT a purchase in the
    * same session. One session aggregate with two conditional flags —
    * the q_events_session shuffle class, then a day-keyed rollup. */
  def abandonment(spark: SparkSession, dir: String): DataFrame = {
    val sess = Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(min(col("ts")).as("start_ts"),
        max(when(col("event_type") === "click", 1L).otherwise(0L)).as("has_click"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("has_buy"))
      .filter(col("has_click") === 1L)
    sess.groupBy(to_date(col("start_ts")).as("day"))
      .agg(count(lit(1)).as("n_click_sessions"),
        sum(when(col("has_buy") === 0L, 1L).otherwise(0L)).as("n_abandoned"))
      .select(col("day"), col("n_click_sessions"), col("n_abandoned"),
        roundN(col("n_abandoned").cast("double") / col("n_click_sessions"), 6)
          .as("abandonment_rate"))
      .orderBy(col("day"))
  }

  private val abandonmentSql =
    s"""WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type FROM events),
      |x AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x),
      |s AS (SELECT user_id, sid, min(ts) AS start_ts,
      |        max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
      |        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_buy
      |      FROM y GROUP BY 1, 2)
      |SELECT CAST(start_ts AS DATE) AS day,
      |  count(*) AS n_click_sessions,
      |  CAST(sum(CASE WHEN has_buy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
      |  ${roundNSql(
        "CAST(sum(CASE WHEN has_buy = 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS abandonment_rate
      |FROM s WHERE has_click = 1
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- holt

  /** Forecast horizon of the Holt extrapolation, in days. */
  val HoltHorizon = 7

  /** Holt linear-trend (double exponential smoothing) forecast of daily
    * purchase revenue — the model-based step up from the lag-7/lag-1
    * baselines `q_events_forecast_naive` backtests: per calendar day
    * (zero-filled between min and max purchase day, so absence = zero
    * revenue, not a skipped step), the recursions
    * l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}) and
    * b_t = β(l_t−l_{t−1}) + (1−β)·b_{t−1} with α = β = 0.5, initialized
    * l_1 = y_1, b_1 = y_2−y_1; `fitted` is the one-step-ahead forecast
    * l_{t−1}+b_{t−1} (NULL at t = 1), and 7 `forecast` rows extrapolate
    * l_T + h·b_T past the horizon. Needs ≥ 2 observed days, else empty.
    *
    * Exactness: y is exact integer cents; α = β = 0.5 makes every float
    * step a double add/multiply by an exact binary fraction — NO
    * transcendentals anywhere, so the recursion is bit-identical
    * cross-engine by IEEE 754 alone (the oracle replays it as a
    * recursive CTE); roundN(4) only at display.
    *
    * Scale shape: the corpus collapses to the per-day cents series in
    * one keyed aggregate; the zero-fill spine explodes from a 1-row
    * bounds aggregate; the recursion itself runs as ONE `aggregate` HOF
    * over the collected calendar-bounded series (≤ years of days — the
    * q_stats_bootstrap single-row class), so no driver loop, no
    * per-step job, and state never touches user-sized data. */
  def holt(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day")).agg(sum(cents).as("c"))
    holtFromDaily(daily)
  }

  /** [[holt]] from an already-aggregated (day, c) cents table — the form
    * the streaming forecast monitor recomputes from its bounded day
    * store after every micro-batch (the Trend.ewmaFromDaily pattern). */
  def holtFromDaily(daily: DataFrame): DataFrame = {
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val full = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("y"))
    val arr = full.agg(
      sort_array(collect_list(struct(col("day"), col("y")))).as("s"),
      max(col("day")).as("d1"))
      .where(size(col("s")) >= 2)
    val rec = arr.select(col("d1"), expr(
      """aggregate(
        |  slice(s, 2, greatest(size(s) - 1, 0)),
        |  named_struct(
        |    'l', CAST(s[0].y AS DOUBLE),
        |    'b', CAST(s[1].y AS DOUBLE) - CAST(s[0].y AS DOUBLE),
        |    'out', array(named_struct(
        |      'day', s[0].day, 'y', s[0].y,
        |      'level', CAST(s[0].y AS DOUBLE),
        |      'trend', CAST(s[1].y AS DOUBLE) - CAST(s[0].y AS DOUBLE),
        |      'fitted', CAST(NULL AS DOUBLE)))),
        |  (acc, e) -> named_struct(
        |    'l', 0.5 * CAST(e.y AS DOUBLE) + 0.5 * (acc.l + acc.b),
        |    'b', 0.5 * ((0.5 * CAST(e.y AS DOUBLE) + 0.5 * (acc.l + acc.b)) - acc.l)
        |         + 0.5 * acc.b,
        |    'out', array_append(acc.out, named_struct(
        |      'day', e.day, 'y', e.y,
        |      'level', 0.5 * CAST(e.y AS DOUBLE) + 0.5 * (acc.l + acc.b),
        |      'trend', 0.5 * ((0.5 * CAST(e.y AS DOUBLE) + 0.5 * (acc.l + acc.b)) - acc.l)
        |               + 0.5 * acc.b,
        |      'fitted', acc.l + acc.b))))""".stripMargin).as("r"))
    rec.select(explode(expr(
      s"""concat(r.out, transform(sequence(1, $HoltHorizon), h -> named_struct(
         |  'day', date_add(d1, h),
         |  'y', CAST(NULL AS BIGINT),
         |  'level', CAST(NULL AS DOUBLE),
         |  'trend', CAST(NULL AS DOUBLE),
         |  'fitted', r.l + h * r.b)))""".stripMargin)).as("e"))
      .select(col("e.day").as("day"), col("e.y").as("y"),
        roundN(col("e.level"), 4).as("level"),
        roundN(col("e.trend"), 4).as("trend"),
        roundN(col("e.fitted"), 4).as("fitted"),
        when(col("e.y").isNull, lit("forecast")).otherwise(lit("fit")).as("kind"))
      .orderBy(col("day"))
  }

  private val holtSql =
    s"""WITH RECURSIVE
       |d AS (SELECT ts::TIMESTAMP::DATE AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |bo AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
       |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
       |          FROM bo),
       |f AS (SELECT row_number() OVER (ORDER BY s.day) AS i, s.day,
       |        coalesce(d.c, 0) AS y
       |      FROM spine s LEFT JOIN d USING (day)),
       |nn AS (SELECT count(*) AS n FROM f),
       |rec AS (
       |  SELECT 1 AS i, f1.day, f1.y,
       |    CAST(f1.y AS DOUBLE) AS l,
       |    CAST(f2.y AS DOUBLE) - CAST(f1.y AS DOUBLE) AS b,
       |    CAST(NULL AS DOUBLE) AS fitted
       |  FROM f f1 JOIN f f2 ON f1.i = 1 AND f2.i = 2
       |  UNION ALL
       |  SELECT fx.i, fx.day, fx.y,
       |    0.5 * CAST(fx.y AS DOUBLE) + 0.5 * (r.l + r.b) AS l,
       |    0.5 * ((0.5 * CAST(fx.y AS DOUBLE) + 0.5 * (r.l + r.b)) - r.l)
       |      + 0.5 * r.b AS b,
       |    r.l + r.b AS fitted
       |  FROM rec r JOIN f fx ON fx.i = r.i + 1),
       |fin AS (SELECT r.l, r.b FROM rec r, nn WHERE r.i = nn.n),
       |fc AS (SELECT (SELECT d1 FROM bo) + CAST(h AS INTEGER) AS day,
       |         CAST(NULL AS BIGINT) AS y,
       |         CAST(NULL AS DOUBLE) AS level, CAST(NULL AS DOUBLE) AS trend,
       |         fin.l + h * fin.b AS fitted
       |       FROM fin, (SELECT unnest(range(1, ${HoltHorizon + 1})) AS h))
       |SELECT day, y, ${roundNSql("l", 4)} AS level, ${roundNSql("b", 4)} AS trend,
       |  ${roundNSql("fitted", 4)} AS fitted,
       |  CASE WHEN y IS NULL THEN 'forecast' ELSE 'fit' END AS kind
       |FROM rec
       |UNION ALL
       |SELECT day, y, level, trend, ${roundNSql("fitted", 4)}, 'forecast'
       |FROM fc
       |ORDER BY day""".stripMargin

  // --------------------------------------------------------- holt-winters

  /** Holt-Winters additive triple exponential smoothing of daily purchase
    * revenue, weekly season (period 7) — the seasonal upgrade of
    * [[holt]]: l_t = α(y_t − s_{t−7}) + (1−α)(l+b),
    * b_t = β(l_t − l) + (1−β)b, s_t = γ(y_t − l_t) + (1−γ)s_{t−7},
    * α = β = γ = 0.5. Seed: l = first-week mean (the one division,
    * fixed-order sum), b = 0, s_k = y_k − l over week one; fit rows start
    * at day 8 (`fitted` = l+b+s_{t−7}); 7 forecast rows extrapolate
    * l_T + h·b_T + s_slot. The seasonal SLOT is the spine position mod 7
    * — pure integer arithmetic on the contiguous zero-filled calendar,
    * never an engine weekday function (DuckDB's dayofweek is 0-based
    * Sunday, Spark's 1-based — the documented cross-engine trap). Needs
    * ≥ 8 observed calendar days, else empty.
    *
    * Exactness: same contract as [[holt]] — every float step is add/mul
    * with the exact binary fraction ½ over exact-cents doubles (plus the
    * single seed division), so the recursion is bit-identical
    * cross-engine; the oracle replays it as a recursive CTE carrying the
    * 7 seasonal slots as explicit columns. Scale: identical to holt —
    * one keyed aggregate, 1-row bounds explode, ONE aggregate-HOF pass
    * over the collected calendar-bounded series. */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day")).agg(sum(cents).as("c"))
    holtWintersFromDaily(daily)
  }

  /** [[holtWinters]] from an already-aggregated (day, c) cents table —
    * the streaming ForecastMonitor's replay form (see holtFromDaily). */
  def holtWintersFromDaily(daily: DataFrame): DataFrame = {
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val full = bounds
      .select(col("d0"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select((datediff(col("day"), col("d0")) + 1).as("i"), col("day"),
        coalesce(col("c"), lit(0L)).as("y"))
    val arr = full.agg(
      sort_array(collect_list(struct(col("i"), col("day"), col("y")))).as("s"),
      max(col("day")).as("d1"))
      .where(size(col("s")) >= 8)
    // seed: l = mean(week 1) in array order; s[k] = y_{k+1} - l; b = 0
    val rec = arr.select(col("d1"), size(col("s")).as("n"), expr(
      """aggregate(
        |  slice(s, 8, greatest(size(s) - 7, 0)),
        |  named_struct(
        |    'l', aggregate(slice(s, 1, 7), CAST(0.0 AS DOUBLE),
        |           (a, e) -> a + CAST(e.y AS DOUBLE)) / 7.0,
        |    'b', CAST(0.0 AS DOUBLE),
        |    'sv', transform(slice(s, 1, 7), e -> CAST(e.y AS DOUBLE)
        |            - aggregate(slice(s, 1, 7), CAST(0.0 AS DOUBLE),
        |                (a, e2) -> a + CAST(e2.y AS DOUBLE)) / 7.0),
        |    'out', CAST(array() AS ARRAY<STRUCT<day: DATE, y: BIGINT,
        |      level: DOUBLE, trend: DOUBLE, seasonal: DOUBLE, fitted: DOUBLE>>)),
        |  (acc, e) -> named_struct(
        |    'l', 0.5 * (CAST(e.y AS DOUBLE) - element_at(acc.sv, CAST((e.i - 1) % 7 AS INT) + 1))
        |         + 0.5 * (acc.l + acc.b),
        |    'b', 0.5 * ((0.5 * (CAST(e.y AS DOUBLE) - element_at(acc.sv, CAST((e.i - 1) % 7 AS INT) + 1))
        |         + 0.5 * (acc.l + acc.b)) - acc.l) + 0.5 * acc.b,
        |    'sv', transform(acc.sv, (v, ix) -> CASE WHEN ix = CAST((e.i - 1) % 7 AS INT)
        |      THEN 0.5 * (CAST(e.y AS DOUBLE)
        |             - (0.5 * (CAST(e.y AS DOUBLE) - element_at(acc.sv, CAST((e.i - 1) % 7 AS INT) + 1))
        |                + 0.5 * (acc.l + acc.b)))
        |           + 0.5 * v
        |      ELSE v END),
        |    'out', array_append(acc.out, named_struct(
        |      'day', e.day, 'y', e.y,
        |      'level', 0.5 * (CAST(e.y AS DOUBLE) - element_at(acc.sv, CAST((e.i - 1) % 7 AS INT) + 1))
        |               + 0.5 * (acc.l + acc.b),
        |      'trend', 0.5 * ((0.5 * (CAST(e.y AS DOUBLE) - element_at(acc.sv, CAST((e.i - 1) % 7 AS INT) + 1))
        |               + 0.5 * (acc.l + acc.b)) - acc.l) + 0.5 * acc.b,
        |      'seasonal', 0.5 * (CAST(e.y AS DOUBLE)
        |             - (0.5 * (CAST(e.y AS DOUBLE) - element_at(acc.sv, CAST((e.i - 1) % 7 AS INT) + 1))
        |                + 0.5 * (acc.l + acc.b)))
        |           + 0.5 * element_at(acc.sv, CAST((e.i - 1) % 7 AS INT) + 1),
        |      'fitted', acc.l + acc.b + element_at(acc.sv, CAST((e.i - 1) % 7 AS INT) + 1)))))""".stripMargin)
      .as("r"))
    rec.select(explode(expr(
      s"""concat(r.out, transform(sequence(1, $HoltHorizon), h -> named_struct(
         |  'day', date_add(d1, h),
         |  'y', CAST(NULL AS BIGINT),
         |  'level', CAST(NULL AS DOUBLE),
         |  'trend', CAST(NULL AS DOUBLE),
         |  'seasonal', CAST(NULL AS DOUBLE),
         |  'fitted', r.l + h * r.b
         |    + element_at(r.sv, CAST((n + h - 1) % 7 AS INT) + 1))))""".stripMargin))
      .as("e"))
      .select(col("e.day").as("day"), col("e.y").as("y"),
        roundN(col("e.level"), 4).as("level"),
        roundN(col("e.trend"), 4).as("trend"),
        roundN(col("e.seasonal"), 4).as("seasonal"),
        roundN(col("e.fitted"), 4).as("fitted"),
        when(col("e.y").isNull, lit("forecast")).otherwise(lit("fit")).as("kind"))
      .orderBy(col("day"))
  }

  private val holtWintersSql = {
    def sPrev(src: String, k: String) =
      s"(CASE $k WHEN 0 THEN $src.s0 WHEN 1 THEN $src.s1 WHEN 2 THEN $src.s2" +
        s" WHEN 3 THEN $src.s3 WHEN 4 THEN $src.s4 WHEN 5 THEN $src.s5" +
        s" ELSE $src.s6 END)"
    val k = "((fx.i - 1) % 7)"
    val sp = sPrev("r", k)
    val lNew = s"(0.5 * (CAST(fx.y AS DOUBLE) - $sp) + 0.5 * (r.l + r.b))"
    val sNew = s"(0.5 * (CAST(fx.y AS DOUBLE) - $lNew) + 0.5 * $sp)"
    def sCol(j: Int) = s"CASE WHEN $k = $j THEN $sNew ELSE r.s$j END AS s$j"
    s"""WITH RECURSIVE
       |d AS (SELECT ts::TIMESTAMP::DATE AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |bo AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
       |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
       |          FROM bo),
       |f AS (SELECT row_number() OVER (ORDER BY s.day) AS i, s.day,
       |        coalesce(d.c, 0) AS y
       |      FROM spine s LEFT JOIN d USING (day)),
       |nn AS (SELECT count(*) AS n FROM f),
       |wk AS (SELECT
       |        CAST(max(CASE WHEN i = 1 THEN y END) AS DOUBLE)
       |         + max(CASE WHEN i = 2 THEN y END)
       |         + max(CASE WHEN i = 3 THEN y END)
       |         + max(CASE WHEN i = 4 THEN y END)
       |         + max(CASE WHEN i = 5 THEN y END)
       |         + max(CASE WHEN i = 6 THEN y END)
       |         + max(CASE WHEN i = 7 THEN y END) AS w_sum,
       |        max(CASE WHEN i = 1 THEN y END) AS y1,
       |        max(CASE WHEN i = 2 THEN y END) AS y2,
       |        max(CASE WHEN i = 3 THEN y END) AS y3,
       |        max(CASE WHEN i = 4 THEN y END) AS y4,
       |        max(CASE WHEN i = 5 THEN y END) AS y5,
       |        max(CASE WHEN i = 6 THEN y END) AS y6,
       |        max(CASE WHEN i = 7 THEN y END) AS y7
       |      FROM f WHERE i <= 7),
       |rec AS (
       |  SELECT 7 AS i, CAST(NULL AS DATE) AS day, CAST(NULL AS BIGINT) AS y,
       |    w_sum / 7.0 AS l, CAST(0.0 AS DOUBLE) AS b,
       |    CAST(y1 AS DOUBLE) - w_sum / 7.0 AS s0,
       |    CAST(y2 AS DOUBLE) - w_sum / 7.0 AS s1,
       |    CAST(y3 AS DOUBLE) - w_sum / 7.0 AS s2,
       |    CAST(y4 AS DOUBLE) - w_sum / 7.0 AS s3,
       |    CAST(y5 AS DOUBLE) - w_sum / 7.0 AS s4,
       |    CAST(y6 AS DOUBLE) - w_sum / 7.0 AS s5,
       |    CAST(y7 AS DOUBLE) - w_sum / 7.0 AS s6,
       |    CAST(NULL AS DOUBLE) AS seasonal, CAST(NULL AS DOUBLE) AS fitted
       |  FROM wk, nn WHERE nn.n >= 8
       |  UNION ALL
       |  SELECT fx.i, fx.day, fx.y,
       |    $lNew AS l,
       |    0.5 * ($lNew - r.l) + 0.5 * r.b AS b,
       |    ${(0 to 6).map(sCol).mkString(",\n    ")},
       |    $sNew AS seasonal,
       |    r.l + r.b + $sp AS fitted
       |  FROM rec r JOIN f fx ON fx.i = r.i + 1),
       |fin AS (SELECT r.* FROM rec r, nn WHERE r.i = nn.n),
       |fc AS (SELECT (SELECT d1 FROM bo) + CAST(h AS INTEGER) AS day,
       |         CAST(NULL AS BIGINT) AS y,
       |         CAST(NULL AS DOUBLE) AS level, CAST(NULL AS DOUBLE) AS trend,
       |         CAST(NULL AS DOUBLE) AS seasonal,
       |         fin.l + h * fin.b + ${sPrev("fin", "((nn.n + h - 1) % 7)")} AS fitted
       |       FROM fin, nn, (SELECT unnest(range(1, ${HoltHorizon + 1})) AS h))
       |SELECT day, y, ${roundNSql("l", 4)} AS level, ${roundNSql("b", 4)} AS trend,
       |  ${roundNSql("seasonal", 4)} AS seasonal, ${roundNSql("fitted", 4)} AS fitted,
       |  CASE WHEN y IS NULL THEN 'forecast' ELSE 'fit' END AS kind
       |FROM rec WHERE i >= 8
       |UNION ALL
       |SELECT day, y, level, trend, seasonal, ${roundNSql("fitted", 4)}, 'forecast'
       |FROM fc
       |ORDER BY day""".stripMargin
  }

  // --------------------------------------------------------------- granger

  /** Granger causality (lag-1) of daily VIEW volume onto daily purchase
    * REVENUE: does yesterday's traffic help predict today's revenue
    * beyond yesterday's revenue? Restricted model
    * rev_t ~ 1 + rev_{t−1}; full model adds views_{t−1}; the F statistic
    * ((RSS_r − RSS_f)/1) / (RSS_f/(T−3)) is the Granger test (Granger
    * 1969). β and RSS come from the closed normal-equation forms
    * (Cramer 3×3 / 2×2; RSS = Syy − β'X'y), so no iteration anywhere.
    *
    * Exactness: inputs are quantized to whole DOLLARS (cents div 100)
    * and raw counts, so every sufficient statistic (Σy, Σx², Σxy, …) is
    * an exact BIGINT — order-free — with an enforced overflow budget
    * (the Gram pattern: values must stay under ~3e9 HALF-SCALED so
    * squares×days fit; assert_true in both engines). The determinant /
    * β / RSS / F arithmetic is ONE fixed double tree over those exact
    * integers, token-identical cross-engine; degenerate fits (T < 4 or
    * a singular design) yield NULL F.
    *
    * Scale shape: one keyed per-day aggregate, a day−1 calendar
    * equi-join (the forecastBacktest pattern — a gap means "no lag", the
    * row drops), and a single grand aggregate of integer products. */
  def granger(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val byDay = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        coalesce(sum(when(col("event_type") === "purchase", cents)), lit(0L))
          .as("rc"),
        count(when(col("event_type") === "view", 1)).as("views"))
      .select(col("day"), expr("rc div 100").as("rev"), col("views"))
    // overflow budget: dollars and view counts must keep Σx² in BIGINT
    val guarded = byDay.select(col("day"),
      when(col("rev") < 3000000000L && col("views") < 3000000000L, col("rev"))
        .otherwise(raise_error(lit("granger: input exceeds the Σx² BIGINT budget")))
        .as("rev"),
      col("views"))
    val lag = guarded.select(date_add(col("day"), 1).as("day"),
      col("rev").as("rev_l"), col("views").as("views_l"))
    val j = guarded.join(lag, Seq("day"))
    val agg = j.agg(
      count(lit(1)).as("t"),
      sum(col("rev")).as("sy"),
      sum(col("rev_l")).as("s1"),
      sum(col("views_l")).as("s2"),
      sum(col("rev_l") * col("rev_l")).as("s11"),
      sum(col("views_l") * col("views_l")).as("s22"),
      sum(col("rev_l") * col("views_l")).as("s12"),
      sum(col("rev") * col("rev")).as("syy"),
      sum(col("rev") * col("rev_l")).as("s1y"),
      sum(col("rev") * col("views_l")).as("s2y"))
    def d(c: String) = col(c).cast("double")
    // restricted: [t, s1; s1, s11] b = [sy, s1y]
    val detR = d("t") * d("s11") - d("s1") * d("s1")
    val b0r = (d("sy") * d("s11") - d("s1") * d("s1y")) / detR
    val b1r = (d("t") * d("s1y") - d("s1") * d("sy")) / detR
    val rssR = d("syy") - (b0r * d("sy") + b1r * d("s1y"))
    // full: 3x3 Cramer on [t, s1, s2; s1, s11, s12; s2, s12, s22]
    val detF = d("t") * (d("s11") * d("s22") - d("s12") * d("s12")) -
      d("s1") * (d("s1") * d("s22") - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s12") - d("s11") * d("s2"))
    val det0 = d("sy") * (d("s11") * d("s22") - d("s12") * d("s12")) -
      d("s1") * (d("s1y") * d("s22") - d("s12") * d("s2y")) +
      d("s2") * (d("s1y") * d("s12") - d("s11") * d("s2y"))
    val det1 = d("t") * (d("s1y") * d("s22") - d("s12") * d("s2y")) -
      d("sy") * (d("s1") * d("s22") - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s2y") - d("s1y") * d("s2"))
    val det2 = d("t") * (d("s11") * d("s2y") - d("s1y") * d("s12")) -
      d("s1") * (d("s1") * d("s2y") - d("s1y") * d("s2")) +
      d("sy") * (d("s1") * d("s12") - d("s11") * d("s2"))
    val b0f = det0 / detF
    val b1f = det1 / detF
    val b2f = det2 / detF
    val rssF = d("syy") - (b0f * d("sy") + b1f * d("s1y") + b2f * d("s2y"))
    val fStat = (rssR - rssF) * (d("t") - lit(3.0)) / rssF
    val degenerate = col("t") < 4L || detF === 0.0 || detR === 0.0 || rssF <= 0.0
    agg.select(col("t"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(roundN(b2f, 6)).as("beta_views"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(roundN(rssR, 4)).as("rss_restricted"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(roundN(rssF, 4)).as("rss_full"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(roundN(fStat, 6)).as("f_stat"))
  }

  private val grangerSql = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val detR = s"(${dd("t")} * s11 - ${dd("s1")} * s1)"
    val b0r = s"((${dd("sy")} * s11 - ${dd("s1")} * s1y) / $detR)"
    val b1r = s"((${dd("t")} * s1y - ${dd("s1")} * sy) / $detR)"
    val rssR = s"(${dd("syy")} - ($b0r * sy + $b1r * s1y))"
    val detF = s"""(${dd("t")} * (${dd("s11")} * s22 - ${dd("s12")} * s12) -
       | ${dd("s1")} * (${dd("s1")} * s22 - ${dd("s12")} * s2) +
       | ${dd("s2")} * (${dd("s1")} * s12 - ${dd("s11")} * s2))""".stripMargin
      .replaceAll("\n\\s*\\|", "")
    val det0 = s"""(${dd("sy")} * (${dd("s11")} * s22 - ${dd("s12")} * s12) -
       | ${dd("s1")} * (${dd("s1y")} * s22 - ${dd("s12")} * s2y) +
       | ${dd("s2")} * (${dd("s1y")} * s12 - ${dd("s11")} * s2y))""".stripMargin
      .replaceAll("\n\\s*\\|", "")
    val det1 = s"""(${dd("t")} * (${dd("s1y")} * s22 - ${dd("s12")} * s2y) -
       | ${dd("sy")} * (${dd("s1")} * s22 - ${dd("s12")} * s2) +
       | ${dd("s2")} * (${dd("s1")} * s2y - ${dd("s1y")} * s2))""".stripMargin
      .replaceAll("\n\\s*\\|", "")
    val det2 = s"""(${dd("t")} * (${dd("s11")} * s2y - ${dd("s1y")} * s12) -
       | ${dd("s1")} * (${dd("s1")} * s2y - ${dd("s1y")} * s2) +
       | ${dd("sy")} * (${dd("s1")} * s12 - ${dd("s11")} * s2))""".stripMargin
      .replaceAll("\n\\s*\\|", "")
    val b0f = s"($det0 / $detF)"
    val b1f = s"($det1 / $detF)"
    val b2f = s"($det2 / $detF)"
    val rssF = s"(${dd("syy")} - ($b0f * sy + $b1f * s1y + $b2f * s2y))"
    val fStat = s"(($rssR - $rssF) * (${dd("t")} - 3.0) / $rssF)"
    val degen = s"(t < 4 OR $detF = 0.0 OR $detR = 0.0 OR $rssF <= 0.0)"
    s"""WITH d0 AS (SELECT ts::TIMESTAMP::DATE AS day,
       |        CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
       |          THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) // 100
       |          AS rev,
       |        CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS views
       |      FROM events GROUP BY 1),
       |d1 AS (SELECT day, CASE WHEN rev < 3000000000 AND views < 3000000000 THEN rev
       |         ELSE CAST(error('granger: input exceeds the budget') AS BIGINT)
       |       END AS rev, views FROM d0),
       |j AS (SELECT a.rev, b.rev AS rev_l, b.views AS views_l
       |      FROM d1 a JOIN d1 b ON b.day + 1 = a.day),
       |ag AS (SELECT count(*) AS t,
       |         CAST(sum(rev) AS BIGINT) AS sy,
       |         CAST(sum(rev_l) AS BIGINT) AS s1,
       |         CAST(sum(views_l) AS BIGINT) AS s2,
       |         CAST(sum(rev_l * rev_l) AS BIGINT) AS s11,
       |         CAST(sum(views_l * views_l) AS BIGINT) AS s22,
       |         CAST(sum(rev_l * views_l) AS BIGINT) AS s12,
       |         CAST(sum(rev * rev) AS BIGINT) AS syy,
       |         CAST(sum(rev * rev_l) AS BIGINT) AS s1y,
       |         CAST(sum(rev * views_l) AS BIGINT) AS s2y
       |       FROM j)
       |SELECT t,
       |  CASE WHEN $degen THEN NULL ELSE ${roundNSql(b2f, 6)} END AS beta_views,
       |  CASE WHEN $degen THEN NULL ELSE ${roundNSql(rssR, 4)} END AS rss_restricted,
       |  CASE WHEN $degen THEN NULL ELSE ${roundNSql(rssF, 4)} END AS rss_full,
       |  CASE WHEN $degen THEN NULL ELSE ${roundNSql(fStat, 6)} END AS f_stat
       |FROM ag""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_stats_holt", holt, Some(holtSql)),
    Q("q_stats_granger", granger, Some(grangerSql)),
    Q("q_stats_holt_winters", holtWinters, Some(holtWintersSql)),
    Q("q_events_abandonment", abandonment, Some(abandonmentSql)),
    Q("q_stats_decompose", decompose, Some(decomposeSql)),
    Q("q_stats_spearman", spearman, Some(spearmanSql)),
    Q("q_stats_xcorr", xcorr, Some(xcorrSql)),
    Q("q_events_entry_exit", entryExit, Some(entryExitSql)))
}
