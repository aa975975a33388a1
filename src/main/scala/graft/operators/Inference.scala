package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical inference & experimentation — the decision layer a product
  * team runs on top of the event pipeline: A/B conversion tests,
  * Kaplan-Meier retention/churn curves, Welch's unequal-variance t, and a
  * Benford first-digit audit for financial anomaly screening. Extends the
  * reference's KPI surface (transform.py:109-145 computes the rates these
  * tests decide on) with the tests themselves.
  *
  * Exactness contract (the engine's standard recipe):
  *  - all counts/sums ride exact integers (cents for money-like `value`),
  *    order-independent and map-side-combinable;
  *  - the few float steps (one sqrt / ln / division per statistic) run on
  *    those exact integers with formulas written token-identically in both
  *    engines, so IEEE doubles agree bit-for-bit;
  *  - anything transcendental that feeds a SUM is quantized to integer
  *    micro-units first (the lm_score pattern) so aggregation order can
  *    never drift the result.
  *
  * Scale notes (100 TB): every query here reduces the input to a
  * key-bounded aggregate before any window or join — arms (2 rows),
  * lifetime days (calendar-bounded), digits (9 rows). Per-user work is
  * keyed hash aggregation; nothing sorts or windows over user-sized data.
  */
object Inference {

  /** Deterministic experiment arm from the user id — the md5-byte gate
    * every sampler in this engine uses (operators/Sampling.scala): bit
    * parity of the first md5 byte, 0 = control, 1 = treatment. */
  private[operators] def armCol(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 2), 16, 10).cast("int") % 2

  private[operators] val armSql = "(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::INT % 2)"

  private val eventsUs =
    "e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value FROM events)"

  // ---------------------------------------------------------------- abtest

  /** Conversion = any big-ticket purchase (value ≥ $200). A plain
    * "any purchase" flag saturates to rate 1.0 on this data (every user
    * buys something), which degenerates the pooled variance to 0; the
    * big-ticket cut sits at a healthy 10-60% rate at every harness SF. */
  val ConvThreshold = 200.0

  /** Two-proportion z-test of big-ticket conversion between the two
    * deterministic arms. Per-user conversion flags collapse in one keyed
    * aggregate; the z statistic is a single-row computation from four
    * exact integers (pooled-variance form), so the whole query shuffles
    * 2 rows regardless of event volume. A degenerate experiment (pooled
    * rate 0 or 1 ⇒ zero standard error) yields NULL z in both engines
    * rather than a fault. */
  def abtest(spark: SparkSession, dir: String): DataFrame =
    abtestOf(Tables.events(spark, dir))

  def abtestOf(ev: DataFrame): DataFrame =
    abtestFromFlags(ev
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= ConvThreshold, 1)
        .otherwise(0)).as("conv")))

  /** The statistic from a (user_id, conv ∈ {0,1}) flag table — shared by
    * the batch query above and the streaming monitor
    * ([[graft.streaming.AbtestMonitor]]), whose per-user upsert store has
    * exactly this shape. */
  def abtestFromFlags(perUserFlags: DataFrame): DataFrame = {
    val perUser = perUserFlags
      .select(armCol(col("user_id")).as("arm"), col("conv"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    // 2-row pivot via conditional aggregate — no join, no window
    val w = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n_c"),
      max(when(col("arm") === 0, col("x"))).as("x_c"),
      max(when(col("arm") === 1, col("n"))).as("n_t"),
      max(when(col("arm") === 1, col("x"))).as("x_t"))
    val pC = col("x_c").cast("double") / col("n_c")
    val pT = col("x_t").cast("double") / col("n_t")
    val pPool = (col("x_c") + col("x_t")).cast("double") / (col("n_c") + col("n_t"))
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_c") + lit(1.0) / col("n_t")))
    w.select(
      col("n_c"), col("x_c"), col("n_t"), col("x_t"),
      roundN(pC, 6).as("rate_c"), roundN(pT, 6).as("rate_t"),
      roundN((pT - pC) * 100, 4).as("lift_pp"),
      when(se === 0, lit(null).cast("double"))
        .otherwise(roundN((pT - pC) / se, 4)).as("z"))
  }

  private val abtestSql =
    s"""WITH $eventsUs,
       |u AS (SELECT user_id,
       |        max(CASE WHEN event_type = 'purchase' AND value >= $ConvThreshold
       |            THEN 1 ELSE 0 END) AS conv
       |      FROM e GROUP BY 1),
       |a AS (SELECT $armSql AS arm, count(*) AS n,
       |             CAST(sum(conv) AS BIGINT) AS x FROM u GROUP BY 1),
       |w AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n_c,
       |             max(CASE WHEN arm = 0 THEN x END) AS x_c,
       |             max(CASE WHEN arm = 1 THEN n END) AS n_t,
       |             max(CASE WHEN arm = 1 THEN x END) AS x_t FROM a)
       |SELECT n_c, x_c, n_t, x_t,
       |  ${roundNSql("CAST(x_c AS DOUBLE) / n_c", 6)} AS rate_c,
       |  ${roundNSql("CAST(x_t AS DOUBLE) / n_t", 6)} AS rate_t,
       |  ${roundNSql("(CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c) * 100", 4)} AS lift_pp,
       |  CASE WHEN x_c + x_t = 0 OR x_c + x_t = n_c + n_t THEN NULL
       |       ELSE ${roundNSql(
        "(CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c) / " +
          "sqrt((CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)) * (1.0 - CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)) * " +
          "(1.0 / n_c + 1.0 / n_t))", 4)} END AS z
       |FROM w""".stripMargin

  // ----------------------------------------------------------------- power

  /** z quantiles quantized once and inlined into both engines:
    * z_{0.975} (two-sided α = 5%) and z_{0.80} (80% power). */
  val Z975Micro = 1959964L
  val Z80Micro = 841621L

  /** Minimum detectable effect for the running experiment — "is this
    * test big enough": with the observed arm sizes and pooled conversion
    * rate, the smallest true lift (percentage points) detectable at
    * α = 5% two-sided with 80% power, MDE = (z_{α/2}+z_β)·SE(p̄). Reads
    * the same per-user flag aggregate as the z-test; the statistic is a
    * single-row double from exact integers and two quantized literals. */
  def abtestPower(spark: SparkSession, dir: String): DataFrame =
    abtestPowerOf(Tables.events(spark, dir))

  def abtestPowerOf(ev: DataFrame): DataFrame = {
    val perUser = ev
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= ConvThreshold, 1)
        .otherwise(0)).as("conv"))
      .select(armCol(col("user_id")).as("arm"), col("conv"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    val w = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n_c"),
      max(when(col("arm") === 1, col("n"))).as("n_t"),
      sum(col("x")).as("x_all"), sum(col("n")).as("n_all"))
    val pPool = col("x_all").cast("double") / col("n_all")
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_c") + lit(1.0) / col("n_t")))
    val zsum = lit((Z975Micro + Z80Micro).toDouble / 1e6)
    w.select(col("n_c"), col("n_t"),
      roundN(pPool, 6).as("p_pool"),
      roundN(zsum * se * 100, 4).as("mde_pp"))
  }

  private val abtestPowerSql = {
    val pPool = "(CAST(x_all AS DOUBLE) / n_all)"
    val se = s"sqrt($pPool * (1.0 - $pPool) * (1.0 / n_c + 1.0 / n_t))"
    val zsum = (Z975Micro + Z80Micro).toDouble / 1e6
    s"""WITH $eventsUs,
       |u AS (SELECT user_id,
       |        max(CASE WHEN event_type = 'purchase' AND value >= $ConvThreshold
       |            THEN 1 ELSE 0 END) AS conv
       |      FROM e GROUP BY 1),
       |a AS (SELECT $armSql AS arm, count(*) AS n,
       |             CAST(sum(conv) AS BIGINT) AS x FROM u GROUP BY 1),
       |w AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n_c,
       |             max(CASE WHEN arm = 1 THEN n END) AS n_t,
       |             CAST(sum(x) AS BIGINT) AS x_all,
       |             CAST(sum(n) AS BIGINT) AS n_all FROM a)
       |SELECT n_c, n_t,
       |  ${roundNSql(pPool, 6)} AS p_pool,
       |  ${roundNSql(s"$zsum * $se * 100", 4)} AS mde_pp
       |FROM w""".stripMargin
  }

  // -------------------------------------------------------------- survival

  /** Kaplan-Meier time-to-conversion curve: per user, days from first
    * sighting to the first big-ticket purchase (value ≥ ConvThreshold —
    * the abtest conversion event); users who never convert are
    * right-censored at the corpus horizon. ("Days to churn" is the
    * textbook framing, but this corpus keeps every user active to the
    * horizon — zero churn events at every SF — so conversion is the
    * event that actually produces a curve.) S(t) multiplies (1 − d/n)
    * over event times ≤ t; the product rides a cumulative sum of
    * micro-quantized ln terms so both engines agree bit-for-bit, and a
    * cumulative absorbed flag pins S = 0 past any time where the whole
    * risk set converts.
    *
    * Scale shape: user-sized work is ONE conditional keyed aggregate;
    * the only window runs over DISTINCT day values — bounded by the
    * calendar horizon, the whitelisted q_stats_quantiles class. */
  def survival(spark: SparkSession, dir: String): DataFrame =
    survivalOf(Tables.events(spark, dir))

  /** (arm, lifetime_days, event) time-to-conversion base shared by the
    * KM curve and the log-rank test. */
  private def timeToConv(ev: DataFrame): DataFrame = {
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("f"),
        min(when(col("event_type") === "purchase" && col("value") >= ConvThreshold,
          to_date(col("ts")))).as("conv"))
    val horizon = ev.agg(max(to_date(col("ts"))).as("hz"))
    perUser.crossJoin(broadcast(horizon))
      .select(armCol(col("user_id")).as("arm"),
        when(col("conv").isNotNull, datediff(col("conv"), col("f")))
          .otherwise(datediff(col("hz"), col("f"))).cast("long").as("lifetime_days"),
        when(col("conv").isNotNull, 1L).otherwise(0L).as("churn"))
  }

  private val timeToConvSql =
    s"""u AS (SELECT user_id, min(CAST(ts AS DATE)) AS f,
       |        min(CASE WHEN event_type = 'purchase' AND value >= $ConvThreshold
       |                 THEN CAST(ts AS DATE) END) AS conv
       |      FROM e GROUP BY 1),
       |hz AS (SELECT max(CAST(ts AS DATE)) AS hz FROM e),
       |lv AS (SELECT $armSql AS arm,
       |         CAST(CASE WHEN conv IS NOT NULL THEN date_diff('day', f, conv)
       |              ELSE date_diff('day', f, hz) END AS BIGINT) AS lifetime_days,
       |         CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS churn
       |       FROM u CROSS JOIN hz)""".stripMargin

  def survivalOf(ev: DataFrame): DataFrame = {
    val hist = timeToConv(ev).groupBy(col("lifetime_days"))
      .agg(count(lit(1)).as("leave"), sum(col("churn")).as("d"))
    val win = Window.orderBy(col("lifetime_days"))
    val total = hist.agg(sum(col("leave")).as("n_users"))
    val cum = hist
      .withColumn("left_before",
        coalesce(sum(col("leave")).over(win.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("n_risk", col("n_users") - col("left_before"))
      // micro-quantized ln(1 - d/n); NULL marks an absorbing (d = n) step
      .withColumn("qln", when(col("d") < col("n_risk"),
        floor(log((col("n_risk") - col("d")).cast("double") / col("n_risk")) * 1e6 + 0.5)
          .cast("long")))
      .withColumn("absorbed", max(when(col("qln").isNull, 1).otherwise(0)).over(win))
      .withColumn("s", sum(coalesce(col("qln"), lit(0L))).over(win))
    cum.select(col("lifetime_days").cast("long").as("lifetime_days"),
      col("n_risk"), col("d").as("n_events"),
      when(col("absorbed") === 1, lit(0.0))
        .otherwise(roundN(exp(col("s").cast("double") / 1e6), 6)).as("survival"))
  }

  private val survivalSql =
    s"""WITH $eventsUs,
       |$timeToConvSql,
       |h AS (SELECT lifetime_days, count(*) AS leave, sum(churn) AS d
       |      FROM lv GROUP BY 1),
       |c AS (SELECT lifetime_days, leave, d,
       |        coalesce(sum(leave) OVER (ORDER BY lifetime_days
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS left_before,
       |        sum(leave) OVER () AS n_users
       |      FROM h),
       |q AS (SELECT lifetime_days, d, n_users - left_before AS n_risk,
       |        CASE WHEN d < n_users - left_before
       |             THEN CAST(floor(ln(CAST(n_users - left_before - d AS DOUBLE)
       |                  / (n_users - left_before)) * 1e6 + 0.5) AS BIGINT) END AS qln
       |      FROM c),
       |s AS (SELECT lifetime_days, n_risk, d,
       |        max(CASE WHEN qln IS NULL THEN 1 ELSE 0 END)
       |          OVER (ORDER BY lifetime_days) AS absorbed,
       |        sum(coalesce(qln, 0)) OVER (ORDER BY lifetime_days) AS s
       |      FROM q)
       |SELECT lifetime_days, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_events,
       |  CASE WHEN absorbed = 1 THEN 0.0
       |       ELSE ${roundNSql("exp(CAST(s AS DOUBLE) / 1e6)", 6)} END AS survival
       |FROM s""".stripMargin

  // --------------------------------------------------------------- logrank

  /** Log-rank test between the two arms' time-to-conversion curves —
    * "does the treatment speed up conversion", the standard sequel to the
    * Kaplan-Meier plot. At every event time t: observed arm-1 events d1_t vs expected
    * E1_t = d·n1/n under H0, with hypergeometric variance
    * V_t = d·(n1/n)·(1−n1/n)·(n−d)/(n−1); χ² = (Σ(d1−E1))²/ΣV.
    *
    * Exactness: E1 and V are rationals of exact integers; each term is
    * quantized to integer micro-units BEFORE the sum (the engine's
    * standard transcendental-sum rule — here it guards float ADDITION
    * order, same reason), so both engines sum identical integers and χ²
    * is one final division. Risk sets come from per-arm cumulative
    * windows over the DISTINCT-lifetime grid (calendar-bounded,
    * partitioned by arm). */
  def logrank(spark: SparkSession, dir: String): DataFrame =
    logrankOf(Tables.events(spark, dir))

  def logrankOf(ev: DataFrame): DataFrame = {
    val hist = timeToConv(ev)
      .withColumnRenamed("lifetime_days", "t")
      .groupBy(col("arm"), col("t"))
      .agg(count(lit(1)).as("leave"), sum(col("churn")).as("d"))
    // full (t × arm) grid so per-arm cumulative risk sets line up
    val grid = hist.select(col("t")).distinct()
      .select(col("t"), explode(array(lit(0), lit(1))).as("arm"))
      .join(hist, Seq("arm", "t"), "left_outer")
      .select(col("arm"), col("t"),
        coalesce(col("leave"), lit(0L)).as("leave"),
        coalesce(col("d"), lit(0L)).as("d"))
    val byArm = Window.partitionBy(col("arm")).orderBy(col("t"))
    val risk = grid
      .withColumn("left_before",
        coalesce(sum(col("leave")).over(byArm.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("total_arm",
        sum(col("leave")).over(Window.partitionBy(col("arm"))))
      .withColumn("at_risk", col("total_arm") - col("left_before"))
    val perT = risk.groupBy(col("t")).agg(
      sum(col("d")).as("d"),
      sum(col("at_risk")).as("n"),
      max(when(col("arm") === 1, col("at_risk"))).as("n1"),
      max(when(col("arm") === 1, col("d"))).as("d1"))
      .filter(col("d") > 0 && col("n") > 1)
    val e1 = col("d").cast("double") * col("n1") / col("n")
    val p1 = col("n1").cast("double") / col("n")
    val v = col("d").cast("double") * p1 * (lit(1.0) - p1) *
      (col("n") - col("d")) / (col("n") - lit(1))
    val terms = perT.select(
      col("d1"),
      floor(e1 * 1e6 + 0.5).cast("long").as("qe1"),
      floor(v * 1e6 + 0.5).cast("long").as("qv"))
    terms.agg(
      sum(col("d1")).as("o1"),
      (sum(col("qe1")).cast("double") / 1e6).as("e1"),
      (sum(col("qv")).cast("double") / 1e6).as("v"))
      .select(col("o1"), roundN(col("e1"), 4).as("e1"),
        roundN((col("o1") - col("e1")) * (col("o1") - col("e1")) / col("v"), 4)
          .as("chi2"))
  }

  private val logrankSql =
    s"""WITH $eventsUs,
       |$timeToConvSql,
       |h AS (SELECT arm, lifetime_days AS t, count(*) AS leave,
       |        CAST(sum(churn) AS BIGINT) AS d
       |      FROM lv GROUP BY 1, 2),
       |grid AS (SELECT a.arm, tt.t,
       |           coalesce(h.leave, 0) AS leave, coalesce(h.d, 0) AS d
       |         FROM (SELECT DISTINCT t FROM h) tt
       |         CROSS JOIN (SELECT 0 AS arm UNION ALL SELECT 1) a
       |         LEFT JOIN h ON h.arm = a.arm AND h.t = tt.t),
       |risk AS (SELECT arm, t, d,
       |           coalesce(sum(leave) OVER (PARTITION BY arm ORDER BY t
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS left_before,
       |           sum(leave) OVER (PARTITION BY arm) AS total_arm
       |         FROM grid),
       |pt AS (SELECT t, CAST(sum(d) AS BIGINT) AS d,
       |         CAST(sum(total_arm - left_before) AS BIGINT) AS n,
       |         CAST(max(CASE WHEN arm = 1 THEN total_arm - left_before END) AS BIGINT) AS n1,
       |         CAST(max(CASE WHEN arm = 1 THEN d END) AS BIGINT) AS d1
       |       FROM risk GROUP BY 1
       |       HAVING sum(d) > 0 AND CAST(sum(total_arm - left_before) AS BIGINT) > 1),
       |q AS (SELECT d1,
       |        CAST(floor(CAST(d AS DOUBLE) * n1 / n * 1e6 + 0.5) AS BIGINT) AS qe1,
       |        CAST(floor(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n)
       |          * (1.0 - CAST(n1 AS DOUBLE) / n) * (n - d) / (n - 1) * 1e6 + 0.5)
       |          AS BIGINT) AS qv
       |      FROM pt),
       |s AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
       |        CAST(sum(qe1) AS DOUBLE) / 1e6 AS e1,
       |        CAST(sum(qv) AS DOUBLE) / 1e6 AS v
       |      FROM q)
       |SELECT o1, ${roundNSql("e1", 4)} AS e1,
       |  ${roundNSql("(o1 - e1) * (o1 - e1) / v", 4)} AS chi2
       |FROM s""".stripMargin

  // ----------------------------------------------------------------- welch

  /** Welch's unequal-variance t between the two arms' purchase values.
    * Per-arm n / Σcents / Σcents² are exact order-free BIGINTs; mean,
    * sample variance, t, and the Welch–Satterthwaite df are then a
    * single-row double computation written token-identically in both
    * engines. Σ is cast to DOUBLE before squaring so the statistic stays
    * engine-identical (exact while Σcents < 2^53 ≈ $90T) instead of
    * silently wrapping BIGINT on one side only. */
  def welch(spark: SparkSession, dir: String): DataFrame =
    welchOf(Tables.events(spark, dir))

  def welchOf(ev: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val arms = ev.filter(col("event_type") === "purchase")
      .select(armCol(col("user_id")).as("arm"), cents.as("c"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"), sum(col("c") * col("c")).as("s2"))
    val w = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n_c"),
      max(when(col("arm") === 0, col("s"))).as("s_c"),
      max(when(col("arm") === 0, col("s2"))).as("s2_c"),
      max(when(col("arm") === 1, col("n"))).as("n_t"),
      max(when(col("arm") === 1, col("s"))).as("s_t"),
      max(when(col("arm") === 1, col("s2"))).as("s2_t"))
    def mean(s: Column, n: Column) = s.cast("double") / n
    def variance(s: Column, s2: Column, n: Column) =
      (s2.cast("double") - s.cast("double") * s.cast("double") / n) / (n - lit(1))
    val (mC, mT) = (mean(col("s_c"), col("n_c")), mean(col("s_t"), col("n_t")))
    val vC = variance(col("s_c"), col("s2_c"), col("n_c"))
    val vT = variance(col("s_t"), col("s2_t"), col("n_t"))
    val seC = vC / col("n_c")
    val seT = vT / col("n_t")
    val t = (mT - mC) / sqrt(seC + seT)
    val df = (seC + seT) * (seC + seT) /
      (seC * seC / (col("n_c") - lit(1)) + seT * seT / (col("n_t") - lit(1)))
    w.select(col("n_c"), col("n_t"),
      roundN(mC / 100, 4).as("mean_c"), roundN(mT / 100, 4).as("mean_t"),
      roundN(t, 4).as("t_stat"), roundN(df, 2).as("df"))
  }

  private val welchSql = {
    val mC = "(CAST(s_c AS DOUBLE) / n_c)"
    val mT = "(CAST(s_t AS DOUBLE) / n_t)"
    val vC = "((CAST(s2_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / n_c) / (n_c - 1))"
    val vT = "((CAST(s2_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / n_t) / (n_t - 1))"
    val seC = s"($vC / n_c)"
    val seT = s"($vT / n_t)"
    s"""WITH $eventsUs,
       |p AS (SELECT $armSql AS arm,
       |             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase'),
       |a AS (SELECT arm, count(*) AS n, sum(c) AS s, sum(c * c) AS s2 FROM p GROUP BY 1),
       |w AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n_c,
       |             max(CASE WHEN arm = 0 THEN s END) AS s_c,
       |             max(CASE WHEN arm = 0 THEN s2 END) AS s2_c,
       |             max(CASE WHEN arm = 1 THEN n END) AS n_t,
       |             max(CASE WHEN arm = 1 THEN s END) AS s_t,
       |             max(CASE WHEN arm = 1 THEN s2 END) AS s2_t FROM a)
       |SELECT n_c, n_t,
       |  ${roundNSql(s"$mC / 100", 4)} AS mean_c,
       |  ${roundNSql(s"$mT / 100", 4)} AS mean_t,
       |  ${roundNSql(s"($mT - $mC) / sqrt($seC + $seT)", 4)} AS t_stat,
       |  ${roundNSql(
        s"($seC + $seT) * ($seC + $seT) / ($seC * $seC / (n_c - 1) + $seT * $seT / (n_t - 1))",
        2)} AS df
       |FROM w""".stripMargin
  }

  // --------------------------------------------------------------- benford

  /** Benford's-law first significant digit p_d = log10(1 + 1/d), quantized
    * to 1e-6 once here and inlined as literals into BOTH engines so the
    * expectation is identical by construction. */
  private val BenfordMicro: Map[Int, Long] =
    (1 to 9).map(d => d -> math.round(math.log10(1.0 + 1.0 / d) * 1e6)).toMap

  /** First-digit Benford audit of lineitem prices — the classic financial
    * anomaly screen. One narrow map (first char of the integer part) into
    * a 9-key aggregate; observed share and the χ² contribution against the
    * quantized Benford expectation are per-digit doubles computed from
    * exact integers. TPC-H prices are range-bound (≈ 900..105k) so this
    * REJECTS Benford by construction — the audit's honest output, and why
    * the statistic, not a verdict, is the column. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val digit = substring(floor(col("l_extendedprice")).cast("long").cast("string"), 1, 1)
      .cast("int")
    val obs = Tables.lineitem(spark, dir)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val pMicro = BenfordMicro.foldLeft(lit(null).cast("long")) { case (acc, (d, p)) =>
      when(col("digit") === d, lit(p)).otherwise(acc)
    }
    val total = obs.agg(sum(col("n_obs")).as("n"))
    val exp_ = col("n").cast("double") * col("p_micro") / 1e6
    obs.withColumn("p_micro", pMicro)
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        roundN(col("n_obs").cast("double") / col("n"), 6).as("obs_share"),
        roundN(col("p_micro").cast("double") / 1e6, 6).as("benford_share"),
        roundN((col("n_obs") - exp_) * (col("n_obs") - exp_) / exp_, 4).as("chi2_contrib"))
  }

  private val benfordSql = {
    val pCase = (1 to 9)
      .map(d => s"WHEN digit = $d THEN ${BenfordMicro(d)}")
      .mkString("CASE ", " ", " END")
    s"""WITH o AS (
       |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
       |         count(*) AS n_obs
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT sum(n_obs) AS n FROM o),
       |x AS (SELECT digit, n_obs, $pCase AS p_micro, n FROM o CROSS JOIN t)
       |SELECT digit, n_obs,
       |  ${roundNSql("CAST(n_obs AS DOUBLE) / n", 6)} AS obs_share,
       |  ${roundNSql("CAST(p_micro AS DOUBLE) / 1e6", 6)} AS benford_share,
       |  ${roundNSql(
        "(n_obs - CAST(n AS DOUBLE) * p_micro / 1e6) * (n_obs - CAST(n AS DOUBLE) * p_micro / 1e6) " +
          "/ (CAST(n AS DOUBLE) * p_micro / 1e6)", 4)} AS chi2_contrib
       |FROM x""".stripMargin
  }

  // ------------------------------------------------------------- bootstrap

  /** Replicate count for the Poisson bootstrap. */
  val BootstrapB = 40

  /** Poisson(1) CDF thresholds on the 20-bit uniform scale (the md5
    * 5-hex-digit draw is uniform on [0, 2^20)): a row's replicate weight
    * is the number of thresholds its draw reaches (capped at the table's
    * length — P(w > 6) < 1e-4). Quantized ONCE here, inlined into both
    * engines, so no division ever touches the draw. */
  val PoissonCdf20: IndexedSeq[Long] = {
    val e1 = math.exp(-1.0)
    // cumulative e^-1 * (1 + 1 + 1/2 + 1/6 + 1/24 + 1/120 + 1/720)
    val cum = Iterator.iterate(1.0 -> 0)( { case (term, k) => term / (k + 1) -> (k + 1) })
      .take(7).map(_._1).scanLeft(0.0)(_ + _).drop(1)
    cum.map(c => math.round(c * e1 * 1048576.0)).toIndexedSeq
  }

  /** Poisson-bootstrap 95% CI for the mean purchase value — the
    * scale-out bootstrap: instead of resampling n rows with replacement
    * (impossible to coordinate across a cluster), every row draws an
    * INDEPENDENT Poisson(1) weight per replicate from md5(event_id:b),
    * giving each replicate a multinomial-in-the-limit resample without
    * any shuffle of the data. Replicate means are ratios of exact
    * integer sums; the CI picks type-1 order statistics over the B
    * replicate means (a B-row sort, B = 40 by construction).
    *
    * Scale shape: the corpus-sized pass is ONE explode by the constant B
    * (the DAU contribution trick's bounded-fanout pattern) into a B-key
    * aggregate; everything after runs on B rows. */
  def bootstrap(spark: SparkSession, dir: String): DataFrame =
    bootstrapOf(Tables.events(spark, dir))

  def bootstrapOf(ev: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val rows = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), cents.as("c"))
      .select(col("event_id"), col("c"),
        explode(sequence(lit(0), lit(BootstrapB - 1))).as("b"))
    val u20 = conv(substring(md5(concat_ws(":",
      col("event_id").cast("string"), col("b").cast("string"))), 1, 5), 16, 10)
      .cast("long")
    val weight = PoissonCdf20.foldLeft(lit(0)) { (acc, thr) =>
      acc + when(col("u") >= thr, 1).otherwise(0)
    }
    val reps = rows.withColumn("u", u20)
      .select(col("b"), col("c"), weight.as("w"))
      .groupBy(col("b"))
      .agg(sum(col("w").cast("long") * col("c")).as("wc"), sum(col("w")).cast("long").as("wn"))
      .filter(col("wn") > 0)
      .select((col("wc").cast("double") / col("wn")).as("m"))
    val win = Window.orderBy(col("m"))
    val ranked = reps.withColumn("r", row_number().over(win))
      .crossJoin(broadcast(reps.agg(count(lit(1)).as("nb"))))
    val point = ev.filter(col("event_type") === "purchase")
      .agg((sum(cents).cast("double") / count(lit(1)) / 100.0).as("mean_value"))
    val ci = ranked.agg(
      max(when(col("r") === ceil(lit(0.025) * col("nb")).cast("int"), col("m"))).as("lo_c"),
      max(when(col("r") === ceil(lit(0.975) * col("nb")).cast("int"), col("m"))).as("hi_c"),
      max(col("nb")).as("n_replicates"))
    point.crossJoin(broadcast(ci))
      .select(roundN(col("mean_value"), 4).as("mean_value"),
        roundN(col("lo_c") / 100.0, 4).as("ci_lo"),
        roundN(col("hi_c") / 100.0, 4).as("ci_hi"),
        col("n_replicates"))
  }

  private val bootstrapSql = {
    val thrSum = PoissonCdf20
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $eventsUs,
       |p AS (SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase'),
       |x AS (SELECT event_id, c, unnest(range(0, $BootstrapB)) AS b FROM p),
       |uu AS (SELECT b, c,
       |        ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 5))::BIGINT AS u
       |       FROM x),
       |w AS (SELECT b, c, $thrSum AS w FROM uu),
       |reps AS (SELECT CAST(sum(w * c) AS DOUBLE) / sum(w) AS m
       |         FROM w GROUP BY b HAVING sum(w) > 0),
       |rk AS (SELECT m, row_number() OVER (ORDER BY m) AS r, count(*) OVER () AS nb
       |       FROM reps),
       |ci AS (SELECT max(CASE WHEN r = CAST(ceil(0.025 * nb) AS INT) THEN m END) AS lo_c,
       |              max(CASE WHEN r = CAST(ceil(0.975 * nb) AS INT) THEN m END) AS hi_c,
       |              max(nb) AS n_replicates FROM rk),
       |pt AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) / 100.0 AS mean_value FROM p)
       |SELECT ${roundNSql("mean_value", 4)} AS mean_value,
       |  ${roundNSql("lo_c / 100.0", 4)} AS ci_lo,
       |  ${roundNSql("hi_c / 100.0", 4)} AS ci_hi,
       |  CAST(n_replicates AS BIGINT) AS n_replicates
       |FROM pt CROSS JOIN ci""".stripMargin
  }

  // ----------------------------------------------------------------- cuped

  /** CUPED variance-reduced A/B comparison (Deng et al., the standard
    * big-tech experimentation adjustment): per user, the PRE-period
    * purchase spend X (events before the calendar midpoint) predicts the
    * EXPERIMENT-period spend Y; regressing Y on X pooled across arms
    * (θ = cov(X,Y)/var(X)) and reporting the θ-adjusted arm means cuts
    * metric variance by corr² without biasing the lift (assignment is
    * independent of X).
    *
    * Exactness: the calendar midpoint is integer epoch-micros arithmetic
    * on a 1-row broadcast; X/Y are exact per-user integer cents from ONE
    * conditional keyed aggregate; the five pooled sufficient statistics
    * (n, ΣX, ΣY, ΣXY, ΣX²) and the per-arm sums are exact BIGINTs
    * (product budget: per-user cents < 2^31.5 ≈ $21M each side), so θ,
    * the adjusted means, and the variance-reduction ratio are single-row
    * double computations written token-identically in both engines.
    *
    * Scale shape: one user-keyed aggregate + two single-row frames —
    * nothing after the per-user collapse depends on event volume. */
  def cuped(spark: SparkSession, dir: String): DataFrame =
    cupedOf(Tables.events(spark, dir))

  def cupedOf(ev: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val us = unix_micros(col("ts"))
    val mid = ev.agg(floor((min(us) + max(us)) / lit(2L)).cast("long").as("mid_us"))
    val perUser = ev
      .crossJoin(broadcast(mid))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        sum(when(us < col("mid_us"), cents).otherwise(0L)).as("x"),
        sum(when(us >= col("mid_us"), cents).otherwise(0L)).as("y"))
      .select(armCol(col("user_id")).as("arm"), col("x"), col("y"))
    val pooled = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("an"), sum(col("x")).as("ax"), sum(col("y")).as("ay"))
    val w = arms.agg(
      max(when(col("arm") === 0, col("an"))).as("n_c"),
      max(when(col("arm") === 0, col("ax"))).as("x_c"),
      max(when(col("arm") === 0, col("ay"))).as("y_c"),
      max(when(col("arm") === 1, col("an"))).as("n_t"),
      max(when(col("arm") === 1, col("ax"))).as("x_t"),
      max(when(col("arm") === 1, col("ay"))).as("y_t"))
      .crossJoin(broadcast(pooled))
    def m(s: Column, n: Column) = s.cast("double") / n
    val covXY = (col("sxy").cast("double") - col("sx").cast("double") * col("sy") / col("n")) / col("n")
    val varX = (col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n")) / col("n")
    val varY = (col("syy").cast("double") - col("sy").cast("double") * col("sy") / col("n")) / col("n")
    val theta = covXY / varX
    val mxAll = m(col("sx"), col("n"))
    val adjC = m(col("y_c"), col("n_c")) - theta * (m(col("x_c"), col("n_c")) - mxAll)
    val adjT = m(col("y_t"), col("n_t")) - theta * (m(col("x_t"), col("n_t")) - mxAll)
    w.select(col("n_c"), col("n_t"),
      roundN(m(col("y_c"), col("n_c")) / 100, 4).as("mean_c_raw"),
      roundN(m(col("y_t"), col("n_t")) / 100, 4).as("mean_t_raw"),
      roundN(adjC / 100, 4).as("mean_c_adj"),
      roundN(adjT / 100, 4).as("mean_t_adj"),
      roundN((adjT - adjC) / 100, 4).as("lift_adj"),
      roundN(theta, 6).as("theta"),
      roundN(covXY * covXY / (varX * varY), 6).as("var_reduction"))
  }

  private val cupedSql = {
    val covXY = "((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / n)"
    val varX = "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n)"
    val varY = "((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n)"
    val theta = s"($covXY / $varX)"
    val mxAll = "(CAST(sx AS DOUBLE) / n)"
    val adjC = s"(CAST(y_c AS DOUBLE) / n_c - $theta * (CAST(x_c AS DOUBLE) / n_c - $mxAll))"
    val adjT = s"(CAST(y_t AS DOUBLE) / n_t - $theta * (CAST(x_t AS DOUBLE) / n_t - $mxAll))"
    s"""WITH $eventsUs,
       |mid AS (SELECT CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2) AS BIGINT) AS mid_us
       |        FROM e),
       |u AS (SELECT user_id,
       |        CAST(sum(CASE WHEN epoch_us(ts) < mid_us
       |                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
       |        CAST(sum(CASE WHEN epoch_us(ts) >= mid_us
       |                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
       |      FROM e CROSS JOIN mid WHERE event_type = 'purchase'
       |      GROUP BY 1),
       |ua AS (SELECT $armSql AS arm, x, y FROM u),
       |pooled AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
       |             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
       |           FROM ua),
       |arms AS (SELECT arm, count(*) AS an, CAST(sum(x) AS BIGINT) AS ax,
       |           CAST(sum(y) AS BIGINT) AS ay FROM ua GROUP BY 1),
       |w AS (SELECT max(CASE WHEN arm = 0 THEN an END) AS n_c,
       |             max(CASE WHEN arm = 0 THEN ax END) AS x_c,
       |             max(CASE WHEN arm = 0 THEN ay END) AS y_c,
       |             max(CASE WHEN arm = 1 THEN an END) AS n_t,
       |             max(CASE WHEN arm = 1 THEN ax END) AS x_t,
       |             max(CASE WHEN arm = 1 THEN ay END) AS y_t
       |      FROM arms)
       |SELECT n_c, n_t,
       |  ${roundNSql("CAST(y_c AS DOUBLE) / n_c / 100", 4)} AS mean_c_raw,
       |  ${roundNSql("CAST(y_t AS DOUBLE) / n_t / 100", 4)} AS mean_t_raw,
       |  ${roundNSql(s"$adjC / 100", 4)} AS mean_c_adj,
       |  ${roundNSql(s"$adjT / 100", 4)} AS mean_t_adj,
       |  ${roundNSql(s"($adjT - $adjC) / 100", 4)} AS lift_adj,
       |  ${roundNSql(theta, 6)} AS theta,
       |  ${roundNSql(s"$covXY * $covXY / ($varX * $varY)", 6)} AS var_reduction
       |FROM w CROSS JOIN pooled""".stripMargin
  }

  /** Multi-arm (A/B/n, k = 3) conversion χ² — the k×2 contingency test
    * that generalizes [[abtest]]'s two-proportion z: deterministic md5
    * arms mod 3, big-ticket conversion flags, χ² = Σ (O−E)²/E over the
    * six cells with E from the margins.
    *
    * Scale: one user-keyed aggregate then ONE 6-integer grand
    * aggregate; the χ² is a FIXED expression tree over those exact
    * BIGINTs (literal cell order, no aggregate over float terms), so
    * both engines evaluate the identical IEEE sequence. Degenerate
    * margins (an empty arm or 0/100% pooled conversion) → NULL. */
  def abn(spark: SparkSession, dir: String): DataFrame = {
    val arm3 = conv(substring(md5(col("user_id").cast("string")), 1, 2), 16, 10)
      .cast("int") % 3
    val u = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= ConvThreshold, 1L)
        .otherwise(0L)).as("conv"))
      .select(arm3.as("arm"), col("conv"))
    val g = u.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x1"),
      sum(when(col("arm") === 2, 1L).otherwise(0L)).as("n2"),
      sum(when(col("arm") === 2, col("conv")).otherwise(0L)).as("x2"))
    val nTot = col("n0") + col("n1") + col("n2")
    val xTot = col("x0") + col("x1") + col("x2")
    def term(n: org.apache.spark.sql.Column, o: org.apache.spark.sql.Column,
        colTot: org.apache.spark.sql.Column) = {
      val e = n.cast("double") * colTot.cast("double") / nTot.cast("double")
      (o.cast("double") - e) * (o.cast("double") - e) / e
    }
    val chi2 =
      term(col("n0"), col("x0"), xTot) + term(col("n0"), col("n0") - col("x0"), nTot - xTot) +
        term(col("n1"), col("x1"), xTot) + term(col("n1"), col("n1") - col("x1"), nTot - xTot) +
        term(col("n2"), col("x2"), xTot) + term(col("n2"), col("n2") - col("x2"), nTot - xTot)
    val degenerate = col("n0") === 0L || col("n1") === 0L || col("n2") === 0L ||
      xTot === 0L || xTot === nTot
    g.select(col("n0"), col("x0"), col("n1"), col("x1"), col("n2"), col("x2"),
      when(degenerate, lit(null).cast("double")).otherwise(roundN(chi2, 6)).as("chi2"),
      lit(2).as("df"),
      when(degenerate, lit(null).cast("boolean"))
        .otherwise(chi2 > 5.991465).as("significant"))
  }

  private val abnSql = {
    def term(n: String, o: String, colTot: String) =
      s"((CAST($o AS DOUBLE) - CAST($n AS DOUBLE) * CAST($colTot AS DOUBLE) / CAST(nt AS DOUBLE)) * " +
        s"(CAST($o AS DOUBLE) - CAST($n AS DOUBLE) * CAST($colTot AS DOUBLE) / CAST(nt AS DOUBLE)) / " +
        s"(CAST($n AS DOUBLE) * CAST($colTot AS DOUBLE) / CAST(nt AS DOUBLE)))"
    val chi2 =
      s"(${term("n0", "x0", "xt")} + ${term("n0", "(n0 - x0)", "(nt - xt)")} + " +
        s"${term("n1", "x1", "xt")} + ${term("n1", "(n1 - x1)", "(nt - xt)")} + " +
        s"${term("n2", "x2", "xt")} + ${term("n2", "(n2 - x2)", "(nt - xt)")})"
    s"""WITH $eventsUs,
       |u AS (SELECT user_id,
       |        (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::INT % 3) AS arm,
       |        max(CASE WHEN event_type = 'purchase' AND value >= $ConvThreshold
       |            THEN 1 ELSE 0 END) AS conv
       |      FROM e GROUP BY 1, 2),
       |g AS (SELECT
       |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |        CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0,
       |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |        CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1,
       |        CAST(sum(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |        CAST(sum(CASE WHEN arm = 2 THEN conv ELSE 0 END) AS BIGINT) AS x2
       |      FROM u),
       |m AS (SELECT *, n0 + n1 + n2 AS nt, x0 + x1 + x2 AS xt FROM g)
       |SELECT n0, x0, n1, x1, n2, x2,
       |  CASE WHEN n0 = 0 OR n1 = 0 OR n2 = 0 OR xt = 0 OR xt = nt THEN NULL
       |       ELSE ${roundNSql(chi2, 6)} END AS chi2,
       |  2 AS df,
       |  CASE WHEN n0 = 0 OR n1 = 0 OR n2 = 0 OR xt = 0 OR xt = nt THEN NULL
       |       ELSE $chi2 > 5.991465 END AS significant
       |FROM m""".stripMargin
  }

  /** Continuous-metric MDE — the [[abtestPower]] companion for MEAN
    * purchase value rather than conversion rate: with the observed arm
    * sizes and the pooled per-purchase variance (exact Σcents/Σcents²,
    * the [[welchOf]] sufficient statistics), the smallest true
    * mean-difference in dollars detectable at α = 5% two-sided with 80%
    * power: MDE = (z_{α/2}+z_β)·√(s²_pool·(1/n_c + 1/n_t)). One keyed
    * aggregate + a single-row computation; degenerate arms → NULL. */
  def powerContinuous(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val arms = Tables.events(spark, dir).filter(col("event_type") === "purchase")
      .select(armCol(col("user_id")).as("arm"), cents.as("c"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"), sum(col("c") * col("c")).as("s2"))
    val w = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n_c"),
      max(when(col("arm") === 0, col("s"))).as("s_c"),
      max(when(col("arm") === 0, col("s2"))).as("s2_c"),
      max(when(col("arm") === 1, col("n"))).as("n_t"),
      max(when(col("arm") === 1, col("s"))).as("s_t"),
      max(when(col("arm") === 1, col("s2"))).as("s2_t"))
    // pooled variance: (SS_c + SS_t) / (n_c + n_t − 2), SS from exact sums
    def ss(s: Column, s2: Column, n: Column) =
      s2.cast("double") - s.cast("double") * s.cast("double") / n
    val vPool = (ss(col("s_c"), col("s2_c"), col("n_c")) +
      ss(col("s_t"), col("s2_t"), col("n_t"))) /
      (col("n_c") + col("n_t") - lit(2))
    val zsum = lit((Z975Micro + Z80Micro).toDouble / 1e6)
    val mde = zsum * sqrt(vPool * (lit(1.0) / col("n_c") + lit(1.0) / col("n_t")))
    w.select(col("n_c"), col("n_t"),
      when(col("n_c") < 2L || col("n_t") < 2L, lit(null).cast("double"))
        .otherwise(roundN(sqrt(vPool) / 100.0, 4)).as("sd_pooled"),
      when(col("n_c") < 2L || col("n_t") < 2L, lit(null).cast("double"))
        .otherwise(roundN(mde / 100.0, 4)).as("mde_dollars"))
  }

  private val powerContinuousSql = {
    val zsum = s"(CAST(${Z975Micro + Z80Micro} AS DOUBLE) / 1e6)"
    val vPool = "((CAST(s2_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / n_c) + " +
      "(CAST(s2_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / n_t)) / (n_c + n_t - 2)"
    s"""WITH $eventsUs,
       |p AS (SELECT $armSql AS arm, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |      FROM e WHERE event_type = 'purchase'),
       |a AS (SELECT arm, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
       |        CAST(sum(c * c) AS BIGINT) AS s2 FROM p GROUP BY 1),
       |w AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n_c,
       |        max(CASE WHEN arm = 0 THEN s END) AS s_c,
       |        max(CASE WHEN arm = 0 THEN s2 END) AS s2_c,
       |        max(CASE WHEN arm = 1 THEN n END) AS n_t,
       |        max(CASE WHEN arm = 1 THEN s END) AS s_t,
       |        max(CASE WHEN arm = 1 THEN s2 END) AS s2_t FROM a)
       |SELECT n_c, n_t,
       |  CASE WHEN n_c < 2 OR n_t < 2 THEN NULL
       |       ELSE ${roundNSql(s"sqrt($vPool) / 100.0", 4)} END AS sd_pooled,
       |  CASE WHEN n_c < 2 OR n_t < 2 THEN NULL
       |       ELSE ${roundNSql(
        s"$zsum * sqrt($vPool * (1.0 / n_c + 1.0 / n_t)) / 100.0", 4)} END AS mde_dollars
       |FROM w""".stripMargin
  }

  // ---------------------------------------------------------------- bh-fdr

  /** Benjamini-Hochberg FDR level, as nano-units of p (q = 0.05). */
  val FdrQNano = 50000000L

  /** Multiple-testing control for the metric dashboard: one Welch z-test
    * per EVENT TYPE (does the treatment arm change how often users fire
    * that event?), then the Benjamini-Hochberg step-up at FDR q = 0.05
    * decides which metrics survive — the guard every real experimentation
    * platform puts between "5 metrics moved" and "ship it" (Benjamini &
    * Hochberg 1995).
    *
    * Exactness: per-user counts are exact integers (users missing a type
    * contribute 0 — their zero adds nothing to Σx/Σx², so only the arm
    * DENOMINATOR needs the separate all-users aggregate); z is a fixed
    * double expression over those integers. The normal tail probability
    * uses the Zelen-Severo polynomial (A&S 26.2.17) written
    * token-identically in both engines, and p is quantized to integer
    * NANO-units before the BH comparison — `p_nano·m ≤ k·q·1e9` is then
    * pure BIGINT arithmetic, so the reject set can never differ by a
    * float ulp. Degenerate tests (an arm under 2 users or zero pooled
    * variance) carry NULL p and sort after every real p (pinned NULLS
    * LAST both engines), never rejected.
    *
    * Scale shape: user-sized work is two keyed aggregates (per-user-type
    * counts, distinct arm sizes); everything after is one row per EVENT
    * TYPE — an instrumentation enum, bounded by the product's schema, not
    * by data volume. The rank window over that enum-sized table is the
    * whitelisted bounded-input shape; the step-up cutoff is a 1-row grand
    * aggregate broadcast back. */
  def bhFdr(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val armN = ev.select(col("user_id")).distinct()
      .select(armCol(col("user_id")).as("arm"))
      .groupBy(col("arm")).agg(count(lit(1)).as("n"))
      .agg(
        max(when(col("arm") === 0, col("n"))).as("n_c"),
        max(when(col("arm") === 1, col("n"))).as("n_t"))
    val perType = ev
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("x"))
      .select(col("event_type"), armCol(col("user_id")).as("arm"), col("x"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sx_c"),
        sum(when(col("arm") === 0, col("x") * col("x")).otherwise(0L)).as("sxx_c"),
        sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx_t"),
        sum(when(col("arm") === 1, col("x") * col("x")).otherwise(0L)).as("sxx_t"))
      .crossJoin(broadcast(armN))
    val mC = col("sx_c").cast("double") / col("n_c")
    val mT = col("sx_t").cast("double") / col("n_t")
    def v(s: Column, s2: Column, n: Column) =
      (s2.cast("double") - s.cast("double") * s.cast("double") / n) / (n - lit(1))
    val se2 = v(col("sx_c"), col("sxx_c"), col("n_c")) / col("n_c") +
      v(col("sx_t"), col("sxx_t"), col("n_t")) / col("n_t")
    val z = (mT - mC) / sqrt(se2)
    val zed = perType.select(col("event_type"), col("n_c"), col("n_t"),
      roundN(mC, 6).as("mean_c"), roundN(mT, 6).as("mean_t"),
      when(col("n_c") < 2L || col("n_t") < 2L || se2 <= 0.0,
        lit(null).cast("double")).otherwise(z).as("zf"))
    // two-sided normal p via Zelen-Severo (A&S 26.2.17), nano-quantized.
    // Token-identical formula in the oracle; exp's ≤1-ulp cross-engine
    // slack is absorbed by the 1e-9 grid (the quantized-ln precedent).
    val az = abs(col("zf"))
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val phi = lit(0.3989422804014327) * exp(lit(-0.5) * az * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    val pNano = floor(lit(2.0) * phi * poly * lit(1e9) + lit(0.5)).cast("long")
    // Both windows run over the enum-sized test table (one row per event
    // type), so the step-up cutoff is a second pass over the SAME tiny
    // window input — no re-scan of events, no cache, plan stays
    // tripwire-inspectable.
    val g = Window.partitionBy()
    zed
      .withColumn("p_nano", when(col("zf").isNull, lit(null).cast("long")).otherwise(pNano))
      .withColumn("m", count(lit(1)).over(g))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("p_nano").asc_nulls_last, col("event_type"))))
      .withColumn("k_max", max(
        when(col("p_nano") * col("m") <= col("rk") * lit(FdrQNano), col("rk"))).over(g))
      .select(col("event_type"), col("n_c"), col("n_t"),
        col("mean_c"), col("mean_t"),
        roundN(col("zf"), 4).as("z"),
        (col("p_nano").cast("double") / 1e9).as("p"),
        col("rk").cast("long").as("rk"), col("m"),
        (col("rk") <= coalesce(col("k_max"), lit(0))).as("rejected"))
      .orderBy(col("rk"))
  }

  private val bhFdrSql = {
    val az = "abs(zf)"
    val t = s"(1.0 / (1.0 + 0.2316419 * $az))"
    val phi = s"(0.3989422804014327 * exp(-0.5 * $az * $az))"
    val poly = s"($t * (0.319381530 + $t * (-0.356563782 + " +
      s"$t * (1.781477937 + $t * (-1.821255978 + $t * 1.330274429)))))"
    val vC = "((CAST(sxx_c AS DOUBLE) - CAST(sx_c AS DOUBLE) * CAST(sx_c AS DOUBLE) / n_c) / (n_c - 1))"
    val vT = "((CAST(sxx_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * CAST(sx_t AS DOUBLE) / n_t) / (n_t - 1))"
    val se2 = s"($vC / n_c + $vT / n_t)"
    s"""WITH $eventsUs,
       |an AS (SELECT
       |         max(CASE WHEN arm = 0 THEN n END) AS n_c,
       |         max(CASE WHEN arm = 1 THEN n END) AS n_t
       |       FROM (SELECT $armSql AS arm, count(*) AS n
       |             FROM (SELECT DISTINCT user_id FROM e) GROUP BY 1)),
       |ux AS (SELECT user_id, event_type, count(*) AS x FROM e GROUP BY 1, 2),
       |pt AS (SELECT event_type,
       |         CAST(sum(CASE WHEN $armSql = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_c,
       |         CAST(sum(CASE WHEN $armSql = 0 THEN x * x ELSE 0 END) AS BIGINT) AS sxx_c,
       |         CAST(sum(CASE WHEN $armSql = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
       |         CAST(sum(CASE WHEN $armSql = 1 THEN x * x ELSE 0 END) AS BIGINT) AS sxx_t
       |       FROM ux GROUP BY 1),
       |zt AS (SELECT event_type, n_c, n_t,
       |         ${roundNSql("CAST(sx_c AS DOUBLE) / n_c", 6)} AS mean_c,
       |         ${roundNSql("CAST(sx_t AS DOUBLE) / n_t", 6)} AS mean_t,
       |         CASE WHEN n_c < 2 OR n_t < 2 OR $se2 <= 0.0 THEN NULL
       |              ELSE (CAST(sx_t AS DOUBLE) / n_t - CAST(sx_c AS DOUBLE) / n_c) / sqrt($se2)
       |         END AS zf
       |       FROM pt CROSS JOIN an),
       |pv AS (SELECT *, CASE WHEN zf IS NULL THEN NULL
       |         ELSE CAST(floor(2.0 * $phi * $poly * 1e9 + 0.5) AS BIGINT) END AS p_nano
       |       FROM zt),
       |rk AS (SELECT *, count(*) OVER () AS m,
       |         row_number() OVER (ORDER BY p_nano ASC NULLS LAST, event_type) AS rk
       |       FROM pv),
       |km AS (SELECT *,
       |         max(CASE WHEN p_nano * m <= rk * $FdrQNano THEN rk END) OVER () AS k_max
       |       FROM rk)
       |SELECT event_type, n_c, n_t, mean_c, mean_t,
       |  ${roundNSql("zf", 4)} AS z,
       |  CAST(p_nano AS DOUBLE) / 1e9 AS p,
       |  CAST(rk AS BIGINT) AS rk, CAST(m AS BIGINT) AS m,
       |  rk <= coalesce(k_max, 0) AS rejected
       |FROM km
       |ORDER BY rk""".stripMargin
  }

  // ----------------------------------------------------------------- msprt

  /** Mixture variance τ of the mSPRT normal mixture (Johari, Koomen,
    * Pekelis & Walsh 2017, "Peeking at A/B tests"). τ sets the sample
    * size the test has power at (V ≈ p(1-p)·2/n ≲ τ): 0.01 ≈ tens of
    * users per arm — sized to the harness experiment, and harmless under
    * the null (θ̂ ≈ 0 ⇒ Λ < 1 ⇒ p clamps at 1). */
  val SprtTau = 0.01

  /** Always-valid significance level α = 0.05, in nano-units of p. */
  val SprtAlphaNano = 50000000L

  /** Always-valid sequential test (mSPRT) over the big-ticket conversion
    * rate — what the experiment dashboard should show on EVERY day of the
    * test so that stopping the moment it turns significant is still a
    * valid α = 0.05 decision (the "peeking problem" guard; fixed-horizon
    * z-tests like q_events_abtest are only valid at one pre-committed
    * look). Per observed event day d: cumulative users and converters per
    * arm (a user enters on their first event day, converts on their first
    * qualifying purchase day), the rate-difference estimate θ̂ with
    * variance V, the mixture-SPRT log likelihood ratio
    * ln Λ = ½·ln(V/(V+τ)) + θ̂²τ/(2V(V+τ)), and the always-valid p —
    * the running MINIMUM of min(1, 1/Λ) over days so far.
    *
    * Exactness: every count is an exact integer (cumulative BIGINT sums
    * of per-day deltas); θ̂/V/lnΛ are fixed expression trees over those
    * integers, token-identical in both engines; 1/Λ is quantized to
    * integer NANO-units of p BEFORE the running min, so the significance
    * sequence is pure BIGINT comparison — the reject day can never differ
    * by a float ulp (the q_stats_bh_fdr precedent; exp/ln's ≤1-ulp
    * cross-engine slack is absorbed by the 1e-9 grid). Days where an arm
    * is empty or V degenerates carry NULL lnΛ/p and are skipped by the
    * running min (min ignores NULLs in both engines), never significant.
    *
    * Scale shape: user-sized work is two keyed aggregates (first activity
    * day, first conversion day per user); everything after lives on the
    * per-DAY series — calendar-bounded, the q_events_cum_users window
    * class (tripwire-whitelisted). */
  def sprt(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val day = to_date(col("ts"))
    val newUsers = ev.groupBy(col("user_id")).agg(min(day).as("day"))
      .select(col("day"), armCol(col("user_id")).as("arm"))
      .groupBy(col("day")).agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("du_c"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("du_t"))
    val newConvs = ev
      .filter(col("event_type") === "purchase" && col("value") >= ConvThreshold)
      .groupBy(col("user_id")).agg(min(day).as("day"))
      .select(col("day"), armCol(col("user_id")).as("arm"))
      .groupBy(col("day")).agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("dx_c"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("dx_t"))
    val wd = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ev.select(day.as("day")).distinct()
      .join(newUsers, Seq("day"), "left")
      .join(newConvs, Seq("day"), "left")
      .select(col("day"),
        sum(coalesce(col("du_c"), lit(0L))).over(wd).as("n_c"),
        sum(coalesce(col("du_t"), lit(0L))).over(wd).as("n_t"),
        sum(coalesce(col("dx_c"), lit(0L))).over(wd).as("x_c"),
        sum(coalesce(col("dx_t"), lit(0L))).over(wd).as("x_t"))
    val theta = col("x_t").cast("double") / col("n_t") -
      col("x_c").cast("double") / col("n_c")
    val pool = (col("x_c") + col("x_t")).cast("double") / (col("n_c") + col("n_t"))
    val vEx = pool * (lit(1.0) - pool) * (lit(1.0) / col("n_c") + lit(1.0) / col("n_t"))
    val staged = cum
      .withColumn("theta_f", theta)
      .withColumn("v_f",
        when(col("n_c") === 0L || col("n_t") === 0L, lit(null).cast("double"))
          .otherwise(vEx))
    val llr = lit(0.5) * log(col("v_f") / (col("v_f") + lit(SprtTau))) +
      col("theta_f") * col("theta_f") * lit(SprtTau) /
        (lit(2.0) * col("v_f") * (col("v_f") + lit(SprtTau)))
    val pNano = floor(least(lit(1.0), exp(-col("llr_f"))) * 1e9 + 0.5).cast("long")
    staged
      .withColumn("llr_f",
        when(col("v_f").isNull || col("v_f") <= 0.0, lit(null).cast("double"))
          .otherwise(llr))
      .withColumn("p_nano", when(col("llr_f").isNull, lit(null).cast("long"))
        .otherwise(pNano))
      .withColumn("p_run", min(col("p_nano")).over(wd))
      .select(col("day"), col("n_c"), col("n_t"), col("x_c"), col("x_t"),
        when(col("n_c") === 0L || col("n_t") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("theta_f"), 6)).as("theta"),
        roundN(col("llr_f"), 6).as("llr"),
        (col("p_run").cast("double") / 1e9).as("p_av"),
        coalesce(col("p_run") <= lit(SprtAlphaNano), lit(false)).as("significant"))
      .orderBy(col("day"))
  }

  private val sprtSql = {
    val v = "v_f"
    val llr = s"(0.5 * ln($v / ($v + $SprtTau)) + " +
      s"theta_f * theta_f * $SprtTau / (2.0 * $v * ($v + $SprtTau)))"
    s"""WITH $eventsUs,
       |nu AS (SELECT day,
       |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS du_c,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS du_t
       |       FROM (SELECT min(CAST(ts AS DATE)) AS day, $armSql AS arm
       |             FROM e GROUP BY user_id) GROUP BY 1),
       |nx AS (SELECT day,
       |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dx_c,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dx_t
       |       FROM (SELECT min(CAST(ts AS DATE)) AS day, $armSql AS arm
       |             FROM e WHERE event_type = 'purchase' AND value >= $ConvThreshold
       |             GROUP BY user_id) GROUP BY 1),
       |spine AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM e),
       |cum AS (SELECT s.day,
       |          CAST(sum(coalesce(du_c, 0)) OVER w AS BIGINT) AS n_c,
       |          CAST(sum(coalesce(du_t, 0)) OVER w AS BIGINT) AS n_t,
       |          CAST(sum(coalesce(dx_c, 0)) OVER w AS BIGINT) AS x_c,
       |          CAST(sum(coalesce(dx_t, 0)) OVER w AS BIGINT) AS x_t
       |        FROM spine s LEFT JOIN nu USING (day) LEFT JOIN nx USING (day)
       |        WINDOW w AS (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |staged AS (SELECT day, n_c, n_t, x_c, x_t,
       |             CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c AS theta_f,
       |             CASE WHEN n_c = 0 OR n_t = 0 THEN NULL
       |                  ELSE CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)
       |                       * (1.0 - CAST(x_c + x_t AS DOUBLE) / (n_c + n_t))
       |                       * (1.0 / n_c + 1.0 / n_t) END AS v_f
       |           FROM cum),
       |lf AS (SELECT *, CASE WHEN v_f IS NULL OR v_f <= 0.0 THEN NULL
       |                      ELSE $llr END AS llr_f
       |       FROM staged),
       |pn AS (SELECT *, CASE WHEN llr_f IS NULL THEN NULL
       |         ELSE CAST(floor(least(1.0, exp(-llr_f)) * 1e9 + 0.5) AS BIGINT)
       |         END AS p_nano
       |       FROM lf),
       |pr AS (SELECT *, min(p_nano) OVER (ORDER BY day
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_run
       |       FROM pn)
       |SELECT day, n_c, n_t, x_c, x_t,
       |  CASE WHEN n_c = 0 OR n_t = 0 THEN NULL
       |       ELSE ${roundNSql("theta_f", 6)} END AS theta,
       |  ${roundNSql("llr_f", 6)} AS llr,
       |  CAST(p_run AS DOUBLE) / 1e9 AS p_av,
       |  coalesce(p_run <= $SprtAlphaNano, false) AS significant
       |FROM pr
       |ORDER BY day""".stripMargin
  }

  // ---------------------------------------------------------------- uplift

  /** Uplift by targeting quintile with the Qini curve — the causal read
    * of an experiment a growth team uses to decide WHO to target: users
    * are scored by pre-period activity (event count before the
    * floor-pinned corpus midpoint, the CUPED covariate convention),
    * cut into score quintiles (bucket 1 = highest score, the users a
    * model would target first), and each quintile reports the
    * treatment-vs-control conversion uplift plus the cumulative Qini
    * statistic Q(k) = X_t(k) − X_c(k)·N_t(k)/N_c(k) (Radcliffe 2007) —
    * positive where targeting the top-k quintiles beats not targeting.
    *
    * Exactness: scores and conversions are exact integers; quintile
    * assignment reuses the rfm cutpoint machinery (bit-for-bit ntile
    * tie-splitting on (score DESC, user_id), no unpartitioned
    * user-sized window); uplift and Qini are fixed-form divisions of
    * exact cumulative BIGINTs, NULL-guarded where an arm is empty.
    *
    * Scale shape: one keyed per-user aggregate (map-side combinable)
    * against the broadcast 1-row midpoint; quintile boundaries resolve
    * through the domain-bounded score histogram; the cumulative window
    * runs over the 5 quintile rows — bounded by construction
    * (tripwire-whitelisted). */
  def uplift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val us = unix_micros(col("ts"))
    val mid = ev.agg(floor((min(us) + max(us)) / lit(2L)).cast("long").as("mid_us"))
    val perUser = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        sum(when(us < col("mid_us"), 1L).otherwise(0L)).as("score"),
        max(when(us >= col("mid_us") && col("event_type") === "purchase" &&
          col("value") >= ConvThreshold, 1L).otherwise(0L)).as("conv"))
      .select(col("user_id"), armCol(col("user_id")).as("arm"),
        col("score"), col("conv"))
      .localCheckpoint() // cutpoint jobs + final read reuse one pass
    val n = perUser.count()
    val scored = Events.ntileByCutpoints(perUser, -col("score"), n, "bucket")
    val w5 = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.groupBy(col("bucket"))
      .agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x_t"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x_c"))
      .withColumn("cum_nt", sum(col("n_t")).over(w5))
      .withColumn("cum_nc", sum(col("n_c")).over(w5))
      .withColumn("cum_xt", sum(col("x_t")).over(w5))
      .withColumn("cum_xc", sum(col("x_c")).over(w5))
      .select(col("bucket").cast("long").as("bucket"),
        col("n_t"), col("n_c"), col("x_t"), col("x_c"),
        when(col("n_t") === 0L || col("n_c") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("x_t").cast("double") / col("n_t") -
            col("x_c").cast("double") / col("n_c"), 6)).as("uplift"),
        when(col("cum_nc") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("cum_xt").cast("double") -
            col("cum_xc").cast("double") * col("cum_nt") / col("cum_nc"), 4))
          .as("qini"))
      .orderBy(col("bucket"))
  }

  private val upliftSql =
    s"""WITH $eventsUs,
       |m AS (SELECT CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2) AS BIGINT)
       |        AS mid_us FROM e),
       |u AS (SELECT user_id, $armSql AS arm,
       |        CAST(sum(CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END) AS BIGINT)
       |          AS score,
       |        CAST(max(CASE WHEN epoch_us(ts) >= mid_us AND event_type = 'purchase'
       |          AND value >= $ConvThreshold THEN 1 ELSE 0 END) AS BIGINT) AS conv
       |      FROM e, m GROUP BY user_id),
       |b AS (SELECT *, ntile(5) OVER (ORDER BY score DESC, user_id) AS bucket FROM u),
       |g AS (SELECT bucket,
       |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
       |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       |        CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_t,
       |        CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_c
       |      FROM b GROUP BY 1),
       |c AS (SELECT *,
       |        CAST(sum(n_t) OVER w AS BIGINT) AS cum_nt,
       |        CAST(sum(n_c) OVER w AS BIGINT) AS cum_nc,
       |        CAST(sum(x_t) OVER w AS BIGINT) AS cum_xt,
       |        CAST(sum(x_c) OVER w AS BIGINT) AS cum_xc
       |      FROM g
       |      WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT CAST(bucket AS BIGINT) AS bucket, n_t, n_c, x_t, x_c,
       |  CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c", 6)}
       |  END AS uplift,
       |  CASE WHEN cum_nc = 0 THEN NULL
       |       ELSE ${roundNSql(
                 "CAST(cum_xt AS DOUBLE) - CAST(cum_xc AS DOUBLE) * cum_nt / cum_nc", 4)}
       |  END AS qini
       |FROM c
       |ORDER BY bucket""".stripMargin

  // -------------------------------------------------------------- jackknife

  /** Leave-one-day-out (bucket) jackknife SE for the revenue-per-
    * active-user-day RATIO — how experimentation platforms get honest
    * uncertainty for ratio metrics, where the naive binomial SE is wrong
    * because numerator and denominator are correlated (Quenouille/Tukey;
    * day-buckets keep the replicate count calendar-bounded). Per day d:
    * x_d = purchase cents, n_d = distinct active users; the full ratio
    * R = X/N, replicates R₍d₎ = (X−x_d)/(N−n_d), and
    * se² = (D−1)/D · Σ(R₍d₎ − R̄)².
    *
    * Exactness: x/n/X/N are exact BIGINTs; each replicate quantizes ONCE
    * to integer micro-units and the sum-of-squares runs on CENTERED
    * integer deviations (dev = Rµ₍d₎ − Rµ, so Σdev² stays far from the
    * BIGINT edge instead of Σ(Rµ²) ~ 1e22), using the shift-invariant
    * identity Σ(R₍d₎−R̄)² = Σdev² − (Σdev)²/D. Days whose leave-out
    * denominator would hit zero are excluded and D counts only valid
    * replicates (needs ≥ 2, else NULL se).
    *
    * Scale shape: one keyed per-day aggregate (the corpus pass), then
    * everything lives on the calendar-bounded day table; the final stats
    * are one grand aggregate against the broadcast 1-row totals. */
  def jackknife(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val byDay = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(
        coalesce(sum(when(col("event_type") === "purchase", cents)), lit(0L))
          .as("x"),
        count_distinct(col("user_id")).as("n"))
    val tot = broadcast(byDay.agg(sum(col("x")).as("xx"), sum(col("n")).as("nn")))
    val withR = byDay.crossJoin(tot)
      .withColumn("valid", col("nn") - col("n") > 0L)
      .withColumn("r_mu", when(col("valid"),
        floor((col("xx") - col("x")).cast("double") / (col("nn") - col("n"))
          * 1e6 + 0.5).cast("long")))
      .withColumn("rfull_mu",
        floor(col("xx").cast("double") / col("nn") * 1e6 + 0.5).cast("long"))
      .withColumn("dev", col("r_mu") - col("rfull_mu"))
    val agg = withR.agg(
      sum(when(col("valid"), 1L).otherwise(0L)).as("d_eff"),
      coalesce(sum(when(col("valid"), col("dev"))), lit(0L)).as("sd"),
      coalesce(sum(when(col("valid"), col("dev") * col("dev"))), lit(0L)).as("sd2"),
      max(col("xx")).as("xx"), max(col("nn")).as("nn"))
    val r = col("xx").cast("double") / col("nn")
    val ssd = (col("sd2").cast("double") -
      col("sd").cast("double") * col("sd") / col("d_eff")) / 1e12
    val se = sqrt((col("d_eff") - lit(1.0)) / col("d_eff") * ssd)
    agg.select(
      col("d_eff").as("d"),
      roundN(r, 6).as("ratio"),
      when(col("d_eff") < 2L, lit(null).cast("double"))
        .otherwise(roundN(se, 6)).as("se_jack"),
      when(col("d_eff") < 2L, lit(null).cast("double"))
        .otherwise(roundN(r - lit(1.96) * se, 6)).as("ci_lo"),
      when(col("d_eff") < 2L, lit(null).cast("double"))
        .otherwise(roundN(r + lit(1.96) * se, 6)).as("ci_hi"))
  }

  private val jackknifeSql = {
    val r = "(CAST(xx AS DOUBLE) / nn)"
    val ssd = "((CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE) * sd / d_eff) / 1e12)"
    // CAST first: DuckDB would otherwise route (d_eff - 1.0) / d_eff
    // through DECIMAL division
    val se = s"sqrt((CAST(d_eff AS DOUBLE) - 1.0) / d_eff * $ssd)"
    s"""WITH $eventsUs,
       |bd AS (SELECT CAST(ts AS DATE) AS day,
       |         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
       |           THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS x,
       |         count(DISTINCT user_id) AS n
       |       FROM e GROUP BY 1),
       |tt AS (SELECT CAST(sum(x) AS BIGINT) AS xx, CAST(sum(n) AS BIGINT) AS nn FROM bd),
       |wr AS (SELECT x, n, xx, nn, (nn - n > 0) AS valid,
       |         CASE WHEN nn - n > 0 THEN CAST(floor(
       |           CAST(xx - x AS DOUBLE) / (nn - n) * 1e6 + 0.5) AS BIGINT) END AS r_mu,
       |         CAST(floor(CAST(xx AS DOUBLE) / nn * 1e6 + 0.5) AS BIGINT) AS rfull_mu
       |       FROM bd CROSS JOIN tt),
       |ag AS (SELECT
       |         CAST(sum(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS d_eff,
       |         CAST(coalesce(sum(CASE WHEN valid THEN r_mu - rfull_mu END), 0) AS BIGINT) AS sd,
       |         CAST(coalesce(sum(CASE WHEN valid
       |           THEN (r_mu - rfull_mu) * (r_mu - rfull_mu) END), 0) AS BIGINT) AS sd2,
       |         max(xx) AS xx, max(nn) AS nn
       |       FROM wr)
       |SELECT d_eff AS d,
       |  ${roundNSql(r, 6)} AS ratio,
       |  CASE WHEN d_eff < 2 THEN NULL ELSE ${roundNSql(se, 6)} END AS se_jack,
       |  CASE WHEN d_eff < 2 THEN NULL
       |       ELSE ${roundNSql(s"$r - 1.96 * $se", 6)} END AS ci_lo,
       |  CASE WHEN d_eff < 2 THEN NULL
       |       ELSE ${roundNSql(s"$r + 1.96 * $se", 6)} END AS ci_hi
       |FROM ag""".stripMargin
  }

  // ------------------------------------------------------------------ psm

  /** Stratified (propensity-bucket) average treatment effect on
    * post-period spend — the observational-causal counterpart of the
    * plain arm difference: users are stratified into quintiles of the
    * pre-midpoint activity score (the CUPED covariate / uplift score),
    * the treatment-control spend difference is taken WITHIN each stratum,
    * and the pooled ATE weights strata by size (Rosenbaum & Rubin 1983 —
    * subclassification on the propensity surrogate; under the md5 arms
    * the assignment is genuinely random, so this doubles as an A/A-style
    * check that stratification does not manufacture an effect).
    *
    * Exactness: spend is exact post-period cents; per-stratum diff
    * quantizes ONCE to micro-cents, and the pooled ATE is
    * Σ n_s·diff_µs / N — an integer weighted sum with a single final
    * division, so no float accumulation order anywhere. Strata with an
    * empty arm carry NULL diff and are excluded from the pooled sum
    * (their n_s drops from the numerator AND denominator — documented).
    * Output: one row per stratum plus the stratum = -1 pooled row.
    *
    * Scale shape: one keyed per-user aggregate; quintile boundaries via
    * the rfm cutpoint machinery (no user-sized window); everything after
    * lives on the 5-row stratum table (localCheckpointed; the pooled row
    * derives from it without recomputing the corpus pass). */
  def psm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val us = unix_micros(col("ts"))
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val mid = ev.agg(floor((min(us) + max(us)) / lit(2L)).cast("long").as("mid_us"))
    val perUser = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        sum(when(us < col("mid_us"), 1L).otherwise(0L)).as("score"),
        coalesce(sum(when(us >= col("mid_us") &&
          col("event_type") === "purchase", cents)), lit(0L)).as("y"))
      .select(col("user_id"), armCol(col("user_id")).as("arm"),
        col("score"), col("y"))
      .localCheckpoint()
    val n = perUser.count()
    val strata = Events.ntileByCutpoints(perUser, col("score"), n, "stratum")
      .groupBy(col("stratum"))
      .agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("y_t"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("y_c"))
      .withColumn("diff_mu",
        when(col("n_t") === 0L || col("n_c") === 0L, lit(null).cast("long"))
          .otherwise(floor((col("y_t").cast("double") / col("n_t") -
            col("y_c").cast("double") / col("n_c")) * 1e6 + 0.5).cast("long")))
      .localCheckpoint()
    val pooled = strata.agg(
      sum(when(col("diff_mu").isNotNull, (col("n_t") + col("n_c")) * col("diff_mu")))
        .as("num"),
      sum(when(col("diff_mu").isNotNull, col("n_t") + col("n_c"))).as("den"),
      sum(col("n_t")).as("n_t"), sum(col("n_c")).as("n_c"))
      .select(lit(-1).cast("int").as("stratum"), col("n_t"), col("n_c"),
        when(col("den").isNull || col("den") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("num").cast("double") / col("den") / 1e6 / 100.0, 6))
          .as("diff_dollars"))
    strata
      .select(col("stratum"), col("n_t"), col("n_c"),
        roundN(col("diff_mu").cast("double") / 1e6 / 100.0, 6).as("diff_dollars"))
      .unionByName(pooled)
      .orderBy(col("stratum"))
  }

  private val psmSql =
    s"""WITH $eventsUs,
       |m AS (SELECT CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2) AS BIGINT)
       |        AS mid_us FROM e),
       |u AS (SELECT user_id, $armSql AS arm,
       |        CAST(sum(CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END) AS BIGINT)
       |          AS score,
       |        CAST(coalesce(sum(CASE WHEN epoch_us(ts) >= mid_us
       |          AND event_type = 'purchase'
       |          THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS y
       |      FROM e, m GROUP BY user_id),
       |b AS (SELECT *, ntile(5) OVER (ORDER BY score, user_id) AS stratum FROM u),
       |g AS (SELECT stratum,
       |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
       |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       |        CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS y_t,
       |        CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS y_c
       |      FROM b GROUP BY 1),
       |gd AS (SELECT *,
       |         CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
       |              ELSE CAST(floor((CAST(y_t AS DOUBLE) / n_t
       |                - CAST(y_c AS DOUBLE) / n_c) * 1e6 + 0.5) AS BIGINT)
       |         END AS diff_mu
       |       FROM g),
       |po AS (SELECT CAST(-1 AS INTEGER) AS stratum,
       |         CAST(sum(n_t) AS BIGINT) AS n_t, CAST(sum(n_c) AS BIGINT) AS n_c,
       |         CASE WHEN coalesce(sum(CASE WHEN diff_mu IS NOT NULL
       |                THEN n_t + n_c END), 0) = 0 THEN NULL
       |              ELSE ${roundNSql(
                 "CAST(sum(CASE WHEN diff_mu IS NOT NULL THEN (n_t + n_c) * diff_mu END) AS DOUBLE) " +
                   "/ sum(CASE WHEN diff_mu IS NOT NULL THEN n_t + n_c END) / 1e6 / 100.0",
                 6)}
       |         END AS diff_dollars
       |       FROM gd)
       |SELECT CAST(stratum AS INTEGER) AS stratum, n_t, n_c,
       |  ${roundNSql("CAST(diff_mu AS DOUBLE) / 1e6 / 100.0", 6)} AS diff_dollars
       |FROM gd
       |UNION ALL
       |SELECT stratum, n_t, n_c, diff_dollars FROM po
       |ORDER BY stratum""".stripMargin

  // ---------------------------------------------------------------- ridge

  /** Shrinkage grid reported by the ridge path (λ in Σx² units; 0 = OLS). */
  val RidgeLambdas: Seq[Long] = Seq(0L, 1000L, 100000L)

  /** Closed-form ridge regression (Hoerl-Kennard 1970) of post-period
    * spend on pre-period activity — the regularized counterpart of the
    * Granger/CUPED normal-equation fits, reported as a SHRINKAGE PATH
    * over the pinned λ grid: β(λ) = (X'X + λD)⁻¹X'y with the intercept
    * unpenalized (D = diag(0,1,1)), features x₁ = pre-midpoint views,
    * x₂ = pre-midpoint clicks, target y = post-midpoint purchase dollars.
    *
    * Exactness: all nine sufficient statistics are exact order-free
    * BIGINTs (whole dollars + counts, the granger quantization, with the
    * same enforced overflow budget); each λ row is ONE fixed
    * Cramer-3×3 double tree over those integers plus the integer λ on
    * the penalized diagonal. Singular systems yield NULL.
    *
    * Scale shape: one keyed per-user aggregate collapses the corpus;
    * the grid explodes from the single sufficient-statistics row —
    * 100 TB costs one scan regardless of how many λ are reported. */
  /** (user_id, x1 = pre-midpoint views, x2 = pre-midpoint clicks,
    * y = post-midpoint purchase whole dollars) — the design frame shared
    * by [[ridge]] and the conformal audit, budget-checked. */
  private def ridgeUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val us = unix_micros(col("ts"))
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val mid = ev.agg(floor((min(us) + max(us)) / lit(2L)).cast("long").as("mid_us"))
    ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        sum(when(us < col("mid_us") && col("event_type") === "view", 1L)
          .otherwise(0L)).as("x1"),
        sum(when(us < col("mid_us") && col("event_type") === "click", 1L)
          .otherwise(0L)).as("x2"),
        coalesce(sum(when(us >= col("mid_us") &&
          col("event_type") === "purchase", cents)), lit(0L)).as("yc"))
      .select(col("user_id"),
        when(col("x1") < 3000000000L && col("x2") < 3000000000L, col("x1"))
          .otherwise(raise_error(lit("ridge: input exceeds the BIGINT budget")))
          .as("x1"),
        col("x2"), expr("yc div 100").as("y"))
  }

  /** The u CTE body mirroring [[ridgeUsers]] (expects `e` and `m`). */
  private val ridgeUsersSql =
    s"""u AS (SELECT user_id,
       |        CAST(sum(CASE WHEN epoch_us(ts) < mid_us AND event_type = 'view'
       |          THEN 1 ELSE 0 END) AS BIGINT) AS x1,
       |        CAST(sum(CASE WHEN epoch_us(ts) < mid_us AND event_type = 'click'
       |          THEN 1 ELSE 0 END) AS BIGINT) AS x2,
       |        CAST(coalesce(sum(CASE WHEN epoch_us(ts) >= mid_us
       |          AND event_type = 'purchase'
       |          THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) // 100 AS BIGINT)
       |          AS y
       |      FROM e, m GROUP BY user_id)""".stripMargin

  def ridge(spark: SparkSession, dir: String): DataFrame = {
    val perUser = ridgeUsers(spark, dir).drop("user_id")
    val agg = perUser.agg(
      count(lit(1)).as("t"),
      sum(col("y")).as("sy"), sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("y") * col("x1")).as("s1y"),
      sum(col("y") * col("x2")).as("s2y"))
    val grid = agg.select(col("*"),
      explode(typedLit(RidgeLambdas)).as("lambda"))
    def d(c: String) = col(c).cast("double")
    val a11 = (col("s11") + col("lambda")).cast("double")
    val a22 = (col("s22") + col("lambda")).cast("double")
    val detF = d("t") * (a11 * a22 - d("s12") * d("s12")) -
      d("s1") * (d("s1") * a22 - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s12") - a11 * d("s2"))
    val det0 = d("sy") * (a11 * a22 - d("s12") * d("s12")) -
      d("s1") * (d("s1y") * a22 - d("s12") * d("s2y")) +
      d("s2") * (d("s1y") * d("s12") - a11 * d("s2y"))
    val det1 = d("t") * (d("s1y") * a22 - d("s12") * d("s2y")) -
      d("sy") * (d("s1") * a22 - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s2y") - d("s1y") * d("s2"))
    val det2 = d("t") * (a11 * d("s2y") - d("s1y") * d("s12")) -
      d("s1") * (d("s1") * d("s2y") - d("s1y") * d("s2")) +
      d("sy") * (d("s1") * d("s12") - a11 * d("s2"))
    val degenerate = col("t") < 4L || detF === 0.0
    grid.select(col("lambda"), col("t").as("n_users"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(roundN(det0 / detF, 6)).as("b0"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(roundN(det1 / detF, 6)).as("b1"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(roundN(det2 / detF, 6)).as("b2"))
      .orderBy(col("lambda"))
  }

  private val ridgeSql = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val a11 = "CAST(s11 + lambda AS DOUBLE)"
    val a22 = "CAST(s22 + lambda AS DOUBLE)"
    val detF = s"""(${dd("t")} * ($a11 * $a22 - ${dd("s12")} * s12) -
       | ${dd("s1")} * (${dd("s1")} * $a22 - ${dd("s12")} * s2) +
       | ${dd("s2")} * (${dd("s1")} * s12 - $a11 * s2))""".stripMargin
      .replaceAll("\n", "")
    val det0 = s"""(${dd("sy")} * ($a11 * $a22 - ${dd("s12")} * s12) -
       | ${dd("s1")} * (${dd("s1y")} * $a22 - ${dd("s12")} * s2y) +
       | ${dd("s2")} * (${dd("s1y")} * s12 - $a11 * s2y))""".stripMargin
      .replaceAll("\n", "")
    val det1 = s"""(${dd("t")} * (${dd("s1y")} * $a22 - ${dd("s12")} * s2y) -
       | ${dd("sy")} * (${dd("s1")} * $a22 - ${dd("s12")} * s2) +
       | ${dd("s2")} * (${dd("s1")} * s2y - ${dd("s1y")} * s2))""".stripMargin
      .replaceAll("\n", "")
    val det2 = s"""(${dd("t")} * ($a11 * s2y - ${dd("s1y")} * s12) -
       | ${dd("s1")} * (${dd("s1")} * s2y - ${dd("s1y")} * s2) +
       | ${dd("sy")} * (${dd("s1")} * s12 - $a11 * s2))""".stripMargin
      .replaceAll("\n", "")
    val deg = s"(t < 4 OR $detF = 0.0)"
    val lam = RidgeLambdas.map(l => s"($l)").mkString(", ")
    s"""WITH $eventsUs,
       |m AS (SELECT CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2) AS BIGINT)
       |        AS mid_us FROM e),
       |$ridgeUsersSql,
       |ag AS (SELECT count(*) AS t,
       |         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x1) AS BIGINT) AS s1,
       |         CAST(sum(x2) AS BIGINT) AS s2,
       |         CAST(sum(x1 * x1) AS BIGINT) AS s11,
       |         CAST(sum(x2 * x2) AS BIGINT) AS s22,
       |         CAST(sum(x1 * x2) AS BIGINT) AS s12,
       |         CAST(sum(y * x1) AS BIGINT) AS s1y,
       |         CAST(sum(y * x2) AS BIGINT) AS s2y
       |       FROM u),
       |grid AS (SELECT ag.*, CAST(l.lambda AS BIGINT) AS lambda
       |         FROM ag CROSS JOIN (VALUES $lam) l(lambda))
       |SELECT lambda, t AS n_users,
       |  CASE WHEN $deg THEN NULL ELSE ${roundNSql(s"$det0 / $detF", 6)} END AS b0,
       |  CASE WHEN $deg THEN NULL ELSE ${roundNSql(s"$det1 / $detF", 6)} END AS b1,
       |  CASE WHEN $deg THEN NULL ELSE ${roundNSql(s"$det2 / $detF", 6)} END AS b2
       |FROM grid
       |ORDER BY lambda""".stripMargin
  }

  // ----------------------------------------------------------- conformal

  /** Miscoverage target: 1 − α = 9/10. */
  val ConformalKeepNum = 9

  /** Split conformal prediction interval (Papadopoulos et al. 2002 /
    * Lei et al. 2018) around the OLS spend model — the
    * distribution-free answer to "how wide must the ±band be so 90% of
    * unseen users land inside": users split 3 ways on the md5("cp|u")
    * byte (0 train, 1 calibration, 2 test); OLS fits on train via the
    * [[ridge]] Cramer-3×3 normal equations (λ = 0); q̂ = the
    * k = ⌈(n_cal+1)·9/10⌉-th smallest calibration |residual|; coverage
    * = share of TEST users with |residual| ≤ q̂ — the audit row carries
    * it beside q̂ because ≈ 90% IS the method's guarantee.
    *
    * Exactness: residuals quantize ONCE to whole cents (one fixed double
    * tree over exact integers and the train-derived betas, identical
    * both engines), so rank selection and the coverage comparison are
    * pure BIGINT; k is exact integer arithmetic ⌈x/10⌉ = (x+9) div 10.
    * k > n_cal (too few calibration points) pins q̂ = NULL and
    * coverage = 1 (the infinite interval); a degenerate train fit
    * (singular / < 4 users) yields NULL q̂ AND NULL coverage.
    *
    * Scale shape: one keyed corpus aggregate builds the user frame; the
    * fit is a 1-row sufficient-statistics aggregate; q̂ selection walks
    * the DISTINCT residual-CENTS histogram — money-domain-bounded (the
    * q_events_gini class, whitelisted); everything else is 1-row
    * broadcast algebra. */
  def conformal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = ridgeUsers(spark, dir)
      .withColumn("sp", conv(substring(md5(concat(lit("cp|"),
        col("user_id").cast("string"))), 1, 2), 16, 10).cast("int") % 3)
      .localCheckpoint()
    val tr = u.filter(col("sp") === 0).agg(
      count(lit(1)).as("t"),
      sum(col("y")).as("sy"), sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("y") * col("x1")).as("s1y"),
      sum(col("y") * col("x2")).as("s2y"))
    def d(c: String) = col(c).cast("double")
    val a11 = d("s11")
    val a22 = d("s22")
    val detF = d("t") * (a11 * a22 - d("s12") * d("s12")) -
      d("s1") * (d("s1") * a22 - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s12") - a11 * d("s2"))
    val det0 = d("sy") * (a11 * a22 - d("s12") * d("s12")) -
      d("s1") * (d("s1y") * a22 - d("s12") * d("s2y")) +
      d("s2") * (d("s1y") * d("s12") - a11 * d("s2y"))
    val det1 = d("t") * (d("s1y") * a22 - d("s12") * d("s2y")) -
      d("sy") * (d("s1") * a22 - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s2y") - d("s1y") * d("s2"))
    val det2 = d("t") * (a11 * d("s2y") - d("s1y") * d("s12")) -
      d("s1") * (d("s1") * d("s2y") - d("s1y") * d("s2")) +
      d("sy") * (d("s1") * d("s12") - a11 * d("s2"))
    // the divisions live INSIDE the when guard: Spark 4 ANSI throws on a
    // division the plan might evaluate, even when the output is masked
    val degB = col("t") < 4L || detF === 0.0
    def b(det: org.apache.spark.sql.Column) =
      when(degB, lit(null).cast("double")).otherwise(det / detF)
    val beta = broadcast(tr.select(col("t").as("n_train"), degB.as("deg"),
      b(det0).as("b0"), b(det1).as("b1"), b(det2).as("b2")))
    def resid(df: DataFrame) = df.crossJoin(beta)
      .select(when(col("deg"), lit(null).cast("long"))
        .otherwise(floor(abs(col("y").cast("double") -
          (col("b0") + col("b1") * col("x1") + col("b2") * col("x2")))
          * 100 + 0.5).cast("long")).as("r"))
    val calR = resid(u.filter(col("sp") === 1)).localCheckpoint()
    val kRow = broadcast(calR.agg(count(lit(1)).as("n_cal"))
      .select(col("n_cal"),
        expr(s"(($ConformalKeepNum * (n_cal + 1)) + 9) div 10").as("k")))
    val hist = calR.filter(col("r").isNotNull)
      .groupBy(col("r")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("r"))))
    val qRow = broadcast(hist.crossJoin(kRow).filter(col("cum") >= col("k"))
      .agg(min(col("r")).as("qh")))
    val cov = resid(u.filter(col("sp") === 2)).crossJoin(qRow)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("qh"), 1L).otherwise(0L)).as("n_in"))
    beta.select(col("n_train"), col("deg"))
      .crossJoin(kRow).crossJoin(broadcast(cov)).crossJoin(qRow)
      .select(col("n_train"), col("n_cal"), col("n_test"),
        when(col("deg") || col("k") > col("n_cal"), lit(null).cast("double"))
          .otherwise(roundN(col("qh").cast("double") / 100.0, 6)).as("q_hat"),
        when(col("deg"), lit(null).cast("double"))
          .when(col("k") > col("n_cal"), lit(1.0))
          .when(col("n_test") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("n_in").cast("double") / col("n_test"), 6))
          .as("coverage"))
  }

  private val conformalSql = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val a11 = dd("s11")
    val a22 = dd("s22")
    def flat(s: String) = s.replaceAll("\n", "")
    val detF = flat(s"""(${dd("t")} * ($a11 * $a22 - ${dd("s12")} * s12) -
       | ${dd("s1")} * (${dd("s1")} * $a22 - ${dd("s12")} * s2) +
       | ${dd("s2")} * (${dd("s1")} * s12 - $a11 * s2))""".stripMargin)
    val det0 = flat(s"""(${dd("sy")} * ($a11 * $a22 - ${dd("s12")} * s12) -
       | ${dd("s1")} * (${dd("s1y")} * $a22 - ${dd("s12")} * s2y) +
       | ${dd("s2")} * (${dd("s1y")} * s12 - $a11 * s2y))""".stripMargin)
    val det1 = flat(s"""(${dd("t")} * (${dd("s1y")} * $a22 - ${dd("s12")} * s2y) -
       | ${dd("sy")} * (${dd("s1")} * $a22 - ${dd("s12")} * s2) +
       | ${dd("s2")} * (${dd("s1")} * s2y - ${dd("s1y")} * s2))""".stripMargin)
    val det2 = flat(s"""(${dd("t")} * ($a11 * s2y - ${dd("s1y")} * s12) -
       | ${dd("s1")} * (${dd("s1")} * s2y - ${dd("s1y")} * s2) +
       | ${dd("sy")} * (${dd("s1")} * s12 - $a11 * s2))""".stripMargin)
    s"""WITH $eventsUs,
       |m AS (SELECT CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2) AS BIGINT)
       |        AS mid_us FROM e),
       |$ridgeUsersSql,
       |s AS (SELECT *, (('0x' || substr(md5('cp|' || CAST(user_id AS VARCHAR)), 1, 2))::INT % 3)
       |        AS sp FROM u),
       |tr AS (SELECT count(*) AS t,
       |         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x1) AS BIGINT) AS s1,
       |         CAST(sum(x2) AS BIGINT) AS s2,
       |         CAST(sum(x1 * x1) AS BIGINT) AS s11,
       |         CAST(sum(x2 * x2) AS BIGINT) AS s22,
       |         CAST(sum(x1 * x2) AS BIGINT) AS s12,
       |         CAST(sum(y * x1) AS BIGINT) AS s1y,
       |         CAST(sum(y * x2) AS BIGINT) AS s2y
       |       FROM s WHERE sp = 0),
       |bt AS (SELECT t AS n_train, (t < 4 OR $detF = 0.0) AS deg,
       |         CASE WHEN (t < 4 OR $detF = 0.0) THEN NULL
       |              ELSE $det0 / $detF END AS b0,
       |         CASE WHEN (t < 4 OR $detF = 0.0) THEN NULL
       |              ELSE $det1 / $detF END AS b1,
       |         CASE WHEN (t < 4 OR $detF = 0.0) THEN NULL
       |              ELSE $det2 / $detF END AS b2
       |       FROM tr),
       |calr AS (SELECT CASE WHEN deg THEN NULL
       |           ELSE CAST(floor(abs(CAST(y AS DOUBLE)
       |             - (b0 + b1 * x1 + b2 * x2)) * 100 + 0.5) AS BIGINT)
       |         END AS r
       |         FROM s CROSS JOIN bt WHERE sp = 1),
       |kk AS (SELECT count(*) AS n_cal,
       |         (($ConformalKeepNum * (count(*) + 1)) + 9) // 10 AS k
       |       FROM calr),
       |h AS (SELECT r, count(*) AS c FROM calr WHERE r IS NOT NULL GROUP BY 1),
       |cm AS (SELECT r, sum(c) OVER (ORDER BY r) AS cum FROM h),
       |q AS (SELECT min(r) AS qh FROM cm CROSS JOIN kk WHERE cum >= kk.k),
       |ter AS (SELECT CASE WHEN deg THEN NULL
       |          ELSE CAST(floor(abs(CAST(y AS DOUBLE)
       |            - (b0 + b1 * x1 + b2 * x2)) * 100 + 0.5) AS BIGINT)
       |        END AS r
       |        FROM s CROSS JOIN bt WHERE sp = 2),
       |cov AS (SELECT count(*) AS n_test,
       |          CAST(sum(CASE WHEN ter.r <= qh THEN 1 ELSE 0 END) AS BIGINT) AS n_in
       |        FROM ter CROSS JOIN q)
       |SELECT n_train, n_cal, n_test,
       |  CASE WHEN deg OR k > n_cal THEN NULL
       |       ELSE ${roundNSql("CAST(qh AS DOUBLE) / 100.0", 6)} END AS q_hat,
       |  CASE WHEN deg THEN NULL
       |       WHEN k > n_cal THEN 1.0
       |       WHEN n_test = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(n_in AS DOUBLE) / n_test", 6)} END AS coverage
       |FROM bt CROSS JOIN kk CROSS JOIN cov CROSS JOIN q""".stripMargin
  }

  // --------------------------------------------------------- permutation

  /** Re-randomizations drawn by the permutation test. */
  val PermCount = 100

  /** Fisher-style permutation (re-randomization) test on mean spend per
    * user between the two md5 arms — the assumption-free companion of the
    * Welch/z tests: the null distribution is built by re-assigning every
    * user to a pseudo-arm under [[PermCount]] deterministic md5 coins
    * (md5("perm|p|user") parity — fresh randomization per p, independent
    * of the real arm), and p = (1 + #{|diff_p| ≥ |diff_obs|}) /
    * (1 + #valid perms), the standard add-one form that keeps p > 0.
    *
    * Exactness: per-user spend is exact cents; each arm mean quantizes as
    * the exact integer division (sum·1e6) div n (operands non-negative,
    * so truncation is identical cross-engine), making every |diff|
    * comparison pure BIGINT — the reject count cannot differ by a float
    * ulp. One-armed splits (observed or permuted) carry NULL and are
    * excluded from the valid-perm denominator. sum·1e6 fits BIGINT to
    * ~9e12 spend cents (documented budget).
    *
    * Scale shape: ONE keyed corpus aggregate collapses events to users;
    * the perm fanout explodes users × [[PermCount]] AFTER that collapse
    * and map-side-combines straight back to PermCount rows — no extra
    * corpus scan, no window, no join wider than a 1-row broadcast. */
  def permutation(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val u = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("event_type") === "purchase", cents)), lit(0L))
        .as("y"))
      .localCheckpoint()
    def diffed(df: DataFrame) = df.select(col("*"),
      when(col("nt") > 0L && col("nc") > 0L,
        expr("(st * 1000000) div nt") - expr("(sc * 1000000) div nc")).as("d"))
    val obs = diffed(u.agg(
      count(lit(1)).as("n_users"),
      sum(when(armCol(col("user_id")) === 1, col("y")).otherwise(0L)).as("st"),
      sum(when(armCol(col("user_id")) === 1, 1L).otherwise(0L)).as("nt"),
      sum(when(armCol(col("user_id")) === 0, col("y")).otherwise(0L)).as("sc"),
      sum(when(armCol(col("user_id")) === 0, 1L).otherwise(0L)).as("nc")))
    val permArm = conv(substring(md5(concat(lit("perm|"),
      col("p").cast("string"), lit("|"), col("user_id").cast("string"))),
      1, 2), 16, 10).cast("int") % 2
    val pd = diffed(u
      .select(col("user_id"), col("y"),
        explode(sequence(lit(0), lit(PermCount - 1))).as("p"))
      .select(col("p"), col("y"), permArm.as("a"))
      .groupBy(col("p"))
      .agg(sum(when(col("a") === 1, col("y")).otherwise(0L)).as("st"),
        sum(when(col("a") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("a") === 0, col("y")).otherwise(0L)).as("sc"),
        sum(when(col("a") === 0, 1L).otherwise(0L)).as("nc")))
    val ag = pd.crossJoin(broadcast(obs.select(col("d").as("d_obs"))))
      .agg(count(col("d")).as("n_perms"),
        sum(when(abs(col("d")) >= abs(col("d_obs")), 1L).otherwise(0L))
          .as("n_ext"))
    obs.crossJoin(broadcast(ag))
      .select(col("n_users"), col("nt").as("n_t"), col("nc").as("n_c"),
        roundN(col("d").cast("double") / 1e8, 6).as("diff_dollars"),
        col("n_perms"),
        when(col("d").isNull, lit(null).cast("long"))
          .otherwise(col("n_ext")).as("n_extreme"),
        when(col("d").isNull || col("n_perms") === 0L,
          lit(null).cast("double"))
          .otherwise(roundN((lit(1.0) + col("n_ext")) /
            (lit(1.0) + col("n_perms")), 6)).as("p_value"))
  }

  private val permutationSql = {
    val permArm = "(('0x' || substr(md5('perm|' || CAST(p AS VARCHAR) || '|' " +
      "|| CAST(user_id AS VARCHAR)), 1, 2))::INT % 2)"
    s"""WITH $eventsUs,
       |u AS (SELECT user_id,
       |        CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
       |          THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT)
       |          AS y
       |      FROM e GROUP BY 1),
       |ob AS (SELECT count(*) AS n_users,
       |         CAST(sum(CASE WHEN $armSql = 1 THEN y ELSE 0 END) AS BIGINT) AS st,
       |         CAST(sum(CASE WHEN $armSql = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
       |         CAST(sum(CASE WHEN $armSql = 0 THEN y ELSE 0 END) AS BIGINT) AS sc,
       |         CAST(sum(CASE WHEN $armSql = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc
       |       FROM u),
       |obd AS (SELECT *, CASE WHEN nt > 0 AND nc > 0
       |          THEN (st * 1000000) // nt - (sc * 1000000) // nc END AS d
       |        FROM ob),
       |pm AS (SELECT p.p, u.y, $permArm AS a
       |       FROM u CROSS JOIN (SELECT unnest(range(0, $PermCount)) AS p) p),
       |pg AS (SELECT p,
       |         CAST(sum(CASE WHEN a = 1 THEN y ELSE 0 END) AS BIGINT) AS st,
       |         CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
       |         CAST(sum(CASE WHEN a = 0 THEN y ELSE 0 END) AS BIGINT) AS sc,
       |         CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc
       |       FROM pm GROUP BY 1),
       |pd AS (SELECT CASE WHEN nt > 0 AND nc > 0
       |         THEN (st * 1000000) // nt - (sc * 1000000) // nc END AS d
       |       FROM pg),
       |ag AS (SELECT count(pd.d) AS n_perms,
       |         CAST(sum(CASE WHEN abs(pd.d) >= abs(obd.d) THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_ext
       |       FROM pd CROSS JOIN obd)
       |SELECT n_users, nt AS n_t, nc AS n_c,
       |  ${roundNSql("CAST(d AS DOUBLE) / 1e8", 6)} AS diff_dollars,
       |  n_perms,
       |  CASE WHEN d IS NULL THEN NULL ELSE n_ext END AS n_extreme,
       |  CASE WHEN d IS NULL OR n_perms = 0 THEN NULL
       |       ELSE ${roundNSql("(1.0 + n_ext) / (1.0 + n_perms)", 6)}
       |  END AS p_value
       |FROM obd CROSS JOIN ag""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_stats_sprt", sprt, Some(sprtSql)),
    Q("q_stats_permutation", permutation, Some(permutationSql)),
    Q("q_train_conformal", conformal, Some(conformalSql)),
    Q("q_train_ridge", ridge, Some(ridgeSql)),
    Q("q_events_psm", psm, Some(psmSql)),
    Q("q_stats_jackknife", jackknife, Some(jackknifeSql)),
    Q("q_events_uplift", uplift, Some(upliftSql)),
    Q("q_events_abn", abn, Some(abnSql)),
    Q("q_stats_bh_fdr", bhFdr, Some(bhFdrSql)),
    Q("q_events_power_continuous", powerContinuous, Some(powerContinuousSql)),
    Q("q_events_abtest_cuped", cuped, Some(cupedSql)),
    Q("q_stats_bootstrap", bootstrap, Some(bootstrapSql)),
    Q("q_events_abtest", abtest, Some(abtestSql)),
    Q("q_events_abtest_power", abtestPower, Some(abtestPowerSql)),
    Q("q_events_survival", survival, Some(survivalSql)),
    Q("q_events_logrank", logrank, Some(logrankSql)),
    Q("q_stats_welch", welch, Some(welchSql)),
    Q("q_stats_benford", benford, Some(benfordSql)),
  )
}
