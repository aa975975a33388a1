package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream aggregations over the `events` table — the Spark-native
  * re-expression of the reference's "real-time" requirement. The reference
  * meets it with orchestration (S3 event → Step Functions → re-run batch,
  * spec p.1,3 — zero streaming code, SURVEY.md §2.8); here the same
  * aggregations are defined once over a generic DataFrame and run EITHER
  * as batch (below, oracle-checked) or as Structured Streaming
  * ([[graft.streaming.EventStreams]] wraps these with readStream +
  * watermark).
  *
  * Scale notes (100 TB): tumbling windows group on (window, type) — a
  * map-side-combinable hash aggregate whose key count is bounded by
  * (hours × types), so the shuffle is tiny regardless of input size.
  * Session windows shuffle on user_id (Spark plans the session merge
  * within each key partition); skewed users are the known hazard and AQE
  * skew handling applies.
  */
object Events {

  /** Tumbling 1-hour window per event type (batch or streaming input). */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), roundN(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Gap-based session windows per user (30-minute inactivity gap). */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), roundN(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** Hopping (sliding) 1-hour window, 15-minute slide: each event lands in
    * exactly 4 windows. Spark's `window(ts, dur, slide)` expands rows
    * per-window BEFORE the aggregate (an explode by dur/slide), so the
    * shuffle carries 4× the (still tiny, key-bounded) partial aggregates —
    * the scale cost of hopping windows is the slide ratio, not the input. */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), roundN(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  def hoppingBatch(spark: SparkSession, dir: String): DataFrame =
    hoppingAgg(Tables.events(spark, dir))

  def windowBatch(spark: SparkSession, dir: String): DataFrame =
    windowAgg(Tables.events(spark, dir))

  def sessionBatch(spark: SparkSession, dir: String): DataFrame =
    sessionAgg(Tables.events(spark, dir))

  /** Bucketized RANGE JOIN — pairs of same-user events within 5 minutes.
    * A naive `|t_a − t_b| <= r` self-join has no equality key, so Spark
    * plans a nested-loop join (quadratic per user). Bucketizing time into
    * r-wide bins and exploding ONE side to its bin ±1 turns it into an
    * equi-join on (user, bin): any qualifying pair differs by at most one
    * bin, each candidate matches exactly one exploded bin (no dedup), and
    * the residual exact filter runs on the candidates only. 3× replication
    * of one side buys O(pairs-in-range) instead of O(n²/user) — the
    * standard interval-join plan at 100 TB. */
  val RangeUs: Long = 300L * 1000 * 1000 // 5 minutes in microseconds

  def eventPairsRange(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("us"))
    val a = e.withColumn("bkt", expr(s"us div $RangeUs")).alias("a")
    val b = e.withColumn("bkt", explode(array(
        expr(s"us div $RangeUs") - 1,
        expr(s"us div $RangeUs"),
        expr(s"us div $RangeUs") + 1))).alias("b")
    a.join(b, col("a.user_id") === col("b.user_id") && col("a.bkt") === col("b.bkt")
        && col("a.event_id") < col("b.event_id"))
      .filter(abs(col("a.us") - col("b.us")) <= RangeUs)
      .select(col("a.event_id").as("id_a"), col("b.event_id").as("id_b"),
        (col("b.us") - col("a.us")).as("dt_us"))
  }

  /** Oracle: the plain (quadratic) range join — same relation. */
  private val eventPairsRangeSql =
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS us FROM events)
       |SELECT a.event_id AS id_a, b.event_id AS id_b, b.us - a.us AS dt_us
       |FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
       |WHERE abs(a.us - b.us) <= $RangeUs""".stripMargin

  /** Both oracles read events through this CTE: `ts::TIMESTAMP` truncates
    * the file's TIMESTAMP(NANOS) to microseconds exactly as the Spark side
    * does (Tables.events). */
  private val eventsUs =
    "e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value FROM events)"

  /** Oracle for session windows: classic gaps-and-islands. A new session
    * starts when the gap since the previous event is >= 30 min (Spark
    * merges sessions only on STRICT overlap: next.ts < prev.ts + gap). */
  private val sessionSql =
    s"""WITH $eventsUs,
       |x AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |y AS (
       |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                           ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM x)
       |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       |  ${roundNSql("sum(value)", 2)} AS total_value
       |FROM y GROUP BY user_id, sid""".stripMargin

  /** Funnel analysis (view → click → purchase): per user, the earliest
    * view, the earliest click AFTER that view, and the earliest purchase
    * after that click — the canonical product-analytics sequence query.
    * Expressed as three user-keyed min-aggregates chained by strict
    * time-order joins: every stage is a groupBy + equi-join on user_id
    * (no window over raw events, no per-user sort), so the whole funnel
    * shuffles on one key and partial-aggregates map-side at any scale. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage_reached"))
  }

  private val funnelSql =
    s"""WITH $eventsUs,
       |v AS (SELECT user_id, min(ts) AS t_view FROM e
       |      WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, min(e.ts) AS t_click
       |      FROM e JOIN v ON e.user_id = v.user_id
       |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
       |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
       |      FROM e JOIN c ON e.user_id = c.user_id
       |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
       |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       |  1 + (CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END)
       |    + (CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS stage_reached
       |FROM v LEFT JOIN c ON v.user_id = c.user_id
       |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  /** Funnel conversion rates with Wilson 95% score intervals — the
    * uncertainty read the plain funnel lacks: a 40%-conversion step over
    * 10 users and over 10,000 users print the same rate but very
    * different intervals, and the Wilson form (unlike the Wald ±z√(pq/n))
    * stays inside [0,1] and behaves at x = 0 / x = n. One row per step
    * transition (view→click, click→purchase, view→purchase end-to-end).
    *
    * Exactness: stage counts are exact BIGINTs from ONE grand aggregate
    * over the funnel stage table (the 3 rows emit via explode — never a
    * union of selects re-running the aggregate); the Wilson center/half
    * are fixed double expression trees over those integers,
    * token-identical in both engines (all SQL literals forced to DOUBLE
    * so DuckDB can't route through DECIMAL arithmetic), one sqrt each,
    * roundN display. Empty-step guard: n = 0 → NULL rate/bounds. */
  def funnelCi(spark: SparkSession, dir: String): DataFrame = {
    val agg = funnel(spark, dir).agg(
      count(lit(1)).as("s1"),
      sum(when(col("stage_reached") >= 2, 1L).otherwise(0L)).as("s2"),
      sum(when(col("stage_reached") >= 3, 1L).otherwise(0L)).as("s3"))
    val rows = agg.select(explode(expr(
      """array(
        |  named_struct('step', 'click_to_purchase', 'n', s2, 'x', s3),
        |  named_struct('step', 'view_to_click', 'n', s1, 'x', s2),
        |  named_struct('step', 'view_to_purchase', 'n', s1, 'x', s3))""".stripMargin))
      .as("r"))
      .select(col("r.step").as("step"), col("r.n").as("n"), col("r.x").as("x"))
    val p = col("x").cast("double") / col("n")
    val z = lit(1.96)
    val z2 = z * z
    val denom = lit(1.0) + z2 / col("n")
    val center = (p + z2 / (lit(2.0) * col("n"))) / denom
    val half = z * sqrt(p * (lit(1.0) - p) / col("n") +
      z2 / (lit(4.0) * col("n") * col("n"))) / denom
    rows.select(col("step"), col("n"), col("x"),
      when(col("n") === 0L, lit(null).cast("double"))
        .otherwise(roundN(p, 6)).as("rate"),
      when(col("n") === 0L, lit(null).cast("double"))
        .otherwise(roundN(center - half, 6)).as("lo"),
      when(col("n") === 0L, lit(null).cast("double"))
        .otherwise(roundN(center + half, 6)).as("hi"))
      .orderBy(col("step"))
  }

  private val funnelCiSql = {
    val z = "CAST(1.96 AS DOUBLE)"
    val p = "(CAST(x AS DOUBLE) / n)"
    val denom = s"(1.0 + $z * $z / n)"
    val center = s"(($p + $z * $z / (2.0 * n)) / $denom)"
    val half = s"($z * sqrt($p * (1.0 - $p) / n + " +
      s"$z * $z / (4.0 * n * n)) / $denom)"
    s"""WITH f AS ($funnelSql),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS s1,
       |        CAST(sum(CASE WHEN stage_reached >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
       |        CAST(sum(CASE WHEN stage_reached >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS s3
       |      FROM f),
       |r AS (SELECT 'click_to_purchase' AS step, s2 AS n, s3 AS x FROM a
       |      UNION ALL SELECT 'view_to_click', s1, s2 FROM a
       |      UNION ALL SELECT 'view_to_purchase', s1, s3 FROM a)
       |SELECT step, n, x,
       |  CASE WHEN n = 0 THEN NULL ELSE ${roundNSql(p, 6)} END AS rate,
       |  CASE WHEN n = 0 THEN NULL
       |       ELSE ${roundNSql(s"$center - $half", 6)} END AS lo,
       |  CASE WHEN n = 0 THEN NULL
       |       ELSE ${roundNSql(s"$center + $half", 6)} END AS hi
       |FROM r
       |ORDER BY step""".stripMargin
  }

  /** The configurable funnel's step sequence — a CONFIG, not a schema:
    * production funnels arrive as an ordered list, so the operator takes
    * one ([[funnelStepsOf]]) and this 4-step instance (one step longer
    * than the fixed `q_events_funnel`) is just the registered pin. */
  val FunnelSteps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Steps-table-driven funnel REPORT: per step, the users whose
    * earliest qualifying event strictly follows their previous step's
    * time, plus the step-over-step conversion rate. The step list is
    * config-sized, so the fold builds a LINEAR chain of keyed
    * aggregates + joins (one per step — the q_events_funnel plan shape
    * at any step count); counts are 1-row aggregates and the report
    * joins step k to k−1 on literals. No window, no collect. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame =
    funnelStepsOf(Tables.events(spark, dir), FunnelSteps)

  def funnelStepsOf(ev: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val perStep = steps.tail.scanLeft(
      ev.filter(col("event_type") === steps.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))) { (prev, st) =>
      ev.filter(col("event_type") === st)
        .join(prev.select(col("user_id"), col("t").as("t_prev")), Seq("user_id"))
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
    val counts = perStep.zip(steps).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_no"), lit(st).as("event_type"), col("n_users"))
    }.reduce(_ unionByName _)
    val prev = counts.select(col("step_no").as("prev_no"), col("n_users").as("n_prev"))
    counts.join(prev, col("step_no") === col("prev_no") + 1, "left_outer")
      .select(col("step_no"), col("event_type"), col("n_users"),
        when(col("n_prev").isNull || col("n_prev") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("n_users").cast("double") / col("n_prev"), 6))
          .as("conv_rate"))
      .orderBy(col("step_no"))
  }

  private val funnelStepsSql = {
    val ctes = FunnelSteps.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s1 AS (SELECT user_id, min(ts) AS t FROM e
           |       WHERE event_type = '$st' GROUP BY 1)""".stripMargin
      else
        s"""s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t
           |       FROM e JOIN s$i ON e.user_id = s$i.user_id
           |       WHERE e.event_type = '$st' AND e.ts > s$i.t GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val unions = FunnelSteps.zipWithIndex.map { case (st, i) =>
      s"SELECT ${i + 1} AS step_no, '$st' AS event_type, count(*) AS n_users FROM s${i + 1}"
    }.mkString(" UNION ALL ")
    s"""WITH $eventsUs,
       |$ctes,
       |c AS ($unions)
       |SELECT c.step_no, c.event_type, c.n_users,
       |  CASE WHEN p.n_users IS NULL OR p.n_users = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(c.n_users AS DOUBLE) / p.n_users", 6)}
       |  END AS conv_rate
       |FROM c LEFT JOIN c p ON c.step_no = p.step_no + 1
       |ORDER BY c.step_no""".stripMargin
  }

  /** Cohort retention: users bucketed by first-activity week (anchor-based
    * integer weeks — no engine-specific week() semantics), counted in every
    * later week they return, keyed (cohort_week, week_offset). Two
    * user-keyed aggregates + one join: the retention matrix is
    * group-cardinality-sized, never user-sized, on the wire. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val wk = expr("CAST(floor(datediff(CAST(ts AS DATE), DATE '2024-01-01') / 7) AS BIGINT)")
    val active = Tables.events(spark, dir)
      .select(col("user_id"), wk.as("wk")).distinct()
    val cohort = active.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    active.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  private val retentionSql =
    s"""WITH $eventsUs,
       |active AS (SELECT DISTINCT user_id,
       |             date_diff('day', DATE '2024-01-01', ts::DATE) // 7 AS wk
       |           FROM e),
       |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM active GROUP BY 1)
       |SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset, count(*) AS n_users
       |FROM active a JOIN cohort c ON a.user_id = c.user_id
       |GROUP BY 1, 2""".stripMargin

  /** z-score anomaly scan — the monitoring primitive: flag events whose
    * `value` sits more than 3 sample standard deviations from their
    * event-type mean. Moments come from the integer-cents pattern (value
    * is 2-decimal data): Σcents and Σcents² are EXACT order-free BIGINTs,
    * mean/var/std then divide back through identical double ops in both
    * engines — no order-dependent float aggregation anywhere. One
    * map-side-combinable moment pass over a bounded key set (event types)
    * + a broadcast join back; scan-speed at any scale. */
  /** Per-type moments (exact integer-cents sums). */
  def anomalyStats(events: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents).as("s"), sum(cents * cents).as("s2"))
      .select(col("event_type"), col("n"),
        (col("s").cast("double") / 100.0 / col("n")).as("mean"),
        sqrt((col("s2").cast("double") / 10000.0 -
          col("n").cast("double") * (col("s").cast("double") / 100.0 / col("n")) *
            (col("s").cast("double") / 100.0 / col("n"))) / (col("n") - 1)).as("std"))
  }

  /** The 3σ gate over ANY events frame — batch below, or an unbounded
    * stream joined against archive-trained stats
    * ([[graft.streaming.EventStreams.anomalyStream]]): stream-static
    * broadcast join + narrow filter, append-mode safe (stateless). */
  def anomaliesOf(events: DataFrame, stats: DataFrame): DataFrame =
    events
      .join(broadcast(stats), "event_type")
      .withColumn("z", roundN((col("value") - col("mean")) / col("std"), 4))
      .filter(abs(col("z")) > 3)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))

  def anomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    anomaliesOf(ev, anomalyStats(ev))
  }

  private val anomaliesSql =
    s"""WITH $eventsUs,
       |m AS (SELECT event_type, count(*) AS n,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS s,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) *
       |                 CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS s2
       |      FROM e GROUP BY 1),
       |st AS (SELECT event_type, n, s / 100.0 / n AS mean,
       |         sqrt((s2 / 10000.0 - CAST(n AS DOUBLE) * (s / 100.0 / n) * (s / 100.0 / n))
       |              / (n - 1)) AS std
       |       FROM m)
       |SELECT e.event_id, e.event_type, e.value,
       |  ${roundNSql("(e.value - st.mean) / st.std", 4)} AS z
       |FROM e JOIN st USING (event_type)
       |WHERE abs(${roundNSql("(e.value - st.mean) / st.std", 4)}) > 3""".stripMargin

  /** Cumulative distinct users by day — the growth-curve query. The naive
    * form (`count(DISTINCT user) OVER (ORDER BY day)`) either recomputes
    * the distinct set per day or carries O(users) window state; the
    * FIRST-SEEN rewrite makes it two cheap steps: min(day) per user (one
    * map-side-combinable hash agg — the only corpus-sized shuffle), then a
    * running sum over the DAY-sized series (the single-partition window is
    * over ~hundreds of rows, not events — that's the point). */
  def cumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    firstSeen.groupBy(col("first_day"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users",
        sum(col("new_users")).over(Window.orderBy(col("first_day"))))
      .orderBy(col("first_day"))
  }

  private val cumulativeUsersSql =
    s"""WITH $eventsUs,
       |fs AS (
       |  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM e GROUP BY 1),
       |d AS (SELECT first_day, count(*) AS new_users FROM fs GROUP BY 1)
       |SELECT first_day, new_users,
       |  CAST(sum(new_users) OVER (ORDER BY first_day) AS BIGINT) AS cum_users
       |FROM d
       |ORDER BY 1""".stripMargin

  /** User-journey transition matrix — P(next event type | current), the
    * Markov view of product flows. One lag window per user (state =
    * per-user ordered stream, the sessionization partitioning) and one
    * tiny (|types|²) aggregate; probabilities divide exact counts. Ties
    * in ts break by event_id so the "next" event is deterministic. */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        roundN(col("n").cast("double") / col("n_from"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Skew-guarded transition matrix (round-3 verdict ask #6): the per-user
    * window sort is O(events-per-user · log) in ONE task — a bot account
    * with 10⁸ events wedges the stage. The guard keeps each user's FIRST
    * JourneyCap events (by time — a prefix, so real transition structure
    * is preserved, unlike a hash sample which would fabricate transitions
    * between non-adjacent events). JourneyCap = 50 bites on this fixture
    * (users run 60-90 events), so the oracle checks the truncation;
    * production tunes it to the p99.9 user. */
  val JourneyCap = 50

  def transitionMatrixCapped(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= JourneyCap)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        roundN(col("n").cast("double") / col("n_from"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val transitionMatrixCappedSql =
    s"""WITH $eventsUs,
       |capped AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM e
       |  QUALIFY rn <= $JourneyCap),
       |nx AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS to_type
       |  FROM capped),
       |p AS (SELECT from_type, to_type, count(*) AS n FROM nx
       |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM p GROUP BY 1)
       |SELECT p.from_type, p.to_type, p.n,
       |  ${roundNSql("CAST(p.n AS DOUBLE) / t.n_from", 6)} AS p
       |FROM p JOIN t USING (from_type)
       |ORDER BY 1, 2""".stripMargin

  private val transitionMatrixSql =
    s"""WITH $eventsUs,
       |nx AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS to_type
       |  FROM e),
       |p AS (SELECT from_type, to_type, count(*) AS n FROM nx
       |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM p GROUP BY 1)
       |SELECT p.from_type, p.to_type, p.n,
       |  ${roundNSql("CAST(p.n AS DOUBLE) / t.n_from", 6)} AS p
       |FROM p JOIN t USING (from_type)
       |ORDER BY 1, 2""".stripMargin

  /** Last-touch marketing attribution: each purchase is credited to the
    * same user's most recent click/view at or before it (ties: touches
    * beat same-timestamp purchases; equal-timestamp touches break to the
    * higher event_id), rolled up to channel totals. Purchases with no
    * prior touch land in the explicit 'none' channel.
    *
    * Plan shape: the merge-style as-of composition (AsOf.scala) — tag
    * sides, union, ONE shuffle+sort on (user, ts, side, event_id), a
    * running `last(ignoreNulls)` carries the latest touch into each
    * purchase row, then a map-side-combinable channel rollup. No range
    * join, no per-purchase probe — the shape that survives 100 TB of
    * events. Revenue rides the exact integer-cents pattern (order-free
    * BIGINT sums, divided back once at the end). */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"),
        lit(null).cast("string").as("touch"), cents.as("cents"))
    val t = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"),
        col("event_type").as("touch"), lit(null).cast("long").as("cents"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(t)
      .withColumn("channel", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(coalesce(col("channel"), lit("none")).as("channel"), col("cents"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        (sum(col("cents")) / 100.0).as("revenue"))
  }

  private val attributionSql =
    s"""WITH $eventsUs,
       |p AS (SELECT user_id, ts, event_id,
       |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
       |      FROM e WHERE event_type = 'purchase'),
       |a AS (SELECT p.cents,
       |        (SELECT t.event_type FROM e t
       |         WHERE t.user_id = p.user_id
       |           AND t.event_type IN ('click', 'view') AND t.ts <= p.ts
       |         ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS channel
       |      FROM p)
       |SELECT coalesce(channel, 'none') AS channel, count(*) AS n_purchases,
       |  sum(cents) / 100.0 AS revenue
       |FROM a GROUP BY 1""".stripMargin

  /** RFM segmentation — the classic product-analytics cut: per user,
    * Recency (days from their last event to the corpus max event time, so
    * the query is self-anchored and replayable), Frequency (purchase
    * count) and Monetary (purchase cents). Quintile scores follow ntile(5)
    * over a TOTAL order ((metric, user_id)) so bucket assignment is
    * deterministic and engine-independent; recency orders DESC so bucket 5
    * is the most recent.
    *
    * Scale (the round-5 verdict's last named scale-killer, rewritten):
    * the naive form is three unpartitioned `ntile(5)` windows, i.e. the
    * whole user table sorted on ONE task, three times. Instead the four
    * bucket-boundary ranks per metric (the ntile end-ranks, a pure
    * function of n) are resolved to boundary VALUES through the same
    * histogram-cumulative machinery as q_stats_quantiles — one
    * map-side-combinable value histogram per metric, a cumulative sum
    * over the histogram (distinct metric values: day-counts, purchase
    * counts, money cents — all domain-bounded, never user-bounded), and a
    * 4-row collect of (boundary value, in-tie split rank). Scores are then
    * a broadcast CASE over those 12 constants; only rows whose metric
    * value EQUALS a boundary value need a rank-within-tie (a window
    * partitioned by the ≤4 boundary values over just the tied rows) to
    * reproduce ntile's exact tie-splitting by user_id. The returned plan
    * contains no unpartitioned window and no single-partition exchange;
    * per-user aggregation stays one map-side-combinable pass over the
    * log plus the 1-row max-ts broadcast (tripwire-exempt). */
  def rfm(spark: SparkSession, dir: String): DataFrame =
    rfmOf(Tables.events(spark, dir))

  /** [[rfm]] over any events-shaped frame (user_id, ts, event_type,
    * value) — the library-API form. */
  def rfmOf(ev: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val perUser = ev.groupBy(col("user_id")).agg(
      max(col("ts")).as("last_ts"),
      count(when(col("event_type") === "purchase", 1)).as("f"),
      coalesce(sum(when(col("event_type") === "purchase", cents)), lit(0L))
        .as("m_cents"))
      .crossJoin(broadcast(ev.agg(max(col("ts")).as("anchor_ts"))))
      .withColumn("r_days",
        datediff(to_date(col("anchor_ts")), to_date(col("last_ts"))).cast("long"))
      .select(col("user_id"), col("r_days"), col("f"), col("m_cents"))
      .localCheckpoint() // 3 cutpoint jobs + final read reuse one pass
    val n = perUser.count()
    val scored = Seq(
      ("r_score", -col("r_days")), // asc(-r_days) = ntile order (r_days DESC)
      ("f_score", col("f")),
      ("m_score", col("m_cents")))
      .foldLeft(perUser) { case (df, (name, key)) =>
        ntileByCutpoints(df, key, n, name)
      }
    scored.select(col("user_id"), col("r_days"), col("f"), col("m_cents"),
      col("r_score"), col("f_score"), col("m_score"))
  }

  /** Exact ntile(5) over (key asc, user_id asc) WITHOUT a global sort.
    * ntile's bucket of a row is determined by its global rank vs the four
    * bucket end-ranks k_b = b·(n/5) + min(b, n%5); rank = (#rows with
    * smaller key) + (rank by user_id within the key's tie group). So:
    * build the key histogram, cumulative-sum it (histogram-sized window —
    * the q_stats_quantiles exempt class), resolve each k_b to the smallest
    * value v_b whose cumulative count reaches it plus the split rank
    * t_b = k_b − cum(<v_b), collect those 4 rows, and assign
    * score = 1 + Σ_b [key > v_b ∨ (key = v_b ∧ tieRank > t_b)] where
    * tieRank is computed ONLY for rows tied at a boundary value (window
    * partitioned by the ≤4 boundary values; user_id is unique per row so
    * ties order totally). Matches ntile(5) bit-for-bit, including tie
    * groups straddling bucket boundaries. */
  private[operators] def ntileByCutpoints(
      df: DataFrame, key: Column, n: Long, scoreName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (n == 0) return df.withColumn(scoreName, lit(1).cast("int"))
    val q = n / 5
    val r = n % 5
    val ks = (1 to 4).map(b => b * q + math.min(b, r))
    val hist = df.select(key.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("v"))))
    val bk = explode(array(
      ks.zipWithIndex.map { case (k, i) =>
        struct(lit(i + 1).as("b"), lit(k).as("k")) }: _*)).as("bk")
    val bounds = hist.select(col("v"), col("cnt"), col("cum"), bk)
      .filter(col("cum") >= col("bk.k"))
      .groupBy(col("bk.b").as("b"), col("bk.k").as("k"))
      .agg(min(col("v")).as("vb"),
        min_by(col("cum") - col("cnt"), col("v")).as("cum_before"))
      .select(col("vb"), (col("k") - col("cum_before")).as("tb"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val tieVals = bounds.map(_._1).distinct.toSeq
    val rankCol = s"__tie_$scoreName"
    val ties = df.filter(key.cast("long").isin(tieVals: _*))
      .select(col("user_id"), key.cast("long").as("v"))
      .withColumn(rankCol,
        row_number().over(Window.partitionBy(col("v")).orderBy(col("user_id"))))
      .select(col("user_id"), col(rankCol))
    val past = bounds.map { case (vb, tb) =>
      when(key.cast("long") > lit(vb) ||
        (key.cast("long") === lit(vb) && col(rankCol) > lit(tb)), 1)
        .otherwise(0)
    }.reduce(_ + _)
    df.join(ties, Seq("user_id"), "left")
      .withColumn(scoreName, (lit(1) + past).cast("int"))
      .drop(rankCol)
  }

  private val rfmSql =
    s"""WITH $eventsUs,
       |u AS (SELECT user_id, max(ts) AS last_ts,
       |        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS f,
       |        CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
       |          THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS m_cents
       |      FROM e GROUP BY 1),
       |a AS (SELECT max(ts) AS anchor_ts FROM e)
       |SELECT user_id,
       |  date_diff('day', last_ts::DATE, anchor_ts::DATE) AS r_days,
       |  f, m_cents,
       |  ntile(5) OVER (ORDER BY date_diff('day', last_ts::DATE, anchor_ts::DATE) DESC, user_id) AS r_score,
       |  ntile(5) OVER (ORDER BY f, user_id) AS f_score,
       |  ntile(5) OVER (ORDER BY m_cents, user_id) AS m_score
       |FROM u, a""".stripMargin

  /** DAU / trailing-7-day WAU / stickiness per day — the standard
    * engagement rollup. The (day, user) DISTINCT pair table is the one
    * corpus-sized shuffle; WAU avoids a per-day sliding distinct by the
    * contribution trick: each active (day, user) contributes to the 7
    * target days it keeps the user "weekly active" for, and WAU(t) is a
    * plain count over the re-DISTINCTed contributions — constant 7×
    * fanout, both aggregates map-side combinable, no window over users.
    * Days with zero activity have no row (join keeps observed days only);
    * stickiness = dau/wau as one rounded double on exact integers. */
  def dauWau(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val dau = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val contrib = du
      .select(explode(sequence(col("d"), date_add(col("d"), 6))).as("t"),
        col("user_id"))
      .distinct()
    val wau = contrib.groupBy(col("t")).agg(count(lit(1)).as("wau"))
    dau.join(wau, dau("d") === wau("t"))
      .select(col("d"), col("dau"), col("wau"),
        graft.functions.Rounding.roundN(
          col("dau").cast("double") / col("wau"), 4).as("stickiness"))
  }

  /** DAU / trailing-28-day MAU / DAU-over-MAU stickiness — the monthly
    * engagement rollup (round-5 verdict ask #7). Same contribution trick
    * as [[dauWau]] at a 28× constant fanout: each distinct (day, user)
    * contributes to the 28 target days it keeps the user "monthly
    * active" for, then a plain re-DISTINCT + count per target day — no
    * per-day sliding distinct, no window over users, both aggregates
    * map-side combinable. The fanout is constant in corpus size (the
    * sliding-window-distinct control would carry a 28-day user multiset
    * through a window sort per day — unbounded state per day at scale);
    * the events scale decade measures this query's exponent directly. */
  def dauMau(spark: SparkSession, dir: String): DataFrame =
    dauMauOf(Tables.events(spark, dir))

  /** [[dauMau]] over any events-shaped frame — the library-API form. */
  def dauMauOf(ev: DataFrame): DataFrame = {
    val du = ev.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val dau = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val contrib = du
      .select(explode(sequence(col("d"), date_add(col("d"), 27))).as("t"),
        col("user_id"))
      .distinct()
    val mau = contrib.groupBy(col("t")).agg(count(lit(1)).as("mau"))
    dau.join(mau, dau("d") === mau("t"))
      .select(col("d"), col("dau"), col("mau"),
        graft.functions.Rounding.roundN(
          col("dau").cast("double") / col("mau"), 4).as("stickiness"))
  }

  private val dauMauSql =
    s"""WITH du AS (SELECT DISTINCT ts::DATE AS d, user_id FROM events),
       |dau AS (SELECT d, count(*) AS dau FROM du GROUP BY 1),
       |c AS (SELECT DISTINCT CAST(unnest(generate_series(d::TIMESTAMP,
       |        d::TIMESTAMP + INTERVAL 27 DAY, INTERVAL 1 DAY)) AS DATE) AS t,
       |        user_id
       |      FROM du),
       |mau AS (SELECT t, count(*) AS mau FROM c GROUP BY 1)
       |SELECT dau.d, dau.dau, mau.mau,
       |  ${graft.functions.Rounding.roundNSql(
            "CAST(dau.dau AS DOUBLE) / mau.mau", 4)} AS stickiness
       |FROM dau JOIN mau ON dau.d = mau.t""".stripMargin

  private val dauWauSql =
    s"""WITH du AS (SELECT DISTINCT ts::DATE AS d, user_id FROM events),
       |dau AS (SELECT d, count(*) AS dau FROM du GROUP BY 1),
       |c AS (SELECT DISTINCT CAST(unnest(generate_series(d::TIMESTAMP,
       |        d::TIMESTAMP + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS t,
       |        user_id
       |      FROM du),
       |wau AS (SELECT t, count(*) AS wau FROM c GROUP BY 1)
       |SELECT dau.d, dau.dau, wau.wau,
       |  ${graft.functions.Rounding.roundNSql(
            "CAST(dau.dau AS DOUBLE) / wau.wau", 4)} AS stickiness
       |FROM dau JOIN wau ON dau.d = wau.t""".stripMargin

  /** Revenue-concentration (Pareto/"whale") audit: what share of purchase
    * revenue do the users above the p50/p90/p99 spend cutpoints hold?
    * The cutpoints come from the engine's histogram-cumulative type-1
    * quantile form over the DISTINCT per-user cents values (the KS/
    * Mann-Whitney money-bounded histogram — the one unpartitioned-window
    * shape the tripwire whitelists), broadcast back as integer cents;
    * the shares are then one conditional aggregate. Tie semantics are
    * value-threshold ("strictly above the cutpoint value"), which is
    * deterministic without any per-user ranking. */
  def concentrationOf(ev: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val perUser = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(cents).as("m_cents"))
    val tot = perUser.agg(count(lit(1)).as("n_users"),
      sum(col("m_cents")).as("total_cents"))
    val cum = perUser.groupBy(col("m_cents")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("m_cents"))))
      .crossJoin(broadcast(tot))
    def cut(q: Double) =
      min(when(col("cum") >= ceil(lit(q) * col("n_users")), col("m_cents")))
    val cuts = cum.groupBy().agg(
      cut(0.5).as("c50"), cut(0.9).as("c90"), cut(0.99).as("c99"))
    def leg(c: String) = Seq(
      sum(when(col("m_cents") > col(c), 1L).otherwise(0L)).as(s"n_$c"),
      sum(when(col("m_cents") > col(c), col("m_cents")).otherwise(0L)).as(s"s_$c"))
    val agg = perUser.crossJoin(broadcast(cuts)).crossJoin(broadcast(tot))
      .groupBy()
      .agg(first(col("c50")).as("cut50"),
        (leg("c50") ++ leg("c90") ++ leg("c99") ++ Seq(
          first(col("c90")).as("cut90"), first(col("c99")).as("cut99"),
          first(col("total_cents")).as("total_cents"))): _*)
    agg.selectExpr(
      """stack(3,
        |  'p50', cut50, n_c50, floor(s_c50 * 1e4 / total_cents + 0.5) / 1e4,
        |  'p90', cut90, n_c90, floor(s_c90 * 1e4 / total_cents + 0.5) / 1e4,
        |  'p99', cut99, n_c99, floor(s_c99 * 1e4 / total_cents + 0.5) / 1e4
        |) AS (pct, cut_cents, n_top_users, rev_share)""".stripMargin)
      .orderBy(col("pct"))
  }

  def concentration(spark: SparkSession, dir: String): DataFrame =
    concentrationOf(Tables.events(spark, dir))

  private val concentrationSql =
    """WITH u AS (
      |  SELECT user_id, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m_cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |t AS (SELECT count(*) AS n_users, CAST(sum(m_cents) AS BIGINT) AS total_cents FROM u),
      |h AS (SELECT m_cents, count(*) AS cnt FROM u GROUP BY 1),
      |c AS (SELECT m_cents, sum(cnt) OVER (ORDER BY m_cents) AS cum FROM h),
      |cuts AS (SELECT
      |  min(CASE WHEN cum >= ceil(0.5 * n_users) THEN m_cents END) AS cut50,
      |  min(CASE WHEN cum >= ceil(0.9 * n_users) THEN m_cents END) AS cut90,
      |  min(CASE WHEN cum >= ceil(0.99 * n_users) THEN m_cents END) AS cut99
      |  FROM c CROSS JOIN t),
      |a AS (SELECT
      |  CAST(sum(CASE WHEN m_cents > cut50 THEN 1 ELSE 0 END) AS BIGINT) AS n50,
      |  CAST(sum(CASE WHEN m_cents > cut50 THEN m_cents ELSE 0 END) AS BIGINT) AS s50,
      |  CAST(sum(CASE WHEN m_cents > cut90 THEN 1 ELSE 0 END) AS BIGINT) AS n90,
      |  CAST(sum(CASE WHEN m_cents > cut90 THEN m_cents ELSE 0 END) AS BIGINT) AS s90,
      |  CAST(sum(CASE WHEN m_cents > cut99 THEN 1 ELSE 0 END) AS BIGINT) AS n99,
      |  CAST(sum(CASE WHEN m_cents > cut99 THEN m_cents ELSE 0 END) AS BIGINT) AS s99,
      |  any_value(cut50) AS cut50, any_value(cut90) AS cut90, any_value(cut99) AS cut99,
      |  any_value(total_cents) AS total_cents
      |  FROM u CROSS JOIN cuts CROSS JOIN t)
      |SELECT 'p50' AS pct, cut50 AS cut_cents, n50 AS n_top_users,
      |  floor(s50 * 1e4 / total_cents + 0.5) / 1e4 AS rev_share FROM a
      |UNION ALL
      |SELECT 'p90', cut90, n90, floor(s90 * 1e4 / total_cents + 0.5) / 1e4 FROM a
      |UNION ALL
      |SELECT 'p99', cut99, n99, floor(s99 * 1e4 / total_cents + 0.5) / 1e4 FROM a
      |ORDER BY pct""".stripMargin

  /** Seasonal-naive forecast backtest — the baseline every real
    * forecasting deployment must beat, evaluated in-engine: per event
    * type, predict each day's revenue with (a) the same weekday one week
    * earlier (seasonal-naive, lag-7) and (b) yesterday (persistence,
    * lag-1), and report each baseline's MAE over the days where the lag
    * exists. Calendar joins (day − 7 / day − 1 equi-joins on the daily
    * aggregate), NOT window lags — gaps in the calendar then mean "no
    * prediction" instead of silently comparing against the wrong day,
    * and the daily table is (days × types)-sized so the joins are
    * dimension-scale at any SF. All error arithmetic is integer cents;
    * the MAE division is the single float op, on identical exact sums. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(cents).as("c")).localCheckpoint()
    def lagJoin(k: Int, as: String) = daily.select(
      col("event_type").as(s"t$k"), date_add(col("day"), k).as(s"d$k"),
      col("c").as(as))
    daily
      .join(lagJoin(7, "pred7"),
        col("event_type") === col("t7") && col("day") === col("d7"), "left_outer")
      .join(lagJoin(1, "pred1"),
        col("event_type") === col("t1") && col("day") === col("d1"), "left_outer")
      .groupBy(col("event_type"))
      .agg(
        count(when(col("pred7").isNotNull, 1)).as("n_eval7"),
        (sum(when(col("pred7").isNotNull, abs(col("c") - col("pred7"))))
          .cast("double") / count(when(col("pred7").isNotNull, 1))).as("mae7_cents"),
        count(when(col("pred1").isNotNull, 1)).as("n_eval1"),
        (sum(when(col("pred1").isNotNull, abs(col("c") - col("pred1"))))
          .cast("double") / count(when(col("pred1").isNotNull, 1))).as("mae1_cents"))
      .orderBy(col("event_type"))
  }

  private val forecastBacktestSql =
    """WITH d AS (
      |  SELECT event_type, ts::DATE AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2)
      |SELECT d.event_type,
      |  count(p7.c) AS n_eval7,
      |  CAST(sum(CASE WHEN p7.c IS NOT NULL THEN abs(d.c - p7.c) END) AS DOUBLE)
      |    / count(p7.c) AS mae7_cents,
      |  count(p1.c) AS n_eval1,
      |  CAST(sum(CASE WHEN p1.c IS NOT NULL THEN abs(d.c - p1.c) END) AS DOUBLE)
      |    / count(p1.c) AS mae1_cents
      |FROM d
      |LEFT JOIN d p7 ON p7.event_type = d.event_type AND p7.day + 7 = d.day
      |LEFT JOIN d p1 ON p1.event_type = d.event_type AND p1.day + 1 = d.day
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Burst-collapse gap for telemetry debouncing, in microseconds. */
  val DebounceGapUs: Long = 300L * 1000 * 1000 // 5 minutes

  /** Telemetry debounce (burst collapse): retransmitted / rage-click
    * bursts — runs of same-(user, type) events each under 5 minutes after
    * the previous — collapse to one row per burst carrying the first
    * timestamp, the collapsed count, and the exact burst span. Classic
    * gaps-and-islands: the break flag is a lag over the per-(user, type)
    * partition, the burst id its running sum — both windows partitioned by
    * the key (bounded by one user's traffic, never corpus-sized), and the
    * span arithmetic stays in integer epoch-microseconds in both engines.
    * At 100 TB this is the ingest-dedup pass that runs before sessionizing:
    * one shuffle on (user_id, event_type), map-side nothing to combine but
    * also nothing corpus-global. */
  def debounce(spark: SparkSession, dir: String): DataFrame =
    debounceOf(Tables.events(spark, dir))

  def debounceOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("us", unix_micros(col("ts")))
      .withColumn("brk",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) >= DebounceGapUs, 1)
          .otherwise(0))
      .withColumn("burst", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("event_type"), col("burst"))
      .agg(min(col("ts")).as("burst_start"), count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("span_us"))
      .select(col("user_id"), col("event_type"), col("burst_start"),
        col("n_events"), col("span_us"))
  }

  private val debounceSql =
    s"""WITH $eventsUs,
       |x AS (SELECT user_id, event_type, ts, event_id, epoch_us(ts) AS us,
       |        CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= $DebounceGapUs
       |             THEN 1 ELSE 0 END AS brk
       |      FROM e
       |      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
       |y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id, event_type
       |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS burst
       |      FROM x)
       |SELECT user_id, event_type, min(ts) AS burst_start,
       |  count(*) AS n_events, CAST(max(us) - min(us) AS BIGINT) AS span_us
       |FROM y GROUP BY user_id, event_type, burst""".stripMargin

  /** Cohort LTV curves: users cohorted by first-purchase day, revenue
    * accumulated per cohort over day-age — the growth-team matrix that
    * answers "do newer cohorts monetize faster". All revenue is exact
    * integer cents; the only float op is the final per-user division,
    * quantized. The cumulative window partitions BY COHORT over ages — a
    * partition bounded by the calendar (#months), never by users or
    * events; everything user-sized is a map-side-combinable aggregate. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame =
    cohortLtvOf(Tables.events(spark, dir))

  def cohortLtvOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"), cents.as("cents"))
    val cohort = p.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sized = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("n_users"))
    val aged = p.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("age"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aged.join(sized, "cohort_day")
      .withColumn("cum_cents", sum(col("rev_cents")).over(w))
      .select(col("cohort_day"), col("age"), col("n_users"),
        col("rev_cents"), col("cum_cents"),
        roundN(col("cum_cents").cast("double") / col("n_users"), 4)
          .as("ltv_cents_per_user"))
      .orderBy(col("cohort_day"), col("age"))
  }

  private val cohortLtvSql =
    s"""WITH $eventsUs,
       |p AS (SELECT user_id, ts::DATE AS day,
       |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
       |      FROM e WHERE event_type = 'purchase'),
       |c AS (SELECT user_id, min(day) AS cohort_day FROM p GROUP BY 1),
       |sz AS (SELECT cohort_day, count(*) AS n_users FROM c GROUP BY 1),
       |a AS (SELECT c.cohort_day,
       |        CAST(date_diff('day', c.cohort_day, p.day) AS INT) AS age,
       |        CAST(sum(p.cents) AS BIGINT) AS rev_cents
       |      FROM p JOIN c USING (user_id) GROUP BY 1, 2),
       |x AS (SELECT a.cohort_day, a.age, sz.n_users, a.rev_cents,
       |        CAST(sum(a.rev_cents) OVER (PARTITION BY a.cohort_day
       |          ORDER BY a.age ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
       |      FROM a JOIN sz USING (cohort_day))
       |SELECT cohort_day, age, n_users, rev_cents, cum_cents,
       |  ${roundNSql("CAST(cum_cents AS DOUBLE) / n_users", 4)} AS ltv_cents_per_user
       |FROM x ORDER BY cohort_day, age""".stripMargin

  /** Time-to-convert: per user, seconds from the FIRST view to the first
    * purchase at-or-after it; the report is exact type-1 p50/p90 over the
    * converting users, via the histogram-cumulative quantile form
    * (distinct latency-seconds values — time-domain-bounded — feed the
    * only unpartitioned window, the whitelisted q_stats_quantiles class;
    * user-sized work stays in keyed aggregates). */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame =
    funnelLatencyOf(Tables.events(spark, dir))

  def funnelLatencyOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fv = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("fv_us"))
    val lat = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
      .join(fv, "user_id")
      .filter(col("p_us") >= col("fv_us"))
      .groupBy(col("user_id")).agg(min(col("p_us")).as("fp_us"))
      .join(fv, "user_id")
      .select(((col("fp_us") - col("fv_us")) / lit(1000000L)).cast("long").as("lat_s"))
    val hist = lat.groupBy(col("lat_s")).agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("lat_s"))))
      .crossJoin(broadcast(hist.agg(sum(col("cnt")).as("n"))))
    def pick(q: Double) = min(when(col("cum") >= ceil(lit(q) * col("n")), col("lat_s")))
    cum.agg(max(col("n")).as("n_converted"),
      pick(0.5).as("p50_s"), pick(0.9).as("p90_s"))
  }

  private val funnelLatencySql =
    s"""WITH $eventsUs,
       |fv AS (SELECT user_id, min(epoch_us(ts)) AS fv_us
       |       FROM e WHERE event_type = 'view' GROUP BY 1),
       |fp AS (SELECT e.user_id, min(epoch_us(e.ts)) AS fp_us
       |       FROM e JOIN fv USING (user_id)
       |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.fv_us
       |       GROUP BY 1),
       |lat AS (SELECT CAST((fp.fp_us - fv.fv_us) // 1000000 AS BIGINT) AS lat_s
       |        FROM fp JOIN fv USING (user_id)),
       |hist AS (SELECT lat_s, count(*) AS cnt FROM lat GROUP BY 1),
       |cum AS (SELECT lat_s, sum(cnt) OVER (ORDER BY lat_s) AS cum,
       |          sum(cnt) OVER () AS n
       |        FROM hist)
       |SELECT CAST(max(n) AS BIGINT) AS n_converted,
       |  min(CASE WHEN cum >= ceil(0.5 * n) THEN lat_s END) AS p50_s,
       |  min(CASE WHEN cum >= ceil(0.9 * n) THEN lat_s END) AS p90_s
       |FROM cum""".stripMargin

  // ----------------------------------------------------------------- paths

  /** Leading steps kept per session path. */
  val PathSteps = 4
  /** Paths reported (bounded-heap top-k). */
  val PathTopK = 20

  /** Session path analysis: the PathTopK most common session-opening
    * event-type sequences (first PathSteps events of each 30-minute-gap
    * session) — "how do sessions start and where do they go". Ordering
    * inside a session is pinned by (ts, event_id), so the path string is
    * deterministic in both engines.
    *
    * Scale shape: sessionization is the user-partitioned gaps-and-islands
    * pair of windows (user-keyed — skewed users are the known hazard, AQE
    * applies); the path aggregate's key space is bounded by
    * |event types|^PathSteps, and the final top-k is orderBy+limit —
    * TakeOrderedAndProject's bounded heap, no global sort. */
  def paths(spark: SparkSession, dir: String): DataFrame =
    pathsOf(Tables.events(spark, dir))

  def pathsOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = ev
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("brk",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) >= 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(run))
    val perSess = sess
      .groupBy(col("user_id"), col("sid"))
      .agg(sort_array(collect_list(struct(col("us"), col("event_id"), col("event_type"))))
        .as("evs"))
      .select(array_join(
        transform(slice(col("evs"), 1, PathSteps), e => e.getField("event_type")),
        ">").as("path"))
    perSess.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(PathTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))))
  }

  private val pathsSql =
    s"""WITH $eventsUs,
       |x AS (SELECT user_id, event_id, ts, event_type,
       |        CASE WHEN lag(ts) OVER w IS NULL
       |               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
       |      FROM e
       |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                               ROWS UNBOUNDED PRECEDING) AS sid
       |      FROM x),
       |s AS (SELECT array_to_string(
       |          (list(event_type ORDER BY ts, event_id))[1:$PathSteps], '>') AS path
       |      FROM y GROUP BY user_id, sid),
       |c AS (SELECT path, count(*) AS n_sessions FROM s GROUP BY 1
       |      ORDER BY n_sessions DESC, path LIMIT $PathTopK)
       |SELECT path, n_sessions,
       |  CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS INT) AS rank
       |FROM c""".stripMargin

  // ---------------------------------------------- linear multi-touch attribution

  /** Attribution lookback: touches within 7 days before the purchase. */
  val TouchLookbackUs: Long = 7L * 24 * 3600 * 1000000L

  /** Linear multi-touch attribution: each purchase's revenue is split
    * EQUALLY across all click/view touches in the 7-day lookback
    * (last-touch is `q_events_attribution`). The split stays exact
    * integer cents: every touch gets cents div n and the LATEST touch
    * (ts, event_id desc) carries the remainder — a pinned deterministic
    * rule, so channel revenue sums reconstruct total purchase revenue to
    * the cent. Untouched purchases attribute to 'none'.
    *
    * Scale shape: purchases ⋈ touches is a user-keyed equi-join with the
    * range predicate applied on top (the q_join_range_events pattern);
    * per-user fan-out is purchases × touches inside the lookback —
    * bounded by the window, with the usual AQE skew guard for
    * pathological users. */
  def attributionLinear(spark: SparkSession, dir: String): DataFrame =
    attributionLinearOf(Tables.events(spark, dir))

  def attributionLinearOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"),
        col("event_id").as("p_id"), cents.as("cents"))
    val t = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("t_id"), col("event_type").as("channel"))
    val joined = p.join(t,
      Seq("user_id")).where(
        col("t_us") <= col("p_us") && col("t_us") > col("p_us") - TouchLookbackUs)
    val w = Window.partitionBy(col("user_id"), col("p_id"))
    val rankW = Window.partitionBy(col("user_id"), col("p_id"))
      .orderBy(col("t_us").desc, col("t_id").desc)
    val shares = joined
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("r", row_number().over(rankW))
      .withColumn("share",
        expr("cents div n") +
          when(col("r") === 1, col("cents") % col("n")).otherwise(0L))
    val touched = shares.groupBy(col("channel"))
      .agg(countDistinct(col("user_id"), col("p_id")).as("n_purchases"),
        (sum(col("share")) / 100.0).as("revenue"))
    // 'none' = purchases with ZERO in-window touches: anti-join against shares
    val none = p.join(shares.select(col("user_id"), col("p_id")).distinct(),
        Seq("user_id", "p_id"), "left_anti")
      .agg(count(lit(1)).as("n_purchases"), (sum(col("cents")) / 100.0).as("revenue"))
      .select(lit("none").as("channel"), col("n_purchases"), col("revenue"))
      .where(col("n_purchases") > 0)
    touched.unionByName(none)
  }

  private val attributionLinearSql =
    s"""WITH $eventsUs,
       |p AS (SELECT user_id, epoch_us(ts) AS p_us, event_id AS p_id,
       |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
       |      FROM e WHERE event_type = 'purchase'),
       |t AS (SELECT user_id, epoch_us(ts) AS t_us, event_id AS t_id,
       |        event_type AS channel
       |      FROM e WHERE event_type IN ('click', 'view')),
       |j AS (SELECT p.*, t.t_us, t.t_id, t.channel
       |      FROM p JOIN t USING (user_id)
       |      WHERE t.t_us <= p.p_us AND t.t_us > p.p_us - $TouchLookbackUs),
       |s AS (SELECT channel, user_id, p_id,
       |        CAST(cents // count(*) OVER (PARTITION BY user_id, p_id) AS BIGINT)
       |          + CASE WHEN row_number() OVER (PARTITION BY user_id, p_id
       |                                         ORDER BY t_us DESC, t_id DESC) = 1
       |                 THEN cents % count(*) OVER (PARTITION BY user_id, p_id)
       |                 ELSE 0 END AS share
       |      FROM j),
       |touched AS (SELECT channel, count(DISTINCT (user_id, p_id)) AS n_purchases,
       |              sum(share) / 100.0 AS revenue
       |            FROM s GROUP BY 1),
       |none_p AS (SELECT count(*) AS n_purchases, sum(cents) / 100.0 AS revenue
       |           FROM p WHERE NOT EXISTS (SELECT 1 FROM s
       |             WHERE s.user_id = p.user_id AND s.p_id = p.p_id))
       |SELECT channel, CAST(n_purchases AS BIGINT) AS n_purchases, revenue FROM touched
       |UNION ALL
       |SELECT 'none', CAST(n_purchases AS BIGINT), revenue FROM none_p WHERE n_purchases > 0""".stripMargin

  // ------------------------------------------------------- attribution-decay

  /** Time-decay half-life: a touch half the lookback old carries half
    * the weight of a touch at purchase time (2^(-Δ/half_life)). */
  val DecayHalfLifeUs: Long = TouchLookbackUs

  /** Time-decay multi-touch attribution — the third member of the
    * attribution family (last-touch `q_events_attribution`, equal-split
    * `q_events_attribution_linear`): each purchase's revenue is split
    * across its 7-day-lookback touches proportionally to
    * 2^(-Δ/half_life), so recent touches earn more credit.
    *
    * Exactness: the weight is the ONE transcendental step and it feeds a
    * sum, so it is quantized to integer MICRO-units first
    * (floor(2^(-Δ/hl)·1e6 + 0.5), token-identical in both engines — the
    * lm_score recipe); Δ < lookback = half-life keeps every quantized
    * weight in [500000, 1000000], never 0. Shares are then pure BIGINT:
    * cents·w div Σw per touch, with the LATEST touch (ts, event_id desc)
    * carrying the rounding remainder — the linear rule — so channel
    * revenue reconstructs total purchase revenue to the cent.
    *
    * Scale shape: identical to linear — user-keyed equi-join with the
    * range predicate on top, per-purchase fan-out bounded by the lookback
    * window, all windows partitioned by (user, purchase), map-side
    * combinable channel rollup. */
  def attributionDecay(spark: SparkSession, dir: String): DataFrame =
    attributionDecayOf(Tables.events(spark, dir))

  def attributionDecayOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"),
        col("event_id").as("p_id"), cents.as("cents"))
    val t = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("t_id"), col("event_type").as("channel"))
    val joined = p.join(t,
      Seq("user_id")).where(
        col("t_us") <= col("p_us") && col("t_us") > col("p_us") - TouchLookbackUs)
    val wMicro = floor(
      pow(lit(2.0),
        -(col("p_us") - col("t_us")).cast("double") / lit(DecayHalfLifeUs.toDouble))
        * 1e6 + 0.5).cast("long")
    val w = Window.partitionBy(col("user_id"), col("p_id"))
    val rankW = Window.partitionBy(col("user_id"), col("p_id"))
      .orderBy(col("t_us").desc, col("t_id").desc)
    val shares = joined
      .withColumn("w_micro", wMicro)
      .withColumn("sw", sum(col("w_micro")).over(w))
      .withColumn("base", expr("(cents * w_micro) div sw"))
      .withColumn("r", row_number().over(rankW))
      .withColumn("share",
        col("base") + when(col("r") === 1,
          col("cents") - sum(col("base")).over(w)).otherwise(0L))
    val touched = shares.groupBy(col("channel"))
      .agg(countDistinct(col("user_id"), col("p_id")).as("n_purchases"),
        (sum(col("share")) / 100.0).as("revenue"))
    val none = p.join(shares.select(col("user_id"), col("p_id")).distinct(),
        Seq("user_id", "p_id"), "left_anti")
      .agg(count(lit(1)).as("n_purchases"), (sum(col("cents")) / 100.0).as("revenue"))
      .select(lit("none").as("channel"), col("n_purchases"), col("revenue"))
      .where(col("n_purchases") > 0)
    touched.unionByName(none)
  }

  private val attributionDecaySql =
    s"""WITH $eventsUs,
       |p AS (SELECT user_id, epoch_us(ts) AS p_us, event_id AS p_id,
       |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
       |      FROM e WHERE event_type = 'purchase'),
       |t AS (SELECT user_id, epoch_us(ts) AS t_us, event_id AS t_id,
       |        event_type AS channel
       |      FROM e WHERE event_type IN ('click', 'view')),
       |j AS (SELECT p.*, t.t_us, t.t_id, t.channel,
       |        CAST(floor(power(2.0, -CAST(p.p_us - t.t_us AS DOUBLE)
       |          / ${DecayHalfLifeUs}.0) * 1e6 + 0.5) AS BIGINT) AS w_micro
       |      FROM p JOIN t USING (user_id)
       |      WHERE t.t_us <= p.p_us AND t.t_us > p.p_us - $TouchLookbackUs),
       |s0 AS (SELECT channel, user_id, p_id, cents, t_us, t_id,
       |         CAST((cents * w_micro) // sum(w_micro)
       |           OVER (PARTITION BY user_id, p_id) AS BIGINT) AS base
       |       FROM j),
       |s AS (SELECT channel, user_id, p_id,
       |        base + CASE WHEN row_number() OVER (PARTITION BY user_id, p_id
       |                                            ORDER BY t_us DESC, t_id DESC) = 1
       |               THEN cents - sum(base) OVER (PARTITION BY user_id, p_id)
       |               ELSE 0 END AS share
       |      FROM s0),
       |touched AS (SELECT channel, count(DISTINCT (user_id, p_id)) AS n_purchases,
       |              sum(share) / 100.0 AS revenue
       |            FROM s GROUP BY 1),
       |none_p AS (SELECT count(*) AS n_purchases, sum(cents) / 100.0 AS revenue
       |           FROM p WHERE NOT EXISTS (SELECT 1 FROM s
       |             WHERE s.user_id = p.user_id AND s.p_id = p.p_id))
       |SELECT channel, CAST(n_purchases AS BIGINT) AS n_purchases, revenue FROM touched
       |UNION ALL
       |SELECT 'none', CAST(n_purchases AS BIGINT), revenue FROM none_p WHERE n_purchases > 0""".stripMargin

  // -------------------------------------------------------------- lifecycle

  /** Weekly growth accounting — the new/retained/resurrected/churned
    * decomposition every growth team reports (net change = new +
    * resurrected − churned): per ISO week, users active this week split
    * by first-week and prior-week activity; churned counts users active
    * LAST week who went silent this week (so the week after the corpus
    * horizon carries the final churn row — kept, both engines agree).
    *
    * Scale shape: the corpus collapses to the DISTINCT (user, week)
    * activity table in one aggregate; classification is a self
    * full-outer-join on (user, week vs week+7) plus the user-keyed
    * first-week join — all equi-joins on user_id, map-side-combinable
    * final aggregate, calendar-bounded output. */
  def lifecycle(spark: SparkSession, dir: String): DataFrame =
    lifecycleOf(Tables.events(spark, dir))

  def lifecycleOf(ev: DataFrame): DataFrame = {
    val uw = ev.select(col("user_id"),
      to_date(date_trunc("week", col("ts"))).as("w")).distinct()
    val fw = uw.groupBy(col("user_id")).agg(min(col("w")).as("first_w"))
    val cur = uw.select(col("user_id"), col("w"), lit(1).as("cur"))
    val prev = uw.select(col("user_id"), date_add(col("w"), 7).as("w"), lit(1).as("prev"))
    cur.join(prev, Seq("user_id", "w"), "full_outer")
      .join(fw, "user_id")
      .groupBy(col("w"))
      .agg(
        sum(when(col("cur") === 1 && col("first_w") === col("w"), 1).otherwise(0))
          .cast("long").as("n_new"),
        sum(when(col("cur") === 1 && col("prev") === 1, 1).otherwise(0))
          .cast("long").as("n_retained"),
        sum(when(col("cur") === 1 && col("prev").isNull && col("first_w") < col("w"), 1)
          .otherwise(0)).cast("long").as("n_resurrected"),
        sum(when(col("prev") === 1 && col("cur").isNull, 1).otherwise(0))
          .cast("long").as("n_churned"))
      .orderBy(col("w"))
  }

  private val lifecycleSql =
    s"""WITH $eventsUs,
       |uw AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w FROM e),
       |fw AS (SELECT user_id, min(w) AS first_w FROM uw GROUP BY 1),
       |cur AS (SELECT user_id, w, 1 AS cur FROM uw),
       |prev AS (SELECT user_id, w + to_days(7) AS w, 1 AS prev FROM uw),
       |j AS (SELECT coalesce(cur.user_id, prev.user_id) AS user_id,
       |        coalesce(cur.w, prev.w) AS w, cur.cur, prev.prev
       |      FROM cur FULL OUTER JOIN prev
       |        ON cur.user_id = prev.user_id AND cur.w = prev.w)
       |SELECT j.w,
       |  CAST(sum(CASE WHEN cur = 1 AND first_w = j.w THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |  CAST(sum(CASE WHEN cur = 1 AND prev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       |  CAST(sum(CASE WHEN cur = 1 AND prev IS NULL AND first_w < j.w THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
       |  CAST(sum(CASE WHEN prev = 1 AND cur IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
       |FROM j JOIN fw USING (user_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------ rolling window

  /** 7-day rolling revenue per event type — the trailing-window trend
    * line, gap-correct: the window is a RANGE frame over the integer day
    * index (days since the fixed 2024-01-01 anchor), so missing calendar
    * days genuinely shrink the trailing sum instead of silently widening
    * the frame the way a ROWS frame would. Cents stay exact integers;
    * the per-(type, day) base is a keyed aggregate and the window
    * partitions by type over calendar-bounded rows. */
  def rolling(spark: SparkSession, dir: String): DataFrame =
    rollingOf(Tables.events(spark, dir))

  def rollingOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(cents).as("c"), count(lit(1)).as("n"))
      .withColumn("d", datediff(col("day"), lit("2024-01-01").cast("date")).cast("long"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d")).rangeBetween(-6, 0)
    daily
      .withColumn("c7", sum(col("c")).over(w))
      .withColumn("n7", sum(col("n")).over(w))
      .select(col("event_type"), col("day"),
        roundN(col("c").cast("double") / 100.0, 2).as("revenue"),
        roundN(col("c7").cast("double") / 100.0, 2).as("revenue_7d"),
        roundN(col("c7").cast("double") / col("n7") / 100.0, 4).as("avg_value_7d"))
  }

  private val rollingSql =
    s"""WITH $eventsUs,
       |d AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c,
       |        count(*) AS n
       |      FROM e GROUP BY 1, 2),
       |x AS (SELECT *, date_diff('day', DATE '2024-01-01', day) AS di FROM d),
       |r AS (SELECT event_type, day, c,
       |        CAST(sum(c) OVER w AS BIGINT) AS c7, CAST(sum(n) OVER w AS BIGINT) AS n7
       |      FROM x
       |      WINDOW w AS (PARTITION BY event_type ORDER BY di
       |                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
       |SELECT event_type, day,
       |  ${roundNSql("CAST(c AS DOUBLE) / 100.0", 2)} AS revenue,
       |  ${roundNSql("CAST(c7 AS DOUBLE) / 100.0", 2)} AS revenue_7d,
       |  ${roundNSql("CAST(c7 AS DOUBLE) / n7 / 100.0", 4)} AS avg_value_7d
       |FROM r""".stripMargin

  // ----------------------------------------------------------------- dwell

  /** Transition dwell times — the time dimension the Markov matrix
    * (`q_events_markov`) drops: per (from → to) event-type transition,
    * how long users linger before moving. Gaps are exact integer
    * microseconds out of a user-partitioned lead window; the aggregate is
    * keyed by the (groups²-bounded) transition pair. */
  def dwell(spark: SparkSession, dir: String): DataFrame =
    dwellOf(Tables.events(spark, dir))

  def dwellOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("us", unix_micros(col("ts")))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("gap_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"),
        roundN(sum(col("gap_us")).cast("double") / count(lit(1)) / 1e6, 3).as("mean_gap_s"),
        (max(col("gap_us")) / lit(1000000L)).cast("long").as("max_gap_s"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val dwellSql =
    s"""WITH $eventsUs,
       |x AS (SELECT user_id, event_type, epoch_us(ts) AS us,
       |        lead(event_type) OVER w AS to_type,
       |        lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
       |      FROM e
       |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT event_type AS from_type, to_type, count(*) AS n,
       |  ${roundNSql("CAST(sum(gap_us) AS DOUBLE) / count(*) / 1e6", 3)} AS mean_gap_s,
       |  CAST(max(gap_us) // 1000000 AS BIGINT) AS max_gap_s
       |FROM x WHERE to_type IS NOT NULL
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------- second-order markov

  /** Second-order transition matrix — P(next | previous two): the
    * sequence-model refinement of `q_events_markov` that answers whether
    * the journey is actually Markovian (compare P(c|b) to P(c|a,b) —
    * large gaps falsify the first-order model). Two leads over the same
    * user-partitioned window; the matrix is groups³-bounded. */
  def transitionMatrix2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trips = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("from1"), col("t2").as("from2"),
        col("t3").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trips.groupBy(col("from1"), col("from2"))
      .agg(sum(col("n")).as("n_ctx"))
    trips.join(totals, Seq("from1", "from2"))
      .select(col("from1"), col("from2"), col("to_type"), col("n"),
        roundN(col("n").cast("double") / col("n_ctx"), 6).as("p"))
      .orderBy(col("from1"), col("from2"), col("to_type"))
  }

  private val transitionMatrix2Sql =
    s"""WITH $eventsUs,
       |x AS (SELECT user_id, event_type,
       |        lead(event_type, 1) OVER w AS t2,
       |        lead(event_type, 2) OVER w AS t3
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |t AS (SELECT event_type AS from1, t2 AS from2, t3 AS to_type, count(*) AS n
       |      FROM x WHERE t3 IS NOT NULL GROUP BY 1, 2, 3),
       |tot AS (SELECT from1, from2, CAST(sum(n) AS BIGINT) AS n_ctx
       |        FROM t GROUP BY 1, 2)
       |SELECT from1, from2, to_type, n,
       |  ${roundNSql("CAST(n AS DOUBLE) / n_ctx", 6)} AS p
       |FROM t JOIN tot USING (from1, from2)
       |ORDER BY from1, from2, to_type""".stripMargin

  // ------------------------------------------------------------------ gini

  /** Gini coefficient of per-user purchase spend — the inequality summary
    * next to the Pareto cutpoints (`q_events_concentration`): 0 = every
    * user spends alike, →1 = one whale carries the corpus. Computed on
    * the DISTINCT spend-cents histogram (money-bounded, the whitelisted
    * cumulative class — never a user-sized sort) via the grouped-data
    * identity G = Σ c_i·x_i·(2·cumBefore_i + c_i − n) / (n·Σx), whose
    * numerator and denominator are exact BIGINTs; one final division.
    * Overflow budget: n·Σcents < 2^63 (≈ 10⁹ users × $90M total) —
    * beyond, lift to DECIMAL. */
  def gini(spark: SparkSession, dir: String): DataFrame =
    giniOf(Tables.events(spark, dir))

  def giniOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val spend = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(cents).as("x"))
    val hist = spend.groupBy(col("x")).agg(count(lit(1)).as("c"))
    val win = Window.orderBy(col("x"))
    val cum = hist
      .withColumn("cb",
        coalesce(sum(col("c")).over(win.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"),
        sum(col("c") * col("x")).as("sx"))))
    cum.agg(
      max(col("n")).as("n_users"),
      roundN(sum(col("c") * col("x") * (lit(2) * col("cb") + col("c") - col("n")))
        .cast("double") / (max(col("n")) * max(col("sx"))), 6).as("gini"))
  }

  private val giniSql =
    s"""WITH $eventsUs,
       |u AS (SELECT user_id, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |h AS (SELECT x, count(*) AS c FROM u GROUP BY 1),
       |cu AS (SELECT x, c,
       |         coalesce(sum(c) OVER (ORDER BY x
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
       |         sum(c) OVER () AS n, sum(c * x) OVER () AS sx
       |       FROM h)
       |SELECT CAST(max(n) AS BIGINT) AS n_users,
       |  ${roundNSql(
        "CAST(sum(c * x * (2 * cb + c - n)) AS DOUBLE) / (max(n) * max(sx))", 6)} AS gini
       |FROM cu""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_events_gini", gini, Some(giniSql)),
    Q("q_events_markov2", transitionMatrix2, Some(transitionMatrix2Sql)),
    Q("q_events_rolling", rolling, Some(rollingSql)),
    Q("q_events_dwell", dwell, Some(dwellSql)),
    Q("q_events_lifecycle", lifecycle, Some(lifecycleSql)),
    Q("q_events_paths", paths, Some(pathsSql)),
    Q("q_events_attribution_linear", attributionLinear, Some(attributionLinearSql)),
    Q("q_events_attribution_decay", attributionDecay, Some(attributionDecaySql)),
    Q("q_events_funnel_ci", funnelCi, Some(funnelCiSql)),
    Q("q_events_cohort_ltv", cohortLtv, Some(cohortLtvSql)),
    Q("q_events_funnel_latency", funnelLatency, Some(funnelLatencySql)),
    Q("q_events_debounce", debounce, Some(debounceSql)),
    Q("q_events_forecast_naive", forecastBacktest, Some(forecastBacktestSql)),
    Q("q_events_concentration", concentration, Some(concentrationSql)),
    Q("q_events_attribution", attribution, Some(attributionSql)),
    Q("q_events_rfm", rfm, Some(rfmSql)),
    Q("q_events_dau", dauWau, Some(dauWauSql)),
    Q("q_events_mau", dauMau, Some(dauMauSql)),
    Q("q_events_markov", transitionMatrix, Some(transitionMatrixSql)),
    Q("q_events_markov_capped", transitionMatrixCapped, Some(transitionMatrixCappedSql)),
    Q("q_events_cum_users", cumulativeUsers, Some(cumulativeUsersSql)),
    Q("q_events_anomaly", anomalies, Some(anomaliesSql)),
    Q("q_events_funnel", funnel, Some(funnelSql)),
    Q("q_events_funnel_steps", funnelSteps, Some(funnelStepsSql)),
    Q("q_events_retention", retention, Some(retentionSql)),
    Q("q_events_window", windowBatch, Some(
      s"""WITH $eventsUs
         |SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS n_events, ${roundNSql("sum(value)", 2)} AS total_value
         |FROM e GROUP BY 1, 2""".stripMargin), bench = true),
    Q("q_events_session", sessionBatch, Some(sessionSql), bench = true),
    Q("q_join_range_events", eventPairsRange, Some(eventPairsRangeSql), bench = true),
    // oracle mirrors the expansion: each event replicated into the 4
    // slide-aligned windows covering it
    Q("q_events_hopping", hoppingBatch, Some(
      s"""WITH $eventsUs,
         |x AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts) - to_minutes(15 * k) AS window_start,
         |             event_type, value
         |      FROM e CROSS JOIN range(0, 4) r(k))
         |SELECT window_start, event_type, count(*) AS n_events,
         |  ${roundNSql("sum(value)", 2)} AS total_value
         |FROM x GROUP BY 1, 2""".stripMargin)),
  )
}
