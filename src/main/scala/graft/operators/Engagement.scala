package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Activity-streak distribution — the engagement metric next to
  * DAU/MAU/retention: for each user the LONGEST run of consecutive
  * active days, reported as a histogram (streak length → users).
  *
  * Scale design: the corpus collapses to DISTINCT (user, day) in one
  * aggregate; the gaps-and-islands walk (day − row_number days is
  * constant within a run) is a user-partitioned window — the
  * sessionization shuffle class — and the output is bounded by the
  * calendar (a streak cannot exceed the observation window). Everything
  * is integer arithmetic; no float appears anywhere. */
object Engagement {

  def streaks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val days = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val runs = days
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("longest"))
    runs.groupBy(col("longest").as("streak_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("streak_days"))
  }

  private val streaksSql =
    """WITH e AS (SELECT DISTINCT user_id, CAST(ts::TIMESTAMP AS DATE) AS day
      |           FROM events),
      |r AS (SELECT user_id,
      |        day - to_days(CAST(row_number() OVER (PARTITION BY user_id
      |          ORDER BY day) AS INT)) AS grp
      |      FROM e),
      |runs AS (SELECT user_id, grp, count(*) AS len FROM r GROUP BY 1, 2),
      |u AS (SELECT user_id, max(len) AS longest FROM runs GROUP BY 1)
      |SELECT longest AS streak_days, count(*) AS n_users
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin

  /** Repurchase cadence: p50/p90 of the per-user gap between
    * CONSECUTIVE purchases — the retention input behind "when should
    * the win-back campaign fire". Per-user lag (the sessionization
    * shuffle class) → exact gap SECONDS → type-1 quantiles over the
    * DISTINCT-gap-seconds histogram (the q_events_funnel_latency
    * whitelisted cumulative class — bounded by the time domain, never
    * a user-sized sort). */
  def interPurchase(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(floor((unix_micros(col("ts")) - unix_micros(col("prev")))
        .cast("double") / 1e6).cast("long").as("gap_s"))
    val cum = gaps.groupBy(col("gap_s")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt"))
        .over(Window.orderBy(col("gap_s"))))
      .crossJoin(broadcast(gaps.agg(count(lit(1)).as("n"))))
    cum.agg(
      max(col("n")).as("n_gaps"),
      min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("gap_s"))).as("p50_s"),
      min(when(col("cum") >= ceil(lit(0.9) * col("n")), col("gap_s"))).as("p90_s"))
  }

  private val interPurchaseSql =
    """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type FROM events),
      |g AS (SELECT CAST(floor(CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS DOUBLE) / 1e6) AS BIGINT) AS gap_s
      |      FROM e WHERE event_type = 'purchase'
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |      QUALIFY lag(ts) OVER w IS NOT NULL),
      |h AS (SELECT gap_s, count(*) AS cnt FROM g GROUP BY 1),
      |c AS (SELECT gap_s, sum(cnt) OVER (ORDER BY gap_s) AS cum,
      |        sum(cnt) OVER () AS n
      |      FROM h)
      |SELECT CAST(max(n) AS BIGINT) AS n_gaps,
      |  min(CASE WHEN cum >= ceil(0.5 * n) THEN gap_s END) AS p50_s,
      |  min(CASE WHEN cum >= ceil(0.9 * n) THEN gap_s END) AS p90_s
      |FROM c""".stripMargin

  /** Retention by ACQUISITION CHANNEL: users cohorted by the event type
    * of their very first event (ties broken by event_id), then counted
    * in every later week they return — "which front door brings users
    * who stay". Two user-keyed aggregates + one join (the
    * q_events_retention shape with a channel axis); the matrix is
    * (channels × weeks)-bounded on the wire. Weeks are anchor-based
    * integer offsets (no engine week() semantics). */
  def retentionByChannel(spark: SparkSession, dir: String): DataFrame = {
    val wk = expr("CAST(floor(datediff(CAST(ts AS DATE), DATE '2024-01-01') / 7) AS BIGINT)")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        wk.as("wk"))
    val first = ev.groupBy(col("user_id")).agg(
      min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("channel"),
      min(col("wk")).as("wk0"))
    val active = ev.select(col("user_id"), col("wk")).distinct()
    val cohorts = first.groupBy(col("channel")).agg(count(lit(1)).as("n_cohort"))
    active.join(first, "user_id")
      .groupBy(col("channel"), (col("wk") - col("wk0")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(cohorts), "channel")
      .select(col("channel"), col("week_offset"), col("n_active"),
        roundN(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
      .orderBy(col("channel"), col("week_offset"))
  }

  private val retentionByChannelSql =
    s"""WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type,
       |             CAST(floor(CAST(date_diff('day', DATE '2024-01-01',
       |               CAST(ts::TIMESTAMP AS DATE)) AS DOUBLE) / 7) AS BIGINT) AS wk
       |           FROM events),
       |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id) AS rn FROM e),
       |f AS (SELECT user_id,
       |        max(CASE WHEN rn = 1 THEN event_type END) AS channel,
       |        min(wk) AS wk0
       |      FROM r GROUP BY 1),
       |a AS (SELECT DISTINCT user_id, wk FROM e),
       |co AS (SELECT channel, count(*) AS n_cohort FROM f GROUP BY 1),
       |m AS (SELECT f.channel, a.wk - f.wk0 AS week_offset,
       |        count(DISTINCT a.user_id) AS n_active
       |      FROM a JOIN f USING (user_id)
       |      GROUP BY 1, 2)
       |SELECT m.channel, m.week_offset, m.n_active,
       |  ${roundNSql("CAST(m.n_active AS DOUBLE) / co.n_cohort", 6)} AS retention
       |FROM m JOIN co USING (channel)
       |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ event study

  /** Days on each side of the anchor in the event-study window. */
  val EventStudyWindow = 7

  /** Event study around each user's FIRST purchase — the peri-event
    * profile a causal read starts from (DID compares two period means;
    * this plots the full lead/lag path so pre-trends are visible): for
    * relative day τ ∈ [−7, 7], mean spend per anchored user at day
    * anchor+τ, with users who have no event that day contributing an
    * implicit exact zero — only the sum over OBSERVED (user, τ) rows and
    * the anchored-user count are ever materialized, never a user×τ
    * spine. The τ = 0 row spikes by construction (it contains every
    * user's first purchase) — the spec pins exactly that.
    *
    * Exactness: cents and counts are exact BIGINTs; mean_spend is one
    * final division. Scale shape: one keyed first-purchase aggregate,
    * one user-keyed equi-join with the ±7 range filter, a 15-group
    * aggregate, and the τ spine explodes from a literal sequence —
    * no window anywhere. */
  def eventStudy(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"),
        cents.as("c"))
    val anchor = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    val n = broadcast(anchor.agg(count(lit(1)).as("n_users")))
    val rel = ev.join(anchor, "user_id")
      .select(datediff(col("day"), col("d0")).cast("long").as("rel_day"),
        col("user_id"),
        when(col("event_type") === "purchase", col("c")).otherwise(0L).as("c"))
      .filter(col("rel_day").between(-EventStudyWindow, EventStudyWindow))
    val g = rel.groupBy(col("rel_day"))
      .agg(count_distinct(col("user_id")).as("n_active"),
        sum(col("c")).as("s"))
    spark.range(1).select(explode(sequence(lit(-EventStudyWindow.toLong),
        lit(EventStudyWindow.toLong))).as("rel_day"))
      .join(g, Seq("rel_day"), "left")
      .crossJoin(n)
      .select(col("rel_day"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        roundN(coalesce(col("s"), lit(0L)).cast("double") / col("n_users")
          / 100.0, 6).as("mean_spend"))
      .orderBy(col("rel_day"))
  }

  private val eventStudySql =
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, user_id, event_type, value FROM events),
       |ev AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
       |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |       FROM e),
       |an AS (SELECT user_id, min(day) AS d0 FROM ev
       |       WHERE event_type = 'purchase' GROUP BY 1),
       |nu AS (SELECT count(*) AS n_users FROM an),
       |rel AS (SELECT CAST(datediff('day', d0, day) AS BIGINT) AS rel_day,
       |          ev.user_id,
       |          CASE WHEN event_type = 'purchase' THEN c ELSE 0 END AS c
       |        FROM ev JOIN an USING (user_id)
       |        WHERE datediff('day', d0, day)
       |          BETWEEN -$EventStudyWindow AND $EventStudyWindow),
       |g AS (SELECT rel_day, count(DISTINCT user_id) AS n_active,
       |        CAST(sum(c) AS BIGINT) AS s
       |      FROM rel GROUP BY 1),
       |sp AS (SELECT unnest(range(-$EventStudyWindow, ${EventStudyWindow + 1}))
       |         AS rel_day)
       |SELECT CAST(sp.rel_day AS BIGINT) AS rel_day,
       |  CAST(coalesce(n_active, 0) AS BIGINT) AS n_active,
       |  ${roundNSql("CAST(coalesce(s, 0) AS DOUBLE) / n_users / 100.0", 6)}
       |    AS mean_spend
       |FROM sp LEFT JOIN g ON g.rel_day = sp.rel_day CROSS JOIN nu
       |ORDER BY 1""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_events_streaks", streaks, Some(streaksSql)),
    Q("q_events_interpurchase", interPurchase, Some(interPurchaseSql)),
    Q("q_events_eventstudy", eventStudy, Some(eventStudySql)),
    Q("q_events_retention_channel", retentionByChannel, Some(retentionByChannelSql)))
}
