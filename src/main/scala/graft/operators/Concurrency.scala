package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Peak concurrent sessions per day — the capacity-planning sweep-line:
  * sessions (the 30-minute-gap windows of `q_events_session`) become
  * +1/−1 boundary events, and the daily maximum of the running open
  * count is the load metric an ops team provisions against.
  *
  * Scale design — the global running sum is DECOMPOSED so no
  * events-sized data crosses one task:
  *  - within each DAY the running count is a day-partitioned window
  *    (boundaries per day, ordered ts then +1 before −1 so touching
  *    intervals count as concurrent);
  *  - the cross-day carry (sessions still open at midnight) is a
  *    cumulative sum over the per-day NET of deltas — a calendar-bounded
  *    series (the q_events_cum_users whitelisted window class);
  *  - day max = greatest(carry, carry + within-day running max) — the
  *    carry term covers the day-start plateau when every boundary in the
  *    day is a close. Days with no session boundary are absent (their
  *    concurrency is constant = the carry).
  * The oracle mirrors the same two-level decomposition — bitwise
  * identical because integer sums commute with the day split.
  *
  * Tie semantics, pinned: at an identical timestamp starts (+1) process
  * before ends (−1); a single-event session (start = end) therefore
  * still registers concurrency ≥ 1 at its instant.
  */
object Concurrency {

  def maxConcurrent(spark: SparkSession, dir: String): DataFrame =
    maxConcurrentOf(Tables.events(spark, dir))

  def maxConcurrentOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
    // boundaries via explode, NOT a union of two selects — a union
    // re-plans (and re-computes) the session aggregate once per branch;
    // the explode keeps ONE MergingSessions subtree with a 2× fanout
    val b = sessions.select(explode(array(
        struct(col("s").as("ts"), lit(1L).as("d")),
        struct(col("e").as("ts"), lit(-1L).as("d")))).as("x"))
      .select(col("x.ts").as("ts"), col("x.d").as("d"))
      .withColumn("day", to_date(col("ts")))
    val inDay = Window.partitionBy(col("day"))
      .orderBy(col("ts"), col("d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = b.withColumn("run", sum(col("d")).over(inDay))
      .groupBy(col("day"))
      .agg(max(col("run")).as("peak_in_day"), sum(col("d")).as("net"))
    val carryW = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    runs
      .withColumn("carry", coalesce(sum(col("net")).over(carryW), lit(0L)))
      .select(col("day"),
        greatest(col("carry"), col("carry") + col("peak_in_day")).as("max_concurrent"))
      .orderBy(col("day"))
  }

  private val maxConcurrentSql =
    """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events),
      |x AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x),
      |sessions AS (SELECT user_id, sid, min(ts) AS s, max(ts) AS e
      |             FROM y GROUP BY 1, 2),
      |b AS (SELECT s AS ts, 1 AS d FROM sessions
      |      UNION ALL SELECT e, -1 FROM sessions),
      |r AS (SELECT CAST(ts AS DATE) AS day,
      |        sum(d) OVER (PARTITION BY CAST(ts AS DATE)
      |          ORDER BY ts, d DESC ROWS UNBOUNDED PRECEDING) AS run,
      |        d
      |      FROM b),
      |g AS (SELECT day, max(run) AS peak, sum(d) AS net FROM r GROUP BY day),
      |c AS (SELECT day, peak,
      |        coalesce(sum(net) OVER (ORDER BY day
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry
      |      FROM g)
      |SELECT day, CAST(greatest(carry, carry + peak) AS BIGINT) AS max_concurrent
      |FROM c ORDER BY day""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_events_concurrency", maxConcurrent, Some(maxConcurrentSql)))
}
