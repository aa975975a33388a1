package graft.operators

import graft.Q
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

  val queries: Seq[Q] = Seq(
    Q("q_events_streaks", streaks, Some(streaksSql)))
}
