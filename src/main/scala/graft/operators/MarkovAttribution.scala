package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Markov removal-effect attribution — the data-driven alternative to the
  * positional rules in `q_events_attribution` / `q_events_attribution_linear`
  * (reference scope: transform.py's per-category KPIs stop at rollups;
  * removal-effect is the standard upgrade once journeys are modeled).
  *
  * Model: user journeys become a first-order absorbing Markov chain over
  * channel states. START opens every journey segment (a user's stream
  * re-opens after each purchase), `purchase` absorbs at CONV, and the end
  * of an unconverted stream absorbs at NULL. A channel's credit is its
  * REMOVAL EFFECT: how much the START→CONV absorption probability drops
  * when every transition into that channel is redirected to NULL
  * (denominators unchanged — the standard formulation).
  *
  * Scale design (the [[KMeans]] / [[TrainClassifier]] driver-model shape):
  * the corpus reduces ONCE — one user-partitioned lag/lead window (the
  * q_events_markov class) and one (|types|+3)²-bounded transition
  * aggregate. The chain itself is a driver-sized model: value iteration
  * runs over ≤ (|types|+3)² rows × (|channels|+1) scenarios on the
  * driver, so 100 TB of events costs exactly one extra scan versus the
  * plain transition matrix.
  *
  * Exactness: absorption probabilities are the T = [[Steps]]-step value
  * iteration with per-term micro-quantization — p'_µ(s) =
  * Σ_t floor((n_st/n_s)·p_µ(t) + 0.5), an order-independent BIGINT sum of
  * identical IEEE products in both engines (the oracle unrolls the T
  * steps as chained CTEs, scenario-expanded). Shares are exact integer
  * ratios: share_c = (p_full − p_c) / Σ_d (p_full − p_d) — the p_full
  * normalization cancels, so the division is BIGINT/BIGINT → one double.
  */
object MarkovAttribution {

  /** Truncation depth of the value iteration — the metric is DEFINED as
    * the T-step absorption probability (both engines compute it
    * verbatim). With per-step absorption hazard ≥ ~0.2 on journey data,
    * the residual at 40 steps is ≈ 0.8⁴⁰ ≈ 1e-4 of a journey. */
  val Steps = 40

  private val Conv = "CONV"
  private val Term = "NULL_END"
  private val Start = "START"

  /** (s, t, n) transition counts with START/CONV/NULL_END states. */
  private def edges(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val x = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .withColumn("is_last", lead(col("event_type"), 1).over(w).isNull)
    val step = x.select(
      when(col("prev").isNull || col("prev") === "purchase", lit(Start))
        .otherwise(col("prev")).as("s"),
      when(col("event_type") === "purchase", lit(Conv))
        .otherwise(col("event_type")).as("t"))
    val ends = x.filter(col("is_last") && col("event_type") =!= "purchase")
      .select(col("event_type").as("s"), lit(Term).as("t"))
    step.unionByName(ends).groupBy(col("s"), col("t")).agg(count(lit(1)).as("n"))
  }

  /** Driver-side T-step absorption from START under `removed` (None =
    * full chain), mirroring the SQL arithmetic op-for-op. */
  private def absorb(
      tm: Seq[(String, String, Long)], removed: Option[String]): Long = {
    val nS = tm.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val kept = tm.filterNot { case (s, t, _) =>
      removed.exists(c => s == c || t == c) }
    val states = (tm.map(_._1) ++ tm.map(_._2)).distinct
    var p: Map[String, Long] =
      states.map(s => s -> (if (s == Conv) 1000000L else 0L)).toMap
    for (_ <- 1 to Steps) {
      val acc = kept.groupBy(_._1).map { case (s, rs) =>
        s -> rs.map { case (_, t, n) =>
          math.floor((n.toDouble / nS(s).toDouble) * p(t).toDouble + 0.5).toLong
        }.sum }
      p = states.map { s =>
        s -> (if (s == Conv) 1000000L else if (s == Term) 0L
              else acc.getOrElse(s, 0L))
      }.toMap
    }
    p.getOrElse(Start, 0L)
  }

  /** Per-channel removal effect + exact share of credit. */
  def removalEffect(spark: SparkSession, dir: String): DataFrame = {
    val tm = edges(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val channels = tm.map(_._2)
      .filter(t => t != Conv && t != Term).distinct.sorted
    val pFull = absorb(tm, None)
    val rows = channels.map { c =>
      val pc = absorb(tm, Some(c))
      (c, pFull, pc, pFull - pc)
    }
    val drop = rows.map(_._4).sum
    val out = rows.map { case (c, f, pc, d) =>
      Row(c, f / 1e6, pc / 1e6,
        if (f == 0L) null else Double.box(d.toDouble / f),
        if (drop == 0L) null else Double.box(d.toDouble / drop))
    }
    val schema = StructType(Seq(
      StructField("channel", StringType), StructField("p_conv", DoubleType),
      StructField("p_removed", DoubleType),
      StructField("removal_effect", DoubleType), StructField("share", DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
      .select(col("channel"), roundN(col("p_conv"), 6).as("p_conv"),
        roundN(col("p_removed"), 6).as("p_removed"),
        roundN(col("removal_effect"), 6).as("removal_effect"),
        roundN(col("share"), 6).as("share"))
      .orderBy(col("channel"))
  }

  // MATERIALIZED: without it DuckDB inlines the chain 2·Steps levels
  // deep and planning blows up (observed: >7 min at Steps=40; 6 s with)
  private def stepSql(k: Int): String =
    s"""a$k AS MATERIALIZED (SELECT tm2.scen, tm2.s AS state,
       |  CAST(sum(CAST(floor((CAST(tm2.n AS DOUBLE) / CAST(tm2.n_s AS DOUBLE)) *
       |    CAST(p.mu AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS acc
       |  FROM tm2 JOIN p${k - 1} p ON p.scen = tm2.scen AND p.state = tm2.t
       |  GROUP BY 1, 2),
       |p$k AS MATERIALIZED (SELECT st.scen, st.state,
       |  CASE WHEN st.state = '$Conv' THEN 1000000
       |       WHEN st.state = '$Term' THEN 0
       |       ELSE coalesce(a.acc, 0) END AS mu
       |  FROM sst st LEFT JOIN a$k a
       |    ON a.scen = st.scen AND a.state = st.state)""".stripMargin

  private val removalEffectSql: String =
    s"""WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type
       |           FROM events),
       |x AS (SELECT user_id, event_type,
       |        lag(event_type) OVER w AS prev,
       |        lead(event_type) OVER w IS NULL AS is_last
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |edges AS (
       |  SELECT CASE WHEN prev IS NULL OR prev = 'purchase' THEN '$Start'
       |              ELSE prev END AS s,
       |         CASE WHEN event_type = 'purchase' THEN '$Conv'
       |              ELSE event_type END AS t
       |  FROM x
       |  UNION ALL
       |  SELECT event_type, '$Term' FROM x
       |  WHERE is_last AND event_type <> 'purchase'),
       |tm AS (SELECT s, t, count(*) AS n FROM edges GROUP BY 1, 2),
       |tot AS (SELECT s, CAST(sum(n) AS BIGINT) AS n_s FROM tm GROUP BY 1),
       |ch AS (SELECT DISTINCT t AS c FROM tm
       |       WHERE t NOT IN ('$Conv', '$Term')),
       |scen AS (SELECT 'FULL' AS scen UNION ALL SELECT c FROM ch),
       |states AS (SELECT DISTINCT s AS state FROM
       |             (SELECT s FROM tm UNION ALL SELECT t FROM tm)),
       |sst AS (SELECT scen.scen, states.state FROM scen CROSS JOIN states),
       |tm2 AS (SELECT scen.scen, tm.s, tm.t, tm.n, tot.n_s
       |        FROM scen CROSS JOIN tm JOIN tot USING (s)
       |        WHERE scen.scen = 'FULL'
       |           OR (tm.s <> scen.scen AND tm.t <> scen.scen)),
       |p0 AS (SELECT scen, state,
       |         CASE WHEN state = '$Conv' THEN 1000000 ELSE 0 END AS mu
       |       FROM sst),
       |${(1 to Steps).map(stepSql).mkString(",\n")},
       |pr AS (SELECT scen, CAST(mu AS BIGINT) AS mu FROM p$Steps
       |       WHERE state = '$Start'),
       |fv AS (SELECT mu AS f FROM pr WHERE scen = 'FULL'),
       |d AS (SELECT pr.scen AS channel, fv.f, pr.mu AS pc, fv.f - pr.mu AS dr
       |      FROM pr CROSS JOIN fv WHERE pr.scen <> 'FULL'),
       |s AS (SELECT CAST(sum(dr) AS BIGINT) AS total_drop FROM d)
       |SELECT d.channel,
       |  ${roundNSql("CAST(d.f AS DOUBLE) / 1000000.0", 6)} AS p_conv,
       |  ${roundNSql("CAST(d.pc AS DOUBLE) / 1000000.0", 6)} AS p_removed,
       |  CASE WHEN d.f = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(d.dr AS DOUBLE) / d.f", 6)} END AS removal_effect,
       |  CASE WHEN s.total_drop = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(d.dr AS DOUBLE) / s.total_drop", 6)} END AS share
       |FROM d CROSS JOIN s
       |ORDER BY d.channel""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_events_attribution_markov", removalEffect, Some(removalEffectSql)))
}
