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
    // the transition matrix is ≤ (channels+2)² rows by construction; the
    // bound catches a pathological channel cardinality before it OOMs the
    // driver (1M edge rows ≈ a 1000-channel matrix — far past any real one)
    val tm = Guard.boundedCollect(edges(spark, dir), 1 << 20, "markov transition matrix")
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

  // ---------------------------------------------------------------- shapley

  /** Shapley-value channel attribution (Shapley 1953 applied to conversion
    * credit, the Zhao et al. 2018 marketing formulation) — the
    * coalition-game alternative to [[removalEffect]]: the characteristic
    * function v(S) is the observed conversion RATE of users whose
    * pre-conversion touched-channel set is exactly S (v = 0 for
    * unobserved coalitions and for ∅, the standard convention), and a
    * channel's credit is its Shapley value
    * φ_c = Σ_{S ⊆ C∖{c}} |S|!·(k−|S|−1)!/k! · (v(S∪{c}) − v(S)).
    * Unlike removal effect (which models journeys as a Markov chain and
    * asks "what if the channel vanished"), Shapley needs no transition
    * model and axiomatically satisfies efficiency:
    * Σ_c φ_c = v(full coalition).
    *
    * Journey definition: a user's channel set is their DISTINCT
    * non-purchase event types strictly before their first purchase
    * (converters) or over the whole stream (non-converters); users who
    * convert with no prior touch carry coalition ∅ and receive no
    * attribution.
    *
    * Exactness: v quantizes to micro-units via (conv·1e6) div n; margins,
    * factorial weights (k ≤ |event-type domain|, so k! fits BIGINT
    * comfortably) and φ_scaled = Σ |S|!·(k−|S|−1)!·margin_µ are exact
    * integer arithmetic; the single division φ_scaled / k! / 1e6 is one
    * fixed double tree.
    *
    * Scale shape: the corpus collapses in TWO keyed aggregates (first
    * purchase per user, then distinct touches → bitmask per user);
    * everything after lives on the ≤ 2^k coalition table — the subset
    * lattice joins are 2^k × k bounded nested-loop fanouts (whitelisted;
    * k is the event-type domain, a schema constant), never corpus-sized.
    * The channel bit-index window runs over ≤ k rows (whitelisted, same
    * bound). */
  def shapley(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val fp = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase", col("ts"))).as("fp"))
    val touches = ev.select(col("user_id"), col("ts"), col("event_type"))
      .filter(col("event_type") =!= "purchase")
      .join(fp, Seq("user_id"))
      .filter(col("fp").isNull || col("ts") < col("fp"))
      .select(col("user_id"), col("event_type")).distinct()
    val chan = touches.select(col("event_type")).distinct()
      .withColumn("b",
        (row_number().over(Window.orderBy(col("event_type"))) - 1).cast("int"))
      .localCheckpoint()
    val um = touches.join(broadcast(chan), Seq("event_type"))
      .groupBy(col("user_id"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), b)")).as("mask"))
      .join(fp, Seq("user_id"))
      .select(col("mask"), col("fp").isNotNull.cast("long").as("is_conv"))
    val coal = um.groupBy(col("mask"))
      .agg(count(lit(1)).as("n"), sum(col("is_conv")).as("conv"))
      .withColumn("v_mu", expr("(conv * 1000000) div n"))
      .localCheckpoint()
    val kk = chan.agg(count(lit(1)).cast("int").as("k"))
    val masks = kk
      .select(col("k"),
        explode(expr("sequence(CAST(0 AS BIGINT), shiftleft(CAST(1 AS BIGINT), k) - 1)"))
          .as("m"))
    val vall = masks.join(coal.select(col("mask").as("m"), col("v_mu")), Seq("m"), "left")
      .select(col("k"), col("m"), coalesce(col("v_mu"), lit(0L)).as("v_mu"))
      .localCheckpoint()
    val margins = vall.alias("v0")
      .join(broadcast(chan), expr("(v0.m & shiftleft(CAST(1 AS BIGINT), b)) = 0"))
      .join(vall.select(col("m").as("m1"), col("v_mu").as("v1")).alias("up"),
        expr("up.m1 = (v0.m | shiftleft(CAST(1 AS BIGINT), b))"))
      .select(col("event_type"), col("v0.k").as("k"),
        (factorial(bit_count(col("v0.m"))) *
          factorial(col("v0.k") - bit_count(col("v0.m")) - 1) *
          (col("v1") - col("v0.v_mu"))).as("term"))
    val exposed = coal.crossJoin(broadcast(chan))
      .filter(expr("(mask & shiftleft(CAST(1 AS BIGINT), b)) != 0"))
      .groupBy(col("event_type")).agg(sum(col("n")).as("exposed_users"))
    margins.groupBy(col("event_type"), col("k"))
      .agg(sum(col("term")).as("phi_scaled"))
      .join(exposed, Seq("event_type"), "left")
      .select(col("event_type").as("channel"),
        coalesce(col("exposed_users"), lit(0L)).as("exposed_users"),
        roundN(col("phi_scaled").cast("double") / factorial(col("k")) / 1e6, 6)
          .as("phi"))
      .orderBy(col("channel"))
  }

  private val shapleySql =
    s"""WITH e AS (SELECT ts::TIMESTAMP AS ts, user_id, event_type FROM events),
       |fp AS (SELECT user_id,
       |         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
       |       FROM e GROUP BY 1),
       |touches AS (SELECT DISTINCT e.user_id, e.event_type
       |            FROM e JOIN fp USING (user_id)
       |            WHERE e.event_type != 'purchase'
       |              AND (fp.fp IS NULL OR e.ts < fp.fp)),
       |chan AS (SELECT event_type,
       |           CAST(row_number() OVER (ORDER BY event_type) - 1 AS INTEGER) AS b
       |         FROM (SELECT DISTINCT event_type FROM touches)),
       |um AS (SELECT t.user_id,
       |         CAST(sum(1::BIGINT << b) AS BIGINT) AS mask
       |       FROM touches t JOIN chan USING (event_type) GROUP BY 1),
       |uc AS (SELECT um.mask,
       |         CASE WHEN fp.fp IS NOT NULL THEN 1 ELSE 0 END AS is_conv
       |       FROM um JOIN fp USING (user_id)),
       |coal AS (SELECT mask, count(*) AS n, CAST(sum(is_conv) AS BIGINT) AS conv,
       |           CAST((sum(is_conv) * 1000000) // count(*) AS BIGINT) AS v_mu
       |         FROM uc GROUP BY 1),
       |kk AS (SELECT CAST(count(*) AS INTEGER) AS k FROM chan),
       |masks AS (SELECT k, unnest(range(0, 1::BIGINT << k)) AS m FROM kk),
       |vall AS (SELECT masks.k, masks.m,
       |           CAST(coalesce(coal.v_mu, 0) AS BIGINT) AS v_mu
       |         FROM masks LEFT JOIN coal ON coal.mask = masks.m),
       |margins AS (SELECT chan.event_type, v0.k,
       |              CAST(factorial(bit_count(v0.m)) AS BIGINT)
       |                * CAST(factorial(v0.k - bit_count(v0.m) - 1) AS BIGINT)
       |                * (v1.v_mu - v0.v_mu) AS term
       |            FROM vall v0
       |            JOIN chan ON (v0.m & (1::BIGINT << b)) = 0
       |            JOIN vall v1 ON v1.m = (v0.m | (1::BIGINT << b))),
       |exposed AS (SELECT chan.event_type,
       |              CAST(sum(coal.n) AS BIGINT) AS exposed_users
       |            FROM coal JOIN chan ON (coal.mask & (1::BIGINT << b)) != 0
       |            GROUP BY 1),
       |phi AS (SELECT event_type, k, CAST(sum(term) AS BIGINT) AS phi_scaled
       |        FROM margins GROUP BY 1, 2)
       |SELECT phi.event_type AS channel,
       |  CAST(coalesce(exposed.exposed_users, 0) AS BIGINT) AS exposed_users,
       |  ${roundNSql(
             "CAST(phi_scaled AS DOUBLE) / CAST(factorial(k) AS BIGINT) / 1e6", 6)} AS phi
       |FROM phi LEFT JOIN exposed USING (event_type)
       |ORDER BY channel""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_events_attribution_markov", removalEffect, Some(removalEffectSql)),
    Q("q_events_attribution_shapley", shapley, Some(shapleySql)))
}
