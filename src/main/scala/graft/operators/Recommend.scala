package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Item-item collaborative filtering over order baskets, plus the
  * difference-in-differences estimator — the two analyses a growth team
  * runs on the same events/orders corpus the reference pipeline KPIs
  * (transform.py's rollups) summarize.
  *
  * Scale design:
  *  - Item-item cosine generates pairs WITHIN each order only — fanout
  *    per order is C(basket,2), bounded by basket size, never corpus².
  *    The per-item degree table joins by part key (AQE shuffle), cosine
  *    is row-local, and the per-item top-k rides the native bounded-heap
  *    TopK operator — the `q_basket_affinity` shuffle classes exactly.
  *  - DiD collapses events to per-(user, period) exact-cents sums in one
  *    keyed aggregate, then 4 conditional grand aggregates; the period
  *    split derives from the corpus min/max day — two 1-row broadcasts
  *    (the tripwire-exempt single-row shape).
  *
  * Exactness: cosine quantizes floor(co/√(n_a·n_b)·10⁶ + 0.5) once from
  * exact BIGINTs; DiD means are single divisions of exact cents sums.
  */
object Recommend {

  /** Neighbors kept per item. */
  val RecTopK = 3

  /** Item-item cosine similarity from basket co-occurrence:
    * cos(a,b) = co(a,b) / √(n_a·n_b), top-[[RecTopK]] neighbors per
    * item (ties break on neighbor id). */
  /** Distinct (order, part) projection shared by the CF queries. */
  private def liDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()

  /** Top-[[RecTopK]] cosine neighbors per item, with the raw
    * co-occurrence count kept for downstream exact corrections:
    * (item, neighbor, co, cos_mu). Shared by [[itemSim]] and
    * [[holdout]]. */
  private def simTop(spark: SparkSession, dir: String): DataFrame = {
    // NOT persisted: the projection scan is cheaper than a persist
    // barrier (A/B'd at sf0.1: 1.9-2.6 s either way, host-noise-bound;
    // the distinct shuffle re-runs but is the same exchange AQE reuses)
    val li = liDistinct(spark, dir)
    val deg = li.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val pairs = li.as("a").join(li.as("b"), "o")
      .filter(col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("co"))
    val sym = pairs.select(col("pa").as("item"), col("pb").as("neighbor"), col("co"))
      .unionByName(pairs.select(col("pb").as("item"), col("pa").as("neighbor"), col("co")))
    val scored = sym
      .join(deg.select(col("p").as("item"), col("n").as("n_i")), "item")
      .join(deg.select(col("p").as("neighbor"), col("n").as("n_j")), "neighbor")
      .select(col("item"), col("neighbor"), col("co"),
        floor(col("co").cast("double") /
          sqrt((col("n_i") * col("n_j")).cast("double")) * 1e6 + 0.5)
          .cast("long").as("cos_mu"))
    graft.plans.TopK.topK(scored, Seq("item"),
      Seq(("cos_mu", true), ("neighbor", false)), RecTopK)
  }

  def itemSim(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cos_mu").desc, col("neighbor"))
    simTop(spark, dir).select(col("item"), col("neighbor"), col("co"),
      roundN(col("cos_mu").cast("double") / 1e6, 6).as("cosine"),
      row_number().over(w).as("rank"))
  }

  /** Shared oracle CTE block mirroring [[simTop]]'s pair scoring. */
  private val simCtesSql =
    s"""li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |deg AS (SELECT p, count(*) AS n FROM li GROUP BY 1),
       |pr AS (SELECT a.p AS pa, b.p AS pb, count(*) AS co
       |       FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
       |       GROUP BY 1, 2),
       |sym AS (SELECT pa AS item, pb AS neighbor, co FROM pr
       |        UNION ALL SELECT pb, pa, co FROM pr),
       |sc AS (SELECT s.item, s.neighbor, s.co,
       |         CAST(floor(CAST(s.co AS DOUBLE) /
       |           sqrt(CAST(di.n * dj.n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS cos_mu
       |       FROM sym s
       |       JOIN deg di ON di.p = s.item
       |       JOIN deg dj ON dj.p = s.neighbor)""".stripMargin

  private val itemSimSql =
    s"""WITH $simCtesSql
       |SELECT item, neighbor, co,
       |  ${roundNSql("CAST(cos_mu AS DOUBLE) / 1e6", 6)} AS cosine,
       |  CAST(row_number() OVER (PARTITION BY item
       |    ORDER BY cos_mu DESC, neighbor) AS INT) AS rank
       |FROM sc
       |QUALIFY rank <= $RecTopK""".stripMargin

  // --------------------------------------------------------------- did

  /** Difference-in-differences of per-user purchase spend between the
    * deterministic md5 arms, periods split at the corpus midpoint day:
    * did = (T̄₂ − T̄₁) − (C̄₂ − C̄₁) over per-(user, period) cents sums
    * (users active in a period contribute; a silent user-period doesn't).
    */
  def did(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        when(col("event_type") === "purchase", cents).otherwise(0L).as("c"))
    val span = broadcast(ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(date_add(col("d0"),
        floor(datediff(col("d1"), col("d0")) / 2).cast("int")).as("mid")))
    val up = ev.crossJoin(span)
      .select(col("user_id"),
        when(col("day") <= col("mid"), lit(1)).otherwise(lit(2)).as("period"),
        col("c"))
      .groupBy(col("user_id"), col("period")).agg(sum(col("c")).as("s"))
      .select(Inference.armCol(col("user_id")).as("arm"), col("period"), col("s"))
    val g = up.agg(
      sum(when(col("arm") === 0 && col("period") === 1, col("s"))).as("sc1"),
      count(when(col("arm") === 0 && col("period") === 1, lit(1))).as("nc1"),
      sum(when(col("arm") === 0 && col("period") === 2, col("s"))).as("sc2"),
      count(when(col("arm") === 0 && col("period") === 2, lit(1))).as("nc2"),
      sum(when(col("arm") === 1 && col("period") === 1, col("s"))).as("st1"),
      count(when(col("arm") === 1 && col("period") === 1, lit(1))).as("nt1"),
      sum(when(col("arm") === 1 && col("period") === 2, col("s"))).as("st2"),
      count(when(col("arm") === 1 && col("period") === 2, lit(1))).as("nt2"))
    def m(s: String, n: String) = col(s).cast("double") / col(n) / lit(100.0)
    g.select(
      col("nc1"), col("nc2"), col("nt1"), col("nt2"),
      roundN(m("sc1", "nc1"), 6).as("mean_c1"),
      roundN(m("sc2", "nc2"), 6).as("mean_c2"),
      roundN(m("st1", "nt1"), 6).as("mean_t1"),
      roundN(m("st2", "nt2"), 6).as("mean_t2"),
      when(col("nc1") === 0L || col("nc2") === 0L ||
        col("nt1") === 0L || col("nt2") === 0L, lit(null).cast("double"))
        .otherwise(roundN(
          (m("st2", "nt2") - m("st1", "nt1")) - (m("sc2", "nc2") - m("sc1", "nc1")),
          6)).as("did"))
  }

  private val didSql = {
    def m(s: String, n: String) = s"(CAST($s AS DOUBLE) / $n / 100.0)"
    s"""WITH e AS (SELECT user_id, CAST(ts::TIMESTAMP AS DATE) AS day,
       |             CASE WHEN event_type = 'purchase'
       |               THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END AS c
       |           FROM events),
       |sp AS (SELECT min(day) + CAST(floor(CAST(date_diff('day', min(day), max(day)) AS INT) / 2) AS INT)
       |         AS mid FROM e),
       |up AS (SELECT ${Inference.armSql} AS arm,
       |         CASE WHEN e.day <= sp.mid THEN 1 ELSE 2 END AS period,
       |         CAST(sum(e.c) AS BIGINT) AS s
       |       FROM e CROSS JOIN sp
       |       GROUP BY user_id, 2),
       |g AS (SELECT
       |        CAST(sum(CASE WHEN arm = 0 AND period = 1 THEN s END) AS BIGINT) AS sc1,
       |        count(CASE WHEN arm = 0 AND period = 1 THEN 1 END) AS nc1,
       |        CAST(sum(CASE WHEN arm = 0 AND period = 2 THEN s END) AS BIGINT) AS sc2,
       |        count(CASE WHEN arm = 0 AND period = 2 THEN 1 END) AS nc2,
       |        CAST(sum(CASE WHEN arm = 1 AND period = 1 THEN s END) AS BIGINT) AS st1,
       |        count(CASE WHEN arm = 1 AND period = 1 THEN 1 END) AS nt1,
       |        CAST(sum(CASE WHEN arm = 1 AND period = 2 THEN s END) AS BIGINT) AS st2,
       |        count(CASE WHEN arm = 1 AND period = 2 THEN 1 END) AS nt2
       |      FROM up)
       |SELECT nc1, nc2, nt1, nt2,
       |  ${roundNSql(m("sc1", "nc1"), 6)} AS mean_c1,
       |  ${roundNSql(m("sc2", "nc2"), 6)} AS mean_c2,
       |  ${roundNSql(m("st1", "nt1"), 6)} AS mean_t1,
       |  ${roundNSql(m("st2", "nt2"), 6)} AS mean_t2,
       |  CASE WHEN nc1 = 0 OR nc2 = 0 OR nt1 = 0 OR nt2 = 0 THEN NULL
       |       ELSE ${roundNSql(
        s"(${m("st2", "nt2")} - ${m("st1", "nt1")}) - (${m("sc2", "nc2")} - ${m("sc1", "nc1")})", 6)}
       |  END AS did
       |FROM g""".stripMargin
  }

  // ------------------------------------------------------------------ ope

  /** Size of the logging policy's action set — 8 divides 256, so one md5
    * byte mod 8 is EXACTLY uniform: propensity is exactly 1/8. */
  val OpeSlots = 8

  /** Off-policy evaluation of a recommendation policy from logged bandit
    * feedback — the estimator a recsys team runs before an online A/B
    * (Horvitz-Thompson IPS and its self-normalized SNIPS variant; see
    * Swaminathan & Joachims 2015). The logged randomized policy is
    * simulated deterministically: for each order, the "shown" part is the
    * md5(orderkey)-chosen slot among the global top-8 most-purchased
    * parts (one md5 byte mod 8 — exactly uniform because 8 | 256, so the
    * propensity is exactly 1/8); reward = the order actually contains
    * that part. The TARGET policy is context-dependent: recommend the
    * most-purchased part within the order's customer NATION (ties to the
    * lower part key). Per nation: logged reward rate, the IPS estimate
    * 8·Σ(r·match)/n of the target policy's value, and SNIPS
    * Σ(r·match)/Σmatch (NULL where the target action was never logged —
    * reported, not guessed).
    *
    * Exactness: everything is exact BIGINT counts until the three final
    * divisions (roundN display). Scale shape: popularity tables are keyed
    * aggregates; the global top-8 rides a LIMIT-8 bounded heap (its rank
    * window runs over 8 rows — the q_text_zipf tripwire class) and is
    * broadcast; per-nation argmax is a nation-partitioned rank over the
    * (nation × part) aggregate; everything else is equi-joins on order
    * keys. */
  /** Per-order logged-feedback frame shared by [[ope]] and [[opeDr]]:
    * (o_orderkey, c_nationkey, nation name, logged_part, reward,
    * tgt_part) — the plumbing documented on [[ope]]. */
  private def opeFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val pop = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val top8 = pop.orderBy(col("cnt").desc, col("l_partkey")).limit(OpeSlots)
      .withColumn("slot",
        row_number().over(Window.orderBy(col("cnt").desc, col("l_partkey"))) - 1)
      .select(col("slot"), col("l_partkey").as("logged_part"))
    val slot = conv(substring(md5(col("o_orderkey").cast("string")), 1, 2), 16, 10)
      .cast("int") % OpeSlots
    val logged = o.select(col("o_orderkey"), col("o_custkey"), slot.as("slot"))
      .join(broadcast(top8), Seq("slot"))
    val contains = li.select(col("l_orderkey"), col("l_partkey")).distinct()
    val withReward = logged.join(contains,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_partkey") === col("logged_part"), "left_outer")
      .select(col("o_orderkey"), col("o_custkey"), col("logged_part"),
        when(col("l_partkey").isNotNull, 1L).otherwise(0L).as("reward"))
    val natPop = li.join(o.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(c.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val tgt = natPop
      .withColumn("rk", row_number().over(Window.partitionBy(col("c_nationkey"))
        .orderBy(col("cnt").desc, col("l_partkey"))))
      .filter(col("rk") === 1)
      .select(col("c_nationkey"), col("l_partkey").as("tgt_part"))
    withReward
      .join(c.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(tgt), Seq("c_nationkey"))
      .join(broadcast(n.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
  }

  def ope(spark: SparkSession, dir: String): DataFrame = {
    opeFrame(spark, dir)
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("reward")).as("n_reward"),
        sum(when(col("logged_part") === col("tgt_part"), 1L).otherwise(0L))
          .as("n_match"),
        sum(when(col("logged_part") === col("tgt_part"), col("reward"))
          .otherwise(0L)).as("n_reward_match"))
      .select(col("nation"), col("n_orders"), col("n_reward"), col("n_match"),
        col("n_reward_match"),
        roundN(col("n_reward").cast("double") / col("n_orders"), 6)
          .as("logged_rate"),
        roundN(lit(OpeSlots.toDouble) * col("n_reward_match") / col("n_orders"), 6)
          .as("ips"),
        when(col("n_match") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("n_reward_match").cast("double") / col("n_match"), 6))
          .as("snips"))
      .orderBy(col("nation"))
  }

  /** Shared oracle CTE block mirroring [[opeFrame]]. */
  private val opeCtesSql =
    s"""pop AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
       |t8 AS (SELECT l_partkey AS logged_part,
       |         row_number() OVER (ORDER BY cnt DESC, l_partkey) - 1 AS slot
       |       FROM (SELECT * FROM pop ORDER BY cnt DESC, l_partkey LIMIT $OpeSlots)),
       |lg AS (SELECT o_orderkey, o_custkey, t8.logged_part
       |       FROM orders JOIN t8 ON t8.slot =
       |         (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))::INT % $OpeSlots)),
       |cont AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |rw AS (SELECT lg.o_orderkey, lg.o_custkey, lg.logged_part,
       |         CASE WHEN cont.l_partkey IS NOT NULL THEN 1 ELSE 0 END AS reward
       |       FROM lg LEFT JOIN cont ON cont.l_orderkey = lg.o_orderkey
       |         AND cont.l_partkey = lg.logged_part),
       |np AS (SELECT c_nationkey, l_partkey, count(*) AS cnt
       |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |         JOIN customer ON o_custkey = c_custkey
       |       GROUP BY 1, 2),
       |tgt AS (SELECT c_nationkey, l_partkey AS tgt_part FROM np
       |        QUALIFY row_number() OVER (PARTITION BY c_nationkey
       |          ORDER BY cnt DESC, l_partkey) = 1)""".stripMargin

  private val opeSql =
    s"""WITH $opeCtesSql,
       |agg AS (SELECT n_name AS nation,
       |          count(*) AS n_orders,
       |          CAST(sum(reward) AS BIGINT) AS n_reward,
       |          CAST(sum(CASE WHEN logged_part = tgt_part THEN 1 ELSE 0 END) AS BIGINT)
       |            AS n_match,
       |          CAST(sum(CASE WHEN logged_part = tgt_part THEN reward ELSE 0 END) AS BIGINT)
       |            AS n_reward_match
       |        FROM rw JOIN customer ON o_custkey = c_custkey
       |          JOIN tgt USING (c_nationkey)
       |          JOIN nation ON c_nationkey = n_nationkey
       |        GROUP BY 1)
       |SELECT nation, n_orders, n_reward, n_match, n_reward_match,
       |  ${roundNSql("CAST(n_reward AS DOUBLE) / n_orders", 6)} AS logged_rate,
       |  ${roundNSql(s"CAST($OpeSlots AS DOUBLE) * n_reward_match / n_orders", 6)} AS ips,
       |  CASE WHEN n_match = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(n_reward_match AS DOUBLE) / n_match", 6)} END AS snips
       |FROM agg
       |ORDER BY nation""".stripMargin

  // --------------------------------------------------------------- ope-dr

  /** Doubly-robust off-policy estimator (Dudík, Langford & Li 2011) —
    * the variance-reduced upgrade of [[ope]]'s IPS: per logged order,
    * DR = q̂(x, π(x)) + K·1{a = π(x)}·(r − q̂(x, a)), where the reward
    * model q̂(nation, part) is the exact containment rate of the part
    * among the nation's orders. The direct-method (DM) column is the
    * model-only estimate Σq̂(x, π(x))/n; DR corrects DM with the
    * importance-weighted residual on matched actions, so it is unbiased
    * whenever EITHER the model or the propensity is right.
    *
    * Exactness: q̂ is quantized ONCE to integer micro-units
    * ((count·1e6) div n_nation — pure BIGINT), so every per-order DR
    * term and all sums are exact BIGINT arithmetic; the final /1e6
    * divisions are fixed-form (roundN display). Scale: adds two keyed
    * aggregates (per-nation order counts, per-(nation, part) containment
    * counts) and two broadcast-sized equi-joins on top of [[opeFrame]];
    * nothing beyond the [[ope]] shuffle classes. */
  def opeDr(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val oNat = o.select(col("o_orderkey"), col("o_custkey"))
      .join(c.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    val nNat = oNat.groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_nat"))
    val qhat = li.select(col("l_orderkey"), col("l_partkey")).distinct()
      .join(oNat.select(col("o_orderkey"), col("c_nationkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_nationkey"), col("l_partkey"))
      .agg(count(lit(1)).as("ccnt"))
      .join(broadcast(nNat), Seq("c_nationkey"))
      .select(col("c_nationkey"), col("l_partkey"),
        expr("(ccnt * 1000000) div n_nat").as("q_mu"))
    opeFrame(spark, dir)
      .join(qhat.select(col("c_nationkey"), col("l_partkey").as("logged_part"),
        col("q_mu").as("q_log_mu")), Seq("c_nationkey", "logged_part"), "left_outer")
      .join(qhat.select(col("c_nationkey"), col("l_partkey").as("tgt_part"),
        col("q_mu").as("q_tgt_mu")), Seq("c_nationkey", "tgt_part"), "left_outer")
      .select(col("n_name"), col("reward"),
        col("logged_part") === col("tgt_part"), coalesce(col("q_log_mu"), lit(0L)),
        coalesce(col("q_tgt_mu"), lit(0L)))
      .toDF("n_name", "reward", "is_match", "q_log_mu", "q_tgt_mu")
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("q_tgt_mu")).as("dm_mu"),
        sum(col("q_tgt_mu") + when(col("is_match"),
          lit(OpeSlots.toLong) * (col("reward") * 1000000L - col("q_log_mu")))
          .otherwise(0L)).as("dr_mu"),
        sum(when(col("is_match"), col("reward")).otherwise(0L))
          .as("n_reward_match"))
      .select(col("nation"), col("n_orders"),
        roundN(col("dm_mu").cast("double") / col("n_orders") / 1e6, 6).as("dm"),
        roundN(lit(OpeSlots.toDouble) * col("n_reward_match") / col("n_orders"), 6)
          .as("ips"),
        roundN(col("dr_mu").cast("double") / col("n_orders") / 1e6, 6).as("dr"))
      .orderBy(col("nation"))
  }

  private val opeDrSql =
    s"""WITH $opeCtesSql,
       |onat AS (SELECT o_orderkey, o_custkey, c_nationkey
       |         FROM orders JOIN customer ON o_custkey = c_custkey),
       |nnat AS (SELECT c_nationkey, count(*) AS n_nat FROM onat GROUP BY 1),
       |qh AS (SELECT q.c_nationkey, q.l_partkey,
       |         CAST((q.ccnt * 1000000) // nnat.n_nat AS BIGINT) AS q_mu
       |       FROM (SELECT onat.c_nationkey, cont.l_partkey, count(*) AS ccnt
       |             FROM cont JOIN onat ON cont.l_orderkey = onat.o_orderkey
       |             GROUP BY 1, 2) q
       |       JOIN nnat ON q.c_nationkey = nnat.c_nationkey),
       |pf AS (SELECT rw.reward, tgt.tgt_part, rw.logged_part,
       |         customer.c_nationkey, n_name,
       |         coalesce(ql.q_mu, 0) AS q_log_mu, coalesce(qt.q_mu, 0) AS q_tgt_mu
       |       FROM rw JOIN customer ON rw.o_custkey = c_custkey
       |         JOIN tgt USING (c_nationkey)
       |         JOIN nation ON c_nationkey = n_nationkey
       |         LEFT JOIN qh ql ON ql.c_nationkey = customer.c_nationkey
       |           AND ql.l_partkey = rw.logged_part
       |         LEFT JOIN qh qt ON qt.c_nationkey = customer.c_nationkey
       |           AND qt.l_partkey = tgt.tgt_part),
       |agg AS (SELECT n_name AS nation, count(*) AS n_orders,
       |          CAST(sum(q_tgt_mu) AS BIGINT) AS dm_mu,
       |          CAST(sum(q_tgt_mu + CASE WHEN logged_part = tgt_part
       |            THEN $OpeSlots * (reward * 1000000 - q_log_mu) ELSE 0 END) AS BIGINT)
       |            AS dr_mu,
       |          CAST(sum(CASE WHEN logged_part = tgt_part THEN reward ELSE 0 END)
       |            AS BIGINT) AS n_reward_match
       |        FROM pf GROUP BY 1)
       |SELECT nation, n_orders,
       |  ${roundNSql("CAST(dm_mu AS DOUBLE) / n_orders / 1e6", 6)} AS dm,
       |  ${roundNSql(s"CAST($OpeSlots AS DOUBLE) * n_reward_match / n_orders", 6)} AS ips,
       |  ${roundNSql("CAST(dr_mu AS DOUBLE) / n_orders / 1e6", 6)} AS dr
       |FROM agg
       |ORDER BY nation""".stripMargin

  // -------------------------------------------------------------- holdout

  /** Recommendations kept per evaluated order. */
  val HoldoutK = 3

  /** Leave-one-out holdout evaluation of the item-item CF recommender —
    * the offline accuracy read (HR@k / MRR@k) a recsys team checks
    * before trusting [[itemSim]]'s neighbors: for every order with ≥ 2
    * distinct parts, hold out one item (max part key, deterministic),
    * recommend from the REST of the basket (candidates = union of each
    * remaining item's top-[[RecTopK]] neighbors, minus items already in
    * the basket), and score the held-out item's rank.
    *
    * Honesty: the co-occurrence statistics are corrected EXACTLY for the
    * evaluated order (leave-one-order-out: co −= 1 where the candidate
    * pair co-occurs only via this order's held-out item, both degrees
    * −= their membership), so the held-out item never scores on evidence
    * that includes itself — the quantized cosine recomputes from the
    * corrected BIGINTs with the [[simTop]] token form. Candidates whose
    * corrected evidence vanishes (score 0) drop out. Reciprocal ranks
    * are exact integers (1e6 div rank) so MRR never depends on float
    * summation order.
    *
    * Scale shape: per-order fanout is (basket size)·[[RecTopK]] —
    * bounded; ranking is an order-partitioned window; the two summary
    * aggregates are 1-row broadcasts. */
  def holdout(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = liDistinct(spark, dir)
    val deg = li.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val eval = li.groupBy(col("o"))
      .agg(count(lit(1)).as("n_items"), max(col("p")).as("ho"))
      .filter(col("n_items") >= 2)
    val basket = li.join(eval.select(col("o"), col("ho")), Seq("o"))
      .filter(col("p") =!= col("ho"))
    val cand = basket
      .join(simTop(spark, dir).select(col("item").as("p"),
        col("neighbor").as("c"), col("co")), Seq("p"))
      .join(basket.select(col("o"), col("p").as("c")), Seq("o", "c"), "left_anti")
    val isHo = when(col("c") === col("ho"), 1L).otherwise(0L)
    val scored = cand
      .join(deg.select(col("p"), col("n").as("n_a")), Seq("p"))
      .join(deg.select(col("p").as("c"), col("n").as("n_c")), Seq("c"))
      .select(col("o"), col("c"), isHo.as("is_ho"),
        (col("co") - isHo).as("co_adj"), (col("n_a") - 1L).as("na_adj"),
        (col("n_c") - isHo).as("nc_adj"))
      .select(col("o"), col("c"), col("is_ho"),
        when(col("co_adj") <= 0L || col("na_adj") <= 0L || col("nc_adj") <= 0L,
          0L).otherwise(
          floor(col("co_adj").cast("double") /
            sqrt((col("na_adj") * col("nc_adj")).cast("double")) * 1e6 + 0.5)
            .cast("long")).as("score_mu"))
    val ranked = scored.groupBy(col("o"), col("c"))
      .agg(max(col("score_mu")).as("s"), max(col("is_ho")).as("is_ho"))
      .filter(col("s") > 0L)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o")).orderBy(col("s").desc, col("c"))))
      .filter(col("rk") <= HoldoutK)
    val h = ranked.filter(col("is_ho") === 1L).agg(
      coalesce(sum(when(col("rk") === 1, 1L)), lit(0L)).as("hits1"),
      count(lit(1)).as("hits3"),
      coalesce(sum(expr("1000000 div rk").cast("long")), lit(0L)).as("mrr_mu"))
    eval.agg(count(lit(1)).as("n_eval")).crossJoin(broadcast(h))
      .select(col("n_eval"), col("hits1"), col("hits3"),
        when(col("n_eval") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("hits1").cast("double") / col("n_eval"), 6)).as("hr1"),
        when(col("n_eval") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("hits3").cast("double") / col("n_eval"), 6)).as("hr3"),
        when(col("n_eval") === 0L, lit(null).cast("double"))
          .otherwise(roundN(col("mrr_mu").cast("double") / col("n_eval") / 1e6, 6))
          .as("mrr"))
  }

  private val holdoutSql =
    s"""WITH $simCtesSql,
       |tk AS (SELECT item, neighbor, co FROM sc
       |       QUALIFY row_number() OVER (PARTITION BY item
       |         ORDER BY cos_mu DESC, neighbor) <= $RecTopK),
       |ev AS (SELECT o, count(*) AS n_items, max(p) AS ho FROM li GROUP BY 1
       |       HAVING count(*) >= 2),
       |bk AS (SELECT li.o, li.p, ev.ho FROM li JOIN ev ON li.o = ev.o
       |       WHERE li.p != ev.ho),
       |c0 AS (SELECT bk.o, bk.ho, bk.p, tk.neighbor AS c, tk.co
       |       FROM bk JOIN tk ON tk.item = bk.p),
       |c1 AS (SELECT * FROM c0 WHERE NOT EXISTS (
       |         SELECT 1 FROM bk b2 WHERE b2.o = c0.o AND b2.p = c0.c)),
       |cs AS (SELECT c1.o, c1.c,
       |         CASE WHEN c1.c = c1.ho THEN 1 ELSE 0 END AS is_ho,
       |         c1.co - (CASE WHEN c1.c = c1.ho THEN 1 ELSE 0 END) AS co_adj,
       |         da.n - 1 AS na_adj,
       |         dc.n - (CASE WHEN c1.c = c1.ho THEN 1 ELSE 0 END) AS nc_adj
       |       FROM c1 JOIN deg da ON da.p = c1.p JOIN deg dc ON dc.p = c1.c),
       |cm AS (SELECT o, c, is_ho,
       |         CASE WHEN co_adj <= 0 OR na_adj <= 0 OR nc_adj <= 0 THEN 0
       |              ELSE CAST(floor(CAST(co_adj AS DOUBLE) /
       |                sqrt(CAST(na_adj * nc_adj AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
       |         END AS score_mu
       |       FROM cs),
       |pc AS (SELECT o, c, max(score_mu) AS s, max(is_ho) AS is_ho
       |       FROM cm GROUP BY 1, 2),
       |rkd AS (SELECT *, row_number() OVER (PARTITION BY o
       |          ORDER BY s DESC, c) AS rk
       |        FROM pc WHERE s > 0
       |        QUALIFY rk <= $HoldoutK),
       |h AS (SELECT
       |        CAST(coalesce(sum(CASE WHEN rk = 1 THEN 1 END), 0) AS BIGINT) AS hits1,
       |        CAST(count(*) AS BIGINT) AS hits3,
       |        CAST(coalesce(sum(1000000 // rk), 0) AS BIGINT) AS mrr_mu
       |      FROM rkd WHERE is_ho = 1),
       |ne AS (SELECT count(*) AS n_eval FROM ev)
       |SELECT n_eval, hits1, hits3,
       |  CASE WHEN n_eval = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(hits1 AS DOUBLE) / n_eval", 6)} END AS hr1,
       |  CASE WHEN n_eval = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(hits3 AS DOUBLE) / n_eval", 6)} END AS hr3,
       |  CASE WHEN n_eval = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(mrr_mu AS DOUBLE) / n_eval / 1e6", 6)} END AS mrr
       |FROM ne CROSS JOIN h""".stripMargin

  // ------------------------------------------------------------- coverage

  /** Aggregate diversity of the item-sim recommender — the health check a
    * recsys team runs beside accuracy (HR/MRR measure the lists'
    * QUALITY; this measures what the system as a whole ever shows):
    * catalog coverage = share of cataloged items appearing in ANY
    * top-[[RecTopK]] list, and the exposure Gini over per-item list
    * appearances with never-recommended items counted at 0 — the
    * popularity-concentration read (Gini → 1 means a few blockbusters
    * absorb all slots).
    *
    * Exactness: exposures and counts are exact BIGINTs; coverage is one
    * final division; the Gini is the q_events_gini grouped-histogram
    * identity Σ c·x·(2·cb+c−n)/(n·Σx) on exact integers (an
    * exposure-free system, Σx = 0, yields NULL). Scale shape: the
    * candidate work IS the registered item-sim plan; exposure is an
    * item-keyed aggregate left-joined to the item catalog; the
    * cumulative walk runs over the DISTINCT-exposure-count histogram
    * (values bounded by the exposure domain, never the catalog —
    * whitelisted, the q_events_gini class). */
  def coverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cat = liDistinct(spark, dir).select(col("p")).distinct()
    val exp = simTop(spark, dir)
      .groupBy(col("neighbor")).agg(count(lit(1)).as("e"))
    val xs = cat.join(exp, cat("p") === exp("neighbor"), "left")
      .select(coalesce(col("e"), lit(0L)).as("x"))
    val hist = xs.groupBy(col("x")).agg(count(lit(1)).as("c"))
    val win = Window.orderBy(col("x"))
    val cum = hist
      .withColumn("cb", coalesce(sum(col("c"))
        .over(win.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"),
        sum(col("c") * col("x")).as("sx"))))
    cum.agg(
      max(col("n")).as("n_items"),
      sum(when(col("x") > 0L, col("c")).otherwise(0L)).as("n_recommended"),
      roundN(sum(when(col("x") > 0L, col("c")).otherwise(0L)).cast("double") /
        max(col("n")), 6).as("coverage"),
      when(max(col("sx")) === 0L, lit(null).cast("double"))
        .otherwise(roundN(
          sum(col("c") * col("x") * (lit(2) * col("cb") + col("c") - col("n")))
            .cast("double") / (max(col("n")) * max(col("sx"))), 6))
        .as("exposure_gini"))
  }

  private val coverageSql =
    s"""WITH $simCtesSql,
       |t3 AS (SELECT item, neighbor FROM sc
       |       QUALIFY row_number() OVER (PARTITION BY item
       |         ORDER BY cos_mu DESC, neighbor) <= $RecTopK),
       |cat AS (SELECT DISTINCT p FROM li),
       |ex AS (SELECT neighbor, count(*) AS e FROM t3 GROUP BY 1),
       |xs AS (SELECT CAST(coalesce(e, 0) AS BIGINT) AS x
       |       FROM cat LEFT JOIN ex ON ex.neighbor = cat.p),
       |h AS (SELECT x, count(*) AS c FROM xs GROUP BY 1),
       |cu AS (SELECT x, c,
       |         coalesce(sum(c) OVER (ORDER BY x
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
       |         sum(c) OVER () AS n, sum(c * x) OVER () AS sx
       |       FROM h)
       |SELECT CAST(max(n) AS BIGINT) AS n_items,
       |  CAST(sum(CASE WHEN x > 0 THEN c ELSE 0 END) AS BIGINT) AS n_recommended,
       |  ${roundNSql(
           "CAST(sum(CASE WHEN x > 0 THEN c ELSE 0 END) AS DOUBLE) / max(n)", 6)}
       |    AS coverage,
       |  CASE WHEN max(sx) = 0 THEN NULL
       |       ELSE ${roundNSql(
               "CAST(sum(c * x * (2 * cb + c - n)) AS DOUBLE) / (max(n) * max(sx))",
               6)}
       |  END AS exposure_gini
       |FROM cu""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_rec_coverage", coverage, Some(coverageSql)),
    Q("q_rec_ope", ope, Some(opeSql)),
    Q("q_rec_ope_dr", opeDr, Some(opeDrSql)),
    Q("q_rec_holdout", holdout, Some(holdoutSql)),
    Q("q_rec_item_sim", itemSim, Some(itemSimSql)),
    Q("q_events_did", did, Some(didSql)))
}
