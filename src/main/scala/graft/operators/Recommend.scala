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
  def itemSim(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOT persisted: the projection scan is cheaper than a persist
    // barrier (A/B'd at sf0.1: 1.9-2.6 s either way, host-noise-bound;
    // the distinct shuffle re-runs but is the same exchange AQE reuses)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
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
    val top = graft.plans.TopK.topK(scored, Seq("item"),
      Seq(("cos_mu", true), ("neighbor", false)), RecTopK)
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cos_mu").desc, col("neighbor"))
    top.select(col("item"), col("neighbor"), col("co"),
      roundN(col("cos_mu").cast("double") / 1e6, 6).as("cosine"),
      row_number().over(w).as("rank"))
  }

  private val itemSimSql =
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
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
       |       JOIN deg dj ON dj.p = s.neighbor)
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

  val queries: Seq[Q] = Seq(
    Q("q_rec_item_sim", itemSim, Some(itemSimSql)),
    Q("q_events_did", did, Some(didSql)))
}
