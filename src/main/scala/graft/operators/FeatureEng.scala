package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-engineering transforms a training pipeline applies before a
  * model sees tabular columns — completing the scaler family
  * (`q_feat_zscore` / `q_feat_robust`) with leakage-safe target encoding
  * and outlier-robust winsorized means.
  *
  * Scale design:
  *  - Target encoding is one tiny keyed aggregate (category cardinality
  *    rows) broadcast back over the fact table — one shuffle-free pass
  *    per row beyond the category agg; the leave-one-out subtraction is
  *    row-local arithmetic on exact cents.
  *  - Winsorization derives per-group p05/p95 cutpoints from the
  *    DISTINCT-cents histogram (group-partitioned cumulative — the
  *    scale-safe q_stats_quantiles form, never a per-group sort of raw
  *    rows), broadcasts the groups-sized cutpoint table, and clips in a
  *    second scan; the winsorized mean is an exact clipped-cents sum.
  *
  * Exactness: all sums are BIGINT cents; each output ratio is a single
  * final division of exact integers, identical in both engines.
  */
object FeatureEng {

  // ------------------------------------------------------- target encode

  /** Leave-one-out target encoding of order priority against order value:
    * enc(i) = (Σ_cat cents − cents_i) / (n_cat − 1), the standard
    * leakage-safe form (a category with one row encodes to NULL). */
  def targetEncode(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), cents.as("c"))
    val stats = o.groupBy(col("o_orderpriority"))
      .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
    o.join(broadcast(stats), "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"),
        when(col("n") === 1L, lit(null).cast("double"))
          .otherwise(roundN((col("s") - col("c")).cast("double") /
            (col("n") - lit(1L)) / lit(100.0), 6)).as("loo_mean_price"))
  }

  private val targetEncodeSql =
    s"""WITH o AS (SELECT o_orderkey, o_orderpriority,
       |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
       |           FROM orders),
       |st AS (SELECT o_orderpriority, CAST(sum(c) AS BIGINT) AS s,
       |         count(*) AS n
       |       FROM o GROUP BY 1)
       |SELECT o.o_orderkey, o.o_orderpriority,
       |  CASE WHEN st.n = 1 THEN NULL
       |       ELSE ${roundNSql("CAST(st.s - o.c AS DOUBLE) / (st.n - 1) / 100.0", 6)}
       |  END AS loo_mean_price
       |FROM o JOIN st USING (o_orderpriority)""".stripMargin

  // ----------------------------------------------------------- winsorize

  /** Winsorized mean of event value per type: clip at the type-1 p05/p95
    * cutpoints (smallest cents value whose cumulative count reaches
    * ceil(q·n) over the per-type histogram), then average the clipped
    * exact cents. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val vals = Tables.events(spark, dir)
      .select(col("event_type"), cents.as("c"))
      .persist() // read by the cutpoint histogram and the clipped mean
    val byT = Window.partitionBy(col("event_type"))
    val cuts = vals.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byT.orderBy(col("c"))))
      .withColumn("n", sum(col("cnt")).over(byT))
      .groupBy(col("event_type"))
      .agg(
        min(when(col("cum") >= ceil(lit(0.05) * col("n")), col("c"))).as("lo"),
        min(when(col("cum") >= ceil(lit(0.95) * col("n")), col("c"))).as("hi"),
        max(col("n")).as("n"))
    vals.join(broadcast(cuts), "event_type")
      .select(col("event_type"), col("n"), col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("c"))).as("w"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        (max(col("lo")).cast("double") / 100.0).as("p05"),
        (max(col("hi")).cast("double") / 100.0).as("p95"),
        roundN(sum(col("w")).cast("double") / max(col("n")) / lit(100.0), 6)
          .as("mean_winsorized"))
      .orderBy(col("event_type"))
  }

  private val winsorizeSql =
    s"""WITH e AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |           FROM events),
       |h AS (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2),
       |cu AS (SELECT event_type, c,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
       |         sum(cnt) OVER (PARTITION BY event_type) AS n
       |       FROM h),
       |cuts AS (SELECT event_type,
       |           min(CASE WHEN cum >= ceil(0.05 * n) THEN c END) AS lo,
       |           min(CASE WHEN cum >= ceil(0.95 * n) THEN c END) AS hi,
       |           CAST(max(n) AS BIGINT) AS n
       |         FROM cu GROUP BY 1)
       |SELECT e.event_type, cuts.n,
       |  CAST(cuts.lo AS DOUBLE) / 100.0 AS p05,
       |  CAST(cuts.hi AS DOUBLE) / 100.0 AS p95,
       |  ${roundNSql(
        "CAST(sum(greatest(cuts.lo, least(cuts.hi, e.c))) AS DOUBLE) / max(cuts.n) / 100.0", 6)}
       |    AS mean_winsorized
       |FROM e JOIN cuts USING (event_type)
       |GROUP BY e.event_type, cuts.n, cuts.lo, cuts.hi
       |ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------- woe/iv

  /** Weight-of-Evidence encoding + Information Value (the credit-scoring
    * standard; Siddiqi 2006) for a categorical feature against a binary
    * target: per category, WoE = ln((g_c/G)/(b_c/B)), and the feature's
    * predictive power is IV = Σ_c (g_c/G − b_c/B)·WoE_c, reported as the
    * category = '__TOTAL__' row. Registered instantiation: order
    * priority vs the order-fulfilled target (o_orderstatus = 'F') — an
    * A/A-style check on TPC-H's independent columns (IV ≈ 0), with the
    * spec planting a genuinely predictive fixture.
    *
    * Exactness: WoE = ln((g_c·B)/(b_c·G)) — exact BIGINT cross-products
    * inside one ln, micro-quantized per category; the IV contribution
    * reuses the exact difference (g_c·B − b_c·G)/(G·B) in one fixed
    * double tree against woe_µ, quantized before the order-free integer
    * total. One-sided categories (g_c or b_c = 0) carry NULL WoE and
    * drop from IV — the standard treatment, and the when() guards keep
    * every division ANSI-safe. Cross-products fit BIGINT to ~3e9 rows
    * per class; beyond that quantize the shares first (the Gram-budget
    * pattern).
    *
    * Scale shape: ONE corpus-collapsing aggregate on (category); the
    * WoE/IV algebra runs on the category-bounded table off a
    * localCheckpoint, totals on the category count. */
  def woeIv(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("category"),
        (col("o_orderstatus") === "F").cast("long").as("good"))
    val g = o.groupBy(col("category"))
      .agg(sum(col("good")).as("g"), sum(lit(1L) - col("good")).as("b"))
      .localCheckpoint()
    val tot = broadcast(g.agg(sum(col("g")).as("gt"), sum(col("b")).as("bt")))
    val sc = g.crossJoin(tot)
      .withColumn("woe_mu",
        when(col("g") === 0L || col("b") === 0L || col("gt") === 0L ||
          col("bt") === 0L, lit(null).cast("long"))
          .otherwise(floor(log((col("g") * col("bt")).cast("double") /
            (col("b") * col("gt"))) * 1e6 + 0.5).cast("long")))
      .withColumn("iv_mu",
        when(col("woe_mu").isNull, lit(null).cast("long"))
          .otherwise(floor((col("g") * col("bt") - col("b") * col("gt")).cast("double")
            / (col("gt") * col("bt")) * (col("woe_mu").cast("double") / 1e6)
            * 1e6 + 0.5).cast("long")))
      .localCheckpoint()
    val total = sc
      .agg(sum(col("g")).as("n_good"), sum(col("b")).as("n_bad"),
        sum(col("iv_mu")).as("ivs"))
      .select(lit("__TOTAL__").as("category"), col("n_good"), col("n_bad"),
        lit(null).cast("double").as("woe"),
        (col("ivs") / 1e6).as("iv"))
    sc.select(col("category"), col("g").as("n_good"), col("b").as("n_bad"),
        (col("woe_mu") / 1e6).as("woe"), (col("iv_mu") / 1e6).as("iv"))
      .unionByName(total)
      .orderBy(col("category"))
  }

  private val woeIvSql =
    s"""WITH o AS (SELECT o_orderpriority AS category,
       |             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS good
       |           FROM orders),
       |g AS (SELECT category, CAST(sum(good) AS BIGINT) AS g,
       |        CAST(sum(1 - good) AS BIGINT) AS b
       |      FROM o GROUP BY 1),
       |tot AS (SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt
       |        FROM g),
       |sc AS (SELECT category, g, b, gt, bt,
       |         CASE WHEN g = 0 OR b = 0 OR gt = 0 OR bt = 0 THEN NULL
       |              ELSE CAST(floor(ln(CAST(g * bt AS DOUBLE) / (b * gt))
       |                     * 1e6 + 0.5) AS BIGINT)
       |         END AS woe_mu
       |       FROM g CROSS JOIN tot),
       |sc2 AS (SELECT *,
       |          CASE WHEN woe_mu IS NULL THEN NULL
       |               ELSE CAST(floor(CAST(g * bt - b * gt AS DOUBLE) / (gt * bt)
       |                      * (CAST(woe_mu AS DOUBLE) / 1e6) * 1e6 + 0.5) AS BIGINT)
       |          END AS iv_mu
       |        FROM sc)
       |SELECT category, g AS n_good, b AS n_bad,
       |  woe_mu / 1e6 AS woe, iv_mu / 1e6 AS iv
       |FROM sc2
       |UNION ALL
       |SELECT '__TOTAL__' AS category, CAST(sum(g) AS BIGINT), CAST(sum(b) AS BIGINT),
       |  CAST(NULL AS DOUBLE), sum(iv_mu) / 1e6
       |FROM sc2
       |ORDER BY category""".stripMargin

  // -------------------------------------------------------- mutual info

  /** Mutual information I(X;Y) in nats between each candidate categorical
    * feature and the fulfilled label — the model-free screening companion
    * of [[woeIv]] (WoE needs both classes per category and measures
    * monotone separation; MI is defined for any contingency table and
    * captures ANY dependence). Per feature the output also carries the
    * marginal entropies and the normalized score
    * NMI = I/√(H(X)·H(Y)) so features of different cardinality compare
    * fairly.
    *
    * Exactness: every cell/marginal count is an exact BIGINT; each
    * ln(n_xy·N/(n_x·n_y)) and ln(N/n_x) term micro-quantizes ONCE, then
    * I·N·1e6 = Σ n_xy·t_µ and H·N·1e6 = Σ n_x·h_µ are order-free
    * integer sums (quantization can leave I a hair negative where true
    * MI ≈ 0 — reported, not clamped). NMI divides the two integer sums
    * directly (the /N/1e6 units cancel); a zero-entropy marginal yields
    * NULL. Products n_xy·N / n_x·n_y fit BIGINT to N ≈ 3e9 rows
    * (documented budget, the woe cross-product bound).
    *
    * Scale shape: ONE corpus scan (both features emitted via explode,
    * never a second pass), one cell aggregate; marginals/totals re-derive
    * from the category-bounded cell table off a localCheckpoint. */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select((col("o_orderstatus") === "F").cast("long").as("y"),
        explode(array(
          struct(lit("priority").as("feature"),
            col("o_orderpriority").as("x")),
          struct(lit("month").as("feature"),
            month(col("o_orderdate")).cast("string").as("x")))).as("fx"))
      .select(col("fx.feature").as("feature"), col("fx.x").as("x"), col("y"))
    val cells = o.groupBy(col("feature"), col("x"), col("y"))
      .agg(count(lit(1)).as("nxy")).localCheckpoint()
    val nx = cells.groupBy(col("feature"), col("x")).agg(sum(col("nxy")).as("nx"))
    val ny = cells.groupBy(col("feature"), col("y")).agg(sum(col("nxy")).as("ny"))
    val nn = cells.groupBy(col("feature")).agg(sum(col("nxy")).as("n"))
    val mi = cells
      .join(nx, Seq("feature", "x")).join(ny, Seq("feature", "y"))
      .join(nn, Seq("feature"))
      .select(col("feature"), col("nxy"),
        floor(log((col("nxy") * col("n")).cast("double") /
          (col("nx") * col("ny"))) * 1e6 + 0.5).cast("long").as("t_mu"))
      .groupBy(col("feature")).agg(sum(col("nxy") * col("t_mu")).as("mi_s"))
    def entropy(m: DataFrame, cnt: String, out: String) =
      m.join(nn, Seq("feature"))
        .select(col("feature"),
          (col(cnt) * floor(log(col("n").cast("double") / col(cnt))
            * 1e6 + 0.5).cast("long")).as("h"))
        .groupBy(col("feature")).agg(sum(col("h")).as(out))
    mi.join(entropy(nx, "nx", "hx_s"), Seq("feature"))
      .join(entropy(ny, "ny", "hy_s"), Seq("feature"))
      .join(nn, Seq("feature"))
      .select(col("feature"), col("n"),
        roundN(col("mi_s").cast("double") / col("n") / 1e6, 6).as("mi"),
        roundN(col("hx_s").cast("double") / col("n") / 1e6, 6).as("hx"),
        roundN(col("hy_s").cast("double") / col("n") / 1e6, 6).as("hy"),
        when(col("hx_s") === 0L || col("hy_s") === 0L,
          lit(null).cast("double"))
          .otherwise(roundN(col("mi_s").cast("double") /
            sqrt(col("hx_s").cast("double") * col("hy_s")), 6)).as("nmi"))
      .orderBy(col("feature"))
  }

  private val mutualInfoSql =
    s"""WITH o AS (
       |  SELECT 'priority' AS feature, o_orderpriority AS x,
       |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
       |  FROM orders
       |  UNION ALL
       |  SELECT 'month', CAST(month(o_orderdate) AS VARCHAR),
       |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
       |  FROM orders),
       |cells AS (SELECT feature, x, y, count(*) AS nxy FROM o GROUP BY 1, 2, 3),
       |nx AS (SELECT feature, x, CAST(sum(nxy) AS BIGINT) AS nx
       |       FROM cells GROUP BY 1, 2),
       |ny AS (SELECT feature, y, CAST(sum(nxy) AS BIGINT) AS ny
       |       FROM cells GROUP BY 1, 2),
       |nn AS (SELECT feature, CAST(sum(nxy) AS BIGINT) AS n
       |       FROM cells GROUP BY 1),
       |mi AS (SELECT c.feature,
       |         CAST(sum(nxy * CAST(floor(ln(CAST(nxy * n AS DOUBLE) / (nx * ny))
       |           * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS mi_s
       |       FROM cells c JOIN nx USING (feature, x) JOIN ny USING (feature, y)
       |         JOIN nn USING (feature)
       |       GROUP BY 1),
       |hx AS (SELECT nx.feature,
       |         CAST(sum(nx * CAST(floor(ln(CAST(n AS DOUBLE) / nx) * 1e6 + 0.5)
       |           AS BIGINT)) AS BIGINT) AS hx_s
       |       FROM nx JOIN nn USING (feature) GROUP BY 1),
       |hy AS (SELECT ny.feature,
       |         CAST(sum(ny * CAST(floor(ln(CAST(n AS DOUBLE) / ny) * 1e6 + 0.5)
       |           AS BIGINT)) AS BIGINT) AS hy_s
       |       FROM ny JOIN nn USING (feature) GROUP BY 1)
       |SELECT mi.feature, n,
       |  ${roundNSql("CAST(mi_s AS DOUBLE) / n / 1e6", 6)} AS mi,
       |  ${roundNSql("CAST(hx_s AS DOUBLE) / n / 1e6", 6)} AS hx,
       |  ${roundNSql("CAST(hy_s AS DOUBLE) / n / 1e6", 6)} AS hy,
       |  CASE WHEN hx_s = 0 OR hy_s = 0 THEN NULL
       |       ELSE ${roundNSql("CAST(mi_s AS DOUBLE) / sqrt(CAST(hx_s AS DOUBLE) * hy_s)", 6)}
       |  END AS nmi
       |FROM mi JOIN hx USING (feature) JOIN hy USING (feature) JOIN nn USING (feature)
       |ORDER BY feature""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_feat_target_encode", targetEncode, Some(targetEncodeSql)),
    Q("q_feat_winsorize", winsorize, Some(winsorizeSql)),
    Q("q_feat_woe_iv", woeIv, Some(woeIvSql)),
    Q("q_feat_mutual_info", mutualInfo, Some(mutualInfoSql)))
}
