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

  val queries: Seq[Q] = Seq(
    Q("q_feat_target_encode", targetEncode, Some(targetEncodeSql)),
    Q("q_feat_winsorize", winsorize, Some(winsorizeSql)))
}
