package graft.operators

import graft.Q
import graft.functions.Rounding.roundNSql
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-wide catalog profiler — the "describe my table" pass a data
  * catalog runs on registration (Deequ/Glue-crawler shape): for EVERY
  * column of the fact table in ONE scan, the row count, null count, an
  * exact NDV audit, and the KMV NDV estimate — the number the catalog
  * actually stores at 100 TB (the exact distinct is corpus-sized state
  * per column; the sketch is 16 hashes. The exact column here is the
  * test-scale audit the estimate is judged against, and the thing you
  * drop first at scale).
  *
  * One scan: columns melt to (col_name, canonical_value) via a narrow
  * explode (11× fanout of 2 small strings), then one hash aggregate.
  * Canonicalization pins cross-engine value identity: integers/strings
  * cast verbatim, 2-decimal doubles to integer cents, timestamps to
  * yyyy-MM-dd — so md5-based sketches agree byte-for-byte. NULLs map to
  * a sentinel and count as one NDV value when present (none in the
  * harness data; the profiler must not crash on them). */
object Profiler {

  val NullSentinel = "<<NULL>>"

  private def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast("long").cast("string")
  private def centsSql(c: String): String =
    s"CAST(CAST(floor($c * 100 + 0.5) AS BIGINT) AS VARCHAR)"

  /** (column, Spark canonical expr, DuckDB canonical expr). */
  private val canon: Seq[(String, Column, String)] = Seq(
    ("l_orderkey", col("l_orderkey").cast("string"), "CAST(l_orderkey AS VARCHAR)"),
    ("l_partkey", col("l_partkey").cast("string"), "CAST(l_partkey AS VARCHAR)"),
    ("l_suppkey", col("l_suppkey").cast("string"), "CAST(l_suppkey AS VARCHAR)"),
    ("l_linenumber", col("l_linenumber").cast("string"), "CAST(l_linenumber AS VARCHAR)"),
    ("l_quantity", cents(col("l_quantity")), centsSql("l_quantity")),
    ("l_extendedprice", cents(col("l_extendedprice")), centsSql("l_extendedprice")),
    ("l_discount", cents(col("l_discount")), centsSql("l_discount")),
    ("l_tax", cents(col("l_tax")), centsSql("l_tax")),
    ("l_returnflag", col("l_returnflag"), "l_returnflag"),
    ("l_linestatus", col("l_linestatus"), "l_linestatus"),
    ("l_shipdate", date_format(col("l_shipdate"), "yyyy-MM-dd"),
      "strftime(l_shipdate, '%Y-%m-%d')"))

  def catalogProfile(spark: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(graft.functions.KmvSketch.aggregator)
    val melted = Tables.lineitem(spark, dir).select(
      explode(array(canon.map { case (n, c, _) =>
        struct(lit(n).as("c"), coalesce(c, lit(NullSentinel)).as("v"))
      }: _*)).as("kv"))
      .select(col("kv.c").as("col_name"), col("kv.v").as("v"))
    melted.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v") === NullSentinel, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("ndv_exact"),
        kmv(md5(col("v"))).as("kmv"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("ndv_exact"),
        Sketches.kmvEstimate(col("kmv")).as("ndv_est"))
      .orderBy(col("col_name"))
  }

  private val catalogProfileSql = {
    val K = graft.functions.KmvSketch.K
    val legs = canon.map { case (n, _, sql) =>
      s"SELECT '$n' AS col_name, coalesce($sql, '$NullSentinel') AS v FROM lineitem"
    }.mkString("\n  UNION ALL ")
    s"""WITH m AS (
       |  $legs),
       |g AS (SELECT col_name, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN v = '$NullSentinel' THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  count(DISTINCT v) AS ndv_exact,
       |  (list_sort(list(DISTINCT md5(v))))[1:$K] AS kmv
       |  FROM m GROUP BY 1)
       |SELECT col_name, n_rows, n_null, ndv_exact,
       |  ${roundNSql(
          s"""CASE WHEN len(kmv) < $K THEN len(kmv)::DOUBLE
             |    ELSE ${K - 1}.0 / ((('0x' || substr(kmv[$K], 1, 15))::BIGINT) / 1152921504606846976.0)
             |  END""".stripMargin, 2)} AS ndv_est
       |FROM g ORDER BY 1""".stripMargin
  }

  /** Per-column Shannon entropy — the catalog's "how informative is this
    * column" signal (near-zero ⇒ constant, ln(NDV) ⇒ uniform key).
    * H = ln(n) − (Σ c·ln c)/n over the value histogram; each c·ln c term
    * is quantized to integer micro-units before the sum (the engine's
    * transcendental-sum rule), so H and the ln(NDV)-normalized form are
    * exact-identical in both engines. Same one-scan canonical melt as the
    * catalog profile; per-column work is histogram-sized. */
  def columnEntropy(spark: SparkSession, dir: String): DataFrame = {
    val melted = Tables.lineitem(spark, dir).select(
      explode(array(canon.map { case (n, c, _) =>
        struct(lit(n).as("c"), coalesce(c, lit(NullSentinel)).as("v"))
      }: _*)).as("kv"))
      .select(col("kv.c").as("col_name"), col("kv.v").as("v"))
    val hist = melted.groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("c"))
    val qclc = floor(col("c").cast("double") * log(col("c").cast("double")) * 1e6 + 0.5)
      .cast("long")
    val g = hist.select(col("col_name"), col("c"), qclc.as("q"))
      .groupBy(col("col_name"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("m"), sum(col("q")).as("sq"))
    val h = log(col("n").cast("double")) - col("sq").cast("double") / 1e6 / col("n")
    g.select(col("col_name"), col("m").as("n_distinct"),
      graft.functions.Rounding.roundN(h, 6).as("entropy_nats"),
      when(col("m") === 1, lit(null).cast("double"))
        .otherwise(graft.functions.Rounding.roundN(h / log(col("m").cast("double")), 6))
        .as("entropy_norm"))
      .orderBy(col("col_name"))
  }

  private val columnEntropySql = {
    val legs = canon.map { case (n, _, sql) =>
      s"SELECT '$n' AS col_name, coalesce($sql, '$NullSentinel') AS v FROM lineitem"
    }.mkString("\n  UNION ALL ")
    s"""WITH m AS (
       |  $legs),
       |h AS (SELECT col_name, v, count(*) AS c FROM m GROUP BY 1, 2),
       |q AS (SELECT col_name, c,
       |        CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS q
       |      FROM h),
       |g AS (SELECT col_name, CAST(sum(c) AS BIGINT) AS n, count(*) AS m,
       |        CAST(sum(q) AS BIGINT) AS sq
       |      FROM q GROUP BY 1)
       |SELECT col_name, m AS n_distinct,
       |  ${roundNSql("ln(CAST(n AS DOUBLE)) - CAST(sq AS DOUBLE) / 1e6 / n", 6)} AS entropy_nats,
       |  CASE WHEN m = 1 THEN NULL
       |       ELSE ${roundNSql(
        "(ln(CAST(n AS DOUBLE)) - CAST(sq AS DOUBLE) / 1e6 / n) / ln(CAST(m AS DOUBLE))", 6)}
       |  END AS entropy_norm
       |FROM g ORDER BY 1""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_profile_catalog", catalogProfile, Some(catalogProfileSql)),
    Q("q_profile_entropy", columnEntropy, Some(columnEntropySql)),
  )
}
