package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-type completeness: the reference only exercises inner and left-anti
  * joins (SURVEY.md §2.3), but any user migrating real workloads needs the
  * full join menu. Each variant is registered with a DuckDB oracle.
  *
  * Scale notes (100 TB):
  *  - Semi join keeps only the probe side's columns, so Spark never
  *    materializes the build side's payload — the idiomatic EXISTS form
  *    (never `IN (SELECT …)` via collect, never inner-join+distinct which
  *    duplicates then dedups).
  *  - The left-outer "parts with sales count" is written aggregate-FIRST:
  *    lineitem collapses to one row per partkey BEFORE the join, so the
  *    outer join's right side is dimension-sized and broadcastable. Joining
  *    first and aggregating after would shuffle the full fact table through
  *    the outer join for the same answer.
  *  - The full-outer joins two pre-aggregated daily series — both sides are
  *    group-cardinality-sized, the join itself is trivial at any SF; the
  *    pattern (aggregate each leg, then outer-join the summaries) is the
  *    scale-safe way to compare two metrics with mismatched key coverage.
  */
object Joins {

  /** Customers that have at least one open ('O') order — left semi. */
  def customersWithOpenOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  private val customersWithOpenOrdersSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin

  /** Per-part sales count including never-sold parts — left outer over a
    * PRE-AGGREGATED fact side (broadcastable at any SF). */
  def partSalesIncludingUnsold(spark: SparkSession, dir: String): DataFrame = {
    val sold = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_sold"),
        roundN(sum(col("l_extendedprice")), 2).as("part_revenue"))
    Tables.part(spark, dir)
      .join(sold, col("p_partkey") === col("l_partkey"), "left_outer")
      .select(col("p_partkey"), col("p_brand"),
        coalesce(col("n_sold"), lit(0L)).as("n_sold"),
        coalesce(col("part_revenue"), lit(0.0)).as("part_revenue"))
  }

  private val partSalesIncludingUnsoldSql =
    s"""WITH sold AS (
       |  SELECT l_partkey, count(*) AS n_sold,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS part_revenue
       |  FROM lineitem GROUP BY 1)
       |SELECT p_partkey, p_brand,
       |  coalesce(n_sold, 0) AS n_sold,
       |  coalesce(part_revenue, 0.0) AS part_revenue
       |FROM part LEFT JOIN sold ON p_partkey = l_partkey""".stripMargin

  /** Daily returned-revenue vs accepted-revenue series, full-outer joined on
    * the day: days where only one series exists keep the other at NULL. */
  def dailyReturnVsAccept(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("d", to_date(col("l_shipdate")))
    def daily(flag: String, as: String) =
      li.filter(col("l_returnflag") === flag)
        .groupBy(col("d")).agg(roundN(sum(col("l_extendedprice")), 2).as(as))
    val r = daily("R", "returned_rev").alias("r")
    val a = daily("A", "accepted_rev").alias("a")
    r.join(a, col("r.d") === col("a.d"), "full_outer")
      .select(coalesce(col("r.d"), col("a.d")).as("day"),
        col("returned_rev"), col("accepted_rev"))
  }

  private val dailyReturnVsAcceptSql =
    s"""WITH r AS (
       |  SELECT CAST(l_shipdate AS DATE) AS d,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS returned_rev
       |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
       |a AS (
       |  SELECT CAST(l_shipdate AS DATE) AS d,
       |    ${roundNSql("sum(l_extendedprice)", 2)} AS accepted_rev
       |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1)
       |SELECT coalesce(r.d, a.d) AS day, returned_rev, accepted_rev
       |FROM r FULL OUTER JOIN a ON r.d = a.d""".stripMargin

  /** Bloom-filter bits (m) and hash count (k). m = 2048 keeps the whole
    * filter one broadcastable 1-row array; k = 3 puts the false-positive
    * rate near (1-e^(-kn/m))^k for the selective dim below. */
  val BloomBits = 2048L
  val BloomHashes = 3

  /** Bloom-PREFILTERED semi join + false-positive audit — the
    * runtime-filter pattern (Spark's own InjectRuntimeFilter, Delta/
    * Iceberg DPP) made explicit and measurable: build a deterministic
    * m-bit Bloom filter from the selective dim side (parts with
    * p_size <= 2), broadcast it as ONE aggregate row, prefilter the fact
    * scan with k array-membership tests, and report — per returnflag —
    * how many rows pass the bloom vs truly match, i.e. the filter's
    * false-positive rate.
    *
    * Why it matters at 100 TB: when the dim side is selective, shipping
    * a 2 KB bit array to every scan task and dropping 99% of fact rows
    * BEFORE the join's shuffle is the difference between shuffling
    * terabytes and gigabytes. The audit quantifies the residue the
    * bloom lets through (the rows the real join still has to drop).
    *
    * Determinism: bit positions are md5-derived (h:key), the filter is a
    * sorted distinct-bit array — no implementation-specific sketch state,
    * so DuckDB replays the identical filter and the driver hash-checks
    * the audit. */
  def bloomPrefilterAudit(spark: SparkSession, dir: String): DataFrame = {
    def bitOf(h: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(concat(h.cast("string"), lit(":"), k.cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(BloomBits))
    val dim = Tables.part(spark, dir).filter(col("p_size") <= 2)
      .select(col("p_partkey").as("k")).distinct()
    val bloom = dim
      .select(explode(sequence(lit(0), lit(BloomHashes - 1))).as("h"), col("k"))
      .select(bitOf(col("h"), col("k")).as("b")).distinct()
      .agg(sort_array(collect_list(col("b"))).as("bits"))
    val probed = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_returnflag"))
      .crossJoin(broadcast(bloom))
      .withColumn("bloom_pass",
        (0 until BloomHashes).map(h =>
          array_contains(col("bits"), bitOf(lit(h), col("l_partkey"))))
          .reduce(_ && _))
    probed
      .join(broadcast(dim.withColumn("m", lit(1))),
        col("l_partkey") === col("k"), "left_outer")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
        sum(when(col("m") === 1, 1L).otherwise(0L)).as("n_exact_match"),
        sum(when(col("bloom_pass") && col("m").isNull, 1L).otherwise(0L)).as("n_false_pos"))
  }

  private val bloomPrefilterAuditSql = {
    def bitOf(h: String, k: String) =
      s"(('0x' || substr(md5(concat(CAST($h AS VARCHAR), ':', CAST($k AS VARCHAR))), 1, 15))::BIGINT % $BloomBits)"
    val passExpr = (0 until BloomHashes)
      .map(h => s"list_contains(bits, ${bitOf(h.toString, "l.l_partkey")})")
      .mkString(" AND ")
    s"""WITH dk AS (SELECT DISTINCT p_partkey AS k FROM part WHERE p_size <= 2),
       |bb AS (SELECT DISTINCT ${bitOf("r.h", "dk.k")} AS b
       |       FROM dk, range(0, $BloomHashes) r(h)),
       |ba AS (SELECT list(b ORDER BY b) AS bits FROM bb),
       |p AS (SELECT l.l_returnflag, l.l_partkey, ($passExpr) AS bloom_pass,
       |        dk.k IS NOT NULL AS exact_match
       |      FROM lineitem l CROSS JOIN ba LEFT JOIN dk ON l.l_partkey = dk.k)
       |SELECT l_returnflag, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       |  CAST(sum(CASE WHEN exact_match THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_match,
       |  CAST(sum(CASE WHEN bloom_pass AND NOT exact_match THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
       |FROM p GROUP BY 1""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_join_semi", customersWithOpenOrders, Some(customersWithOpenOrdersSql)),
    Q("q_join_left_outer", partSalesIncludingUnsold, Some(partSalesIncludingUnsoldSql)),
    Q("q_join_full_outer", dailyReturnVsAccept, Some(dailyReturnVsAcceptSql)),
    Q("q_join_bloom_prefilter", bloomPrefilterAudit, Some(bloomPrefilterAuditSql)),
  )
}
