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

  val queries: Seq[Q] = Seq(
    Q("q_join_semi", customersWithOpenOrders, Some(customersWithOpenOrdersSql)),
    Q("q_join_left_outer", partSalesIncludingUnsold, Some(partSalesIncludingUnsoldSql)),
    Q("q_join_full_outer", dailyReturnVsAccept, Some(dailyReturnVsAcceptSql)),
  )
}
