package graft.sources

import graft.Q
import graft.functions.Rounding.roundN
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning (DPP) — the scan-side kill switch that makes
  * a partitioned 100 TB fact table affordable to query through a
  * dimension filter. The fact copy is laid out hive-partitioned by ship
  * month at WRITE time; at PLAN time the month dimension's selective
  * filter (first quarter only) is turned by Spark into a runtime
  * DynamicPruningExpression on the fact scan, so only the matching month
  * directories are ever read — the fact side never pays a full scan even
  * though the query's WHERE clause mentions only dimension columns.
  * DppSpec asserts the pruning subquery is in the scan's partition
  * filters and that the number of read partitions equals the number of
  * selected months, not the total.
  *
  * The one-time partitioned write is the same amortize-the-layout trade
  * as Bucketing: pay one shuffle-free partitionBy write, then every
  * dimension-filtered query reads only its months forever.
  */
object Dpp {

  /** Hive-partitioned lineitem copy keyed by ship month (yyyy-MM). */
  def partitionedFact(spark: SparkSession, dir: String): DataFrame = {
    val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_dpp_$tag").getAbsolutePath
    val marker = new java.io.File(out, "_SUCCESS")
    if (!marker.exists()) {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"),
          substring(col("l_shipdate"), 1, 7).as("l_month"))
        .write.mode("overwrite").partitionBy("l_month").parquet(out)
    }
    spark.read.parquet(out)
  }

  /** Month dimension derived from order dates, with the quarter
    * attribute the query filters on. Dimension-sized: one row per month. */
  def monthDim(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(substring(col("o_orderdate"), 1, 7).as("month"))
      .distinct()
      .withColumn("month_num", substring(col("month"), 6, 2).cast("int"))

  /** Q1 revenue by month through the partitioned fact + filtered dim —
    * the filter is ONLY on the dimension; partition pruning of the fact
    * is Spark's runtime DPP, not a static predicate. */
  def q1RevenueByMonth(spark: SparkSession, dir: String): DataFrame = {
    val fact = partitionedFact(spark, dir)
      .withColumn("cents", floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
    val dim = monthDim(spark, dir).filter(col("month_num") <= 3)
    fact.join(dim, fact("l_month") === dim("month"))
      .groupBy(col("l_month"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("cents")).cast("double") / 100.0).as("revenue"))
      .orderBy(col("l_month"))
  }

  private val q1RevenueByMonthSql =
    """WITH dim AS (
      |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month FROM orders
      |  WHERE CAST(strftime(o_orderdate, '%m') AS INT) <= 3),
      |f AS (SELECT strftime(l_shipdate, '%Y-%m') AS l_month,
      |  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem)
      |SELECT l_month, count(*) AS n_rows,
      |  CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue
      |FROM f JOIN dim ON l_month = month
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_join_dpp", q1RevenueByMonth, Some(q1RevenueByMonthSql)),
  )
}
