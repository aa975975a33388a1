package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the harness testdata (/root/repo/TESTDATA.md): one
  * parquet file per table under the per-scale-factor directory.
  *
  * Role binding to the reference's e-commerce star schema
  * (reference validate.py:22-55, transform.py:28-61 — see SURVEY.md §7.2):
  *   order_items -> lineitem  (fact; sale_price -> l_extendedprice,
  *                             status -> l_returnflag, created_at -> l_shipdate,
  *                             product_id -> l_partkey, order_id -> l_orderkey)
  *   orders      -> orders    (header; status -> o_orderstatus,
  *                             created_at -> o_orderdate, user_id -> o_custkey)
  *   products    -> part      (dimension; category -> p_brand)
  *
  * Scans are plain `spark.read.parquet` so Catalyst owns predicate pushdown
  * and column pruning — every downstream select/filter reaches the scan.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.parquet stores TIMESTAMP(NANOS) (pandas-generated), which Spark
    * cannot represent (micros max) and by default refuses to read. The
    * sessions set `spark.sql.legacy.parquet.nanosAsLong=true`, so the column
    * arrives as LongType nanos and is floor-divided to an exact microsecond
    * timestamp here. The DuckDB oracle applies the same truncation
    * (`ts::TIMESTAMP` casts ns→us toward zero), keeping both engines
    * bit-identical. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
