package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for co-located fact-to-fact joins.
  *
  * At 100 TB the lineitem⋈orders join is fact-to-fact: neither side
  * broadcasts, so a plain join pays a full shuffle of both relations every
  * run. Bucketing both tables by the join key at WRITE time (same bucket
  * count) lets every subsequent join/aggregation on that key run with ZERO
  * exchange — the amortize-the-shuffle-once pattern (Spark's equivalent of
  * the reference warehouse's keyed layout). BucketingSpec asserts the plan
  * is exchange-free.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. Drops any
    * previous table AND its orphaned location first — a fresh in-memory
    * metastore doesn't know about directories left by earlier JVMs, and
    * saveAsTable refuses to reuse them. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    if (loc.exists()) rm(loc)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Co-located equi-join of two same-bucketed tables. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey), "inner")
  }
}
