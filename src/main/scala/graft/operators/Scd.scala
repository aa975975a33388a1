package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 merge — the warehouse operator behind
  * every "dimension history" table. The reference's sink upserts by key
  * (transform.py:149-174 DynamoDB put_item = Type-1 overwrite); Type 2 is
  * what the same user needs once history matters.
  *
  * Semantics of one apply(dim, updates, effectiveDate):
  *  - rows whose attributes CHANGED: the current version is closed
  *    (valid_to = effective, is_current = false) and a new current version
  *    is inserted (valid_from = effective);
  *  - no-op updates (same attribute values) are dropped;
  *  - brand-new keys are inserted as first versions;
  *  - historical (already-closed) rows pass through untouched.
  *
  * Scale notes (100 TB dimension): everything is key-equi-joins and unions —
  * one shuffle family on the dimension key, no window, no driver state. The
  * updates batch is usually tiny relative to the dimension, so every join
  * against it broadcasts; the union output is written back partition-local.
  * This is exactly the distributed MERGE INTO plan a lakehouse writes, with
  * the matched/not-matched branches made explicit.
  */
object Scd {

  /** Generic Type-2 apply. `dim` must carry (key, attrs..., valid_from,
    * valid_to, is_current); `updates` carries (key, attrs...). */
  def applyScd2(dim: DataFrame, updates: DataFrame, key: String,
                attrs: Seq[String], effective: Column): DataFrame = {
    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current"))
    val diff = attrs.map(a => col(s"u.$a") =!= col(s"d.$a")).reduce(_ || _)
    // updates whose attributes genuinely differ from the current version
    val changed = updates.alias("u")
      .join(cur.alias("d"), col(s"u.$key") === col(s"d.$key"), "inner")
      .filter(diff)
      .select(col(s"u.$key").as(key) +: attrs.map(a => col(s"u.$a").as(a)): _*)
    // updates with no current version at all
    val fresh = updates.alias("u")
      .join(cur.alias("d"), col(s"u.$key") === col(s"d.$key"), "left_anti")
      .select(col(key) +: attrs.map(col): _*)
    val changedKeys = changed.select(col(key))
    val untouched = cur.join(changedKeys, Seq(key), "left_anti")
    val closed = cur.join(changedKeys, Seq(key), "left_semi")
      .withColumn("valid_to", effective.cast("date"))
      .withColumn("is_current", lit(false))
    val inserts = changed.unionByName(fresh)
      .withColumn("valid_from", effective.cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    hist.unionByName(untouched).unionByName(closed)
      .unionByName(inserts.select(hist.columns.map(col).toIndexedSeq: _*))
  }

  /** Registered instantiation: `part` as the day-0 dimension, an update
    * batch synthesized deterministically from it (every 10th part gets a
    * +10% price, every 100th partkey arrives as a brand-new key). */
  def scd2Part(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val dim = p.select(
      col("p_partkey").as("key"), col("p_brand").as("brand"),
      col("p_retailprice").as("price"),
      lit("1990-01-01").cast("date").as("valid_from"),
      lit(null).cast("date").as("valid_to"),
      lit(true).as("is_current"))
    val repriced = p.filter(col("p_partkey") % 10 === 0).select(
      col("p_partkey").as("key"), col("p_brand").as("brand"),
      roundN(col("p_retailprice") * 1.1, 2).as("price"))
    val newKeys = p.filter(col("p_partkey") % 100 === 0).select(
      (col("p_partkey") + 1000000L).as("key"), col("p_brand").as("brand"),
      col("p_retailprice").as("price"))
    applyScd2(dim, repriced.unionByName(newKeys), "key",
      Seq("brand", "price"), lit("2000-01-01"))
  }

  private val scd2PartSql =
    s"""WITH dim AS (
       |  SELECT p_partkey AS key, p_brand AS brand, p_retailprice AS price,
       |         DATE '1990-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
       |         true AS is_current
       |  FROM part),
       |upd AS (
       |  SELECT p_partkey AS key, p_brand AS brand,
       |         ${roundNSql("p_retailprice * 1.1", 2)} AS price
       |  FROM part WHERE p_partkey % 10 = 0
       |  UNION ALL
       |  SELECT p_partkey + 1000000 AS key, p_brand, p_retailprice
       |  FROM part WHERE p_partkey % 100 = 0),
       |changed AS (
       |  SELECT u.key, u.brand, u.price FROM upd u
       |  JOIN dim d ON u.key = d.key AND d.is_current
       |  WHERE u.brand <> d.brand OR u.price <> d.price),
       |fresh AS (
       |  SELECT u.key, u.brand, u.price FROM upd u
       |  WHERE NOT EXISTS (SELECT 1 FROM dim d
       |                    WHERE d.key = u.key AND d.is_current))
       |SELECT key, brand, price, valid_from, valid_to, is_current
       |FROM dim WHERE NOT is_current
       |UNION ALL
       |SELECT d.key, d.brand, d.price, d.valid_from, d.valid_to, d.is_current
       |FROM dim d WHERE d.is_current
       |  AND NOT EXISTS (SELECT 1 FROM changed c WHERE c.key = d.key)
       |UNION ALL
       |SELECT d.key, d.brand, d.price, d.valid_from, DATE '2000-01-01', false
       |FROM dim d WHERE d.is_current
       |  AND EXISTS (SELECT 1 FROM changed c WHERE c.key = d.key)
       |UNION ALL
       |SELECT key, brand, price, DATE '2000-01-01', CAST(NULL AS DATE), true
       |FROM (SELECT * FROM changed UNION ALL SELECT * FROM fresh)""".stripMargin

  /** Temporal (point-in-time) join: each fact row picks the dimension
    * VERSION that was valid at its event time — the query every SCD2 table
    * exists to serve. Revenue is priced at the historical price, not the
    * current one.
    *
    * Plan shape at scale: the key equality keeps this a hash/sort-merge
    * EQUI-join (the validity-window predicate rides along as a join
    * residual, it never degrades to a nested-loop); exactly one version
    * matches per fact, so the join neither drops nor fans out rows. The
    * dimension history is versions-per-key small, so AQE broadcasts it
    * when it fits. Amounts aggregate as exact integer cents ×
    * integer quantity (order-insensitive), divided back once at the end. */
  def temporalJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = scd2Part(spark, dir)
      .withColumn("price_cents", roundN(col("price") * 100, 0).cast("long"))
    val li = Tables.lineitem(spark, dir).select(
      col("l_partkey"), to_date(col("l_shipdate")).as("ship_date"),
      col("l_quantity").cast("long").as("qty"))
    li.join(dim,
        col("l_partkey") === col("key") &&
          col("valid_from") <= col("ship_date") &&
          (col("valid_to").isNull || col("ship_date") < col("valid_to")))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("qty") * col("price_cents")).cast("double") / 100.0)
          .as("amount"))
      .orderBy(col("brand"))
  }

  private val temporalJoinSql =
    s"""SELECT h.brand, count(*) AS n_rows,
       |  CAST(sum(CAST(l.l_quantity AS BIGINT) * h.price_cents) AS DOUBLE) / 100.0 AS amount
       |FROM lineitem l
       |JOIN (
       |  SELECT *, CAST(${roundNSql("price * 100", 0)} AS BIGINT) AS price_cents
       |  FROM ($scd2PartSql)
       |) h ON l.l_partkey = h.key
       |   AND h.valid_from <= CAST(l.l_shipdate AS DATE)
       |   AND (h.valid_to IS NULL OR CAST(l.l_shipdate AS DATE) < h.valid_to)
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_scd2", scd2Part, Some(scd2PartSql)),
    Q("q_join_temporal", temporalJoin, Some(temporalJoinSql)),
  )
}
