package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: collapse an ordered changelog
  * (INSERT/UPDATE/DELETE per key) into the current snapshot.
  *
  * This is the operator behind every warehouse mirror of an OLTP table —
  * the batch core of what the reference's event-driven re-run loop
  * (SURVEY.md §2.8: S3 event → re-run transform) approximates by
  * recomputing from scratch. Here the snapshot derives from the log alone,
  * so replays and out-of-order arrivals are harmless.
  *
  * Scale design:
  *  - Latest-wins is ONE hash aggregate over a PACKED BIGINT — not a
  *    `row_number() OVER (PARTITION BY key ORDER BY seq)` window (which
  *    sorts every group), and not `max_by(struct(...), seq)` either:
  *    struct aggregation buffers are not hash-aggregable, so Spark
  *    silently degrades max_by-of-struct to SortAggregate (observed —
  *    CdcSpec pins the regression). Packing (seq, opcode, cents) into one
  *    long keeps the champion a primitive `max`: whole-stage codegen,
  *    map-side combinable, one pre-reduced row per key per mapper on the
  *    wire. seq rides bits 60+, opcode bits 56-59, cents bits 0-55.
  *  - Tombstones (`op = 'D'`) survive the aggregate and are dropped at the
  *    end, which is what makes the operator idempotent under replay: a
  *    delete beats the insert it follows no matter how partitions arrive.
  *  - Prices ride as exact integer cents (the repo-wide fixed-point
  *    pattern) so the snapshot compares hash-exact across engines.
  *
  * The changelog is synthesized deterministically from `orders` (both
  * engines build the identical log, so the oracle checks the APPLY, not
  * the fixture): every order INSERTs at seq 1; keys ≡0 (mod 3) UPDATE the
  * price at seq 2; keys ≡0 (mod 7) DELETE at seq 3.
  */
object Cdc {

  /** Deterministic synthetic changelog over orders: (key, seq, op, cents). */
  def changelog(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey").as("key"),
      roundN(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val ins = o.select(col("key"), lit(1).as("seq"), lit("I").as("op"), col("cents"))
    val upd = o.filter(col("key") % 3 === 0)
      .select(col("key"), lit(2).as("seq"), lit("U").as("op"),
        (col("cents") + 500L).as("cents"))
    val del = o.filter(col("key") % 7 === 0)
      .select(col("key"), lit(3).as("seq"), lit("D").as("op"), lit(0L).as("cents"))
    ins.unionByName(upd).unionByName(del)
  }

  val Pow56 = 1L << 56
  val Pow60 = 1L << 60

  /** Scalar twin of the packed champion (streaming path shares it). */
  def pack(seq: Int, op: String, cents: Long): Long = {
    val opcode = op match { case "I" => 0L; case "U" => 1L; case _ => 2L }
    seq.toLong * Pow60 + opcode * Pow56 + cents
  }

  /** Collapse a changelog to the live snapshot: latest op per key wins,
    * delete tombstones drop the key. */
  def applyLog(log: DataFrame): DataFrame = {
    val opcode = when(col("op") === "I", 0L)
      .when(col("op") === "U", 1L).otherwise(2L)
    val packed = col("seq").cast("long") * Pow60 + opcode * Pow56 + col("cents")
    log.groupBy(col("key"))
      .agg(max(packed).as("packed"))
      .withColumn("opcode", pmod(expr(s"packed div ${Pow56}L"), lit(16L)))
      .filter(col("opcode") =!= 2L)
      .select(col("key").as("orderkey"),
        when(col("opcode") === 0L, "I").otherwise("U").as("op"),
        (pmod(col("packed"), lit(Pow56)).cast("double") / 100.0).as("price"))
  }

  def cdcApply(spark: SparkSession, dir: String): DataFrame =
    applyLog(changelog(spark, dir))

  private val cdcApplySql =
    s"""WITH o AS (
       |  SELECT o_orderkey AS key,
       |    CAST(${roundNSql("o_totalprice * 100", 0)} AS BIGINT) AS cents
       |  FROM orders),
       |log AS (
       |  SELECT key, 1 AS seq, 'I' AS op, cents FROM o
       |  UNION ALL
       |  SELECT key, 2, 'U', cents + 500 FROM o WHERE key % 3 = 0
       |  UNION ALL
       |  SELECT key, 3, 'D', 0 FROM o WHERE key % 7 = 0),
       |last AS (
       |  SELECT key,
       |    max(seq * ${Pow60} + (CASE op WHEN 'I' THEN 0 WHEN 'U' THEN 1
       |                          ELSE 2 END) * ${Pow56} + cents) AS packed
       |  FROM log GROUP BY 1)
       |SELECT key AS orderkey,
       |  CASE (packed // ${Pow56}) % 16 WHEN 0 THEN 'I' ELSE 'U' END AS op,
       |  CAST(packed % ${Pow56} AS DOUBLE) / 100.0 AS price
       |FROM last WHERE (packed // ${Pow56}) % 16 <> 2""".stripMargin

  /** Latest order per customer — the latest-record-per-entity query every
    * warehouse runs, through the native `max_by_longs` declarative
    * aggregate (functions/MaxByLong.scala): ONE codegen'd HashAggregate,
    * no window sort, champion columns unlimited (the packed-BIGINT trick
    * above caps payloads at 64 bits; the flat-buffer aggregate doesn't).
    * Recency ties break by orderkey, packed into the ordering key
    * (day·2^32 + orderkey — ordering stays ONE long; the values don't
    * have to). */
  def latestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
    val ord = day * (1L << 32) + col("o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("cents", roundN(col("o_totalprice") * 100, 0).cast("long"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(call_function("max_by_longs", ord, col("o_orderkey"), col("cents"))
        .as("m"))
      .select(col("custkey"), col("m.v1").as("orderkey"),
        (col("m.v2").cast("double") / 100.0).as("totalprice"))
      .orderBy(col("custkey"))
  }

  private val latestOrderSql =
    s"""SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       |  CAST(CAST(${roundNSql("o_totalprice * 100", 0)} AS BIGINT) AS DOUBLE) / 100.0
       |    AS totalprice
       |FROM orders
       |QUALIFY row_number() OVER (PARTITION BY o_custkey
       |  ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC) = 1
       |ORDER BY 1""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_cdc_apply", cdcApply, Some(cdcApplySql), bench = true),
    Q("q_latest_per_entity", latestOrderPerCustomer, Some(latestOrderSql)))
}
