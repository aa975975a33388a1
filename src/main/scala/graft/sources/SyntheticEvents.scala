package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic harness-shaped generators for the EVENTS and SALES
  * (lineitem/orders/part) table families — the round-5 verdict's ask #3:
  * the LSH dedup family got measured multi-decade scale evidence through
  * [[SyntheticDocs]]; the reference-derived surface (KPI joins, session
  * windows, range joins, attribution, RFM, MAU) stops at harness sf0.1
  * (100k events / 600k lineitem), where fixed job overhead biases every
  * scaling exponent down. These generators extend those families one-plus
  * decades up with the same statistical shape as the harness testdata.
  *
  * Shape matched to /root/testdata (measured at sf0.1): ~66 events/user
  * over a fixed 30-day window; 4 items/order; parts = lineitem/30; money
  * in 2-decimal doubles. Two deliberate realism deltas, both documented
  * where they matter: event types draw from a Zipf-ish weight vector
  * (view-heavy) instead of uniform, and l_partkey popularity is
  * log-uniform (hot products), so the KPI join sees realistic key skew
  * rather than the harness's uniform draw.
  *
  * Every row is a pure function of its id (same discipline as
  * [[SyntheticDocs]]): generation is embarrassingly parallel, rerun- and
  * repartition-stable, and needs no I/O — each executor synthesizes only
  * its `spark.range` slice.
  */
object SyntheticEvents {

  /** 2024-01-01T00:00:00Z in epoch micros; all timestamps land in the
    * [Start, Start + SpanDays) window like the harness events table. */
  val StartUs = 1704067200000000L
  val SpanDays = 30L
  val EventsPerUser = 66L
  /** Zipf-ish event-type mix (view-heavy), cumulative thresholds. */
  private val typeCdf: IndexedSeq[(Double, String)] = IndexedSeq(
    0.45 -> "view", 0.75 -> "click", 0.85 -> "purchase",
    0.95 -> "error", 1.01 -> "signup")

  private def rngOf(id: Long, salt: Long): java.util.Random =
    new java.util.Random(id * 0x9e3779b97f4a7c15L + salt)

  /** Events-shaped frame (event_id, ts, user_id, event_type, value):
    * `rows` events over `rows`/[[EventsPerUser]] users, uniform arrival in
    * the 30-day window, 2-decimal money values. */
  def events(spark: SparkSession, rows: Long, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val users = math.max(1L, rows / EventsPerUser)
    spark.range(0, rows, 1, partitions).map { id =>
      val rnd = rngOf(id, 11)
      val ts = StartUs + (rnd.nextDouble() * SpanDays * 86400L * 1000000L).toLong
      val uid = (rnd.nextDouble() * users).toLong
      val u = rnd.nextDouble()
      val et = typeCdf.find(u < _._1).get._2
      val value = math.floor(rnd.nextDouble() * 56021.0) / 100.0
      (id, ts, uid, et, value)
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  /** lineitem-shaped frame: `rows` items over `rows`/4 orders; log-uniform
    * (hot-product) l_partkey over `rows`/30 parts; only the columns the
    * KPI/join family reads. */
  def lineitem(spark: SparkSession, rows: Long, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val nParts = math.max(100L, rows / 30L)
    val lnParts = math.log(nParts.toDouble)
    spark.range(0, rows, 1, partitions).map { id =>
      val rnd = rngOf(id, 29)
      val okey = id / 4
      val pkey = math.min(nParts - 1,
        math.floor(math.exp(rnd.nextDouble() * lnParts)).toLong)
      val qty = (1 + rnd.nextInt(50)).toDouble
      val price = math.floor(rnd.nextDouble() * 9999900.0 + 100.0) / 100.0
      val disc = rnd.nextInt(11) / 100.0
      val flagDraw = rnd.nextDouble()
      val flag = if (flagDraw < 0.1) "R" else if (flagDraw < 0.55) "A" else "N"
      val ship = StartUs + (rnd.nextDouble() * SpanDays * 86400L * 1000000L).toLong
      (okey, pkey, (id % 4 + 1).toInt, qty, price, disc, flag, ship)
    }.toDF("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "ship_us")
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"), timestamp_micros(col("ship_us")).as("l_shipdate"))
  }

  /** orders-shaped frame for `items` lineitem rows (`items`/4 orders). */
  def orders(spark: SparkSession, items: Long, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val n = math.max(1L, items / 4)
    val nCust = math.max(10L, n / 10)
    spark.range(0, n, 1, partitions).map { id =>
      val rnd = rngOf(id, 41)
      val cust = (rnd.nextDouble() * nCust).toLong
      val sDraw = rnd.nextDouble()
      val status = if (sDraw < 0.3) "F" else if (sDraw < 0.9) "O" else "P"
      val od = StartUs + (rnd.nextDouble() * SpanDays * 86400L * 1000000L).toLong
      (id, cust, status, od)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "od_us")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        timestamp_micros(col("od_us")).as("o_orderdate"))
  }

  /** part-shaped frame for `items` lineitem rows (25 brands, the harness
    * cardinality the KPI groups on). */
  def part(spark: SparkSession, items: Long, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val n = math.max(100L, items / 30L)
    spark.range(0, n, 1, partitions).map { id =>
      (id, s"Brand#${10 + (id % 5) * 10 + rngOf(id, 59).nextInt(5) + 1}")
    }.toDF("p_partkey", "p_brand")
  }

  /** Materialize one scale point: events + the sales triple under `dir`,
    * sized in EVENT rows (lineitem = 6× events, the harness sf0.1 ratio).
    * Skips tables that already exist, so bench reruns pay generation once. */
  def writePoint(spark: SparkSession, dir: String, eventRows: Long): Unit = {
    val itemRows = eventRows * 6
    val tables: Seq[(String, () => DataFrame)] = Seq(
      "events" -> (() => events(spark, eventRows)),
      "lineitem" -> (() => lineitem(spark, itemRows)),
      "orders" -> (() => orders(spark, itemRows)),
      "part" -> (() => part(spark, itemRows)))
    tables.foreach { case (name, gen) =>
      val path = s"$dir/$name.parquet"
      if (!new java.io.File(path).exists())
        gen().write.mode("overwrite").parquet(path)
    }
  }
}
