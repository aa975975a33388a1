package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no native node for,
  * built by COMPOSITION (preference (a) of the custom-operator ladder): for
  * each left event, attach the latest right event of the same key at or
  * before it.
  *
  * Plan shape: tag both sides, union, one shuffle+sort on (key, ts), then a
  * running `last(_, ignoreNulls)` window carries the most recent right-side
  * values forward into each left row. No range explode, no per-row probe:
  * O(n log n) in the sort, single exchange — the merge-style as-of plan
  * that survives 100 TB (vs. the naive `l JOIN r ON l.ts >= r.ts` +
  * row_number, which is a range join that blows up quadratically in hot
  * keys).
  *
  * Instance here: each 'click' event gets the user's most recent 'view'
  * event at or before it (views at the identical timestamp count — the
  * right side sorts before the left at ties). Oracle: DuckDB's native
  * ASOF LEFT JOIN, which defines exactly these semantics.
  */
object AsOf {

  /** Generic composed as-of join over one keyed, time-stamped relation
    * split into left/right sides. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Column
    val leftOther = left.columns.filter(c => c != key && c != ts).toSeq
    val lSel: Seq[Column] = Seq(col(key), col(ts).as("__ts"), lit(1).as("__side")) ++
      leftOther.map(col) ++
      carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))
    val rSel: Seq[Column] = Seq(col(key), col(ts).as("__ts"), lit(0).as("__side")) ++
      leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      carry.map(c => col(c).as(s"__r_$c"))
    val u = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    // right rows (side 0) sort before left rows (side 1) at equal ts, so an
    // equal-timestamp right row is visible to the left row — ASOF `>=`.
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carry.foldLeft(u) { (df, c) =>
      df.withColumn(s"__last_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    val outSel: Seq[Column] = Seq(col(key), col("__ts").as(ts)) ++
      leftOther.map(col) ++ carry.map(c => col(s"__last_$c").as(s"asof_$c"))
    carried.filter(col("__side") === 1).select(outSel: _*)
  }

  /** clicks ⟕asof views per user over the events table. */
  def clicksAsOfViews(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    asOfJoin(clicks, views, "user_id", "ts", carry = Seq("ts", "value"))
      .withColumnRenamed("asof_ts", "view_ts")
      .withColumnRenamed("asof_value", "view_value")
  }

  private val clicksAsOfViewsSql =
    """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value FROM events),
      |c AS (SELECT user_id, ts, event_id, value FROM e WHERE event_type = 'click'),
      |v AS (SELECT user_id, ts, value FROM e WHERE event_type = 'view')
      |SELECT c.user_id, c.ts, c.event_id, c.value,
      |       v.ts AS view_ts, v.value AS view_value
      |FROM c ASOF LEFT JOIN v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin

  /** FORWARD as-of: for each left event, the EARLIEST right event of the
    * same key at or after it — the "next state after the trigger" shape
    * (reaction-time joins, next-heartbeat attachment). Same merge-style
    * single-exchange plan as the backward join, with the window walked in
    * DESCENDING time order; left rows sort before right at equal ts is
    * inverted here (right side 0 still orders first within a tie under
    * the descending walk, preserving ASOF `<=` tie visibility). */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String, ts: String,
      carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Column
    val leftOther = left.columns.filter(c => c != key && c != ts).toSeq
    val lSel: Seq[Column] = Seq(col(key), col(ts).as("__ts"), lit(1).as("__side")) ++
      leftOther.map(col) ++
      carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))
    val rSel: Seq[Column] = Seq(col(key), col(ts).as("__ts"), lit(0).as("__side")) ++
      leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      carry.map(c => col(c).as(s"__r_$c"))
    val u = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    // descending time: a right row at the SAME ts must still be visible to
    // the left row (ASOF <=), so right (side 0) sorts first within a tie
    val w = Window.partitionBy(col(key)).orderBy(col("__ts").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carry.foldLeft(u) { (df, c) =>
      df.withColumn(s"__next_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    val outSel: Seq[Column] = Seq(col(key), col("__ts").as(ts)) ++
      leftOther.map(col) ++ carry.map(c => col(s"__next_$c").as(s"asof_$c"))
    carried.filter(col("__side") === 1).select(outSel: _*)
  }

  /** clicks ⟕asof-forward next purchase per user — time-to-next-purchase
    * after each click. */
  def clicksBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    asOfJoinForward(clicks, purchases, "user_id", "ts", carry = Seq("ts", "value"))
      .withColumnRenamed("asof_ts", "purchase_ts")
      .withColumnRenamed("asof_value", "purchase_value")
  }

  private val clicksBeforePurchaseSql =
    """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value FROM events),
      |c AS (SELECT user_id, ts, event_id, value FROM e WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts, value FROM e WHERE event_type = 'purchase')
      |SELECT c.user_id, c.ts, c.event_id, c.value,
      |       p.ts AS purchase_ts, p.value AS purchase_value
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin

  /** NEAREST as-of: each click gets whichever purchase is closer in time
    * — backward or forward — with the backward side winning exact ties.
    * Composed from the two directional joins (each a single-exchange
    * merge walk) and one row-local comparison; the "match to the closest
    * observation" shape sensor-fusion pipelines use. */
  def clicksNearestPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val back = asOfJoin(clicks, purchases, "user_id", "ts", carry = Seq("ts", "value"))
      .withColumnRenamed("asof_ts", "b_ts").withColumnRenamed("asof_value", "b_value")
    val fwd = asOfJoinForward(clicks, purchases, "user_id", "ts", carry = Seq("ts", "value"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("asof_ts").as("f_ts"), col("asof_value").as("f_value"))
    val db = abs(unix_micros(col("ts")) - unix_micros(col("b_ts")))
    val df_ = abs(unix_micros(col("f_ts")) - unix_micros(col("ts")))
    back.join(fwd, Seq("user_id", "ts", "event_id"))
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        when(col("b_ts").isNull && col("f_ts").isNull, lit(null).cast("timestamp"))
          .when(col("f_ts").isNull, col("b_ts"))
          .when(col("b_ts").isNull, col("f_ts"))
          .when(db <= df_, col("b_ts")).otherwise(col("f_ts")).as("purchase_ts"),
        when(col("b_ts").isNull && col("f_ts").isNull, lit(null).cast("double"))
          .when(col("f_ts").isNull, col("b_value"))
          .when(col("b_ts").isNull, col("f_value"))
          .when(db <= df_, col("b_value")).otherwise(col("f_value")).as("purchase_value"))
  }

  private val clicksNearestPurchaseSql =
    """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value FROM events),
      |c AS (SELECT user_id, ts, event_id, value FROM e WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts, value FROM e WHERE event_type = 'purchase'),
      |b AS (SELECT c.user_id, c.ts, c.event_id, c.value,
      |        p.ts AS b_ts, p.value AS b_value
      |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts),
      |f AS (SELECT c.user_id, c.ts, c.event_id,
      |        p.ts AS f_ts, p.value AS f_value
      |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts)
      |SELECT b.user_id, b.ts, b.event_id, b.value,
      |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
      |       WHEN f_ts IS NULL THEN b_ts
      |       WHEN b_ts IS NULL THEN f_ts
      |       WHEN epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts)
      |         THEN b_ts ELSE f_ts END AS purchase_ts,
      |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
      |       WHEN f_ts IS NULL THEN b_value
      |       WHEN b_ts IS NULL THEN f_value
      |       WHEN epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts)
      |         THEN b_value ELSE f_value END AS purchase_value
      |FROM b JOIN f USING (user_id, ts, event_id)""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_join_asof", clicksAsOfViews, Some(clicksAsOfViewsSql), bench = true),
    Q("q_join_asof_forward", clicksBeforePurchase, Some(clicksBeforePurchaseSql)),
    Q("q_join_asof_nearest", clicksNearestPurchase, Some(clicksNearestPurchaseSql)),
  )
}
