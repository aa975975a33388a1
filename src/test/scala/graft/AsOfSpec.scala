package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Composed as-of join semantics on a hand-built timeline. */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("each left row gets the latest right row at or before it, per key") {
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
      (1L, ts("2024-01-01 12:00:00"), 101L, 2.0),
      (2L, ts("2024-01-01 09:00:00"), 200L, 3.0) // before any view of user 2
    ).toDF("user_id", "ts", "event_id", "value")
    val views = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 11.0),
      (2L, ts("2024-01-01 09:30:00"), 12.0)
    ).toDF("user_id", "ts", "value")

    val out = AsOf.asOfJoin(clicks, views, "user_id", "ts", Seq("ts", "value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.sql.Timestamp]("asof_ts")), Option(r.getAs[Any]("asof_value")))).toMap

    assert(out(100L) === ((Some(ts("2024-01-01 09:30:00")), Some(10.0))))
    assert(out(101L) === ((Some(ts("2024-01-01 11:00:00")), Some(11.0))))
    assert(out(200L) === ((None, None))) // no view at or before -> nulls
  }

  test("a right row at the identical timestamp IS visible (>= semantics)") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L, 0.0)).toDF("user_id", "ts", "event_id", "value")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 42.0)).toDF("user_id", "ts", "value")
    val row = AsOf.asOfJoin(l, r, "user_id", "ts", Seq("value")).head()
    assert(row.getAs[Double]("asof_value") === 42.0)
  }

  test("clicksAsOfViews over events: every matched view_ts <= click ts") {
    val out = AsOf.clicksAsOfViews(spark, SparkSpec.sf0001)
    assert(out.count() > 0)
    assert(out.filter(col("view_ts") > col("ts")).isEmpty)
    // at least some clicks have a preceding view in this data
    assert(out.filter(col("view_ts").isNotNull).count() > 0)
  }
}
