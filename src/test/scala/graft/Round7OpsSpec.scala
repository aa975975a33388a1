package graft

import org.apache.spark.sql.functions._

/** Hand-pinned invariants for the round-7 operator wave. */
class Round7OpsSpec extends SparkSuite {

  import spark.implicits._

  private def ev(id: Long, ts: String, u: Long, t: String, v: Double) =
    (id, java.sql.Timestamp.valueOf(ts), u, t, v, "{}")

  private def eventsDf(rows: (Long, java.sql.Timestamp, Long, String, Double, String)*) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("decay attribution: 2^(-dt/hl) micro-weights, remainder to latest, exact cents") {
    // purchase 1.00 at t0; click at dt=0 (w=1e6), view at dt=3.5d = hl/2
    // (w = floor(2^-0.5 * 1e6 + 0.5) = 707107). sw = 1707107;
    // base: click 100e6/1707107 = 58, view 70710700/1707107 = 41;
    // remainder 100-99=1 goes to the LATEST touch (the click).
    val d = fixtureDir("events" -> eventsDf(
      ev(1, "2024-01-04 22:00:00", 1, "view", 0),
      ev(2, "2024-01-08 10:00:00", 1, "click", 0),
      ev(3, "2024-01-08 10:00:00", 1, "purchase", 1.00),
      ev(4, "2024-01-01 10:00:00", 2, "purchase", 5.00))) // untouched -> none
    val rows = graft.operators.Events.attributionDecay(spark, d).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Double]("revenue"))).toMap
    assert(rows("click") === (1L, 0.59))
    assert(rows("view") === (1L, 0.41))
    assert(rows("none") === (1L, 5.0))
    // recency monotonicity: the newer touch out-earns the older one
    assert(rows("click")._2 > rows("view")._2)
  }

  test("decay attribution: harness data conserves revenue to the cent") {
    val out = graft.operators.Events.attributionDecay(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[String]("channel")).toSet.subsetOf(Set("click", "view", "none")))
    val attributed = out.map(_.getAs[Double]("revenue")).sum
    val total = graft.sources.Tables.events(spark, SparkSpec.sf0001)
      .filter(col("event_type") === "purchase")
      .agg((sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0).as("t"))
      .collect().head.getAs[Double]("t")
    assert(math.abs(attributed - total) < 1e-6, s"$attributed vs $total")
  }
}
