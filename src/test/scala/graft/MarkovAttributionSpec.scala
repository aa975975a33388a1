package graft

import graft.operators.MarkovAttribution

/** Hand-solvable absorbing chains for the removal-effect attribution. */
class MarkovAttributionSpec extends SparkSuite {
  import spark.implicits._

  private def ev(id: Long, uid: Long, ts: String, t: String) =
    (id, java.sql.Timestamp.valueOf(ts), uid, t, 1.0, "{}")

  private def run(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    val d = fixtureDir("events" -> rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    MarkovAttribution.removalEffect(spark, d).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
  }

  test("two-channel chain: hand-solved absorption and equal shares") {
    // u1: click -> purchase ; u2: click (drops) ; u3: view -> purchase
    // p(click)=1/2, p(view)=1, p(START)=2/3; removing either channel
    // leaves p(START)=1/3 => removal effects equal, shares 0.5/0.5
    val out = run(Seq(
      ev(1, 1, "2024-01-01 10:00:00", "click"),
      ev(2, 1, "2024-01-01 10:01:00", "purchase"),
      ev(3, 2, "2024-01-01 10:00:00", "click"),
      ev(4, 3, "2024-01-01 10:00:00", "view"),
      ev(5, 3, "2024-01-01 10:01:00", "purchase")))
    assert(out.keySet === Set("click", "view"))
    val c = out("click")
    assert(math.abs(c.getAs[Double]("p_conv") - 2.0 / 3.0) < 1e-5)
    assert(math.abs(c.getAs[Double]("p_removed") - 1.0 / 3.0) < 1e-5)
    assert(math.abs(c.getAs[Double]("removal_effect") - 0.5) < 1e-5)
    assert(math.abs(c.getAs[Double]("share") - 0.5) < 1e-6)
    assert(math.abs(out("view").getAs[Double]("share") - 0.5) < 1e-6)
  }

  test("self-loop chain converges: click->click->purchase absorbs ~1") {
    // START->click, click->click, click->CONV: p(click)=0.5 p(click)+0.5
    // => 1 in the limit; 40 quantized steps land within 1e-4
    val out = run(Seq(
      ev(1, 1, "2024-01-01 10:00:00", "click"),
      ev(2, 1, "2024-01-01 10:01:00", "click"),
      ev(3, 1, "2024-01-01 10:02:00", "purchase")))
    assert(out.keySet === Set("click"))
    assert(out("click").getAs[Double]("p_conv") > 0.9999)
    assert(math.abs(out("click").getAs[Double]("removal_effect") - 1.0) < 1e-4)
  }

  test("journeys re-open after purchase: post-purchase touch starts at START") {
    // one user: view, purchase, view  => segment 2 is START->view->NULL;
    // START totals 2, p(view)=1/2, p(START)=1/2
    val out = run(Seq(
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 1, "2024-01-01 10:01:00", "purchase"),
      ev(3, 1, "2024-01-01 10:02:00", "view")))
    assert(math.abs(out("view").getAs[Double]("p_conv") - 0.5) < 1e-5)
  }

  test("no conversions anywhere: effect and share are NULL, not Infinity") {
    val out = run(Seq(
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 2, "2024-01-01 10:00:00", "click")))
    val r = out("view")
    assert(r.getAs[Double]("p_conv") === 0.0)
    assert(r.isNullAt(r.fieldIndex("removal_effect")))
    assert(r.isNullAt(r.fieldIndex("share")))
  }

  private def runShapley(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    val d = fixtureDir("events" -> rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    MarkovAttribution.shapley(spark, d).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
  }

  test("shapley: two-channel coalition game solved by hand") {
    // exact sets: {click}: n=2 conv=1 (v=0.5); {view}: n=1 conv=1 (v=1);
    // {click,view}: n=1 conv=1 (v=1); u5 converts with no touch -> coalition
    // empty, excluded. Hand Shapley (k=2):
    //   phi_click = 1/2*(v{c}-0) + 1/2*(v{c,v}-v{v}) = 0.25
    //   phi_view  = 1/2*(v{v}-0) + 1/2*(v{c,v}-v{c}) = 0.75
    val out = runShapley(Seq(
      ev(1, 1, "2024-01-01 10:00:00", "click"),
      ev(2, 1, "2024-01-01 10:01:00", "purchase"),
      ev(3, 2, "2024-01-01 10:00:00", "click"),
      ev(4, 3, "2024-01-01 10:00:00", "view"),
      ev(5, 3, "2024-01-01 10:01:00", "purchase"),
      ev(6, 4, "2024-01-01 10:00:00", "click"),
      ev(7, 4, "2024-01-01 10:01:00", "view"),
      ev(8, 4, "2024-01-01 10:02:00", "purchase"),
      ev(9, 5, "2024-01-01 10:00:00", "purchase")))
    assert(out.keySet === Set("click", "view"))
    assert(out("click").getAs[Double]("phi") === 0.25)
    assert(out("view").getAs[Double]("phi") === 0.75)
    assert(out("click").getAs[Long]("exposed_users") === 3L)
    assert(out("view").getAs[Long]("exposed_users") === 2L)
  }

  test("shapley: post-purchase touches are excluded from the coalition") {
    // u1 touches view only AFTER converting -> coalition {click} only
    val out = runShapley(Seq(
      ev(1, 1, "2024-01-01 10:00:00", "click"),
      ev(2, 1, "2024-01-01 10:01:00", "purchase"),
      ev(3, 1, "2024-01-01 10:02:00", "view")))
    assert(out.keySet === Set("click"))
    assert(out("click").getAs[Double]("phi") === 1.0)
  }

  test("shapley: efficiency — credits sum to v(full coalition) on harness data") {
    val out = MarkovAttribution.shapley(spark, SparkSpec.sf0001).collect()
    assert(out.length === 4) // click, error, signup, view
    val total = out.map(_.getAs[Double]("phi")).sum
    // v is a conversion rate in [0,1]; efficiency: sum of credits = v(C)
    assert(total >= 0.0 && total <= 1.0, s"sum(phi) = $total")
    out.foreach(r => assert(math.abs(r.getAs[Double]("phi")) <= 1.0))
  }
}
