package graft

import graft.operators.Seasonal

/** Hand fixtures for the decomposition, Spearman, and entry/exit ops. */
class SeasonalSpec extends SparkSuite {
  import spark.implicits._

  private def ev(id: Long, uid: Long, ts: String, t: String, v: Double) =
    (id, java.sql.Timestamp.valueOf(ts), uid, t, v, "{}")

  test("decompose: strict period-7 series has zero residual inside the trend span") {
    // day d carries 100·(1 + d mod 7): every 7-day window sums alike, so
    // the trend is constant and the weekday seasonal absorbs the rest
    val rows = (1 to 21).map { d =>
      ev(d.toLong, 1L, f"2024-01-$d%02d 10:00:00", "purchase", 100.0 * (1 + d % 7))
    }
    val d = fixtureDir("events" -> rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Seasonal.decompose(spark, d).collect()
    assert(out.length === 21)
    val full = out.filter(!_.isNullAt(2))
    assert(full.length === 15) // 3-day edges are NULL
    full.foreach { r =>
      assert(math.abs(r.getAs[Double]("trend") - 400.0) < 1e-6) // mean of 100..700
      assert(math.abs(r.getAs[Double]("residual")) < 1e-3,
        s"residual ${r.getAs[Double]("residual")} on ${r.get(0)}")
      // additivity: revenue = trend + seasonal + residual
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(sum - r.getAs[Double]("revenue")) < 1e-3)
    }
  }

  test("spearman: monotone association = 1, inverse = -1") {
    // day i: i purchases of $10 -> revenue and volume both increase
    val up = (1 to 5).flatMap { i =>
      (1 to i).map(j => ev((i * 10 + j).toLong, 1L,
        f"2024-01-0$i%d 10:0$j%d:00", "purchase", 10.0))
    }
    val d1 = fixtureDir("events" -> up
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(Seasonal.spearman(spark, d1).collect()(0).getAs[Double]("spearman_rho") === 1.0)
    // day i: one purchase of $(6-i) plus i clicks -> revenue falls as
    // volume rises
    val down = (1 to 5).flatMap { i =>
      ev((i * 10).toLong, 1L, f"2024-01-0$i%d 10:00:00", "purchase", (6 - i) * 10.0) +:
        (1 to i).map(j => ev((i * 100 + j).toLong, 1L,
          f"2024-01-0$i%d 10:0$j%d:00", "click", 1.0))
    }
    val d2 = fixtureDir("events" -> down
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(Seasonal.spearman(spark, d2).collect()(0).getAs[Double]("spearman_rho") === -1.0)
  }

  test("xcorr: a 2-day shifted purchase wave peaks at lag 2") {
    // signups day 1..6 count = d; purchases day 3..8 count = d-2 -> at
    // lag 2 the pair series are identical (r = 1)
    var id = 0L
    def mk(day: Int, t: String, cnt: Int) = (1 to cnt).map { _ =>
      id += 1; ev(id, 1L, f"2024-01-$day%02d 10:00:00", t, 1.0)
    }
    val rows = (1 to 6).flatMap(d => mk(d, "signup", d)) ++
      (3 to 8).flatMap(d => mk(d, "purchase", d - 2))
    val d = fixtureDir("events" -> rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Seasonal.xcorr(spark, d).collect()
      .map(r => r.getAs[Int]("lag") ->
        Option(r.getAs[java.lang.Double]("r")).map(_.toDouble)).toMap
    assert(out(2) === Some(1.0))
    assert(out(0).forall(_ < 1.0)) // unshifted series are not identical
  }

  test("levene: identical spreads give W = 0, unequal spreads W > 0") {
    def mk(rows: Seq[(String, Double)]) = fixtureDir("events" ->
      rows.zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    // two groups with the SAME |x − med| multiset -> SSB = 0 -> W = 0
    val same = mk(Seq(("a", 10.0), ("a", 20.0), ("b", 10.0), ("b", 20.0)))
    val r1 = graft.operators.Scans.levene(spark, same).collect()(0)
    assert(r1.getAs[Long]("k") === 2L)
    assert(r1.getAs[Double]("w") === 0.0)
    // group c spans 100x wider than d -> W > 0
    val diff = mk(Seq(("c", 0.0), ("c", 100.0), ("d", 49.0), ("d", 51.0)))
    val r2 = graft.operators.Scans.levene(spark, diff).collect()(0)
    assert(r2.getAs[Double]("w") > 0.5, s"w ${r2.getAs[Double]("w")}")
    // one group only -> NULL
    val one = mk(Seq(("a", 1.0), ("a", 2.0)))
    val r3 = graft.operators.Scans.levene(spark, one).collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("w")))
  }

  test("anova: identical means give F = 0, shifted means give the hand value") {
    def mk(rows: Seq[(String, Double)]) = fixtureDir("events" ->
      rows.zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    // equal group means -> SSB = 0 -> F = 0
    val same = mk(Seq(("a", 10.0), ("a", 20.0), ("b", 10.0), ("b", 20.0)))
    assert(graft.operators.Scans.anova(spark, same).collect()(0)
      .getAs[Double]("f") === 0.0)
    // a = {10, 20} (mean 15), b = {30, 40} (mean 35), grand mean 25:
    // SSB = 2·10² + 2·10² = 400$², SSW = 4·5² = 100$²,
    // F = (400/1)/(100/2) = 8
    val shifted = mk(Seq(("a", 10.0), ("a", 20.0), ("b", 30.0), ("b", 40.0)))
    assert(graft.operators.Scans.anova(spark, shifted).collect()(0)
      .getAs[Double]("f") === 8.0)
  }

  test("median ci: binomial order-statistic ranks on 1..100") {
    // n=100, z√n=19.59964: L=floor(40.2)=40, U=min(100, ceil(59.8)+1)=61
    val rows = (1 to 100).map(i => ev(i.toLong, 1L, "2024-01-01 10:00:00", "click", i.toDouble))
    val d = fixtureDir("events" -> rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = graft.operators.Scans.medianCi(spark, d).collect()(0)
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Double]("median") === 50.0)
    assert(r.getAs[Double]("ci_lo") === 40.0)
    assert(r.getAs[Double]("ci_hi") === 61.0)
  }

  test("abandonment: click-session without purchase counts, view-only doesn't") {
    val d = fixtureDir("events" -> Seq(
      ev(1, 1, "2024-01-01 10:00:00", "click", 1.0),
      ev(2, 1, "2024-01-01 10:05:00", "purchase", 9.0), // converted
      ev(3, 2, "2024-01-01 11:00:00", "click", 1.0), // abandoned
      ev(4, 3, "2024-01-01 12:00:00", "view", 1.0)) // not a click session
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Seasonal.abandonment(spark, d).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_click_sessions") === 2L)
    assert(r(0).getAs[Long]("n_abandoned") === 1L)
    assert(r(0).getAs[Double]("abandonment_rate") === 0.5)
  }

  test("entry/exit: session boundaries pick first and last by (ts, event_id)") {
    val d = fixtureDir("events" -> Seq(
      ev(1, 1, "2024-01-01 10:00:00", "view", 1.0),
      ev(2, 1, "2024-01-01 10:05:00", "click", 1.0),
      ev(3, 1, "2024-01-01 12:00:00", "signup", 1.0), // new session (gap > 30m), bounce
      ev(4, 2, "2024-01-01 10:00:00", "purchase", 5.0)) // single-event bounce
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Seasonal.entryExit(spark, d).collect()
      .map(r => (r.getAs[String]("entry_type"), r.getAs[String]("exit_type")) ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounce"))).toMap
    assert(out(("view", "click")) === ((1L, 0L)))
    assert(out(("signup", "signup")) === ((1L, 1L)))
    assert(out(("purchase", "purchase")) === ((1L, 1L)))
    assert(out.size === 3)
  }
}
