package graft

import graft.operators.{Analytics, Events, Scans}
import org.apache.spark.sql.functions._

/** Funnel, retention, top-k-per-group, and the exact-sums statistics —
  * semantics on controlled fixtures plus plan shape. */
class ProductAnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val dir = fixtureDir(
    "events" -> Seq(
      // user 1: full funnel in order
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: purchase BEFORE any view click — stages must not count it
      (4L, ts("2024-01-02 09:00:00"), 2L, "purchase", 1.0, "{}"),
      (5L, ts("2024-01-02 10:00:00"), 2L, "view", 1.0, "{}"),
      (6L, ts("2024-01-02 10:30:00"), 2L, "click", 1.0, "{}"),
      // user 3: view only; returns 2 weeks later (retention)
      (7L, ts("2024-01-03 08:00:00"), 3L, "view", 1.0, "{}"),
      (8L, ts("2024-01-17 08:00:00"), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

  test("last-touch attribution: latest touch wins, ties pinned, none-channel kept") {
    val d = fixtureDir("events" -> Seq(
      // user 1: view then click then purchase -> click wins (latest)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 10.0, "{}"),
      // user 2: touch at the SAME timestamp as the purchase counts (>=)
      (4L, ts("2024-01-02 09:00:00"), 2L, "view", 1.0, "{}"),
      (5L, ts("2024-01-02 09:00:00"), 2L, "purchase", 20.0, "{}"),
      // user 3: two touches at the same ts -> higher event_id (click) wins
      (6L, ts("2024-01-03 08:00:00"), 3L, "view", 1.0, "{}"),
      (7L, ts("2024-01-03 08:00:00"), 3L, "click", 1.0, "{}"),
      (8L, ts("2024-01-03 09:00:00"), 3L, "purchase", 30.25, "{}"),
      // user 4: no prior touch -> 'none' (a later view must not count)
      (9L, ts("2024-01-04 07:00:00"), 4L, "purchase", 5.0, "{}"),
      (10L, ts("2024-01-04 08:00:00"), 4L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = Events.attribution(spark, d).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Double]("revenue"))).toMap
    assert(rows === Map(
      "click" -> (2L, 40.25), // users 1 and 3
      "view" -> (1L, 20.0),   // user 2 (same-ts touch)
      "none" -> (1L, 5.0)))   // user 4
  }

  test("attribution property: window composition equals brute-force per-purchase scan") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val evGen = Gen.listOfN(24, Gen.zip(
      Gen.chooseNum(1L, 3L),                       // user
      Gen.chooseNum(0L, 9L),                       // ts slot (collisions likely)
      Gen.oneOf("view", "click", "purchase"),
      Gen.chooseNum(1L, 9999L)))                   // cents
    val p = Prop.forAll(evGen) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, slot, typ, cents), i) =>
        (i + 1L, ts(f"2024-01-01 10:00:${slot}%02d"), u, typ, cents / 100.0, "{}")
      }
      val d = fixtureDir("events" -> rows
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      val got = Events.attribution(spark, d).collect()
        .map(r => r.getAs[String]("channel") ->
          (r.getAs[Long]("n_purchases"), r.getAs[Double]("revenue"))).toMap
      // brute-force reference: per purchase, the max-(ts, event_id) touch
      // with ts <= purchase ts wins (same-ts touches count: side orders
      // touches before purchases); no touch -> 'none'
      val attributed = rows.filter(_._4 == "purchase").map { p =>
        val touches = rows.filter(t =>
          t._3 == p._3 && t._4 != "purchase" && !t._2.after(p._2))
        val channel =
          if (touches.isEmpty) "none"
          else touches.maxBy(t => (t._2.getTime, t._1))._4
        channel -> math.floor(p._5 * 100 + 0.5).toLong
      }
      val want = attributed.groupBy(_._1).map { case (ch, xs) =>
        ch -> (xs.size.toLong, xs.map(_._2).sum / 100.0)
      }
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  test("anomaly scan flags only the planted outlier") {
    val normal = (1L to 20L).map(i =>
      (i, ts("2024-01-01 10:00:00"), i, "click", 10.0 + (i % 3) * 0.5, "{}"))
    val outlier = Seq((99L, ts("2024-01-01 11:00:00"), 99L, "click", 500.0, "{}"))
    val d = fixtureDir("events" -> (normal ++ outlier)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Events.anomalies(spark, d).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(99L))
    assert(out.head.getAs[Double]("z") > 3)
  }

  test("funnel: stages count only strictly-ordered view->click->purchase") {
    val rows = Events.funnel(spark, dir).orderBy("user_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(4))).toSeq ===
      Seq((1L, 3), (2L, 2), (3L, 1)))
    // user 2's pre-view purchase is not stage 3
    val u2 = rows(1)
    assert(u2.isNullAt(u2.fieldIndex("t_purchase")))
  }

  test("retention: cohort week 0 with a week-2 return") {
    val rows = Events.retention(spark, dir)
      .orderBy("cohort_wk", "week_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // users 1,2,3 all start week 0; user 3 returns at offset 2
    assert(rows.toSeq === Seq((0L, 0L, 3L), (0L, 2L, 1L)))
  }

  test("top-k per group ranks under WindowGroupLimit with per-group limit 3") {
    val df = Analytics.topPartsPerBrand(spark, SparkSpec.sf0001)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val counts = df.groupBy("brand").count().select(max("count")).head().getLong(0)
    assert(counts <= 3)
  }

  test("exact-sums corr matches built-in corr to float tolerance") {
    val ours = Scans.corrStats(spark, SparkSpec.sf0001)
      .select("l_returnflag", "corr_qty_price").as[(String, Double)].collect().toMap
    val builtin = graft.sources.Tables.lineitem(spark, SparkSpec.sf0001)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .as[(String, Double)].collect().toMap
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-6, s"$k: $v vs ${builtin(k)}")
    }
  }

  test("histogram bins cover all rows and edges are monotone") {
    val rows = Scans.histogram(spark, SparkSpec.sf0001).orderBy("bin").collect()
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total === graft.sources.Tables.lineitem(spark, SparkSpec.sf0001).count())
    val edges = rows.map(_.getAs[Double]("bin_lo"))
    assert(edges.zip(edges.tail).forall { case (a, b) => a < b })
  }

  test("unpivot melts via Expand with no shuffle, 4x rows") {
    val df = Analytics.unpivotMeasures(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand") && !plan.contains("Exchange"),
      s"melt should be a narrow Expand:\n$plan")
    assert(df.count() ===
      4 * graft.sources.Tables.lineitem(spark, SparkSpec.sf0001).count())
  }

  test("ntile quartiles are balanced per brand (sizes differ by at most 1)") {
    val sizes = Analytics.revenueQuartiles(spark, SparkSpec.sf0001)
      .groupBy("brand", "quartile").count()
      .groupBy("brand").agg((max("count") - min("count")).as("spread"))
      .select(max("spread")).head().getLong(0)
    assert(sizes <= 1)
  }

  test("gap-filled series has one row per calendar day, zeros on gaps") {
    val rows = Analytics.dailyRevenueFilled(spark, SparkSpec.sf0001)
      .orderBy("day").collect()
    val days = rows.map(_.getAs[java.sql.Date]("day").toLocalDate)
    days.zip(days.tail).foreach { case (a, b) => assert(b === a.plusDays(1)) }
    rows.filter(!_.getAs[Boolean]("is_active"))
      .foreach(r => assert(r.getAs[Double]("revenue") === 0.0))
  }

  test("moving average uses an event-time RANGE frame, not a ROWS frame") {
    // fixture with a gap: days 0,1,9 — at day 9 the 7-day frame must see
    // ONLY day 9 (a ROWS frame would wrongly average days 1 and 9)
    val d = fixtureDir(
      "part" -> Seq((1L, "B1")).toDF("p_partkey", "p_brand"),
      "lineitem" -> Seq(
        (1L, "1995-01-01", 10.0), (1L, "1995-01-02", 20.0), (1L, "1995-01-10", 40.0))
        .toDF("l_partkey", "l_shipdate", "l_extendedprice")
        .withColumn("l_shipdate", col("l_shipdate").cast("timestamp")))
    val rows = Analytics.movingAvgRevenue(spark, d).orderBy("day_idx").collect()
    assert(rows.map(_.getAs[Double]("ma7")).toSeq === Seq(10.0, 15.0, 40.0))
    // percent_rank under total order: 3 distinct revenues -> 0, 0.5, 1
    assert(rows.map(_.getAs[Double]("pct_rank")).sorted.toSeq === Seq(0.0, 0.5, 1.0))
  }

  test("mode returns the most frequent quantity per flag") {
    val m = Scans.modeQty(spark, SparkSpec.sf0001).collect()
    m.foreach { r =>
      val flag = r.getString(0)
      val expected = graft.sources.Tables.lineitem(spark, SparkSpec.sf0001)
        .filter(col("l_returnflag") === flag)
        .groupBy(col("l_quantity").cast("long")).count()
        .orderBy(col("count").desc, col("l_quantity")).head()
      assert(r.getLong(1) === expected.getLong(0))
      assert(r.getLong(2) === expected.getLong(1))
    }
  }
}
