package graft

import org.apache.spark.sql.functions._

/** Hand fixtures for streaks, the k-anon generalization ladder, and
  * embedding whitening stats. */
class EngagementSpec extends SparkSuite {
  import spark.implicits._

  test("streaks: longest consecutive-day run per user, histogram shape") {
    def ev(id: Long, uid: Long, day: Int) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), uid, "click", 1.0, "{}")
    // u1: days 1,2,3 then 5,6 -> longest 3; u2: days 1, 3, 5 -> longest 1
    // u3: two events same day -> one active day, longest 1
    val d = fixtureDir("events" -> Seq(
      ev(1, 1, 1), ev(2, 1, 2), ev(3, 1, 3), ev(4, 1, 5), ev(5, 1, 6),
      ev(6, 2, 1), ev(7, 2, 3), ev(8, 2, 5),
      ev(9, 3, 7), ev(10, 3, 7))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = graft.operators.Engagement.streaks(spark, d).collect()
      .map(r => r.getAs[Long]("streak_days") -> r.getAs[Long]("n_users")).toMap
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }

  test("interpurchase: gap quantiles from consecutive purchases only") {
    def ev(id: Long, uid: Long, ts: String) =
      (id, java.sql.Timestamp.valueOf(ts), uid, "purchase", 10.0, "{}")
    // u1 purchases at +0s, +60s, +300s -> gaps {60, 240}; u2 once -> none
    val d = fixtureDir("events" -> Seq(
      ev(1, 1, "2024-01-01 10:00:00"), ev(2, 1, "2024-01-01 10:01:00"),
      ev(3, 1, "2024-01-01 10:05:00"), ev(4, 2, "2024-01-01 10:00:00"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = graft.operators.Engagement.interPurchase(spark, d).collect()(0)
    assert(r.getAs[Long]("n_gaps") === 2L)
    assert(r.getAs[Long]("p50_s") === 60L)
    assert(r.getAs[Long]("p90_s") === 240L)
  }

  test("power continuous: hand-computed pooled sd and MDE") {
    val probe = (1L to 50L).toDF("user_id")
      .select(col("user_id"), (conv(substring(md5(col("user_id").cast("string")), 1, 2),
        16, 10).cast("int") % 2).as("arm")).collect()
    val ctrl = probe.filter(_.getAs[Int]("arm") == 0).map(_.getLong(0)).take(2)
    val trt = probe.filter(_.getAs[Int]("arm") == 1).map(_.getLong(0)).take(2)
    def ev(id: Long, uid: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), uid, "purchase", v, "{}")
    // both arms {10, 20}: SS = 2·500² cents² each, vPool = 5e5,
    // sd = 707.107 cents, MDE = 2.801585·707.107 cents = $19.8103
    val d = fixtureDir("events" -> Seq(
      ev(1, ctrl(0), 10.0), ev(2, ctrl(1), 20.0),
      ev(3, trt(0), 10.0), ev(4, trt(1), 20.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = graft.operators.Inference.powerContinuous(spark, d).collect()(0)
    assert(r.getAs[Long]("n_c") === 2L && r.getAs[Long]("n_t") === 2L)
    assert(math.abs(r.getAs[Double]("sd_pooled") - 7.0711) < 1e-3)
    assert(math.abs(r.getAs[Double]("mde_dollars") - 19.8103) < 1e-3)
  }

  test("retention by channel: first-event cohorting and week offsets") {
    def ev(id: Long, uid: Long, day: Int, t: String) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), uid, t, 1.0, "{}")
    // u1 enters via view (day 1), returns week 1 (day 8); u2 enters via
    // click (day 2), never returns; u3 enters via view (day 3), returns
    // week 1 -> view cohort: n=2, w0 ret 1.0, w1 ret 1.0; click: w0 only
    val d = fixtureDir("events" -> Seq(
      ev(1, 1, 1, "view"), ev(2, 1, 8, "purchase"),
      ev(3, 2, 2, "click"),
      ev(4, 3, 3, "view"), ev(5, 3, 10, "click"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = graft.operators.Engagement.retentionByChannel(spark, d).collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Double]("retention"))).toMap
    assert(out(("view", 0L)) === ((2L, 1.0)))
    assert(out(("view", 1L)) === ((2L, 1.0)))
    assert(out(("click", 0L)) === ((1L, 1.0)))
    assert(!out.contains(("click", 1L)))
  }

  test("funnel steps: order matters, per-step conversion is exact") {
    def ev(id: Long, uid: Long, min: Int, t: String) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), uid, t, 1.0, "{}")
    // u1 walks all four steps in order; u2 stops after view; u3's view
    // PRECEDES its signup, so it never reaches step 2
    val d = fixtureDir("events" -> Seq(
      ev(1, 1, 1, "signup"), ev(2, 1, 2, "view"), ev(3, 1, 3, "click"),
      ev(4, 1, 4, "purchase"),
      ev(5, 2, 1, "signup"), ev(6, 2, 2, "view"),
      ev(7, 3, 1, "view"), ev(8, 3, 2, "signup"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = graft.operators.Events.funnelSteps(spark, d).collect()
      .map(r => r.getAs[Int]("step_no") ->
        (r.getAs[Long]("n_users"),
          Option(r.getAs[java.lang.Double]("conv_rate")).map(_.toDouble))).toMap
    assert(out(1) === ((3L, None)))
    assert(out(2)._1 === 2L)
    assert(math.abs(out(2)._2.get - 2.0 / 3.0) < 1e-6)
    assert(out(3) === ((1L, Some(0.5))))
    assert(out(4) === ((1L, Some(1.0))))
  }

  test("kanon ladder: generalization levels are monotone and chosen is minimal") {
    val out = graft.operators.Validation.kAnonLevels(spark, SparkSpec.sf0001).collect()
    assert(out.map(_.getAs[Int]("level")).toSeq === Seq(0, 1, 2, 3))
    val mins = out.map(_.getAs[Long]("min_group_size"))
    // coarsening can only grow the smallest group
    assert(mins.sliding(2).forall(p => p(0) <= p(1)))
    val chosen = out.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.length <= 1)
    chosen.foreach { c =>
      assert(c.getAs[Boolean]("meets_k"))
      // nothing below the chosen level meets k
      out.filter(_.getAs[Int]("level") < c.getAs[Int]("level"))
        .foreach(r => assert(!r.getAs[Boolean]("meets_k")))
    }
  }

  test("whitening: constructed corpus has the hand-computed mean and std") {
    // dim 1: values 1, 3 -> mean 2, var 1, std 1; dim 2: constant 5 -> std 0
    // (padded to the pinned Dim = 64 with zeros)
    val emb = Seq(
      (1L, Array(1.0f, 5.0f) ++ Array.fill(62)(0.0f)),
      (2L, Array(3.0f, 5.0f) ++ Array.fill(62)(0.0f))
    ).toDF("vec_id", "embedding")
    val d = fixtureDir("embeddings" -> emb)
    val out = graft.operators.Pca.whitenStats(spark, d)
      .filter(col("dim") <= 2).collect()
      .map(r => r.getAs[Int]("dim") -> (r.getAs[Double]("mean"), r.getAs[Double]("std"))).toMap
    assert(out(1) === ((2.0, 1.0)))
    assert(out(2) === ((5.0, 0.0)))
  }

  test("event study: anchored means with implicit zeros, tau=0 holds every anchor") {
    def ev(id: Long, uid: Long, day: Int, t: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), uid, t, v, "{}")
    // u1 anchors day 3 ($10), buys again day 5 ($4), views day 1;
    // u2 anchors day 10 ($20). 2 anchored users.
    val d = fixtureDir("events" -> Seq(
      ev(1, 1, 1, "view", 0.0), ev(2, 1, 3, "purchase", 10.0),
      ev(3, 1, 5, "purchase", 4.0), ev(4, 2, 10, "purchase", 20.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = graft.operators.Engagement.eventStudy(spark, d).collect()
      .map(r => r.getAs[Long]("rel_day") ->
        (r.getAs[Long]("n_active"), r.getAs[Double]("mean_spend"))).toMap
    assert(out.keySet === (-7L to 7L).toSet) // zero-filled spine
    assert(out(0L) === ((2L, 15.0))) // (1000 + 2000)/2 users/100
    assert(out(2L) === ((1L, 2.0))) // u1's $4 across BOTH anchored users
    assert(out(-2L) === ((1L, 0.0))) // u1's view: active, zero spend
    // before any user's first purchase there is no purchase by definition
    (-7L to -1L).foreach(t => assert(out(t)._2 === 0.0, s"tau $t"))
    (Seq(-7L, -6L, -5L, -4L, -3L, -1L, 1L, 3L, 4L, 5L, 6L, 7L)).foreach { t =>
      assert(out(t) === ((0L, 0.0)), s"tau $t")
    }
  }
}
