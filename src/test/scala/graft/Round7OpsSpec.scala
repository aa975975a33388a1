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

  test("msprt: planted effect turns significant, day-1 degenerate row is NULL-safe") {
    // the engine's md5 arm, recomputed so the fixture can plant an effect
    def arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      (d(0) & 0xff) % 2
    }
    var id = 0L
    def e(ts: String, u: Long, t: String, v: Double) = { id += 1; ev(id, ts, u, t, v) }
    val rows =
      (1L to 40L).map(u => e("2024-01-01 10:00:00", u, "view", 0)) ++
        (1L to 40L).filter(arm(_) == 1)
          .map(u => e("2024-01-02 10:00:00", u, "purchase", 500.0)) ++
        Seq(e("2024-01-03 10:00:00", 1L, "view", 0))
    val d = fixtureDir("events" -> eventsDf(rows: _*))
    val out = graft.operators.Inference.sprt(spark, d).collect()
    assert(out.length === 3)
    val d1 = out(0); val d2 = out(1); val d3 = out(2)
    // day 1: both arms enrolled, zero conversions -> V = 0 -> NULL llr/p
    assert(d1.getAs[Long]("n_c") + d1.getAs[Long]("n_t") === 40L)
    assert(d1.getAs[Long]("x_c") === 0L && d1.getAs[Long]("x_t") === 0L)
    assert(d1.isNullAt(d1.fieldIndex("llr")))
    assert(d1.isNullAt(d1.fieldIndex("p_av")))
    assert(!d1.getAs[Boolean]("significant"))
    // day 2: every treatment user converted, zero control -> significant
    assert(d2.getAs[Long]("x_t") === d2.getAs[Long]("n_t"))
    assert(d2.getAs[Long]("x_c") === 0L)
    assert(d2.getAs[Boolean]("significant"))
    assert(d2.getAs[Double]("p_av") < 0.05)
    assert(d2.getAs[Double]("theta") === 1.0)
    // day 3: always-valid p is a running min -> still significant, p no larger
    assert(d3.getAs[Boolean]("significant"))
    assert(d3.getAs[Double]("p_av") <= d2.getAs[Double]("p_av"))
  }

  test("msprt: harness data — cumulative counts monotone, p_av is a running min") {
    val out = graft.operators.Inference.sprt(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    def mono(xs: Seq[Long]) = xs.zip(xs.tail).forall { case (a, b) => a <= b }
    assert(mono(out.map(_.getAs[Long]("n_c")).toSeq))
    assert(mono(out.map(_.getAs[Long]("n_t")).toSeq))
    assert(mono(out.map(_.getAs[Long]("x_c")).toSeq))
    assert(mono(out.map(_.getAs[Long]("x_t")).toSeq))
    out.foreach { r =>
      assert(r.getAs[Long]("x_c") <= r.getAs[Long]("n_c"))
      assert(r.getAs[Long]("x_t") <= r.getAs[Long]("n_t"))
    }
    val ps = out.flatMap(r =>
      if (r.isNullAt(r.fieldIndex("p_av"))) None else Some(r.getAs[Double]("p_av")))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a }, "p_av must never rise")
    assert(ps.forall(p => p >= 0 && p <= 1.0))
  }

  test("holt: a perfect line is tracked exactly and extrapolated exactly") {
    // y = 100, 200, 300 cents: l1=100, b1=100; every fitted = actual;
    // forecasts continue the line at 100c/day
    val d = fixtureDir("events" -> eventsDf(
      ev(1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
      ev(2, "2024-01-02 10:00:00", 1, "purchase", 2.00),
      ev(3, "2024-01-03 10:00:00", 1, "purchase", 3.00)))
    val out = graft.operators.Seasonal.holt(spark, d).collect()
    assert(out.length === 3 + graft.operators.Seasonal.HoltHorizon)
    val fit = out.filter(_.getAs[String]("kind") == "fit")
    assert(fit.map(_.getAs[Long]("y")).toSeq === Seq(100L, 200L, 300L))
    assert(fit.head.isNullAt(fit.head.fieldIndex("fitted"))) // t=1 has no 1-step form
    assert(fit(1).getAs[Double]("fitted") === 200.0)
    assert(fit(2).getAs[Double]("fitted") === 300.0)
    assert(fit(2).getAs[Double]("level") === 300.0)
    assert(fit(2).getAs[Double]("trend") === 100.0)
    val fc = out.filter(_.getAs[String]("kind") == "forecast")
    assert(fc.map(_.getAs[Double]("fitted")).toSeq ===
      (1 to 7).map(h => 300.0 + 100.0 * h))
    assert(fc.forall(r => r.isNullAt(r.fieldIndex("y"))))
  }

  test("holt: calendar gaps zero-fill and the harness forecast is a straight line") {
    // purchases on day 1 and day 3 -> day 2 must appear as y = 0
    val d = fixtureDir("events" -> eventsDf(
      ev(1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
      ev(2, "2024-01-03 10:00:00", 1, "purchase", 3.00)))
    val fit = graft.operators.Seasonal.holt(spark, d).collect()
      .filter(_.getAs[String]("kind") == "fit")
    assert(fit.map(_.getAs[Long]("y")).toSeq === Seq(100L, 0L, 300L))
    // harness: forecast rows extrapolate linearly (constant successive diff = b_T)
    val out = graft.operators.Seasonal.holt(spark, SparkSpec.sf0001).collect()
    val fc = out.filter(_.getAs[String]("kind") == "forecast")
      .map(_.getAs[Double]("fitted"))
    assert(fc.length === 7)
    val diffs = fc.zip(fc.tail).map { case (a, b) => b - a }
    assert(diffs.forall(dd => math.abs(dd - diffs.head) < 1e-3))
  }

  test("ope: all-rewards fixture — slot math, target argmax, IPS/SNIPS forms") {
    // every order contains parts 1..8 (the only parts): top-8 by
    // (cnt DESC, partkey) is parts 1..8 with slot i -> part i+1; every
    // nation's target = part 1 (tie -> lowest key); reward = 1 always.
    def slot(ok: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(ok.toString.getBytes("UTF-8"))
      (d(0) & 0xff) % graft.operators.Recommend.OpeSlots
    }
    val nOrders = 20L
    val d = fixtureDir(
      "nation" -> Seq((1L, "ALPHA"), (2L, "BETA")).toDF("n_nationkey", "n_name"),
      "customer" -> Seq((1L, 1L), (2L, 2L)).toDF("c_custkey", "c_nationkey"),
      "orders" -> (1L to nOrders).map(ok => (ok, 1L + ok % 2))
        .toDF("o_orderkey", "o_custkey"),
      "lineitem" -> (for (ok <- 1L to nOrders; p <- 1L to 8L) yield (ok, p))
        .toDF("l_orderkey", "l_partkey"))
    val out = graft.operators.Recommend.ope(spark, d).collect()
      .map(r => r.getAs[String]("nation") -> r).toMap
    assert(out.keySet === Set("ALPHA", "BETA"))
    for ((natKey, name) <- Seq(1L -> "ALPHA", 2L -> "BETA")) {
      val orders = (1L to nOrders).filter(ok => 1L + ok % 2 == natKey)
      val expMatch = orders.count(slot(_) == 0).toLong
      val r = out(name)
      assert(r.getAs[Long]("n_orders") === orders.length.toLong)
      assert(r.getAs[Long]("n_reward") === orders.length.toLong) // reward always 1
      assert(r.getAs[Long]("n_match") === expMatch)
      assert(r.getAs[Long]("n_reward_match") === expMatch)
      assert(r.getAs[Double]("logged_rate") === 1.0)
      // IPS = 8 * match / n; SNIPS = 1 when any match
      assert(math.abs(r.getAs[Double]("ips") -
        8.0 * expMatch / orders.length) < 1e-9)
      if (expMatch > 0) assert(r.getAs[Double]("snips") === 1.0)
      else assert(r.isNullAt(r.fieldIndex("snips")))
    }
  }

  test("ope: harness invariants — counts nest, ips bounded, orders partition") {
    val out = graft.operators.Recommend.ope(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_orders")
      val rw = r.getAs[Long]("n_reward")
      val m = r.getAs[Long]("n_match")
      val rm = r.getAs[Long]("n_reward_match")
      assert(rw <= n && m <= n && rm <= math.min(rw, m))
      assert(r.getAs[Double]("ips") >= 0.0 && r.getAs[Double]("ips") <= 8.0)
      if (m == 0) assert(r.isNullAt(r.fieldIndex("snips")))
      else {
        val s = r.getAs[Double]("snips")
        assert(s >= 0.0 && s <= 1.0)
      }
    }
    val total = graft.sources.Tables.orders(spark, SparkSpec.sf0001).count()
    assert(out.map(_.getAs[Long]("n_orders")).sum === total)
  }

  test("uplift: planted top-quintile effect — buckets, uplift, and qini match the hand model") {
    def md5mod(u: Long, m: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      (d(0) & 0xff) % m
    }
    // user u: u pre-midpoint views (score = u, all distinct) on Jan 1;
    // treated users with u > 32 convert post-midpoint on Jan 10
    var id = 0L
    def e(ts: String, u: Long, t: String, v: Double) = { id += 1; ev(id, ts, u, t, v) }
    val rows = (1L to 40L).flatMap { u =>
      (1 to u.toInt).map(i => e(f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00", u, "view", 0)) ++
        (if (md5mod(u, 2) == 1 && u > 32)
          Seq(e("2024-01-10 10:00:00", u, "purchase", 500.0)) else Nil)
    }
    val d = fixtureDir("events" -> eventsDf(rows: _*))
    val out = graft.operators.Inference.uplift(spark, d).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out.keySet === (1L to 5L).toSet)
    // expected model: rank of u = 41-u, bucket = ceil(rank/8)
    def bucketOf(u: Long): Long = math.ceil((41.0 - u) / 8.0).toLong
    var cxt = 0L; var cnt = 0L; var cnc = 0L
    (1L to 5L).foreach { b =>
      val us = (1L to 40L).filter(bucketOf(_) == b)
      val nT = us.count(md5mod(_, 2) == 1).toLong
      val nC = us.length - nT
      val xT = us.count(u => md5mod(u, 2) == 1 && u > 32).toLong
      val r = out(b)
      assert(r.getAs[Long]("n_t") === nT, s"bucket $b n_t")
      assert(r.getAs[Long]("n_c") === nC, s"bucket $b n_c")
      assert(r.getAs[Long]("x_t") === xT, s"bucket $b x_t")
      assert(r.getAs[Long]("x_c") === 0L)
      if (nT > 0 && nC > 0)
        assert(math.abs(r.getAs[Double]("uplift") - xT.toDouble / nT) < 1e-6)
      cxt += xT; cnt += nT; cnc += nC
      if (cnc > 0)
        assert(math.abs(r.getAs[Double]("qini") - cxt.toDouble) < 1e-4,
          s"bucket $b qini (x_c = 0 so qini = cum x_t)")
    }
  }

  test("uplift: harness buckets partition the user population") {
    val out = graft.operators.Inference.uplift(spark, SparkSpec.sf0001).collect()
    assert(out.map(_.getAs[Long]("bucket")).toSeq === (1L to 5L).toSeq)
    val users = graft.sources.Tables.events(spark, SparkSpec.sf0001)
      .select("user_id").distinct().count()
    assert(out.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum === users)
    out.foreach { r =>
      assert(r.getAs[Long]("x_t") <= r.getAs[Long]("n_t"))
      assert(r.getAs[Long]("x_c") <= r.getAs[Long]("n_c"))
    }
  }

  test("ope-dr: perfect reward model makes DM = DR = 1 on the all-rewards fixture") {
    // same fixture as the ope test: every order contains every candidate
    // part, so qhat = 1 exactly (q_mu = 1e6), reward = 1, and the DR
    // residual vanishes -> dm = dr = 1.0 regardless of match pattern
    val nOrders = 20L
    val d = fixtureDir(
      "nation" -> Seq((1L, "ALPHA"), (2L, "BETA")).toDF("n_nationkey", "n_name"),
      "customer" -> Seq((1L, 1L), (2L, 2L)).toDF("c_custkey", "c_nationkey"),
      "orders" -> (1L to nOrders).map(ok => (ok, 1L + ok % 2))
        .toDF("o_orderkey", "o_custkey"),
      "lineitem" -> (for (ok <- 1L to nOrders; p <- 1L to 8L) yield (ok, p))
        .toDF("l_orderkey", "l_partkey"))
    val out = graft.operators.Recommend.opeDr(spark, d).collect()
    assert(out.map(_.getAs[String]("nation")).toSeq === Seq("ALPHA", "BETA"))
    out.foreach { r =>
      assert(r.getAs[Double]("dm") === 1.0)
      assert(r.getAs[Double]("dr") === 1.0)
      assert(r.getAs[Double]("ips") >= 0.0 && r.getAs[Double]("ips") <= 8.0)
    }
  }

  test("ope-dr: harness sanity — dm in [0,1], orders partition, dr finite") {
    val out = graft.operators.Recommend.opeDr(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val dm = r.getAs[Double]("dm")
      assert(dm >= 0.0 && dm <= 1.0)
      assert(!r.getAs[Double]("dr").isNaN)
      assert(!r.getAs[Double]("ips").isNaN)
    }
    val total = graft.sources.Tables.orders(spark, SparkSpec.sf0001).count()
    assert(out.map(_.getAs[Long]("n_orders")).sum === total)
  }

  test("textrank: hub word wins, mass conserved, single-word doc yields nothing") {
    val d = fixtureDir("documents" -> Seq(
      (1L, "a b a b a c", "en", "s", 11L),
      (2L, "x x x", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.operators.Mining.textrank(spark, d).collect()
    // doc 2 has one distinct word -> no edges -> no keywords (pinned)
    assert(!out.exists(_.getAs[Long]("doc_id") == 2L))
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.map(r => r.getAs[Long]("rk") -> r.getAs[String]("word")).toSeq ===
      Seq(1L -> "a", 2L -> "b", 3L -> "c")) // a bridges b and c
    val scores = d1.map(_.getAs[Double]("rank"))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    // damped PageRank over a symmetric weighted graph preserves unit mass
    assert(math.abs(scores.sum - 1.0) < 1e-6)
  }

  test("textrank: harness docs — ranks contiguous, scores descending per doc") {
    val out = graft.operators.Mining.textrank(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq === (1L to sorted.length).toSeq)
      val s = sorted.map(_.getAs[Double]("rank"))
      assert(s.zip(s.tail).forall { case (x, y) => x >= y })
      assert(sorted.length <= graft.operators.Mining.TrTopK)
    }
  }

  test("holdout: leave-one-order-out kills self-evidence; hand-computed HR/MRR") {
    // o1={1,2}, o2={1,2}, o3={1,2,3}. Held-out = max part.
    // o1/o2 recover part 2 at rank 1 (corrected cos = 1.0); o3's held-out
    // part 3 co-occurs ONLY via o3 itself, so its corrected evidence is
    // zero -> a miss. HR@1 = HR@3 = MRR = 2/3.
    val d = fixtureDir("lineitem" ->
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (3L, 3L))
        .toDF("l_orderkey", "l_partkey"))
    val r = graft.operators.Recommend.holdout(spark, d).collect().head
    assert(r.getAs[Long]("n_eval") === 3L)
    assert(r.getAs[Long]("hits1") === 2L)
    assert(r.getAs[Long]("hits3") === 2L)
    assert(r.getAs[Double]("hr1") === 0.666667)
    assert(r.getAs[Double]("hr3") === 0.666667)
    assert(r.getAs[Double]("mrr") === 0.666667)
  }

  test("holdout: harness sanity — hit counts nest and rates bound each other") {
    val r = graft.operators.Recommend.holdout(spark, SparkSpec.sf0001).collect().head
    val n = r.getAs[Long]("n_eval")
    assert(n > 0)
    assert(r.getAs[Long]("hits1") <= r.getAs[Long]("hits3"))
    assert(r.getAs[Long]("hits3") <= n)
    assert(r.getAs[Double]("hr1") <= r.getAs[Double]("hr3"))
    assert(r.getAs[Double]("mrr") >= r.getAs[Double]("hr1") - 1e-9)
    assert(r.getAs[Double]("mrr") <= r.getAs[Double]("hr3") + 1e-9)
  }

  test("funnel-ci: hand-checked Wilson interval and step nesting") {
    // 4 users view; 2 click after; 1 purchases after the click
    val d = fixtureDir("events" -> eventsDf(
      ev(1, "2024-01-01 10:00:00", 1, "view", 0),
      ev(2, "2024-01-01 10:01:00", 1, "click", 0),
      ev(3, "2024-01-01 10:02:00", 1, "purchase", 50.0),
      ev(4, "2024-01-01 10:00:00", 2, "view", 0),
      ev(5, "2024-01-01 10:01:00", 2, "click", 0),
      ev(6, "2024-01-01 10:00:00", 3, "view", 0),
      ev(7, "2024-01-01 10:00:00", 4, "view", 0)))
    val out = graft.operators.Events.funnelCi(spark, d).collect()
      .map(r => r.getAs[String]("step") -> r).toMap
    val vc = out("view_to_click")
    assert(vc.getAs[Long]("n") === 4L && vc.getAs[Long]("x") === 2L)
    assert(vc.getAs[Double]("rate") === 0.5)
    // Wilson 95% for x=2, n=4: center 0.5, half = 1.96*sqrt(1/16+z2/64)/(1+z2/4)
    val z2 = 1.96 * 1.96
    val half = 1.96 * math.sqrt(0.25 / 4 + z2 / 64.0) / (1 + z2 / 4)
    assert(math.abs(vc.getAs[Double]("lo") - (0.5 - half)) < 1e-5)
    assert(math.abs(vc.getAs[Double]("hi") - (0.5 + half)) < 1e-5)
    val cp = out("click_to_purchase")
    assert(cp.getAs[Long]("n") === 2L && cp.getAs[Long]("x") === 1L)
    val vp = out("view_to_purchase")
    assert(vp.getAs[Long]("n") === 4L && vp.getAs[Long]("x") === 1L)
    out.values.foreach { r =>
      assert(r.getAs[Double]("lo") >= 0.0 && r.getAs[Double]("hi") <= 1.0)
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("rate"))
      assert(r.getAs[Double]("rate") <= r.getAs[Double]("hi"))
    }
  }

  test("quantile regression: coverage lands near tau, pinball positive, plane finite") {
    val out = graft.operators.TrainClassifier.quantileRegression(spark, SparkSpec.sf0001)
      .collect().map(r => r.getAs[String]("param") -> r.getAs[Double]("value")).toMap
    assert(out.keySet === Set("bias", "w_ntokens", "w_stop_ratio", "w_avg_len",
      "coverage", "avg_pinball"))
    // the 1/sqrt(t) schedule settles the subgradient walk at P(y <= yhat) ~ tau
    assert(out("coverage") >= 0.85 && out("coverage") <= 0.95, out("coverage"))
    assert(out("avg_pinball") > 0.0)
    Seq("bias", "w_ntokens", "w_stop_ratio", "w_avg_len").foreach { k =>
      assert(!out(k).isNaN && !out(k).isInfinite)
    }
    // length weight must be positive: longer docs predict longer docs
    assert(out("w_ntokens") > 0.0)
  }

  test("holt-winters: a perfectly weekly-periodic series is fit and extrapolated exactly") {
    // 3 weeks of the exact pattern 1..7 dollars: seed l = mean = 4.00,
    // b = 0, s_k = y_k - l; every fit day then reproduces y exactly and
    // the state never moves; forecasts continue the pattern
    var id = 0L
    val rows = (0 until 21).map { d =>
      id += 1
      ev(id, f"2024-01-${d + 1}%02d 10:00:00", 1, "purchase", (d % 7 + 1).toDouble)
    }
    val d = fixtureDir("events" -> eventsDf(rows: _*))
    val out = graft.operators.Seasonal.holtWinters(spark, d).collect()
    val fit = out.filter(_.getAs[String]("kind") == "fit")
    assert(fit.length === 14) // days 8..21
    fit.foreach { r =>
      assert(r.getAs[Double]("fitted") === r.getAs[Long]("y").toDouble,
        s"day ${r.getAs[java.sql.Date]("day")}")
      assert(r.getAs[Double]("level") === 400.0)
      assert(r.getAs[Double]("trend") === 0.0)
    }
    val fc = out.filter(_.getAs[String]("kind") == "forecast")
    // day 22 is slot (22-1)%7 = 0 -> pattern value 100, then 200, ...
    assert(fc.map(_.getAs[Double]("fitted")).toSeq ===
      (0 until 7).map(h => 100.0 * (h + 1)))
  }

  test("holt-winters: harness shape — 7 forecasts, fit rows cover days 8..T") {
    val out = graft.operators.Seasonal.holtWinters(spark, SparkSpec.sf0001).collect()
    val fit = out.filter(_.getAs[String]("kind") == "fit")
    val fc = out.filter(_.getAs[String]("kind") == "forecast")
    assert(fc.length === 7)
    assert(fit.nonEmpty)
    assert(fit.forall(!_.isNullAt(out.head.fieldIndex("fitted"))))
    // the whole output is day-ordered and contiguous across the horizon
    val days = out.map(_.getAs[java.sql.Date]("day").toLocalDate)
    assert(days.zip(days.tail).forall { case (a, b) => b.isAfter(a) })
  }

  test("dp-quantile: engine pick equals the hand-replicated Gumbel-max model") {
    // three users spending 1.00 / 2.00 / 3.00 -> candidates v in cents
    // {100, 200, 300}, ranks {1,2,3}, t = 2, utilities {-1, 0, -1}
    val d = fixtureDir("events" -> eventsDf(
      ev(1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
      ev(2, "2024-01-01 10:00:00", 2, "purchase", 2.00),
      ev(3, "2024-01-01 10:00:00", 3, "purchase", 3.00)))
    def gumbel(v: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
      val qln1 = math.floor(math.log(u) * 1e6 + 0.5) / 1e6
      -(math.floor(math.log(-qln1) * 1e6 + 0.5) / 1e6)
    }
    val score = Map(100L -> (-0.5 + gumbel(100L)), 200L -> (0.0 + gumbel(200L)),
      300L -> (-0.5 + gumbel(300L)))
    val expected = score.toSeq.sortBy { case (v, s) => (-s, v) }.head._1 / 100.0
    val r = graft.operators.Curation.dpQuantile(spark, d).collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("true_median") === 2.0)
    assert(r.getAs[Double]("dp_median") === expected)
    assert(r.getAs[Double]("epsilon") === 1.0)
  }

  test("dp-quantile: release is a DOMAIN value and is deterministic") {
    val out1 = graft.operators.Curation.dpQuantile(spark, SparkSpec.sf0001).collect().head
    val out2 = graft.operators.Curation.dpQuantile(spark, SparkSpec.sf0001).collect().head
    assert(out1.getAs[Double]("dp_median") === out2.getAs[Double]("dp_median"))
    // the exponential mechanism releases an actual per-user spend total —
    // the property Laplace-on-a-count can't give
    val spends = graft.sources.Tables.events(spark, SparkSpec.sf0001)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg((sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0).as("s"))
      .select("s").collect().map(_.getAs[Double]("s")).toSet
    assert(spends.contains(out1.getAs[Double]("dp_median")))
  }

  test("interleave: draft matches a hand model of team-draft with md5 coins") {
    import spark.implicits._
    // ranker A prefers 1..10 in order, B prefers 11..20; rel = {1, 11, 2}
    val a = (1L to 10L).toArray
    val b = (11L to 20L).toArray
    val rel = Array(1L, 2L, 11L)
    val base = Seq((7L, a, b, rel.sorted)).toDF("query_id", "a", "b", "rel")
    val r = graft.operators.Retrieval.draftOf(base).collect().head
    // hand model (lists disjoint, so picks are just each team's prefix)
    def coin(q: Long, round: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$q|$round".getBytes("UTF-8"))
      (d(0) & 0xff) % 2
    }
    var (ia, ib, ca, cb) = (0, 0, 0L, 0L)
    for (round <- 1 to graft.operators.Retrieval.InterleaveRounds) {
      def pickA(): Unit = { if (rel.contains(a(ia))) ca += 1; ia += 1 }
      def pickB(): Unit = { if (rel.contains(b(ib))) cb += 1; ib += 1 }
      if (coin(7L, round) == 0) { pickA(); pickB() } else { pickB(); pickA() }
    }
    assert(r.getAs[Long]("clicks_sparse") === ca)
    assert(r.getAs[Long]("clicks_dense") === cb)
    // disjoint prefixes of length 5: A sees {1,2}, B sees {11} regardless
    // of coin order, so the hand model must have found exactly these
    assert(ca === 2L && cb === 1L)
    assert(r.getAs[String]("winner") === "sparse")
  }

  test("interleave: overlapping rankings — the second picker skips a used doc") {
    import spark.implicits._
    // both rankers agree on doc 1 first; whoever picks second must take
    // its next candidate instead. rel = everything, so clicks count picks.
    val base = Seq((3L, Array(1L, 2L, 3L, 4L, 5L), Array(1L, 6L, 7L, 8L, 9L),
      Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L)))
      .toDF("query_id", "a", "b", "rel")
    val r = graft.operators.Retrieval.draftOf(base).collect().head
    // 9 distinct docs for 10 pick slots: the round-1 first picker takes
    // the shared doc 1 and ends with 5 picks; the other team exhausts its
    // list (NULL pick, no phantom click) and ends with 4 — every pick is
    // relevant, so clicks = picks and the round-1 coin decides the winner
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("3|1".getBytes("UTF-8"))
    val aFirst = (d(0) & 0xff) % 2 == 0
    val (ca, cb) = (r.getAs[Long]("clicks_sparse"), r.getAs[Long]("clicks_dense"))
    if (aFirst) { assert(ca === 5L && cb === 4L); assert(r.getAs[String]("winner") === "sparse") }
    else { assert(ca === 4L && cb === 5L); assert(r.getAs[String]("winner") === "dense") }
  }

  test("interleave: harness — counts bounded by rounds, winner consistent, deterministic") {
    val out1 = graft.operators.Retrieval.interleave(spark, SparkSpec.sf0001).collect()
    val out2 = graft.operators.Retrieval.interleave(spark, SparkSpec.sf0001).collect()
    assert(out1.map(_.toString).toSeq === out2.map(_.toString).toSeq)
    assert(out1.nonEmpty)
    out1.foreach { r =>
      val (ca, cb) = (r.getAs[Long]("clicks_sparse"), r.getAs[Long]("clicks_dense"))
      assert(ca >= 0 && ca <= graft.operators.Retrieval.InterleaveRounds)
      assert(cb >= 0 && cb <= graft.operators.Retrieval.InterleaveRounds)
      val w = r.getAs[String]("winner")
      if (ca > cb) assert(w === "sparse")
      else if (cb > ca) assert(w === "dense")
      else assert(w === "tie")
    }
  }

  test("jackknife: hand-computed replicates, centered-integer variance, CI brackets") {
    // day1: user 1, 100c purchase; day2: users {1,2}, 200c; day3: user 3 view only
    val d = fixtureDir("events" -> eventsDf(
      ev(1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
      ev(2, "2024-01-02 10:00:00", 1, "purchase", 2.00),
      ev(3, "2024-01-02 11:00:00", 2, "view", 0),
      ev(4, "2024-01-03 10:00:00", 3, "view", 0)))
    val r = graft.operators.Inference.jackknife(spark, d).collect().head
    // X = 300, N = 4, R = 75 cents/user-day
    assert(r.getAs[Long]("d") === 3L)
    assert(r.getAs[Double]("ratio") === 75.0)
    // replicate model in exact integers, as the engine computes it
    val reps = Seq((100L, 1L), (200L, 2L), (0L, 1L))
    val rfullMu = math.floor(300.0 / 4 * 1e6 + 0.5).toLong
    val devs = reps.map { case (x, n) =>
      math.floor((300.0 - x) / (4 - n) * 1e6 + 0.5).toLong - rfullMu
    }
    val dEff = 3.0
    val ssd = (devs.map(v => v * v).sum.toDouble -
      devs.sum.toDouble * devs.sum / dEff) / 1e12
    val se = math.sqrt((dEff - 1.0) / dEff * ssd)
    assert(math.abs(r.getAs[Double]("se_jack") - se) < 1e-6)
    assert(r.getAs[Double]("ci_lo") < 75.0 && 75.0 < r.getAs[Double]("ci_hi"))
  }

  test("jackknife: harness — day count matches, CI brackets the ratio") {
    val r = graft.operators.Inference.jackknife(spark, SparkSpec.sf0001).collect().head
    val days = graft.sources.Tables.events(spark, SparkSpec.sf0001)
      .select(to_date(col("ts"))).distinct().count()
    assert(r.getAs[Long]("d") === days)
    assert(r.getAs[Double]("se_jack") > 0.0)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ratio"))
    assert(r.getAs[Double]("ratio") < r.getAs[Double]("ci_hi"))
  }

  test("granger: planted lag-1 causality is detected, coefficient recovered") {
    // views jump around pseudo-randomly; revenue = 10 * yesterday's views
    // (+ tiny parity noise) -> the restricted rev~rev_lag model is poor,
    // the full model is near-perfect -> large F and beta_views ~ 10
    val views = Array(5, 17, 3, 29, 11, 23, 7, 19, 2, 31, 13, 28)
    var id = 0L
    def e(day: Int, t: String, v: Double) = {
      id += 1; ev(id, f"2024-01-$day%02d 10:00:00", id % 7, t, v)
    }
    val rows = (1 to 12).flatMap { t =>
      val vw = (1 to views(t - 1)).map(_ => e(t, "view", 0))
      val rev = if (t >= 2) Seq(e(t, "purchase", (10 * views(t - 2) + t % 2).toDouble))
      else Seq(e(t, "purchase", 100.0))
      vw ++ rev
    }
    val d = fixtureDir("events" -> eventsDf(rows: _*))
    val r = graft.operators.Seasonal.granger(spark, d).collect().head
    assert(r.getAs[Long]("t") === 11L)
    assert(r.getAs[Double]("beta_views") > 9.5 && r.getAs[Double]("beta_views") < 10.5)
    assert(r.getAs[Double]("f_stat") > 50.0)
    assert(r.getAs[Double]("rss_full") < r.getAs[Double]("rss_restricted"))
  }

  test("granger: harness — lagged day count, F non-negative where defined") {
    val r = graft.operators.Seasonal.granger(spark, SparkSpec.sf0001).collect().head
    val days = graft.sources.Tables.events(spark, SparkSpec.sf0001)
      .select(to_date(col("ts"))).distinct().count()
    assert(r.getAs[Long]("t") <= days - 1) // calendar gaps can only shrink it
    if (!r.isNullAt(r.fieldIndex("f_stat"))) {
      assert(r.getAs[Double]("f_stat") >= 0.0)
      assert(r.getAs[Double]("rss_full") <= r.getAs[Double]("rss_restricted") + 1e-6)
    }
  }

  test("prf: expansion surfaces a doc the original query could not reach") {
    // query 1 = (join, merge, sort). Its feedback docs all co-occur with
    // 'spark'; doc 4 contains ONLY 'spark' -> reachable solely through
    // the expanded query, with NULL rank_orig
    val docs = Seq(
      (1L, "join merge sort spark", "en", "s", 21L),
      (2L, "join merge spark spark", "en", "s", 22L),
      (3L, "join spark", "en", "s", 10L),
      (4L, "spark spark spark spark", "en", "s", 23L),
      (5L, "window group filter scan", "en", "s", 24L),
      (6L, "hash vector stream", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = fixtureDir("documents" -> docs)
    val out = graft.operators.Retrieval.prf(spark, d).collect()
    val q1 = out.filter(_.getAs[Long]("query_id") == 1L)
    assert(q1.nonEmpty)
    val d4 = q1.find(_.getAs[Long]("doc_id") == 4L)
    assert(d4.isDefined, "expansion must surface the spark-only doc")
    assert(d4.get.isNullAt(d4.get.fieldIndex("rank_orig")))
    // original hits stay present and keep non-null original ranks
    val d1 = q1.find(_.getAs[Long]("doc_id") == 1L).get
    assert(!d1.isNullAt(d1.fieldIndex("rank_orig")))
  }

  test("prf: harness — per-query ranks contiguous, expansion keeps original hits") {
    val out = graft.operators.Retrieval.prf(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val rks = rows.map(_.getAs[Int]("rank_exp")).sorted.toSeq
      assert(rks === (1 to rks.length).toSeq)
      assert(rks.length <= graft.operators.TextAnalysis.Bm25TopK)
      // the expanded ranking still contains docs from the original top list
      assert(rows.exists(!_.isNullAt(rows.head.fieldIndex("rank_orig"))))
    }
  }

  test("cluster cards: rank structure, support floor, lift ordering per cluster") {
    val out = graft.operators.KMeans.clusterCards(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Int]("cid")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.length <= graft.operators.KMeans.CardTopK)
      assert(sorted.forall(_.getAs[Long]("tf_c") >= graft.operators.KMeans.CardMinTf))
      val lifts = sorted.map(_.getAs[Double]("lift"))
      assert(lifts.forall(_ > 0.0))
      assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    }
    // the label clusters are the kmeans clusters: cids must be a subset
    val kcids = graft.operators.KMeans.kmeans(spark, SparkSpec.sf0001)
      .collect().map(_.getAs[Int]("cid")).toSet
    assert(out.map(_.getAs[Int]("cid")).toSet.subsetOf(kcids))
  }

  test("psm: a uniform planted effect survives stratification unchanged") {
    def md5mod(u: Long, m: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      (d(0) & 0xff) % m
    }
    // score ladder (u pre-views), post spend: treated 500, control 100 ->
    // every two-arm stratum must show diff = 400.0 and so must the pooled ATE
    var id = 0L
    def e(ts: String, u: Long, t: String, v: Double) = { id += 1; ev(id, ts, u, t, v) }
    val rows = (1L to 40L).flatMap { u =>
      (1 to u.toInt).map(i =>
        e(f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00", u, "view", 0)) :+
        e("2024-01-10 10:00:00", u, "purchase",
          if (md5mod(u, 2) == 1) 500.0 else 100.0)
    }
    val d = fixtureDir("events" -> eventsDf(rows: _*))
    val out = graft.operators.Inference.psm(spark, d).collect()
    assert(out.map(_.getAs[Int]("stratum")).toSeq === Seq(-1, 1, 2, 3, 4, 5))
    out.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("diff_dollars")))
        assert(r.getAs[Double]("diff_dollars") === 400.0,
          s"stratum ${r.getAs[Int]("stratum")}")
    }
    val pooled = out.find(_.getAs[Int]("stratum") == -1).get
    assert(pooled.getAs[Double]("diff_dollars") === 400.0)
    assert(pooled.getAs[Long]("n_t") + pooled.getAs[Long]("n_c") === 40L)
  }

  test("psm: harness — pooled row aggregates, pooled ATE inside stratum range") {
    val out = graft.operators.Inference.psm(spark, SparkSpec.sf0001).collect()
    val strata = out.filter(_.getAs[Int]("stratum") > 0)
    val pooled = out.find(_.getAs[Int]("stratum") == -1).get
    assert(strata.length === 5)
    assert(strata.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum ===
      pooled.getAs[Long]("n_t") + pooled.getAs[Long]("n_c"))
    val diffs = strata.flatMap(r =>
      if (r.isNullAt(r.fieldIndex("diff_dollars"))) None
      else Some(r.getAs[Double]("diff_dollars")))
    if (diffs.nonEmpty && !pooled.isNullAt(pooled.fieldIndex("diff_dollars"))) {
      val p = pooled.getAs[Double]("diff_dollars")
      assert(p >= diffs.min - 1e-6 && p <= diffs.max + 1e-6)
    }
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
