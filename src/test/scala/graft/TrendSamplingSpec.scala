package graft

import graft.operators.{Curation, Events, Sampling, Trend}
import org.apache.spark.sql.functions._

/** Fixture semantics for the debounce/seasonal/open-months/Neyman/
  * curriculum/bounded-DP wave. */
class TrendSamplingSpec extends SparkSuite {
  import spark.implicits._

  private def eventsDf(rows: (Long, String, Long, String)*) = {
    // (event_id, ts, user_id, event_type)
    rows.map { case (id, ts, u, t) =>
      (id, java.sql.Timestamp.valueOf(ts), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("debounce collapses sub-gap bursts and splits at the gap") {
    val d = fixtureDir("events" -> eventsDf(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:02:00", 1L, "click"), // 2 min -> same burst
      (3L, "2024-01-01 10:04:00", 1L, "click"), // chain continues
      (4L, "2024-01-01 10:30:00", 1L, "click"), // 26 min -> new burst
      (5L, "2024-01-01 10:01:00", 1L, "view"), // other type: own burst
      (6L, "2024-01-01 10:00:00", 2L, "click"))) // other user
    val out = Events.debounce(spark, d).collect()
    assert(out.length === 4)
    val u1click = out.filter(r => r.getAs[Long]("user_id") == 1L &&
      r.getAs[String]("event_type") == "click").sortBy(_.getAs[java.sql.Timestamp]("burst_start").getTime)
    assert(u1click.map(_.getAs[Long]("n_events")).toSeq === Seq(3L, 1L))
    assert(u1click.head.getAs[Long]("span_us") === 4L * 60 * 1000000)
    assert(u1click(1).getAs[Long]("span_us") === 0L)
  }

  test("seasonal index: strong month > 1, uniform months = 1") {
    import java.sql.Timestamp
    def ts(y: Int, m: Int) = Timestamp.valueOf(f"$y-$m%02d-15 00:00:00")
    // two years; January revenue 3x the other month's in both years
    val orders = Seq(
      (1L, 1L, "O", 0.0, ts(1995, 1), "p"), (2L, 1L, "O", 0.0, ts(1995, 6), "p"),
      (3L, 1L, "O", 0.0, ts(1996, 1), "p"), (4L, 1L, "O", 0.0, ts(1996, 6), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, 30.0), (2L, 10.0), (3L, 30.0), (4L, 10.0))
      .map { case (k, p) => (k, 1L, 1L, 1, 1.0, p, 0.0, 0.0, "N", "O", ts(1997, 1)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = fixtureDir("orders" -> orders, "lineitem" -> li)
    val out = Trend.seasonalIndex(spark, dir).collect()
      .map(r => r.getAs[Int]("month") -> r.getAs[Double]("index")).toMap
    // overall monthly mean = (30+10+30+10)/4 = 20; jan avg 30 -> 1.5; jun 10 -> 0.5
    assert(out === Map(1 -> 1.5, 6 -> 0.5))
  }

  test("open-by-month flattens the order->ship interval to the grid") {
    import java.sql.Timestamp
    val orders = Seq((1L, 1L, "O", 0.0,
      Timestamp.valueOf("1995-01-20 00:00:00"), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq((1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
      Timestamp.valueOf("1995-03-02 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = fixtureDir("orders" -> orders, "lineitem" -> li)
    val out = Trend.openByMonth(spark, dir).collect()
      .map(_.getAs[java.sql.Timestamp]("month").toString.substring(0, 7))
    assert(out.toSeq === Seq("1995-01", "1995-02", "1995-03"))
  }

  test("Neyman allocation favors the high-variance stratum") {
    val out = Sampling.sampleNeyman(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    val allocs = out.map(r => r.getAs[String]("source") ->
      r.getAs[Long]("alloc")).toMap
    val total = allocs.values.sum
    // rounding keeps the total within one unit per stratum of the budget
    assert(math.abs(total - Sampling.NeymanBudget) <= out.length)
    // zero-variance strata would get zero; every real stratum gets > 0
    assert(out.forall(r => r.getAs[Long]("ss") >= 0))
    // allocation is monotone in the weight
    val sorted = out.sortBy(_.getAs[Long]("w_micro"))
    assert(sorted.map(_.getAs[Long]("alloc")).toSeq ==
      sorted.map(_.getAs[Long]("alloc")).toSeq.sorted)
  }

  test("curriculum stages are monotone in difficulty and quintile-sized") {
    val out = Sampling.sampleCurriculum(spark, SparkSpec.sf0001).collect()
    assert(out.length === 500)
    val byStage = out.groupBy(_.getAs[Int]("stage"))
    assert(byStage.keySet === Set(1, 2, 3, 4, 5))
    assert(byStage.values.forall(_.length === 100)) // 500/5 exact
    // stage boundaries respect the (difficulty, doc_id) total order
    val ordered = out.sortBy(r =>
      (r.getAs[Long]("difficulty_micro"), r.getAs[Long]("doc_id")))
    assert(ordered.map(_.getAs[Int]("stage")).toSeq ===
      ordered.map(_.getAs[Int]("stage")).toSeq.sorted)
  }

  test("cohort LTV: day cohorts, ages, and cumulative per-user value") {
    val d = fixtureDir("events" -> Seq(
      // user 1: first purchase day 1 ($1), again day 3 ($2)
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "purchase", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 1L, "purchase", 2.0, "{}"),
      // user 2: same cohort day, single $4 purchase
      (3L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 2L, "purchase", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Events.cohortLtv(spark, d).collect()
      .map(r => r.getAs[Int]("age") -> r).toMap
    assert(out.keySet === Set(0, 2))
    assert(out(0).getAs[Long]("n_users") === 2L)
    assert(out(0).getAs[Long]("rev_cents") === 500L)
    assert(out(0).getAs[Double]("ltv_cents_per_user") === 250.0)
    assert(out(2).getAs[Long]("cum_cents") === 700L)
    assert(out(2).getAs[Double]("ltv_cents_per_user") === 350.0)
  }

  test("funnel latency: first view to first purchase after it, type-1 picks") {
    val d = fixtureDir("events" -> Seq(
      // user 1: view at 10:00, purchase at 10:10 -> 600 s
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: purchase BEFORE the first view is ignored; later one counts
      (3L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 2L, "purchase", 1.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "view", 0.0, "{}"),
      (5L, java.sql.Timestamp.valueOf("2024-01-01 11:00:30"), 2L, "purchase", 1.0, "{}"),
      // user 3: view only -> not converted
      (6L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Events.funnelLatency(spark, d).collect().head
    assert(r.getAs[Long]("n_converted") === 2L)
    assert(r.getAs[Long]("p50_s") === 30L) // ceil(0.5*2)=1st of {30,600}
    assert(r.getAs[Long]("p90_s") === 600L)
  }

  test("bounded DP caps each user's contribution before counting") {
    val burst = (1L to 20L).map(i =>
      (i, f"2024-01-01 10:${i}%02d:00", 1L, "click"))
    val d = fixtureDir("events" -> eventsDf(burst: _*))
    val out = Curation.dpBoundedCounts(spark, d).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_capped") === Curation.DpUserCap.toLong)
  }

  private def eventsDfV(rows: (Long, String, String, Double)*) = {
    // (event_id, ts, event_type, value) — single user
    rows.map { case (id, ts, t, v) =>
      (id, java.sql.Timestamp.valueOf(ts), 1L, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("changepoint: planted step found exactly, gain hand-checked") {
    // $1/day for 10 days then $5/day for 10 days -> split at day 10
    var id = 0L
    val rows = (1 to 20).map { d =>
      id += 1
      (id, f"2024-01-$d%02d 12:00:00", "purchase", if (d <= 10) 1.0 else 5.0)
    }
    val out = Trend.changepoint(spark, fixtureDir("events" -> eventsDfV(rows: _*)))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[java.sql.Date]("split_day").toString === "2024-01-10")
    assert(r.getAs[Long]("n_days") === 20L)
    assert(r.getAs[Double]("mean_before") === 1.0)
    assert(r.getAs[Double]("mean_after") === 5.0)
    // N=20 T=6000 S=1000: dnum = 20*1000-10*6000 = -40000;
    // gain = 40000^2 / (20*10*10) = 800000 cents^2 = 80 dollars^2
    assert(r.getAs[Double]("gain") === 80.0)
  }

  test("changepoint: missing calendar days enter as zero revenue") {
    // revenue only on days 1 and 20; the zero-fill spine must create 20
    // candidate days, and the best split isolates the single high day
    val out = Trend.changepoint(spark, fixtureDir("events" -> eventsDfV(
      (1L, "2024-01-01 10:00:00", "purchase", 1.0),
      (2L, "2024-01-20 10:00:00", "purchase", 99.0)))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") === 20L)
    assert(r.getAs[java.sql.Date]("split_day").toString === "2024-01-19")
    assert(r.getAs[Double]("mean_after") === 99.0)
  }

  test("kendall: pair classes and tau-b match a driver-side hand model") {
    // daily (x=count, y=cents): (1,100) (2,200) (3,150) (3,300)
    val d = fixtureDir("events" -> eventsDfV(
      (1L, "2024-01-01 10:00:00", "purchase", 1.0),
      (2L, "2024-01-02 10:00:00", "purchase", 2.0),
      (3L, "2024-01-02 11:00:00", "view", 0.0),
      (4L, "2024-01-03 10:00:00", "purchase", 1.5),
      (5L, "2024-01-03 11:00:00", "view", 0.0),
      (6L, "2024-01-03 12:00:00", "view", 0.0),
      (7L, "2024-01-04 10:00:00", "purchase", 3.0),
      (8L, "2024-01-04 11:00:00", "view", 0.0),
      (9L, "2024-01-04 12:00:00", "view", 0.0)))
    val series = Seq((1L, 100L), (2L, 200L), (3L, 150L), (3L, 300L))
    val pairs = for {
      i <- series.indices; j <- series.indices if i < j
    } yield (series(i), series(j))
    def cls(p: ((Long, Long), (Long, Long))): String = {
      val ((xa, ya), (xb, yb)) = p
      if (xa == xb && ya == yb) "txy"
      else if (xa == xb) "tx"
      else if (ya == yb) "ty"
      else if ((xb > xa) == (yb > ya)) "c" else "d"
    }
    val byCls = pairs.groupBy(cls).view.mapValues(_.length.toLong).toMap
      .withDefaultValue(0L)
    val (c, dd, tx, ty, txy) =
      (byCls("c"), byCls("d"), byCls("tx"), byCls("ty"), byCls("txy"))
    val n0 = pairs.length.toLong
    val tauB = math.floor((c - dd).toDouble /
      math.sqrt(((n0 - tx - txy) * (n0 - ty - txy)).toDouble) * 1e6 + 0.5) / 1e6
    val r = Trend.kendall(spark, d).collect().head
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Long]("n_pairs") === n0)
    assert(r.getAs[Long]("concordant") === c)
    assert(r.getAs[Long]("discordant") === dd)
    assert(r.getAs[Long]("ties_x") === tx)
    assert(r.getAs[Long]("ties_y") === ty)
    assert(r.getAs[Double]("tau_b") === tauB)
  }

  test("mann-kendall: monotone series hand-solved; constant series NULL z") {
    // strictly increasing revenue over 10 days: S = 45, no ties,
    // V = 10*9*25/18 = 125, z = (45-1)/sqrt(125)
    var id = 0L
    val up = (1 to 10).map { d =>
      id += 1; (id, f"2024-01-$d%02d 12:00:00", "purchase", d.toDouble)
    }
    val r = graft.operators.Trend
      .mannKendall(spark, fixtureDir("events" -> eventsDfV(up: _*)))
      .collect().head
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Long]("s") === 45L)
    val wantZ = math.floor(44.0 / math.sqrt(125.0) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("z") === wantZ)
    // constant series: every pair tied -> variance numerator 0 -> NULL
    id = 0
    val flat = (1 to 6).map { d =>
      id += 1; (id, f"2024-01-$d%02d 12:00:00", "purchase", 7.0)
    }
    val rf = graft.operators.Trend
      .mannKendall(spark, fixtureDir("events" -> eventsDfV(flat: _*)))
      .collect().head
    assert(rf.getAs[Long]("s") === 0L)
    assert(rf.isNullAt(rf.fieldIndex("z")))
  }

  test("periodogram: weekly spike train peaks at 7, values replayed by hand") {
    // 28 days, $100 purchase every 7th day (k = 0, 7, 14, 21); a 0-value
    // purchase on the last day pins the spine end so n = 28 exactly
    var id = 0L
    val rows = (0 until 28).flatMap { k =>
      val day = f"2024-01-${k + 1}%02d 12:00:00"
      if (k % 7 == 0) { id += 1; Seq((id, day, "purchase", 100.0)) }
      else if (k == 27) { id += 1; Seq((id, day, "purchase", 0.0)) }
      else Nil
    }
    val out = graft.operators.Trend
      .periodogram(spark, fixtureDir("events" -> eventsDfV(rows: _*)))
      .collect().map(r => r.getAs[Int]("period") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("power"))).toMap
    assert(out.keySet === graft.operators.Trend.PeriodogramPeriods.toSet)
    out.values.foreach { case (n, _) => assert(n === 28L) }
    // independent hand replay from the same literal trig table
    val tbl = graft.operators.Trend.periodogramTable
      .map { case (p, r, cq, sq) => (p, r) -> ((cq, sq)) }.toMap
    val y = (0 until 28).map(k => if (k % 7 == 0) 10000L else 0L)
    val ybar = y.sum / 28
    val dev = y.map(_ - ybar)
    val want = graft.operators.Trend.PeriodogramPeriods.map { p =>
      val cs = (0 until 28).map(k => dev(k) * tbl((p, k % p))._1).sum
      val ss = (0 until 28).map(k => dev(k) * tbl((p, k % p))._2).sum
      val pw = ((cs / 1e6) * (cs / 1e6) + (ss / 1e6) * (ss / 1e6)) / 28
      p -> math.floor(pw * 1e4 + 0.5) / 1e4
    }.toMap
    graft.operators.Trend.PeriodogramPeriods.foreach { p =>
      assert(out(p)._2 === want(p), s"period $p")
    }
    // the weekly line carries the energy; every non-harmonic is below it
    val p7 = out(7)._2
    assert(p7 > 0.0)
    Seq(2, 3, 4, 5, 6, 14).foreach(p => assert(out(p)._2 < p7, s"period $p >= p7"))
  }

  test("pacf: lag-1 equals r1; lag-2 matches the closed form; AR(1) cuts off") {
    // seeded AR(1): x_t = 0.8 x_{t-1} + e_t -> theoretical PACF cuts off
    // after lag 1 (phi_11 ~ 0.8, later lags ~ 0)
    val rnd = new scala.util.Random(7)
    var x = 0.0
    var id = 0L
    val rows = (0 until 120).map { d =>
      x = 0.8 * x + rnd.nextGaussian()
      id += 1
      (id, f"2024-${1 + d / 28}%02d-${1 + d % 28}%02d 12:00:00", "purchase",
        100.0 + 10.0 * x)
    }
    val out = graft.operators.Trend
      .pacf(spark, fixtureDir("events" -> eventsDfV(rows: _*)))
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    assert(out.size === graft.operators.Trend.PacfMaxLag)
    def mu(v: Double): Long = math.round(v * 1e6)
    // phi_11 = r1 exactly
    assert(out(1).getAs[Double]("pacf") === out(1).getAs[Double]("r"))
    // phi_22 via the independent closed form (r2 - r1^2)/(1 - r1^2),
    // replayed through the same integer micro-quantization
    val r1 = mu(out(1).getAs[Double]("r"))
    val r2 = mu(out(2).getAs[Double]("r"))
    val want22 = math.floor(
      (r2 * 1000000L - r1 * r1).toDouble / (1000000000000L - r1 * r1)
        * 1e6 + 0.5).toLong
    assert(mu(out(2).getAs[Double]("pacf")) === want22)
    // AR(1) signature: strong lag 1, small partials at 2..7
    assert(out(1).getAs[Double]("pacf") > 0.5)
    (2 to 7).foreach { k =>
      assert(math.abs(out(k).getAs[Double]("pacf")) < 0.35, s"lag $k")
    }
  }

  test("ljung-box: alternating series replayed through the exact quantized pipeline") {
    // 14 days of $1/$3 alternation: strong negative r1 -> huge Q at every m
    var id = 0L
    val rows = (1 to 14).map { d =>
      id += 1
      (id, f"2024-03-$d%02d 12:00:00", "purchase", if (d % 2 == 1) 1.0 else 3.0)
    }
    val out = Trend.ljungBox(spark, fixtureDir("events" -> eventsDfV(rows: _*)))
      .collect().map(r => r.getAs[Int]("m") -> r).toMap
    assert(out.size === graft.operators.Trend.PacfMaxLag)
    // replay: zero-fill is a no-op (every day present), x in cents
    val x = (1 to 14).map(d => if (d % 2 == 1) 100L else 300L)
    val n = x.length
    val t = x.sum
    val sxx = x.map(v => v * v).sum
    val xbar = t.toDouble / n
    val den = sxx.toDouble - xbar * t
    val qs = (1 to 7).map { k =>
      val pairs = x.dropRight(k).zip(x.drop(k))
      val mk = pairs.length
      val sh = pairs.map(_._1).sum
      val st = pairs.map(_._2).sum
      val sxy = pairs.map { case (a, b) => a * b }.sum
      val num = (sxy.toDouble - xbar * (sh + st)) + mk * (xbar * xbar)
      val rMu = math.floor(num / den * 1e6 + 0.5).toLong
      k -> (rMu * rMu) / (n - k) // integer div, the engine's term
    }.toMap
    (1 to 7).foreach { m =>
      val ssum = (1 to m).map(qs).sum
      val want = math.floor(
        (n.toLong * (n + 2)).toDouble * ssum / 1e12 * 1e6 + 0.5) / 1e6
      assert(out(m).getAs[Long]("n") === n.toLong)
      assert(out(m).getAs[Double]("q") === want, s"m=$m")
      assert(out(m).getAs[Boolean]("reject_white") ===
        ((n.toLong * (n + 2)).toDouble * ssum / 1e12 >
          out(m).getAs[Double]("crit_95")), s"reject m=$m")
    }
    // the alternating signal is overwhelmingly non-white at m = 1
    assert(out(1).getAs[Boolean]("reject_white"))
    // Q is nondecreasing in m (terms are non-negative)
    val qv = (1 to 7).map(m => out(m).getAs[Double]("q"))
    assert(qv.zip(qv.tail).forall { case (a, b) => b >= a })
  }

  test("ljung-box: constant series carries NULL q and NULL reject at every m") {
    var id = 0L
    val rows = (1 to 10).map { d =>
      id += 1
      (id, f"2024-03-$d%02d 12:00:00", "purchase", 2.0)
    }
    val out = Trend.ljungBox(spark, fixtureDir("events" -> eventsDfV(rows: _*)))
      .collect()
    assert(out.length === graft.operators.Trend.PacfMaxLag)
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("q")))
      assert(r.isNullAt(r.fieldIndex("reject_white")))
      assert(!r.isNullAt(r.fieldIndex("crit_95")))
    }
  }

  test("kendall: strictly monotone series scores tau_b = 1") {
    var id = 0L
    val rows = (1 to 5).flatMap { d =>
      (1 to d).map { k =>
        id += 1
        (id, f"2024-01-$d%02d 10:$k%02d:00", "purchase", d.toDouble)
      }
    }
    val r = Trend.kendall(spark, fixtureDir("events" -> eventsDfV(rows: _*)))
      .collect().head
    assert(r.getAs[Double]("tau_b") === 1.0)
    assert(r.getAs[Long]("discordant") === 0L)
  }
}
