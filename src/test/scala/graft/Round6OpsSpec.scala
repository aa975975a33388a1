package graft

import graft.operators.{Analytics, Mining}
import org.apache.spark.sql.functions._

/** Invariants for the round-6 third wave: JL projection distortion and
  * incremental join-view maintenance. */
class Round6OpsSpec extends SparkSuite {

  private val dir = SparkSpec.sf0001

  test("rp distortion: JL estimator is unbiased-ish and the plan is narrow") {
    val rows = Mining.rpDistortion(spark, dir).collect()
    assert(rows.nonEmpty)
    val ds = rows.flatMap(r => Option(r.getAs[java.lang.Double]("distortion")).map(_.toDouble))
    val mean = ds.sum / ds.length
    // ±1 rows give E[d2_rp] = d2; with k=16 the mean over hundreds of
    // pairs concentrates well inside [0.7, 1.3]
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean")
    // every projected distance is non-negative and finite
    assert(rows.forall(_.getAs[Double]("d2_rp") >= 0))
  }

  test("rp matrix is deterministic ±1 with the pinned shape") {
    assert(Mining.rpMatrix.length === Mining.RpDim)
    assert(Mining.rpMatrix.forall(_.length === 64))
    assert(Mining.rpMatrix.flatten.forall(x => x == 1.0 || x == -1.0))
    // not degenerate: both signs appear in every row
    assert(Mining.rpMatrix.forall(r => r.contains(1.0) && r.contains(-1.0)))
  }

  test("mv join incremental: all four delta-rule branches are non-empty") {
    // the union equals the full join (oracle-checked); here pin that the
    // md5 delta gate actually exercises every branch of the rule
    import org.apache.spark.sql.Column
    def isDelta(k: Column): Column =
      conv(substring(md5(k.cast("string")), 1, 2), 16, 10).cast("int") < 26
    val o = graft.sources.Tables.orders(spark, dir)
    val l = graft.sources.Tables.lineitem(spark, dir)
    val lKey = concat_ws(":", col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string"))
    val oD = o.filter(isDelta(col("o_orderkey")))
    val lD = l.filter(isDelta(lKey))
    val oB = o.filter(!isDelta(col("o_orderkey")))
    val lB = l.filter(!isDelta(lKey))
    assert(oD.count() > 0 && lD.count() > 0)
    val on = col("o_orderkey") === col("l_orderkey")
    assert(oD.join(lB, on).count() > 0) // ΔO ⋈ base
    assert(oB.join(lD, on).count() > 0) // base ⋈ ΔL
    assert(oD.join(lD, on).count() > 0) // ΔO ⋈ ΔL (both sides new)
    // and the composed view matches the plain join row-for-row
    val full = o.join(l, on).count()
    assert(Analytics.mvJoinIncremental(spark, dir).count() === full)
  }

  test("bootstrap: CI brackets the point estimate with sane width") {
    val r = graft.operators.Inference.bootstrap(spark, dir).collect().head
    val (m, lo, hi) = (r.getAs[Double]("mean_value"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo <= hi)
    // Poisson-bootstrap replicate means concentrate around the sample
    // mean; the point estimate must land inside (or on) the 95% band
    assert(m >= lo && m <= hi, s"mean $m outside [$lo, $hi]")
    assert(r.getAs[Long]("n_replicates") === graft.operators.Inference.BootstrapB)
  }

  test("ewma: constant daily series smooths to itself; spike decays by halves") {
    import spark.implicits._
    def ev(id: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), 1L, "purchase", v, "{}")
    val const = (1 to 10).map(d => ev(d.toLong, d, 50.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.Trend.ewmaOf(const).collect()
    assert(out.forall(r => math.abs(r.getAs[Double]("ewma") - 50.0) < 1e-9))

    // a single spike on day 1: ewma_t = spike * w_t where the truncated
    // normalized weight halves each day: day1 -> 100, day2 -> 33.33
    // (2^19/(2^20+2^19)), day3 -> 14.29 (2^18/sum of 3 weights)
    val spike = (Seq(ev(1L, 1, 100.0)) ++ (2 to 4).map(d => ev(d.toLong, d, 0.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = graft.operators.Trend.ewmaOf(spike).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("ewma")).toMap
    assert(math.abs(s("2024-01-01") - 100.0) < 1e-6)
    assert(math.abs(s("2024-01-02") - 100.0 / 3) < 1e-3)
    assert(math.abs(s("2024-01-03") - 100.0 / 7) < 1e-3)
  }

  test("feature hash: buckets in range, weights bounded by token count") {
    val rows = Mining.featureHash(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val f = r.getAs[Int]("feature"); f >= 0 && f < Mining.HashFeatures
    })
    assert(rows.forall(_.getAs[Long]("weight") != 0))
    // |Σ signed weights per doc| <= token count (triangle inequality)
    val tok = graft.operators.TextAnalysis.withWordsOf(
      graft.sources.Tables.documents(spark, dir))
      .select(col("doc_id"), size(col("w")).as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => math.abs(r.getAs[Long]("weight"))).sum)
    assert(byDoc.forall { case (d, s) => s <= tok(d) })
  }

  test("basket triples: downward closure — every sub-pair meets the floor") {
    val triples = Analytics.basketTriples(spark, dir).collect()
    assert(triples.nonEmpty, "fixture must produce at least one triple")
    val items = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct().collect()
      .groupBy(_.getAs[Long]("okey")).view
      .mapValues(_.map(_.getAs[Long]("part")).toSet).toMap
    triples.foreach { t =>
      val (p1, p2, p3) = (t.getAs[Long]("p1"), t.getAs[Long]("p2"), t.getAs[Long]("p3"))
      assert(p1 < p2 && p2 < p3)
      val n = items.values.count(b => b(p1) && b(p2) && b(p3))
      assert(n === t.getAs[Long]("n_orders")) // support is exact
      assert(n >= Analytics.TripleSupport)
    }
  }

  test("cusum: flat series stays 0; level shift peaks at the break") {
    import spark.implicits._
    def ev(id: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), 1L, "purchase", v, "{}")
    // 5 days at 10, then 5 days at 30: S_t peaks (most negative) at day 5
    val rows = ((1 to 5).map(d => ev(d.toLong, d, 10.0)) ++
      (6 to 10).map(d => ev(d.toLong, d, 30.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.Trend.cusumOf(rows).collect()
      .sortBy(_.getAs[java.sql.Date]("day").toString)
    // grand mean 20: S_5 = 5*(10-20) = -50 is the extreme
    val peak = out.filter(_.getAs[Boolean]("is_peak"))
    assert(peak.length === 1)
    assert(peak.head.getAs[java.sql.Date]("day").toString === "2024-01-05")
    assert(math.abs(peak.head.getAs[Double]("cusum") + 50.0) < 1e-9)
    // flat series: every cusum exactly 0, peak at the earliest day
    val flat = (1 to 6).map(d => ev(d.toLong, d, 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val fo = graft.operators.Trend.cusumOf(flat).collect()
    assert(fo.forall(_.getAs[Double]("cusum") === 0.0))
    assert(fo.filter(_.getAs[Boolean]("is_peak"))
      .map(_.getAs[java.sql.Date]("day").toString).toSeq === Seq("2024-01-01"))
  }

  test("paths: session split and step truncation match hand fixture") {
    import spark.implicits._
    def ev(id: Long, ts: String, u: Long, t: String) =
      (id, java.sql.Timestamp.valueOf(ts), u, t, 1.0, "{}")
    val d = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view"),
      ev(2, "2024-01-01 10:01:00", 1, "click"),
      ev(3, "2024-01-01 10:02:00", 1, "purchase"),
      ev(4, "2024-01-01 10:03:00", 1, "view"),
      ev(5, "2024-01-01 10:04:00", 1, "view"), // 5 events: 5th truncated
      ev(6, "2024-01-01 12:00:00", 1, "signup"), // new session (gap)
      ev(7, "2024-01-01 10:00:00", 2, "view"),
      ev(8, "2024-01-01 10:01:00", 2, "click"),
      ev(9, "2024-01-01 10:02:00", 2, "purchase"),
      ev(10, "2024-01-01 10:03:00", 2, "view"),
      ev(11, "2024-01-01 10:04:00", 2, "error"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = fixtureDir("events" -> d)
    val rows = graft.operators.Events.paths(spark, dir).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n_sessions")).toMap
    // both users' long sessions truncate to the same first-4 path
    assert(rows("view>click>purchase>view") === 2L)
    assert(rows("signup") === 1L)
  }

  test("linear attribution: exact split with remainder to latest touch") {
    import spark.implicits._
    def ev(id: Long, ts: String, u: Long, t: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(ts), u, t, v, "{}")
    val d = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 0),
      ev(2, "2024-01-01 10:05:00", 1, "click", 0),
      ev(3, "2024-01-01 10:06:00", 1, "click", 0),
      ev(4, "2024-01-01 10:10:00", 1, "purchase", 1.00), // 100c / 3 touches
      ev(5, "2024-01-01 10:00:00", 2, "purchase", 5.00)) // no touches -> none
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = fixtureDir("events" -> d)
    val rows = graft.operators.Events.attributionLinear(spark, dir).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Double]("revenue"))).toMap
    // 100 cents over 3 touches: 33 each, +1 remainder to the LATEST (click id 3)
    assert(rows("view") === (1L, 0.33))
    assert(rows("click") === (1L, 0.67)) // 33 + (33 + 1)
    assert(rows("none") === (1L, 5.0))
    // conservation: channel revenues reconstruct total purchase revenue
    assert(math.abs(rows.values.map(_._2).sum - 6.0) < 1e-9)
  }

  test("mad: median and MAD immune to a wild outlier") {
    import spark.implicits._
    def ev(id: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "purchase", v, "{}")
    val d = (Seq.tabulate(9)(i => ev(i.toLong, 10.0 + i)) :+ ev(99L, 100000.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = fixtureDir("events" -> d)
    val r = graft.operators.Scans.madOutliers(spark, dir).collect()
      .filter(_.getAs[String]("event_type") == "purchase").head
    // 10 values: 10..18 plus 100000; type-1 median = 5th = 14
    assert(r.getAs[Double]("median") === 14.0)
    // deviations: 4,3,2,1,0,1,2,3,4,99986 -> median dev = 2 (ceil(5)=5th of sorted 0,1,1,2,2,...)
    assert(r.getAs[Double]("mad") === 2.0)
    assert(r.getAs[Long]("n_outliers") === 1L) // only the wild point
  }

  test("cdc derive: op counts agree with the dataset diff statuses") {
    val ops = graft.operators.Curation.cdcDerive(spark, dir).collect()
      .groupBy(_.getAs[String]("op")).view.mapValues(_.length.toLong).toMap
    val diff = graft.operators.Curation.datasetDiff(spark, dir).collect()
      .groupBy(_.getAs[String]("status")).view
      .mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    assert(ops("insert") === diff("added"))
    assert(ops("delete") === diff("removed"))
    assert(ops("update") === diff("changed"))
    assert(!ops.contains(null))
  }

  test("llr: G2 matches the hand-computed eight-term formula") {
    val rows = Mining.llrCollocations(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= Mining.LlrTopK)
    assert(rows.forall(_.getAs[Long]("n_pair") >= Mining.LlrMinCount))
    assert(rows.forall(_.getAs[Double]("g2") >= -1e-3)) // G2 >= 0 up to quantization
    // recompute the top bigram's G2 from raw counts
    val top = rows.head
    val bg = top.getAs[String]("bigram")
    val Array(w1, w2) = bg.split(" ", 2)
    val grams = graft.operators.TextAnalysis.withWordsOf(
      graft.sources.Tables.documents(spark, dir))
      .select(explode(expr(
        "CASE WHEN size(w) < 2 THEN array() ELSE transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1])) END"))
        .as("bg")).collect().map(_.getString(0))
    val k11 = grams.count(_ == bg).toDouble
    val c1 = grams.count(_.startsWith(w1 + " ")).toDouble
    val c2 = grams.count(_.endsWith(" " + w2)).toDouble
    val nn = grams.length.toDouble
    def xlx(x: Double) = if (x > 0) x * math.log(x) else 0.0
    val g2 = 2.0 * (xlx(k11) + xlx(c1 - k11) + xlx(c2 - k11) + xlx(nn - c1 - (c2 - k11)) -
      xlx(c1) - xlx(nn - c1) - xlx(c2) - xlx(nn - c2) + xlx(nn))
    assert(math.abs(top.getAs[Double]("g2") - g2) < 0.01, s"$bg: ${top.getAs[Double]("g2")} vs $g2")
  }

  test("tcloseness: t in [0,1]; concentrated group scores near 1") {
    val rows = graft.operators.Validation.tCloseness(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val t = r.getAs[Double]("t"); t >= 0.0 && t <= 1.0 + 1e-9
    })
    // hand fixture: group A holds ONLY the max value, group B a uniform
    // spread. A's ordered EMD vs the near-uniform global is EXACTLY
    // Σ_{j<m} j/m / (m−1) = 0.5 in the m→∞ limit (mass at one end vs
    // uniform); B remains ≈ the global itself
    import spark.implicits._
    val cust = ((1 to 99).map(i => (i.toLong, s"c$i", 1L, "B", i * 1.0)) :+
      (100L, "c100", 2L, "A", 10000.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    val d2 = fixtureDir("customer" -> cust)
    val byG = graft.operators.Validation.tCloseness(spark, d2).collect()
      .map(r => r.getAs[String]("mktsegment") -> r.getAs[Double]("t")).toMap
    assert(math.abs(byG("A") - 0.5) < 0.01) // hand-computed: Σ j/100 / 99
    assert(byG("B") < 0.02) // 99% of the table IS the global distribution
  }

  test("asof forward: each click gets its nearest future purchase") {
    import spark.implicits._
    def ev(id: Long, ts: String, t: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(ts), 1L, t, v, "{}")
    val d = fixtureDir("events" -> Seq(
      ev(1, "2024-01-01 10:00:00", "click", 1.0),
      ev(2, "2024-01-01 10:05:00", "purchase", 50.0),
      ev(3, "2024-01-01 10:06:00", "purchase", 60.0),
      ev(4, "2024-01-01 10:07:00", "click", 2.0), // -> 10:09 purchase
      ev(5, "2024-01-01 10:09:00", "purchase", 70.0),
      ev(6, "2024-01-01 11:00:00", "click", 3.0)) // no future purchase -> null
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = graft.operators.AsOf.clicksBeforePurchase(spark, d).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("purchase_value")).map(_.toDouble)).toMap
    assert(rows(1L) === Some(50.0)) // nearest future, not latest
    assert(rows(4L) === Some(70.0))
    assert(rows(6L) === None)
  }

  test("asof nearest: closer side wins, backward wins exact ties, one-sided falls back") {
    import spark.implicits._
    def ev(id: Long, ts: String, t: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(ts), 1L, t, v, "{}")
    val d = fixtureDir("events" -> Seq(
      ev(1, "2024-01-01 10:00:00", "click", 1.0),    // back 09:58 (2m) vs fwd 10:05 (5m) -> back 10.0
      ev(2, "2024-01-01 09:58:00", "purchase", 10.0),
      ev(3, "2024-01-01 10:05:00", "purchase", 20.0),
      ev(4, "2024-01-01 10:06:00", "click", 2.0),    // back 10:05 (1m) vs fwd 10:07 (1m) -> tie, back 20.0
      ev(5, "2024-01-01 10:07:00", "purchase", 30.0),
      ev(6, "2024-01-01 09:00:00", "click", 3.0),    // nothing before -> forward 10.0
      ev(7, "2024-01-01 23:00:00", "click", 4.0))    // nothing after -> backward 30.0
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = graft.operators.AsOf.clicksNearestPurchase(spark, d).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("purchase_value")).map(_.toDouble)).toMap
    assert(rows(1L) === Some(10.0))
    assert(rows(4L) === Some(20.0)) // exact tie -> backward side
    assert(rows(6L) === Some(10.0)) // only a future purchase exists
    assert(rows(7L) === Some(30.0)) // only a past purchase exists
  }

  test("autocorr: perfectly periodic series gives r7 = 1, constant gives NULL") {
    import spark.implicits._
    def ev(id: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), 1L, "purchase", v, "{}")
    // strict period-7 pattern over 28 days: lag-7 pairs are identical
    val per = (1 to 28).map(d => ev(d.toLong, d, 10.0 + (d % 7) * 5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.Trend.autocorrOf(per).collect()
      .map(x => x.getAs[Int]("lag") -> x.getAs[java.lang.Double]("r").doubleValue).toMap
    assert(math.abs(r(7) - 1.0) < 1e-6)
    assert(r(1) < 1.0) // within-week variation decorrelates lag 1
    // constant series: zero variance -> NULL both lags
    val const = (1 to 14).map(d => ev(d.toLong, d, 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rc = graft.operators.Trend.autocorrOf(const).collect()
    assert(rc.forall(_.isNullAt(rc.head.fieldIndex("r"))))
  }

  test("sample balanced: every kept count lands near the min class") {
    val rows = graft.operators.Sampling.sampleBalanced(spark, SparkSpec.sf0001).collect()
    val m = rows.map(_.getAs[Long]("n_total")).min
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      // hash-gate estimator: within 50% of the min class on this tiny SF
      assert(kept <= r.getAs[Long]("n_total"))
      assert(kept >= 0 && kept <= 2 * m, s"${r.getAs[String]("lang")}: $kept vs min $m")
    }
  }

  test("abtest power: MDE shrinks as arms grow") {
    import spark.implicits._
    def evs(n: Int) = (1 to n).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), i.toLong, "purchase",
        if (i % 4 == 0) 250.0 else 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val small = graft.operators.Inference.abtestPower(spark, fixtureDir("events" -> evs(40)))
      .collect().head
    val big = graft.operators.Inference.abtestPower(spark, fixtureDir("events" -> evs(400)))
      .collect().head
    assert(small.getAs[Double]("mde_pp") > big.getAs[Double]("mde_pp"))
    assert(big.getAs[Double]("mde_pp") > 0)
  }

  test("lifecycle: new/retained/resurrected/churned partition correctly") {
    import spark.implicits._
    def ev(id: Long, ts: String, u: Long) =
      (id, java.sql.Timestamp.valueOf(ts), u, "view", 1.0, "{}")
    // weeks (Mon-start): W1=01-01, W2=01-08, W3=01-15
    val d = fixtureDir("events" -> Seq(
      ev(1, "2024-01-02 10:00:00", 1), // u1 W1
      ev(2, "2024-01-09 10:00:00", 1), // u1 W2 retained
      ev(3, "2024-01-03 10:00:00", 2), // u2 W1
      ev(4, "2024-01-16 10:00:00", 2), // u2 W3 resurrected (skipped W2)
      ev(5, "2024-01-10 10:00:00", 3)) // u3 new in W2, churned in W3
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = graft.operators.Events.lifecycle(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("w").toString ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"))).toMap
    assert(rows("2024-01-01") === (2L, 0L, 0L, 0L)) // u1, u2 new
    assert(rows("2024-01-08") === (1L, 1L, 0L, 1L)) // u3 new, u1 retained, u2 churned
    assert(rows("2024-01-15") === (0L, 0L, 1L, 2L)) // u2 back, u1+u3 churned
    assert(rows("2024-01-22") === (0L, 0L, 0L, 1L)) // final churn row (u2)
  }

  test("entropy: constant column 0, near-unique key near ln(n)") {
    val rows = graft.operators.Profiler.columnEntropy(spark, dir).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Double]("entropy_nats"))).toMap
    // l_returnflag has 3 values -> entropy <= ln(3); orderkey is near-key
    assert(rows("l_returnflag")._2 <= math.log(3.0) + 1e-6)
    assert(rows("l_returnflag")._2 > 0)
    val (mOk, hOk) = rows("l_orderkey")
    assert(hOk > 0.9 * math.log(mOk.toDouble)) // high-cardinality ~ uniform
    rows.values.foreach { case (m, h) =>
      assert(h >= -1e-6 && h <= math.log(m.toDouble) + 1e-6)
    }
  }

  test("rolling: range frame is gap-correct (missing day shrinks the sum)") {
    import spark.implicits._
    def ev(id: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), 1L, "purchase", v, "{}")
    // active days 1..3, then a gap, then day 10: the day-10 trailing-7d
    // frame (days 4..10) must contain ONLY day 10
    val d = fixtureDir("events" -> (Seq(1, 2, 3, 10).zipWithIndex.map {
      case (day, i) => ev(i.toLong, day, 10.0)
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = graft.operators.Events.rolling(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("revenue_7d")).toMap
    assert(rows("2024-01-03") === 30.0) // days 1+2+3
    assert(rows("2024-01-10") === 10.0) // gap: only itself
  }

  test("dwell: mean gap matches hand computation per transition") {
    import spark.implicits._
    def ev(id: Long, ts: String, t: String) =
      (id, java.sql.Timestamp.valueOf(ts), 1L, t, 1.0, "{}")
    val d = fixtureDir("events" -> Seq(
      ev(1, "2024-01-01 10:00:00", "view"),
      ev(2, "2024-01-01 10:00:10", "click"), // view->click 10s
      ev(3, "2024-01-01 10:00:40", "view"), // click->view 30s
      ev(4, "2024-01-01 10:00:50", "click")) // view->click 10s
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = graft.operators.Events.dwell(spark, d).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_gap_s"))).toMap
    assert(rows(("view", "click")) === (2L, 10.0))
    assert(rows(("click", "view")) === (1L, 30.0))
  }

  test("theil-sen: robust to an outlier month that swings OLS") {
    // nation fixture via customer/orders/lineitem: linear y = 100/month,
    // one wild outlier month; TS median slope stays ~1.00/month
    import spark.implicits._
    def mon(m: Int) = java.sql.Timestamp.valueOf(f"1995-$m%02d-15 00:00:00")
    val cust = Seq((1L, "c1", 0L, "B", 0.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    val nat = Seq((0L, "ALPHA", 0L, "x"))
      .toDF("n_nationkey", "n_name", "n_regionkey", "n_comment")
    val orders = (1 to 8).map(m => (m.toLong, 1L, "O", 0.0, mon(m), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = (1 to 8).map { m =>
      val rev = if (m == 5) 100000.0 else m * 1.0 // outlier at month 5
      (m.toLong, 1L, 1L, 1, 1.0, rev, 0.0, 0.0, "N", "O", mon(m))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate")
    val d = fixtureDir("customer" -> cust, "nation" -> nat,
      "orders" -> orders, "lineitem" -> li)
    val ts = graft.operators.Trend.theilSen(spark, d).collect().head
    assert(ts.getAs[Long]("n_pairs") === 28) // C(8,2)
    val slope = ts.getAs[Double]("slope_monthly")
    assert(slope > 0.5 && slope < 2.0, s"TS slope $slope should ignore the outlier")
  }

  test("markov2: context probabilities sum to 1 and refine first order") {
    val rows = graft.operators.Events.transitionMatrix2(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCtx = rows.groupBy(r => (r.getAs[String]("from1"), r.getAs[String]("from2")))
    byCtx.values.foreach { ctx =>
      val pSum = ctx.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-3)
    }
    // trigram counts must be consistent with the first-order pair counts:
    // sum over from1 of n(from1, a, b) = n(a, b) minus journeys where
    // (a,b) opens the journey — so it can only be <= the pair count
    val m1 = graft.operators.Events.transitionMatrix(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n")).toMap
    byCtx.foreach { case ((_, from2), ctx) =>
      ctx.groupBy(_.getAs[String]("to_type")).foreach { case (to, rs) =>
        val n2 = rs.map(_.getAs[Long]("n")).sum
        assert(n2 <= m1((from2, to)))
      }
    }
  }

  test("runs test: alternating series maximizes runs, blocked series minimizes") {
    import spark.implicits._
    def ev(id: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), 1L, "purchase", v, "{}")
    // alternating high/low: runs = n
    val alt = (1 to 10).map(d => ev(d.toLong, d, if (d % 2 == 0) 100.0 else 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ra = graft.operators.Trend.runsTest(spark, fixtureDir("events" -> alt))
      .collect().head
    assert(ra.getAs[Long]("runs") === 10L)
    assert(ra.getAs[Double]("z") > 0) // more runs than expected
    // blocked: 5 low then 5 high -> 2 runs
    val blk = (1 to 10).map(d => ev(d.toLong, d, if (d <= 5) 1.0 else 100.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rb = graft.operators.Trend.runsTest(spark, fixtureDir("events" -> blk))
      .collect().head
    assert(rb.getAs[Long]("runs") === 2L)
    assert(rb.getAs[Double]("z") < 0)
  }

  test("gini: equal spend 0, one-whale fixture matches hand computation") {
    import spark.implicits._
    def ev(id: Long, u: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), u, "purchase", v, "{}")
    val eq = (1 to 10).map(i => ev(i.toLong, i.toLong, 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val g0 = graft.operators.Events.gini(spark, fixtureDir("events" -> eq))
      .collect().head
    assert(g0.getAs[Double]("gini") === 0.0)
    // spends (1,1,4): hand-computed G = 1/3
    val three = Seq(ev(1, 1, 0.01), ev(2, 2, 0.01), ev(3, 3, 0.04))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val g3 = graft.operators.Events.gini(spark, fixtureDir("events" -> three))
      .collect().head
    assert(math.abs(g3.getAs[Double]("gini") - 1.0 / 3) < 1e-6)
    assert(g3.getAs[Long]("n_users") === 3L)
  }

  test("mv join incremental: delta terms broadcast the delta side") {
    val plan = Analytics.mvJoinIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
