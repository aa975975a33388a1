package graft

import graft.operators.Inference
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the statistical-inference family:
  * A/B two-proportion z, Kaplan-Meier survival, Welch's t, Benford. */
class InferenceSpec extends SparkSuite {
  import spark.implicits._

  private def eventsDf(rows: (Long, String, Long, String, Double)*) =
    rows.map { case (id, ts, u, t, v) =>
      (id, java.sql.Timestamp.valueOf(ts), u, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  // ---------------------------------------------------------------- abtest

  test("abtest: z sign follows the lift and counts partition the users") {
    val d = fixtureDir("events" -> eventsDf(
      (1 to 40).map(i =>
        (i.toLong, "2024-01-01 10:00:00", i.toLong, "purchase",
          if (i % 3 == 0) 250.0 else 10.0)): _*))
    val r = Inference.abtest(spark, d).collect().head
    val (nC, nT) = (r.getAs[Long]("n_c"), r.getAs[Long]("n_t"))
    val (xC, xT) = (r.getAs[Long]("x_c"), r.getAs[Long]("x_t"))
    assert(nC + nT === 40)
    assert(xC + xT === 13) // multiples of 3 in 1..40
    val lift = r.getAs[Double]("lift_pp")
    val z = r.getAs[Double]("z")
    assert(math.signum(lift) === math.signum(z))
    // hand-check z from the four counts (pooled form)
    val (pC, pT) = (xC.toDouble / nC, xT.toDouble / nT)
    val p = (xC + xT).toDouble / (nC + nT)
    val se = math.sqrt(p * (1 - p) * (1.0 / nC + 1.0 / nT))
    assert(math.abs(z - (pT - pC) / se) < 1e-3)
  }

  test("abtest: degenerate experiment (everyone converts) yields NULL z") {
    val d = fixtureDir("events" -> eventsDf(
      (1 to 10).map(i =>
        (i.toLong, "2024-01-01 10:00:00", i.toLong, "purchase", 300.0)): _*))
    val r = Inference.abtest(spark, d).collect().head
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.getAs[Double]("rate_c") === 1.0)
  }

  // -------------------------------------------------------------- survival

  test("survival: KM curve matches the hand-multiplied product") {
    // time-to-conversion; horizon = 2024-01-20 (u4's last event). Users:
    //  u1: first 01-01, big purchase 01-03 -> t=2, event
    //  u2: same -> t=2, event
    //  u3: first 01-01, big purchase 01-06 -> t=5, event
    //  u4: first 01-01, never converts, last 01-20 -> t=19, censored
    val d = fixtureDir("events" -> eventsDf(
      (1L, "2024-01-01 09:00:00", 1L, "view", 1.0),
      (2L, "2024-01-03 09:00:00", 1L, "purchase", 300.0),
      (3L, "2024-01-01 09:00:00", 2L, "view", 1.0),
      (4L, "2024-01-03 09:00:00", 2L, "purchase", 300.0),
      (5L, "2024-01-01 09:00:00", 3L, "view", 1.0),
      (6L, "2024-01-06 09:00:00", 3L, "purchase", 300.0),
      (7L, "2024-01-01 09:00:00", 4L, "view", 1.0),
      (8L, "2024-01-20 09:00:00", 4L, "view", 1.0)))
    val rows = Inference.survival(spark, d).collect()
      .sortBy(_.getAs[Long]("lifetime_days"))
    assert(rows.map(_.getAs[Long]("lifetime_days")).toSeq === Seq(2L, 5L, 19L))
    val byT = rows.map(r => r.getAs[Long]("lifetime_days") ->
      (r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"), r.getAs[Double]("survival"))).toMap
    assert(byT(2L)._1 === 4 && byT(2L)._2 === 2)
    assert(math.abs(byT(2L)._3 - 0.5) < 1e-4) // 1 - 2/4
    assert(byT(5L)._1 === 2 && byT(5L)._2 === 1)
    assert(math.abs(byT(5L)._3 - 0.25) < 1e-4) // 0.5 * (1 - 1/2)
    // u4 censored at 19: no event there, survival unchanged
    assert(byT(19L)._2 === 0)
    assert(math.abs(byT(19L)._3 - 0.25) < 1e-4)
  }

  test("survival: full conversion at the last step absorbs S to exactly 0") {
    // u1, u2 convert at t=1 (the last event time, d = n there); u3 never
    // converts and censors at t=0 (single sighting on the horizon day)
    val d = fixtureDir("events" -> eventsDf(
      (1L, "2024-01-01 09:00:00", 1L, "view", 1.0),
      (2L, "2024-01-02 09:00:00", 1L, "purchase", 300.0), // t=1, event
      (3L, "2024-01-01 09:00:00", 2L, "view", 1.0),
      (4L, "2024-01-02 09:00:00", 2L, "purchase", 300.0), // t=1, event
      (5L, "2024-01-20 09:00:00", 3L, "view", 1.0))) // t=0, censored (horizon)
    val rows = Inference.survival(spark, d).collect()
      .sortBy(_.getAs[Long]("lifetime_days"))
    // t=0: risk 3, events 0 (u3 censored, leaves). t=1: risk 2, d=2 -> S=0
    assert(rows.map(r => (r.getAs[Long]("lifetime_days"), r.getAs[Long]("n_risk"),
      r.getAs[Long]("n_events"))).toSeq === Seq((0L, 3L, 0L), (1L, 2L, 2L)))
    assert(rows.last.getAs[Double]("survival") === 0.0)
  }

  // --------------------------------------------------------------- logrank

  test("logrank: identical arm curves give chi2 exactly 0") {
    // 2 users per md5 arm with the SAME time-to-conversion profile:
    // one converter at t=2, one never-converter censored at the horizon
    val ids = (1L to 40L).toList
    val armOf = ids.map { u =>
      u -> Integer.parseInt(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(u.toString).substring(0, 2), 16) % 2
    }.toMap
    val arm0 = ids.filter(armOf(_) == 0).take(2)
    val arm1 = ids.filter(armOf(_) == 1).take(2)
    def pair(conv: Long, cens: Long) = Seq(
      (conv * 10, "2024-01-01 09:00:00", conv, "view", 1.0),
      (conv * 10 + 1, "2024-01-03 09:00:00", conv, "purchase", 300.0), // t=2, event
      (cens * 10, "2024-01-01 09:00:00", cens, "view", 1.0),
      (cens * 10 + 1, "2024-01-20 09:00:00", cens, "view", 1.0)) // censored, defines horizon
    val rows = (pair(arm0.head, arm0(1)) ++ pair(arm1.head, arm1(1)))
      .map { case (id, ts, u, t, v) =>
        (id, java.sql.Timestamp.valueOf(ts), u, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = fixtureDir("events" -> rows)
    val r = Inference.logrank(spark, d).collect().head
    assert(r.getAs[Long]("o1") === 1L) // arm 1's converter
    assert(math.abs(r.getAs[Double]("e1") - 1.0) < 1e-4) // d=2, n1=n/2
    assert(r.getAs[Double]("chi2") === 0.0)
  }

  test("logrank and survival: non-degenerate on real data") {
    val r = Inference.logrank(spark, SparkSpec.sf0001).collect().head
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Double]("e1") > 0.0)
    assert(r.getAs[Long]("o1") > 0L)
    // the KM curve must actually step down (events exist at this SF)
    val s = Inference.survival(spark, SparkSpec.sf0001).collect()
    assert(s.exists(_.getAs[Long]("n_events") > 0))
    assert(s.map(_.getAs[Double]("survival")).min < 1.0)
  }

  // ----------------------------------------------------------------- welch

  test("welch: identical arms give t = 0; shifted arm flips the sign") {
    // users 3 and 6 land in different arms under the md5 gate; force a
    // known layout instead: find two user ids per arm empirically
    val ids = (1L to 20L).toList
    val armOf = ids.map { u =>
      val h = Integer.parseInt(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(u.toString).substring(0, 2), 16)
      u -> h % 2
    }.toMap
    val arm0 = ids.filter(armOf(_) == 0).take(3)
    val arm1 = ids.filter(armOf(_) == 1).take(3)
    val sameRows = (arm0 ++ arm1).zipWithIndex.map { case (u, i) =>
      (i.toLong, "2024-01-01 10:00:00", u, "purchase", Seq(10.0, 20.0, 30.0)(i % 3))
    }
    val d = fixtureDir("events" -> eventsDf(sameRows: _*))
    val r = Inference.welch(spark, d).collect().head
    assert(r.getAs[Double]("mean_c") === r.getAs[Double]("mean_t"))
    assert(r.getAs[Double]("t_stat") === 0.0)

    val shifted = (arm0.map((_, 10.0)) ++ arm1.map((_, 40.0))).zipWithIndex.map {
      case ((u, v), i) =>
        (i.toLong, "2024-01-01 10:00:00", u, "purchase", Seq(v, v + 5, v + 10)(i % 3))
    }
    val d2 = fixtureDir("events" -> eventsDf(shifted: _*))
    val r2 = Inference.welch(spark, d2).collect().head
    assert(r2.getAs[Double]("mean_t") > r2.getAs[Double]("mean_c"))
    assert(r2.getAs[Double]("t_stat") > 0)
  }

  // ----------------------------------------------------------------- cuped

  test("cuped: a perfectly predictive pre-period zeroes the adjusted lift") {
    // every user spends the same amount pre and post: Y = X, so theta = 1,
    // variance reduction = 1, and the adjusted means collapse to the grand
    // pre-period mean in BOTH arms -> lift_adj = 0 regardless of arm skew
    val rows = (1L to 20L).flatMap { u =>
      val v = 10.0 + u
      Seq((u * 2, "2024-01-01 10:00:00", u, "purchase", v, "{}"),
        (u * 2 + 1, "2024-01-09 10:00:00", u, "purchase", v, "{}"))
    }.map { case (id, ts, u, t, v, p) =>
      (id, java.sql.Timestamp.valueOf(ts), u, t, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = fixtureDir("events" -> rows)
    val r = Inference.cuped(spark, d).collect().head
    assert(math.abs(r.getAs[Double]("theta") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("var_reduction") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("lift_adj")) < 1e-6)
    // the RAW lift is nonzero (arms have different users), proving the
    // adjustment did the work
    assert(math.abs(r.getAs[Double]("mean_t_raw") - r.getAs[Double]("mean_c_raw")) > 1e-6)
  }

  test("cuped: variance reduction bounded on real data") {
    val r = Inference.cuped(spark, SparkSpec.sf0001).collect().head
    val vr = r.getAs[Double]("var_reduction")
    assert(vr >= 0.0 && vr <= 1.0)
    assert(r.getAs[Long]("n_c") > 0 && r.getAs[Long]("n_t") > 0)
  }

  // --------------------------------------------------------------- benford

  // ---------------------------------------------------------------- bh-fdr

  test("bh-fdr: real effect rejected, degenerate metric sorts last unrejected") {
    // the engine's md5 arm, recomputed here so the fixture can plant a
    // true per-arm effect
    def arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      (d(0) & 0xff) % 2
    }
    var id = 0L
    val rows = (1L to 40L).flatMap { u =>
      // strong planted effect + (u % 3) within-arm variance so the Welch
      // denominator is nonzero
      val clicks = (if (arm(u) == 1) 12 else 2) + (u % 3).toInt
      val es = Seq.fill(clicks)("click") ++ Seq("view") // view: zero variance
      es.map { t => id += 1; (id, "2024-01-05 10:00:00", u, t, 5.0) }
    }
    val d = fixtureDir("events" -> eventsDf(rows: _*))
    val out = Inference.bhFdr(spark, d).collect()
    assert(out.map(_.getAs[Long]("m")).distinct.toSeq === Seq(2))
    assert(out.map(_.getAs[Long]("rk")).toSeq === Seq(1L, 2L))
    val click = out.find(_.getAs[String]("event_type") == "click").get
    val view = out.find(_.getAs[String]("event_type") == "view").get
    // the planted 2-vs-12 effect is overwhelmingly significant
    assert(click.getAs[Long]("rk") === 1L)
    assert(click.getAs[Boolean]("rejected"))
    assert(click.getAs[Double]("p") < 1e-6)
    assert(click.getAs[Double]("mean_t") > click.getAs[Double]("mean_c"))
    // zero-variance metric: NULL z/p, ranked after every real p, never rejected
    assert(view.isNullAt(view.fieldIndex("z")))
    assert(view.isNullAt(view.fieldIndex("p")))
    assert(view.getAs[Long]("rk") === 2L)
    assert(!view.getAs[Boolean]("rejected"))
  }

  test("bh-fdr: harness data — ranks complete, p monotone, reject set is the BH prefix") {
    val out = Inference.bhFdr(spark, SparkSpec.sf0001).collect().sortBy(_.getAs[Long]("rk"))
    assert(out.nonEmpty)
    val m = out.head.getAs[Long]("m")
    assert(out.map(_.getAs[Long]("rk")).toSeq === (1L to m).toSeq)
    // p monotone non-decreasing over rank, all in (0, 1]
    val ps = out.flatMap(r =>
      if (r.isNullAt(r.fieldIndex("p"))) None else Some(r.getAs[Double]("p")))
    assert(ps.toSeq === ps.sorted.toSeq)
    assert(ps.forall(p => p > 0 && p <= 1.0))
    // BH self-consistency: rejected ⇔ rank ≤ max{k : p(k) ≤ k·q/m},
    // recomputed independently from the returned p-values
    val kmax = out.flatMap { r =>
      if (r.isNullAt(r.fieldIndex("p"))) None
      else if (r.getAs[Double]("p") <= r.getAs[Long]("rk") * 0.05 / m)
        Some(r.getAs[Long]("rk"))
      else None
    }.sorted.lastOption.getOrElse(0L)
    out.foreach { r =>
      assert(r.getAs[Boolean]("rejected") === (r.getAs[Long]("rk") <= kmax),
        s"${r.getAs[String]("event_type")}")
    }
  }

  test("benford: shares sum to 1, digits complete, chi2 non-negative") {
    val li = (1 to 90).map(i =>
      (i.toLong, 1L, 1L, 1, 1.0, i * 111.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val d = fixtureDir("lineitem" -> li)
    val rows = graft.operators.Inference.benford(spark, d).collect()
    assert(rows.map(_.getAs[Int]("digit")).sorted.toSeq === (1 to 9))
    val shareSum = rows.map(_.getAs[Double]("obs_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
    assert(rows.forall(_.getAs[Double]("chi2_contrib") >= 0))
    val benfordSum = rows.map(_.getAs[Double]("benford_share")).sum
    assert(math.abs(benfordSum - 1.0) < 1e-3)
  }

  // ------------------------------------------------------------- conformal

  test("conformal: exact linear target gives a zero band with full coverage") {
    // y = 5*x1 exactly for every user -> train OLS recovers it, every
    // calibration/test residual is 0 cents -> q_hat = 0, coverage = 1
    var id = 0L
    def e(ts: String, u: Long, t: String, v: Double) = {
      id += 1; (id, ts, u, t, v)
    }
    val rows = (1L to 60L).flatMap { u =>
      (1 to (u % 5 + 1).toInt).map(i =>
        e(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:30", u, "view", 0)) ++
        (1 to (u % 3).toInt).map(i => // clicks vary so the design has rank 3
          e(f"2024-01-02 01:$i%02d:00", u, "click", 0)) :+
        e("2024-01-10 10:00:00", u, "purchase", 5.0 * (u % 5 + 1))
    }
    val r = Inference.conformal(spark, fixtureDir("events" -> eventsDf(rows: _*)))
      .collect().head
    val (nt, ncal, nte) = (r.getAs[Long]("n_train"), r.getAs[Long]("n_cal"),
      r.getAs[Long]("n_test"))
    assert(nt + ncal + nte === 60L)
    // the md5 3-way split is replayable
    def sp(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cp|$u".getBytes("UTF-8"))
      (d(0) & 0xff) % 3
    }
    assert(nt === (1L to 60L).count(sp(_) == 0).toLong)
    assert(ncal === (1L to 60L).count(sp(_) == 1).toLong)
    assert(r.getAs[Double]("q_hat") === 0.0)
    assert(r.getAs[Double]("coverage") === 1.0)
  }

  test("conformal: too-few calibration points pin the infinite-interval path") {
    // 3 users: at most ~1 calibration user; k = ceil((n_cal+1)*0.9) then
    // exceeds n_cal -> q_hat NULL, coverage 1.0 by definition
    var id = 0L
    def e(u: Long, v: Double) = {
      id += 1; (id, "2024-01-01 10:00:00", u, "purchase", v)
    }
    val r = Inference.conformal(spark,
      fixtureDir("events" -> eventsDf((1L to 3L).map(u => e(u, u * 1.0)): _*)))
      .collect().head
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") +
      r.getAs[Long]("n_test") === 3L)
    assert(r.isNullAt(r.fieldIndex("q_hat")))
    // degenerate train fit (< 4 users) -> NULL coverage; a healthy fit
    // with an empty-ish calibration would instead pin coverage = 1.0
    assert(r.isNullAt(r.fieldIndex("coverage")) ||
      r.getAs[Double]("coverage") === 1.0)
  }

  // ----------------------------------------------------------- permutation

  test("permutation: planted effect, all 100 re-randomizations replayed") {
    def md5b(s: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d(0) & 0xff
    }
    def arm(u: Long) = md5b(u.toString) % 2
    def parm(p: Int, u: Long) = md5b(s"perm|$p|$u") % 2
    var id = 0L
    def e(u: Long, v: Double) = {
      id += 1; (id, "2024-01-01 10:00:00", u, "purchase", v)
    }
    // effect aligned with the REAL arm: treatment $100, control $1
    val rows = (1L to 30L).map(u => e(u, if (arm(u) == 1) 100.0 else 1.0))
    val d = fixtureDir("events" -> eventsDf(rows: _*))
    val y = (1L to 30L).map(u =>
      u -> (if (arm(u) == 1) 10000L else 100L)).toMap
    def diff(a: Long => Int): Option[Long] = {
      val t = (1L to 30L).filter(a(_) == 1)
      val c = (1L to 30L).filter(a(_) == 0)
      if (t.isEmpty || c.isEmpty) None
      else Some(t.map(y).sum * 1000000L / t.size -
        c.map(y).sum * 1000000L / c.size)
    }
    val dObs = diff(arm).get
    val perms = (0 until Inference.PermCount).flatMap(p => diff(parm(p, _)))
    val nExt = perms.count(dp => math.abs(dp) >= math.abs(dObs)).toLong
    val r = Inference.permutation(spark, d).collect().head
    assert(r.getAs[Long]("n_users") === 30L)
    assert(r.getAs[Long]("n_t") + r.getAs[Long]("n_c") === 30L)
    assert(r.getAs[Double]("diff_dollars") ===
      math.floor(dObs / 1e8 * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Long]("n_perms") === perms.size.toLong)
    assert(r.getAs[Long]("n_extreme") === nExt)
    assert(r.getAs[Double]("p_value") ===
      math.floor((1.0 + nExt) / (1.0 + perms.size) * 1e6 + 0.5) / 1e6)
    // a 30-user aligned effect is unreachable by chance re-randomization
    assert(r.getAs[Double]("p_value") < 0.05)
  }

  // ----------------------------------------------------------------- ridge

  test("ridge: exact linear target recovered at lambda=0, shrunk monotonically") {
    // user u: u pre-views, (u mod 3) pre-clicks, post spend exactly 5u dollars
    var id = 0L
    def e(ts: String, u: Long, t: String, v: Double) = {
      id += 1; (id, ts, u, t, v)
    }
    val rows = (1L to 20L).flatMap { u =>
      (1 to u.toInt).map(i => e(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:30", u, "view", 0)) ++
        (1 to (u % 3).toInt).map(i => e(f"2024-01-02 01:$i%02d:00", u, "click", 0)) :+
        e("2024-01-10 10:00:00", u, "purchase", 5.0 * u)
    }
    val d = fixtureDir("events" -> eventsDf(rows: _*))
    val out = Inference.ridge(spark, d).collect()
      .map(r => r.getAs[Long]("lambda") -> r).toMap
    assert(out.keySet === Inference.RidgeLambdas.toSet)
    val ols = out(0L)
    assert(ols.getAs[Double]("b1") === 5.0)
    assert(ols.getAs[Double]("b2") === 0.0)
    assert(ols.getAs[Double]("b0") === 0.0)
    // shrinkage path: |b1| strictly decreases as lambda grows
    val path = Inference.RidgeLambdas.map(l => out(l).getAs[Double]("b1"))
    assert(path === path.sortBy(-_), s"not monotone: $path")
    assert(path.last < 5.0)
    out.values.foreach(r => assert(r.getAs[Long]("n_users") === 20L))
  }
}
