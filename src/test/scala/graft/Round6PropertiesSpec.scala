package graft

import graft.operators.{AsOf, Concurrency, Events, ModelEval}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the round-6 continuation operators:
  * each distributed result is checked against a direct in-memory
  * reference implementation on randomized small relations. */
class Round6PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision

  test("asOfJoin equals the brute-force latest-at-or-before reference") {
    val rowsGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 20L)))
    holds(Prop.forAll(rowsGen, rowsGen) { (leftRaw, rightRaw) =>
      val left = leftRaw.distinct.zipWithIndex
        .map { case ((k, t), i) => (k, ts(t * 60000000L), i.toLong, 0.0) }
      val right = rightRaw.distinct
        .map { case (k, t) => (k, ts(t * 60000000L), t.toDouble) }
      if (left.isEmpty || right.isEmpty) true
      else {
        val got = AsOf.asOfJoin(
          left.toDF("user_id", "ts", "event_id", "value"),
          right.toDF("user_id", "ts", "value"),
          "user_id", "ts", Seq("value")).collect()
          .map(r => r.getAs[Long]("event_id") ->
            Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap
        val want = left.map { case (k, t, id, _) =>
          val cands = right.filter(r => r._1 == k && !r._2.after(t))
          id -> (if (cands.isEmpty) None
                 else Some(cands.maxBy(_._2.getTime)._3))
        }.toMap
        got == want
      }
    })
  }

  test("aucOf equals the pairwise concordance reference (ties = half)") {
    val scGen = Gen.listOfN(20,
      Gen.zip(Gen.chooseNum(0L, 6L), Gen.oneOf(0.0, 1.0)))
    holds(Prop.forAll(scGen) { sc =>
      if (sc.isEmpty) true
      else {
        val row = ModelEval.aucOf(sc.toDF("mu", "y")).collect()(0)
        val pos = sc.filter(_._2 == 1.0).map(_._1)
        val neg = sc.filter(_._2 == 0.0).map(_._1)
        if (pos.isEmpty || neg.isEmpty) row.isNullAt(row.fieldIndex("auc"))
        else {
          val num = (for (p <- pos; n <- neg) yield
            if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
          val want = num / (pos.size.toDouble * neg.size)
          math.abs(row.getAs[Double]("auc") - want) < 1e-6
        }
      }
    })
  }

  test("funnelStepsOf equals the greedy chain reference per step") {
    val steps = Seq("a", "b", "c")
    val evGen = Gen.listOfN(25, Gen.zip(
      Gen.chooseNum(1L, 4L), Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 30L)))
    holds(Prop.forAll(evGen) { raw =>
      val ev = raw.distinct.zipWithIndex.map { case ((u, t, m), i) =>
        (i.toLong, ts(m * 60000000L), u, t, 1.0)
      }
      if (ev.isEmpty) true
      else {
        val got = Events.funnelStepsOf(
          ev.toDF("event_id", "ts", "user_id", "event_type", "value"), steps)
          .collect().map(r => r.getAs[Int]("step_no") -> r.getAs[Long]("n_users")).toMap
        // reference: per user walk the chain greedily on (ts, strict >)
        val byUser = ev.groupBy(_._3)
        val reached = byUser.values.map { es =>
          var tPrev: Option[Long] = None
          var k = 0
          var continue = true
          for (st <- steps if continue) {
            val cands = es.filter(e => e._4 == st &&
              tPrev.forall(p => e._2.getTime > p)).map(_._2.getTime)
            if (cands.isEmpty) continue = false
            else { tPrev = Some(cands.min); k += 1 }
          }
          k
        }.toSeq
        steps.indices.forall { i =>
          got(i + 1) == reached.count(_ >= i + 1).toLong
        }
      }
    })
  }

  test("maxConcurrentOf equals the instant-sweep reference") {
    // events on one calendar day + some near midnight to exercise carry
    val evGen = Gen.listOfN(14, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 3000L)))
    holds(Prop.forAll(evGen) { raw =>
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val ev = raw.distinct.zipWithIndex.map { case ((u, m), i) =>
        (i.toLong, new java.sql.Timestamp(base + m * 60000L), u, "click", 1.0)
      }
      if (ev.isEmpty) true
      else {
        val got = Concurrency.maxConcurrentOf(
          ev.toDF("event_id", "ts", "user_id", "event_type", "value")).collect()
          .map(r => r.getAs[java.sql.Date]("day").toString ->
            r.getAs[Long]("max_concurrent")).toMap
        // reference: 30-min-gap sessions per user, then evaluate the open
        // count at day start and after every boundary (starts before ends
        // at ties)
        val sessions = ev.groupBy(_._3).values.flatMap { es =>
          val sorted = es.map(_._2.getTime).sorted
          val runs = sorted.foldLeft(List.empty[(Long, Long)]) {
            case (acc, t) => acc match {
              case (s, e) :: rest if t - e < 30 * 60000L => (s, t) :: rest
              case _ => (t, t) :: acc
            }
          }
          runs
        }.toSeq
        val bounds = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
          .sortBy { case (t, d) => (t, -d) } // +1 before -1 at ties
        val days = bounds.map(b => new java.sql.Date(b._1).toString).distinct
        val want = days.map { day =>
          var run = 0L
          var carry = 0L
          var mx = Long.MinValue
          var dayStartSeen = false
          bounds.foreach { case (t, d) =>
            val bd = new java.sql.Date(t).toString
            if (bd < day) carry += d
            else if (bd == day) {
              if (!dayStartSeen) { mx = math.max(mx, carry); dayStartSeen = true; run = carry }
              run += d
              mx = math.max(mx, run)
            }
          }
          day -> mx
        }.toMap
        got == want
      }
    })
  }
}
