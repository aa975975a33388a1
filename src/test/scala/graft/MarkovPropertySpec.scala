package graft

import graft.operators.MarkovAttribution
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: the 40-step quantized value iteration lands within the
  * truncation+quantization tolerance of the EXACT absorbing-chain
  * solution (Gaussian elimination on the same transition structure),
  * for random journey corpora. */
class MarkovPropertySpec extends SparkSuite {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(6)

  /** Exact absorption probability from START by solving (I − Q)p = R·1
    * over the transient states of the same edge derivation the operator
    * uses (segments re-open after purchase; last event absorbs NULL). */
  private def exactPConv(journeys: Seq[Seq[String]]): Double = {
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    def add(s: String, t: String): Unit =
      edges((s, t)) = edges.getOrElse((s, t), 0L) + 1L
    journeys.foreach { es =>
      var prev = "START"
      es.foreach { t =>
        if (t == "purchase") { add(prev, "CONV"); prev = "START" }
        else { add(prev, t); prev = t }
      }
      if (prev != "START") add(prev, "NULL_END")
      else if (es.nonEmpty && es.last == "purchase") () // segment closed
    }
    val states = edges.keys.flatMap(k => Seq(k._1, k._2))
      .filter(s => s != "CONV" && s != "NULL_END").toSeq.distinct.sorted
    if (!states.contains("START")) return 0.0
    val n = states.size
    val idx = states.zipWithIndex.toMap
    val outTot = states.map(s =>
      s -> edges.collect { case ((`s`, _), c) => c }.sum).toMap
    // A p = b with A = I − Q, b = P(s → CONV)
    val a = Array.tabulate(n, n + 1) { (i, j) =>
      val s = states(i)
      if (j == n) edges.getOrElse((s, "CONV"), 0L).toDouble / outTot(s)
      else {
        val q = edges.getOrElse((s, states(j)), 0L).toDouble / outTot(s)
        (if (i == j) 1.0 else 0.0) - q
      }
    }
    // Gaussian elimination with partial pivoting
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(a(r)(c)))
      val tmp = a(c); a(c) = a(p); a(p) = tmp
      for (r <- 0 until n if r != c && a(c)(c) != 0.0) {
        val f = a(r)(c) / a(c)(c)
        for (j <- c to n) a(r)(j) -= f * a(c)(j)
      }
    }
    a(idx("START"))(n) / a(idx("START"))(idx("START"))
  }

  test("40-step quantized absorption tracks the exact linear solve") {
    val journeyGen = Gen.listOfN(6,
      Gen.nonEmptyListOf(Gen.frequency(3 -> "a", 3 -> "b", 2 -> "purchase"))
        .map(_.take(8)))
    val prop = Prop.forAll(journeyGen) { js =>
      val rows = js.zipWithIndex.flatMap { case (es, u) =>
        es.zipWithIndex.map { case (t, i) =>
          ((u * 100 + i).toLong,
            java.sql.Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"),
            (u + 1).toLong, t, 1.0, "{}")
        }
      }
      if (rows.isEmpty) true
      else {
        val d = fixtureDir("events" -> rows
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
        val out = MarkovAttribution.removalEffect(spark, d).collect()
        val want = exactPConv(js)
        if (out.isEmpty) math.abs(want) < 1e-9 // no channels -> no rows
        else {
          val got = out.head.getAs[Double]("p_conv")
          // tolerance: 40-step truncation (≤ ~hazard^40) + per-step
          // micro-quantization drift (≤ steps·states·0.5e-6)
          math.abs(got - want) < 5e-4
        }
      }
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }
}
