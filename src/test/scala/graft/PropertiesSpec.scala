package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY.md §5): randomized small relations,
  * checked with scalacheck driving Spark jobs (few trials — each trial is a
  * Spark job). */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val keysGen = Gen.listOfN(30, Gen.chooseNum(1L, 15L))

  test("anti-join is empty iff every fact key has a dimension row") {
    holds(Prop.forAll(keysGen, keysGen) { (factKeys, dimKeys) =>
      val fact = factKeys.toDF("k")
      val dim = dimKeys.distinct.toDF("id")
      val violations = fact.join(dim, fact("k") === dim("id"), "left_anti").count()
      val expectEmpty = factKeys.toSet.subsetOf(dimKeys.toSet)
      (violations == 0) == expectEmpty
    })
  }

  test("group-count duplicate detection is empty iff keys are unique") {
    holds(Prop.forAll(keysGen) { keys =>
      val dups = keys.toDF("k").groupBy("k").count().filter("count > 1").count()
      (dups == 0) == (keys.distinct.size == keys.size)
    })
  }

  test("fan-out return_rate >= order-based return_rate (the §2.9.1 quirk)") {
    val ordersGen = Gen.listOfN(8, Gen.zip(Gen.chooseNum(1L, 6L), Gen.oneOf("returned", "delivered")))
    val itemCountGen = Gen.listOfN(8, Gen.chooseNum(1, 4))
    holds(Prop.forAll(ordersGen, itemCountGen) { (orderList, itemCounts) =>
      val orders = orderList.distinctBy(_._1)
      val items = orders.zip(itemCounts).flatMap { case ((oid, _), n) =>
        (1 to n).map(i => (oid, i))
      }
      if (items.isEmpty) true
      else {
        val o = orders.toDF("order_id", "status")
        val it = items.toDF("order_id", "item_id")
        val joined = o.join(it, "order_id")
        val row = joined.agg(
          (count(when(col("status") === "returned", 1)) /
            countDistinct(col("order_id"))).as("fanout_rate"),
          (countDistinct(when(col("status") === "returned", col("order_id"))) /
            countDistinct(col("order_id"))).as("order_rate")).head()
        row.getDouble(0) >= row.getDouble(1) - 1e-9
      }
    })
  }

  test("roundN is within half an ulp-of-scale and idempotent") {
    val dGen = Gen.chooseNum(-1e6, 1e6)
    holds(Prop.forAll(Gen.listOfN(40, dGen)) { xs =>
      val rows = xs.toDF("x")
        .select(graft.functions.Rounding.roundN(col("x"), 2).as("r"), col("x"))
        .collect()
      rows.forall { r =>
        val (rv, x) = (r.getDouble(0), r.getDouble(1))
        math.abs(rv - x) <= 0.005 + 1e-9 &&
        math.abs(rv * 100 - math.rint(rv * 100)) < 1e-6 // lands on a 2-decimal grid
      }
    })
  }

  test("native top-k equals a reference sort-take on random relations") {
    val rowsGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(-50, 50), Gen.chooseNum(0, 999)))
    val kGen = Gen.chooseNum(1, 8)
    holds(Prop.forAll(rowsGen, kGen) { (rows, k) =>
      // unique (v, id) per group so the expected set is well-defined
      val distinctRows = rows.distinct
      val df = distinctRows.toDF("g", "v", "id")
      val native = graft.plans.TopK
        .topK(df, Seq("g"), Seq(("v", true), ("id", false)), k)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      val want = distinctRows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy { case (_, v, id) => (-v, id) }.take(k)
      }.toSet
      native == want
    })
  }

  test("max_by_longs equals a reference fold on random relations with nulls") {
    val rowsGen = Gen.listOfN(40, Gen.zip(
      Gen.chooseNum(0, 3).map(_.toLong),
      Gen.option(Gen.chooseNum(-100L, 100L)),
      Gen.chooseNum(0L, 999L),
      Gen.chooseNum(0L, 999L)))
    holds(Prop.forAll(rowsGen) { rows =>
      // unique ord per group so the winner is well-defined
      val clean = rows.groupBy(r => (r._1, r._2)).values.map(_.head).toList
      val df = clean.toDF("g", "ord", "a", "b")
      val got = df.groupBy(col("g"))
        .agg(call_function("max_by_longs", col("ord"), col("a"), col("b")).as("m"))
        .select(col("g"), col("m.v1"), col("m.v2"))
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toMap
      val want = clean.groupBy(_._1).map { case (g, rs) =>
        val defined = rs.filter(_._2.isDefined)
        g -> (if (defined.isEmpty) None
              else { val w = defined.maxBy(_._2.get); Some((w._3, w._4)) })
      }
      got == want
    })
  }
}
