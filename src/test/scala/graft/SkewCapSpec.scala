package graft

import graft.operators.{Analytics, Events}
import java.sql.Timestamp

/** Skew guards for the pair/sequence-generating analytics (round-3
  * verdict ask #6): a synthetic mega-basket / mega-user shows the capped
  * variants bound per-group fan-out to a constant, where the uncapped
  * forms are O(group²) pairs or one O(group·log) single-task sort. */
class SkewCapSpec extends SparkSuite {
  import spark.implicits._

  test("mega-basket: capped pair volume is C(BasketCap,2), not C(|basket|,2)") {
    // three identical pathological baskets of 300 items (ids 1000+, so
    // their pairs are unique to them and clear MinSupport=3), plus small
    // normal baskets
    val mega = (997 to 999).flatMap(o => (0 until 300).map(i => (o.toLong, 1000L + i)))
    val normal = (1 to 50).flatMap(o => Seq((o.toLong, 1L), (o.toLong, 2L), (o.toLong, 3L)))
    val d = fixtureDir("lineitem" -> (mega ++ normal).toDF("l_orderkey", "l_partkey"))

    val capped = Analytics.basketAffinityCapped(spark, d).collect()
    val megaPairs = capped.filter(_.getAs[Long]("part_a") >= 1000L)
    // the deterministic hash keeps the SAME BasketCap items in each of the
    // three identical baskets, so exactly C(BasketCap,2) pairs survive
    val bound = Analytics.BasketCap * (Analytics.BasketCap - 1) / 2
    assert(megaPairs.length === bound,
      s"expected C(${Analytics.BasketCap},2)=$bound mega pairs, got ${megaPairs.length}")
    megaPairs.foreach(r => assert(r.getAs[Long]("n_pair") === 3L))
    // the uncapped form would emit C(300,2) = 44850 pairs per basket —
    // the per-task blow-up the cap exists to prevent
    assert(bound < 300 * 299 / 2)
    // normal baskets (3 items < cap) are untouched: identical to uncapped
    val small = capped.filter(_.getAs[Long]("part_a") < 1000L)
    val uncappedSmall = Analytics.basketAffinity(spark, d).collect()
      .filter(_.getAs[Long]("part_a") < 1000L)
    assert(small.map(_.toString).sorted.toSeq === uncappedSmall.map(_.toString).sorted.toSeq)
  }

  test("mega-user: capped journey contributes JourneyCap-1 transitions, not |events|-1") {
    // one bot user with 5000 events (uncapped: a single 5000-row window
    // sort task and 4999 transitions) + one small user
    val t0 = 1700000000000L
    val bot = (0 until 5000).map(i =>
      (i.toLong, new Timestamp(t0 + i * 1000L), 7L, if (i % 2 == 0) "view" else "click"))
    val small = (0 until 3).map(i =>
      (10000L + i, new Timestamp(t0 + i * 1000L), 8L, "view"))
    val d = fixtureDir("events" ->
      (bot ++ small).toDF("event_id", "ts", "user_id", "event_type"))

    val capped = Events.transitionMatrixCapped(spark, d).collect()
    val total = capped.map(_.getAs[Long]("n")).sum
    // bot contributes JourneyCap-1 transitions, small user 2
    assert(total === (Events.JourneyCap - 1) + 2L,
      s"expected ${Events.JourneyCap + 1} total transitions, got $total")
    // the prefix preserves real adjacency: alternating view/click only
    val fromView = capped.filter(r => r.getAs[String]("from_type") == "view"
      && r.getAs[String]("to_type") == "click").map(_.getAs[Long]("n")).sum
    assert(fromView === Events.JourneyCap / 2)
  }
}
