package graft

import graft.sources.SyntheticEvents
import org.apache.spark.sql.functions._

/** The events/sales decade generators: deterministic under resharding,
  * statistically harness-shaped, and consumable by every query the bench
  * decade times (a small point materialized exactly like the bench pass). */
class SyntheticEventsSpec extends SparkSuite {

  test("events generator is repartition-stable and harness-shaped") {
    val a = SyntheticEvents.events(spark, 2000, partitions = 4).collect()
    val b = SyntheticEvents.events(spark, 2000, partitions = 13).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)

    val df = SyntheticEvents.events(spark, 2000)
    val types = df.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Zipf-ish mix: view dominates, signup is the tail
    assert(types("view") > types("click") && types("click") > types("purchase"))
    assert(types.keySet === Set("view", "click", "purchase", "error", "signup"))
    val (users, minTs, maxTs) = {
      val r = df.agg(countDistinct(col("user_id")), min(col("ts")), max(col("ts"))).head()
      (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))
    }
    assert(users > 20 && users <= 2000 / SyntheticEvents.EventsPerUser + 1)
    assert(minTs.getTime / 1000 >= SyntheticEvents.StartUs / 1000000)
    assert(maxTs.getTime / 1000 <
      SyntheticEvents.StartUs / 1000000 + SyntheticEvents.SpanDays * 86400)
    // money: 2-decimal doubles survive the cents round-trip exactly
    assert(df.filter(
      floor(col("value") * 100 + 0.5) / 100.0 =!= col("value")).count() === 0)
  }

  test("sales generators hold the harness ratios and key closure") {
    val items = SyntheticEvents.lineitem(spark, 4000)
    val orders = SyntheticEvents.orders(spark, 4000)
    val part = SyntheticEvents.part(spark, 4000)
    assert(orders.count() === 1000) // 4 items per order
    // every FK resolves (the KPI star join drops nothing)
    assert(items.join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() === 0)
    assert(items.join(part, col("l_partkey") === col("p_partkey"), "left_anti")
      .count() === 0)
    // log-uniform partkey: the hottest product is well above uniform share
    val top = items.groupBy("l_partkey").count().agg(max("count")).head().getLong(0)
    assert(top > 3 * 4000 / math.max(100, 4000 / 30))
  }

  test("a materialized point feeds every decade-benched query") {
    val dir = java.nio.file.Files.createTempDirectory("synth_events_pt").toString
    SyntheticEvents.writePoint(spark, dir, 3000)
    val names = Seq("q_kpi_category", "q_events_session", "q_join_range_events",
      "q_events_attribution", "q_events_rfm", "q_events_mau")
    names.foreach { n =>
      val q = Registry.all.find(_.name == n).get
      assert(q.run(spark, dir).count() > 0, s"$n returned no rows on the synthetic point")
    }
  }
}
