package graft

import graft.sources.{Bucketing, Tables}

/** Co-located bucketed join: same result as the shuffle join, with ZERO
  * exchange in the physical plan. */
class BucketingSpec extends SparkSuite {

  test("bucketed fact-to-fact join runs without any exchange") {
    Bucketing.writeBucketed(Tables.lineitem(spark, SparkSpec.sf0001)
      .select("l_orderkey", "l_linenumber", "l_extendedprice"),
      "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(Tables.orders(spark, SparkSpec.sf0001)
      .select("o_orderkey", "o_custkey", "o_orderstatus"),
      "o_bucketed", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast plan so the exchange-free claim is meaningful
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")

      // and it computes the same relation as the plain shuffle join
      val li = Tables.lineitem(spark, SparkSpec.sf0001)
      val o = Tables.orders(spark, SparkSpec.sf0001)
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      assert(joined.count() === plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("q_join_bucketed: registered query plan is shuffle-free and matches the plain join") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = Bucketing.bucketedItemsOrders(spark, SparkSpec.sf0001)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected zero Exchange nodes:\n$plan")
      val li = Tables.lineitem(spark, SparkSpec.sf0001)
      val o = Tables.orders(spark, SparkSpec.sf0001)
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "o_custkey", "o_orderstatus")
      assert(q.exceptAll(plain).isEmpty && plain.exceptAll(q).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("aggregation on the bucket key also skips the exchange") {
    val agg = spark.table("li_bucketed")
      .groupBy("l_orderkey").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected bucket-pruned aggregation:\n$plan")
  }
}
