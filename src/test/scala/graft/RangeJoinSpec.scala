package graft

import graft.operators.Events
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Bucketized range join: plan must be an equi-join (never a nested-loop),
  * result must equal the naive range predicate. */
class RangeJoinSpec extends SparkSuite {

  test("bucketized range join is an equi-join and matches the naive form") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketized = Events.eventPairsRange(spark, SparkSpec.sf0001)
      val plan = bucketized.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), s"range join fell back to nested loop:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))

      val e = Tables.events(spark, SparkSpec.sf0001)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val a = e.alias("a")
      val b = e.alias("b")
      val naive = a.join(b,
          col("a.user_id") === col("b.user_id") &&
            col("a.event_id") < col("b.event_id") &&
            abs(col("a.us") - col("b.us")) <= Events.RangeUs)
        .select(col("a.event_id").as("id_a"), col("b.event_id").as("id_b"),
          (col("b.us") - col("a.us")).as("dt_us"))
      assert(bucketized.count() === naive.count())
      assert(bucketized.exceptAll(naive).isEmpty && naive.exceptAll(bucketized).isEmpty)
      assert(naive.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
