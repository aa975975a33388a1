package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when one join side carries a
  * selective filter, Catalyst injects a bloom filter built from that side
  * into the OTHER side's scan — rows that cannot join are dropped before
  * the shuffle. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling the ~matching slice; here we assert the
  * rewrite actually fires and preserves results. */
class RuntimeFilterSpec extends SparkSuite {

  test("selective dimension filter injects might_contain on the fact side") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test-scale: the default application-side threshold is 10GB
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val li = Tables.lineitem(spark, SparkSpec.sf0001)
      val o = Tables.orders(spark, SparkSpec.sf0001)
        .filter(col("o_orderstatus") === "F" && col("o_custkey") % 100 === 0)
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(li("l_orderkey"), col("o_custkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter in the optimized plan:\n$plan")

      // and the rewrite is semantics-preserving
      val expected = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        val r = li.join(o, li("l_orderkey") === o("o_orderkey"))
          .select(li("l_orderkey"), col("o_custkey")).collect().toSeq
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        r
      }
      assert(joined.collect().toSeq.sortBy(_.toString) == expected.sortBy(_.toString))
      assert(expected.nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
