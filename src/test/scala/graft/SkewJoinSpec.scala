package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Evidence for the skew playbook: on a deliberately skewed key, AQE's
  * runtime skew-split and the plan-level salted join produce the identical
  * relation, and AQE actually splits the hot partition (skew=true in the
  * final adaptive plan). Timings are logged so the pattern has numbers
  * attached, not just a comment. */
class SkewJoinSpec extends SparkSuite {

  // one hot order key carrying 200k lineitem rows + 20k spread rows;
  // prices are hash-derived so the hot partition's shuffle bytes can't
  // compress away below the skew threshold
  private lazy val dir = {
    val hot = spark.range(200000).select(
      lit(1L).as("l_orderkey"),
      (col("id") % 7 + 1).cast("int").as("l_linenumber"),
      (abs(hash(col("id"))) % 100000 / 100.0).as("l_extendedprice"))
    val spread = spark.range(20000).select(
      (col("id") % 2000 + 2).as("l_orderkey"),
      (col("id") % 7 + 1).cast("int").as("l_linenumber"),
      (abs(hash(col("id") + 7)) % 100000 / 100.0).as("l_extendedprice"))
    val orders = spark.range(2002).select(
      (col("id") + 1).as("o_orderkey"),
      (col("id") % 500).as("o_custkey"),
      when(col("id") % 3 === 0, "F").otherwise("O").as("o_orderstatus"))
    // MANY map tasks are load-bearing: AQE splits a skewed reduce partition
    // into contiguous MAPPER ranges — with a single input file (one mapper)
    // there is nothing to split. 8 files + small maxPartitionBytes (set in
    // the test) → 8 mappers.
    val d = java.nio.file.Files.createTempDirectory("graft_skew").toString
    hot.union(spread).repartition(8).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    orders.coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  test("AQE skew-split and salted join agree on a pathologically skewed key") {
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // test-scale thresholds: the hot partition is ~hundreds of KB, not GB
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // one scan task per fixture file so the shuffle has 8 mappers
      spark.conf.set("spark.sql.files.maxPartitionBytes", "524288")
      spark.conf.set("spark.sql.files.openCostInBytes", "65536")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      val aqeJoin = graft.operators.Kpis.joinItemsOrders(spark, dir)
      // execute THIS DataFrame (count() would spawn a separate
      // QueryExecution and leave this adaptive plan un-finalized)
      val (aqeCount, tAqe) = timed(
        aqeJoin.queryExecution.toRdd.mapPartitions(it => Iterator(it.size.toLong)).sum())
      val plan = aqeJoin.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan not executed:\n$plan")
      assert(plan.contains("skew=true"), s"expected AQE skew split in plan:\n$plan")

      val (saltedCount, tSalt) = timed(Skew.joinSalted(spark, dir).count())
      info(f"AQE skew-split: $tAqe%.2fs; salted: $tSalt%.2fs (220k rows, 1 hot key)")
      assert(aqeCount.toLong === saltedCount)

      val a = aqeJoin
      val s = Skew.joinSalted(spark, dir)
      assert(a.exceptAll(s).isEmpty && s.exceptAll(a).isEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
