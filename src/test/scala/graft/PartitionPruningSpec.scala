package graft

import graft.pipeline.KeyedSink
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Partition-pruned reads over the keyed sink layout: a filter on the
  * partition column must reach the scan as a PartitionFilter (directories
  * skipped entirely), not a data filter — the property that makes the keyed
  * layout a lookup structure at 100 TB. */
class PartitionPruningSpec extends SparkSuite {

  test("filter on the partition key becomes a PartitionFilter, pruning files") {
    val out = java.nio.file.Files.createTempDirectory("pp").toString + "/byflag"
    KeyedSink.write(
      Tables.lineitem(spark, SparkSpec.sf0001)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag")),
      out, Seq("l_returnflag"))

    val q = spark.read.parquet(out).filter(col("l_returnflag") === "R")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("l_returnflag"),
      s"partition filter not pushed:\n$plan")

    // and only the R directory's rows are read
    val expected = Tables.lineitem(spark, SparkSpec.sf0001)
      .filter(col("l_returnflag") === "R").count()
    assert(q.count() === expected)
  }

  test("column selection prunes the read schema at the parquet scan") {
    val q = Tables.lineitem(spark, SparkSpec.sf0001).select(col("l_orderkey"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint>"),
      s"expected 1-column ReadSchema:\n$plan")
  }

  test("registered q_scan_partitioned plans a PartitionFilter on source") {
    val df = graft.operators.Scans.scanPartitioned(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(source"),
      s"source predicate must prune directories, not rows:\n$plan")
    // the data filter list must NOT carry the partition predicate
    assert(!plan.contains("PushedFilters: [IsNotNull(source"),
      s"partition key leaked into data filters:\n$plan")
    assert(df.count() === 25) // one source's share at sf0.001 (500/20)
  }
}
