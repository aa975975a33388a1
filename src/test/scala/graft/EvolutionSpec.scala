package graft

import graft.sources.Evolution
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Schema-evolution and nested-pruning invariants the hash compare can't
  * see: NULL provenance of the added column, and the pruned ReadSchema. */
class EvolutionSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  private val dir = SparkSpec.sf0001

  test("merged scan: pre-evolution rows carry NULL exactly for even keys") {
    val rows = Evolution.evolvedScan(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val even = r.getLong(0) % 2 == 0
      assert(r.isNullAt(2) == even,
        s"key=${r.getLong(0)} status=${if (r.isNullAt(2)) "null" else r.getString(2)}")
    }
  }

  test("nested scan pushes a one-subfield ReadSchema into the parquet scan") {
    val df = Evolution.nestedScan(spark, dir)
    df.collect()
    val scans = collect(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val schema = scans.head.requiredSchema.catalogString
    assert(schema.contains("o_custkey"), schema)
    assert(!schema.contains("o_orderstatus") && !schema.contains("o_totalprice"),
      s"nested pruning failed; ReadSchema=$schema")
  }
}
