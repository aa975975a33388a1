package graft

import graft.sources.Catalog
import org.apache.spark.sql.functions._

/** SQL entry surface + the RewriteSelfDot optimizer rule. */
class SqlSurfaceSpec extends SparkSuite {
  import spark.implicits._

  test("registered views answer the flagship KPI query via spark.sql") {
    Catalog.registerViews(spark, SparkSpec.sf0001)
    val out = spark.sql(
      """SELECT p_brand, CAST(l_shipdate AS DATE) AS d,
        |  round(sum(l_extendedprice), 2) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 5""".stripMargin)
    assert(out.count() === 5)
    // events view exposes the converted microsecond timestamp
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL")
      .head().getLong(0) > 0)
  }

  test("vec_dot(a, a) is rewritten to vec_norm2 by the optimizer rule") {
    // parquet-backed input — a literal would be constant-folded away before
    // the rewrite is observable
    val df = graft.sources.Tables.embeddings(spark, SparkSpec.sf0001)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(call_function("vec_dot", col("v"), col("v")).as("n2"))
    assert(df.queryExecution.optimizedPlan.toString.contains("vec_norm2"))
    val viaNorm = df.head().getDouble(0)
    val manual = graft.sources.Tables.embeddings(spark, SparkSpec.sf0001)
      .select(aggregate(transform(col("embedding").cast("array<double>"), x => x * x),
        lit(0.0), (acc, v) => acc + v).as("m")).head().getDouble(0)
    assert(viaNorm === manual)
  }

  test("vec_dot(a, b) with distinct args is NOT rewritten") {
    val df = Seq((Array(1.0), Array(2.0))).toDF("a", "b")
      .select(call_function("vec_dot", col("a"), col("b")).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("vec_norm2"))
    assert(df.head().getDouble(0) === 2.0)
  }

  test("vec_norm2 is directly callable and matches the sum of squares") {
    val out = spark.sql("SELECT vec_norm2(array(3.0d, 4.0d)) AS n").head().getDouble(0)
    assert(out === 25.0)
  }
}
