package graft

import org.apache.spark.sql.functions._

/** Native multi-column declarative argmax (functions/MaxByLong.scala):
  * hash-aggregable where the builtin max_by(struct, ord) degrades to
  * SortAggregate. */
class MaxByLongSpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq(
    (1L, 10L, 100L, 7L), (1L, 30L, 300L, 8L), (1L, 20L, 200L, 9L),
    (2L, 5L, 50L, 1L)).toDF("g", "ord", "a", "b")

  test("equals the builtin max_by(struct, ord)") {
    val ours = df.groupBy(col("g"))
      .agg(call_function("max_by_longs", col("ord"), col("a"), col("b")).as("m"))
      .select(col("g"), col("m.v1"), col("m.v2"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val builtin = df.groupBy(col("g"))
      .agg(max_by(struct(col("a"), col("b")), col("ord")).as("m"))
      .select(col("g"), col("m.a"), col("m.b"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(ours === builtin)
    assert(ours(1L) === ((300L, 8L)))
  }

  test("plans HashAggregate where the builtin struct form falls to SortAggregate") {
    val ours = df.groupBy(col("g"))
      .agg(call_function("max_by_longs", col("ord"), col("a"), col("b")))
    val oursPlan = ours.queryExecution.executedPlan.toString
    assert(oursPlan.contains("HashAggregate"), s"expected hash agg:\n$oursPlan")
    assert(!oursPlan.contains("SortAggregate"), s"unexpected sort agg:\n$oursPlan")
    val builtin = df.groupBy(col("g"))
      .agg(max_by(struct(col("a"), col("b")), col("ord")))
    val builtinPlan = builtin.queryExecution.executedPlan.toString
    assert(builtinPlan.contains("SortAggregate"),
      s"builtin struct max_by unexpectedly hash-aggregated (Spark fixed it?):\n$builtinPlan")
  }

  test("null ordering keys are skipped; all-null group yields null") {
    val d = Seq(
      (1L, Some(2L), 20L, 1L), (1L, None, 99L, 2L),
      (3L, None, 1L, 3L)).toDF("g", "ord", "a", "b")
    val rows = d.groupBy(col("g"))
      .agg(call_function("max_by_longs", col("ord"), col("a"), col("b")).as("m"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toMap
    assert(rows(1L) === false)
    assert(rows(3L) === true)
  }

  test("callable from SQL with any champion arity") {
    df.createOrReplaceTempView("mbl")
    val out = spark.sql(
      "SELECT g, max_by_longs(ord, a, b, a + b) AS m FROM mbl GROUP BY g ORDER BY g")
      .selectExpr("m.v1", "m.v2", "m.v3").collect()
    assert(out.head.getLong(0) === 300L)
    assert(out.head.getLong(2) === 308L)
  }
}
