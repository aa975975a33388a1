package graft

import org.apache.spark.sql.functions._

/** Native vec_dot expression: value correctness, codegen/interpreted
  * agreement, null propagation, SQL registration via GraftExtensions. */
class VectorExpressionSpec extends SparkSuite {
  import spark.implicits._

  test("vec_dot computes the sequential dot product") {
    val out = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(call_function("vec_dot", col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(out === 32.0)
  }

  test("vec_dot matches the interpreted HOF formulation bit-for-bit") {
    val df = Seq.tabulate(50) { i =>
      val r = new scala.util.Random(i)
      (Array.fill(64)(r.nextDouble() - 0.5), Array.fill(64)(r.nextDouble() - 0.5))
    }.toDF("a", "b")
    val rows = df.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("vec_dot is callable from SQL (extension-registered)") {
    val out = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(out === 11.0)
  }

  test("null input propagates to null; mismatched lengths truncate") {
    val out = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a," +
        " vec_dot(array(2.0d, 9.0d), array(3.0d)) AS b").head()
    assert(out.isNullAt(0))
    assert(out.getDouble(1) === 6.0)
  }

  test("type check rejects non-double arrays") {
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array('x'), array('y'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
