package graft

import graft.functions.Rounding
import org.apache.spark.sql.functions._

/** Engine-portable rounding (the Spark-vs-DuckDB tie hazard, SURVEY §7.5). */
class RoundingSpec extends SparkSuite {
  import spark.implicits._

  private def r2(xs: Double*): Seq[Double] =
    xs.toDF("x").select(Rounding.roundN(col("x"), 2).as("r"))
      .collect().map(_.getDouble(0)).toSeq

  test("roundN rounds plain values like round half-up") {
    assert(r2(1.234, 1.235, 1.236, 0.0, 12.005) === Seq(1.23, 1.24, 1.24, 0.0, 12.01))
  }

  test("roundN is consistent on binary near-ties (the q_kpi_category case)") {
    // 36360.715 is binary 36360.71499…: Spark round() says .72 (shortest-repr
    // HALF_UP), DuckDB says .71 (binary). roundN must give the binary answer.
    assert(r2(36360.715) === Seq(36360.71))
  }

  test("roundN matches SQL text form evaluated by Spark") {
    val viaSql = Seq(36360.715, 1.235).toDF("x")
      .selectExpr(Rounding.roundNSql("x", 2) + " AS r")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql === r2(36360.715, 1.235))
  }

  test("roundN at scale 4 and 6") {
    val out = Seq((0.06254, 0.1234565)).toDF("a", "b")
      .select(Rounding.roundN(col("a"), 4).as("a4"), Rounding.roundN(col("b"), 6).as("b6"))
      .head()
    assert(out.getDouble(0) === 0.0625)
    assert(math.abs(out.getDouble(1) - 0.123456) < 1e-9 ||
      math.abs(out.getDouble(1) - 0.123457) < 1e-9) // binary-tie either way, deterministic
  }
}
