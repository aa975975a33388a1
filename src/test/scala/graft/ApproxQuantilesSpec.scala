package graft

import graft.operators.Scans
import org.apache.spark.sql.functions._

/** Bounds the approx_percentile sketch against the exact per-group sort:
  * Greenwald-Khanna guarantees rank error <= n/Accuracy, which for the
  * near-uniform l_extendedprice distribution translates to a small relative
  * value error. This is the registered scale path's error contract. */
class ApproxQuantilesSpec extends SparkSuite {
  import spark.implicits._

  test("approx quantiles within 2% of exact at sf0.001") {
    val dir = SparkSpec.sf0001
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_returnflag"), col("q25"), col("q50"), col("q75"))
        .as[(String, Double, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val exact = toMap(Scans.quantiles(spark, dir))
    val approx = toMap(Scans.quantilesApprox(spark, dir))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(flag)
      Seq((a25, e25), (a50, e50), (a75, e75)).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.02, s"group $flag: approx $a vs exact $e")
      }
    }
  }

  test("histogram quantile pins the type-1 ceil(q·n) convention on small groups") {
    // n=2, q=0.75: type-1 picks the 2nd element (ceil(1.5)=2) where
    // DuckDB quantile_disc's floor(q·(n-1))+1 picks the 1st — the exact
    // (n, q) family the oracle SQL was rewritten to pin (ADVICE r3).
    val vals = Seq(("A", 1000L), ("A", 2000L), ("B", 1L), ("B", 2L), ("B", 3L))
      .toDF("l_returnflag", "cents")
    val got = Scans.type1CentsQuantiles(vals)
      .as[(String, Double, Double, Double)].collect()
      .map { case (g, q25, q50, q75) => g -> ((q25, q50, q75)) }.toMap
    // A (n=2): q25 -> ceil(0.5)=1st, q50 -> ceil(1)=1st, q75 -> ceil(1.5)=2nd
    assert(got("A") == ((10.0, 10.0, 20.0)))
    // B (n=3): q25 -> ceil(0.75)=1st, q50 -> ceil(1.5)=2nd, q75 -> ceil(2.25)=3rd
    assert(got("B") == ((0.01, 0.02, 0.03)))
  }
}
