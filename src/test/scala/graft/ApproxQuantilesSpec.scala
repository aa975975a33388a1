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
}
