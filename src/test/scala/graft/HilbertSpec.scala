package graft

import graft.sources.{Hilbert, Tables}
import org.apache.spark.sql.functions._

/** Hilbert curve (sources/Hilbert.scala): the HOF expression must BE the
  * curve — equal to the independent imperative xy2d everywhere, a
  * bijection on the full grid, with every consecutive step grid-adjacent
  * (the locality property Z-order lacks, and the entire reason this
  * operator exists). */
class HilbertSpec extends SparkSuite {
  import spark.implicits._

  private val n = Hilbert.GridN.toInt

  test("expression equals the imperative xy2d on the full 256x256 grid") {
    val pts = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("x"),
        pmod(col("id"), lit(n)).cast("long").as("y"))
    val got = pts.select(col("x"), col("y"),
        Hilbert.hilbertIndex(col("x"), col("y")).as("h"))
      .as[(Long, Long, Long)].collect()
    assert(got.length === n * n)
    val bad = got.filter { case (x, y, h) => h != Hilbert.xy2d(x, y) }
    assert(bad.isEmpty, s"${bad.length} mismatches, e.g. ${bad.take(3).mkString(", ")}")
    // bijection: every cell a distinct index covering [0, n^2)
    val hs = got.map(_._3)
    assert(hs.distinct.length === n * n)
    assert(hs.min === 0L && hs.max === (n.toLong * n - 1))
  }

  test("every step of the imperative curve is grid-adjacent (no Z seams)") {
    val inv = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n)
      inv(Hilbert.xy2d(x, y).toInt) = (x, y)
    val nonAdjacent = (0 until n * n - 1).count { d =>
      val (x1, y1) = inv(d); val (x2, y2) = inv(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(nonAdjacent === 0)
  }

  test("hilbert buckets have tighter envelopes than z-order buckets on the orders audit") {
    def area(df: org.apache.spark.sql.DataFrame): Double =
      df.select(((col("cust_max") - col("cust_min") + 1) *
          (col("day_max") - col("day_min") + 1)).cast("double").as("a"))
        .agg(avg(col("a"))).head().getDouble(0)
    val hil = area(graft.operators.Layout.hilbertAudit(spark, SparkSpec.sf0001))
    val zor = area(graft.operators.Layout.zorderAudit(spark, SparkSpec.sf0001))
    info(f"mean bucket envelope area: hilbert=$hil%.0f zorder=$zor%.0f")
    // adjacency means a Hilbert range never spans a Z seam; its average
    // bucket box must not be materially worse than Morton's
    assert(hil <= zor * 1.1, s"hilbert=$hil zorder=$zor")
  }

  test("hilbert-clustered write skips files a z-write cannot be beaten by (scan metrics)") {
    val base = java.nio.file.Files.createTempDirectory("hilbert").toString
    val li = Tables.lineitem(spark, SparkSpec.sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    Hilbert.write(li, s"$base/h", "l_orderkey", "l_partkey", 16)
    val total = li.count()
    assert(spark.read.parquet(s"$base/h").count() === total) // lossless
    val mmX = li.agg(min("l_orderkey"), max("l_orderkey")).head()
    val mmY = li.agg(min("l_partkey"), max("l_partkey")).head()
    val (loX, hiX) = (mmX.getLong(0), mmX.getLong(0) + (mmX.getLong(1) - mmX.getLong(0)) / 10)
    val (loY, hiY) = (mmY.getLong(0), mmY.getLong(0) + (mmY.getLong(1) - mmY.getLong(0)) / 10)
    val df = spark.read.parquet(s"$base/h")
      .filter(col("l_orderkey").between(loX, hiX) && col("l_partkey").between(loY, hiY))
    df.queryExecution.toRdd.count()
    val scanned = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numOutputRows").value
    }.sum
    info(s"hilbert box scan read $scanned of $total rows after footer pruning")
    assert(scanned <= total / 2, s"read $scanned of $total")
  }
}
