package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — the locality-optimal sibling of
  * [[ZOrder]]. A Morton (Z-order) curve has "seams": consecutive z values
  * can jump across the whole grid, so a range chunk occasionally carries a
  * huge min/max envelope. The Hilbert curve (Hilbert 1891; xy2d algorithm
  * as published on the public literature's standard bit-twiddling form)
  * visits every cell of the 2^k × 2^k grid with EVERY step adjacent, so
  * equal-size index ranges have provably tighter bounding boxes — the
  * reason Delta/Iceberg added Hilbert after Z-order.
  *
  * Implementation: the per-level rotate-and-accumulate loop is expressed
  * as ONE `aggregate` higher-order function over the constant array of
  * level scales — the expression tree is level-count-INDEPENDENT (an
  * unrolled `when` chain would grow ~4^levels nodes and blow past the
  * codegen method limit), and evaluation is still a tight per-row loop.
  * The DuckDB oracle unrolls the same arithmetic as a chained-CTE ladder
  * (`Layout.hilbertSql`) because DuckDB 1.0's `list_reduce` mis-evaluates
  * CASE branches inside struct lambdas (verified during round 7).
  *
  * Scale shape: identical to [[ZOrder.write]] — one 4-value min/max agg,
  * one narrow index projection, one range shuffle, sorted files.
  */
object Hilbert {

  /** Bits per dimension: 8 → a 256×256 grid, 65536 cells — far more
    * resolution than any realistic file count needs. */
  val OrderBits = 8
  val GridN: Long = 1L << OrderBits

  /** Hilbert index of a normalized (x, y) cell, both in [0, 2^OrderBits).
    * The classic xy2d loop: at each scale s (descending powers of two),
    * emit the quadrant digit (3·rx)⊕ry and rotate the remaining
    * coordinates into the sub-square's frame. */
  def hilbertIndex(x0: Column, y0: Column): Column = {
    val scales = array((1 to OrderBits).map(i => lit(GridN >> i)): _*)
    val init = struct(
      x0.cast("long").as("x"), y0.cast("long").as("y"), lit(0L).as("d"))
    val folded = aggregate(scales, init, (acc, s) => {
      val x = acc.getField("x")
      val y = acc.getField("y")
      val d = acc.getField("d")
      val rx = when(x.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
      val nd = (d + s * s * (lit(3L) * rx).bitwiseXOR(ry)).cast("long")
      val nx = when(ry === 0,
        when(rx === 1, lit(GridN - 1) - y).otherwise(y)).otherwise(x).cast("long")
      val ny = when(ry === 0,
        when(rx === 1, lit(GridN - 1) - x).otherwise(x)).otherwise(y).cast("long")
      struct(nx.as("x"), ny.as("y"), nd.as("d"))
    })
    folded.getField("d")
  }

  /** Reference imperative xy2d (same public algorithm) — the independent
    * implementation HilbertSpec checks the expression against. */
  def xy2d(x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = GridN / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = GridN - 1 - x; y = GridN - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Write `df` as `nFiles` parquet files Hilbert-clustered on (cx, cy) —
    * the drop-in locality upgrade of [[ZOrder.write]]. */
  def write(df: DataFrame, outDir: String, cx: String, cy: String, nFiles: Int): Unit = {
    val Row(loX, hiX, loY, hiY) = df.agg(
      min(col(cx)).cast("long"), max(col(cx)).cast("long"),
      min(col(cy)).cast("long"), max(col(cy)).cast("long")).head()
    // integer `div`, not double division: a double quotient is lossy past
    // 2^53 and this normalization must stay exact for arbitrary keys
    def norm(c: String, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else expr(s"least(${GridN - 1}L, ((CAST($c AS BIGINT) - ${lo}L) * ${GridN}L)" +
        s" div (${hi}L - ${lo}L + 1L))")
    val h = hilbertIndex(
      norm(cx, loX.asInstanceOf[Long], hiX.asInstanceOf[Long]),
      norm(cy, loY.asInstanceOf[Long], hiY.asInstanceOf[Long]))
    df.withColumn("__h", h)
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(outDir)
  }
}
