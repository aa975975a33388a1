package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-dimensional file skipping.
  *
  * Range-sorting a table by ONE column makes parquet min/max stats
  * selective for that column and useless for every other; a 100 TB table
  * queried by both `x` and `y` needs a layout where file boundaries cut
  * BOTH dimensions. Interleaving the bits of the two (rank-normalized)
  * values walks the 2-D space along a Morton curve, so a range partition
  * over the z-value gives every output file a bounded box in (x, y):
  * x-only, y-only, and box predicates all skip most files.
  *
  * Plan shape: one 4-value min/max agg (metadata-scale collect) → narrow
  * z-value projection (all codegen'd bitwise ops — shiftleft/AND/OR, no
  * UDF) → ONE range shuffle on z → sortWithinPartitions(z) → write. Same
  * cost as the single-column compaction pass (sources/Compaction.scala);
  * only the clustering key changes.
  */
object ZOrder {

  /** Spread 16 bits across 32 (classic Morton magic constants), as
    * codegen'd Column arithmetic. */
  private def spread(c: Column): Column = {
    var x = c
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Interleave two 16-bit lanes into one 32-bit z-value. */
  def zValue(x16: Column, y16: Column): Column =
    spread(x16).bitwiseOR(shiftleft(spread(y16), 1))

  /** Min/max-normalize a numeric column to the 0..65535 lane. */
  def lane(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else least(lit(65535L),
      floor((c.cast("double") - lo) / (hi - lo) * 65536.0).cast("long"))

  /** Write `df` as `nFiles` parquet files z-ordered on (cx, cy). */
  def write(df: DataFrame, outDir: String, cx: String, cy: String, nFiles: Int): Unit = {
    val Row(loX, hiX, loY, hiY) = df.agg(
      min(col(cx)).cast("double"), max(col(cx)).cast("double"),
      min(col(cy)).cast("double"), max(col(cy)).cast("double")).head()
    val z = zValue(
      lane(col(cx), loX.asInstanceOf[Double], hiX.asInstanceOf[Double]),
      lane(col(cy), loY.asInstanceOf[Double], hiY.asInstanceOf[Double]))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
