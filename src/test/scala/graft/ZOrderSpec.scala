package graft

import graft.sources.ZOrder
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Z-order clustering (sources/ZOrder.scala): correctness of the Morton
  * arithmetic plus the file-skipping property it exists for — measured as
  * how many output files' min/max boxes overlap a predicate, the exact
  * statistic parquet row-group/file pruning uses. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("zValue interleaves bits (hand-checked mortons)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    // morton(3,5) = interleave(011, 101) = y2 x2 y1 x1 y0 x0 = 100111 = 39
    assert(out === Array(0L, 1L, 2L, 39L, 4294967295L))
  }

  test("lane normalization is monotone and clamps to 0..65535") {
    val out = Seq(10.0, 20.0, 30.0).toDF("v")
      .select(ZOrder.lane(col("v"), 10.0, 30.0).as("l")).as[Long].collect()
    assert(out(0) === 0L && out(2) === 65535L && out(1) === 32768L)
    // degenerate range collapses to lane 0
    val z = Seq(5.0).toDF("v").select(ZOrder.lane(col("v"), 5.0, 5.0).as("l"))
      .as[Long].head()
    assert(z === 0L)
  }

  /** files whose [min,max]×[min,max] box overlaps the predicate ranges */
  private def overlapping(dir: String, xr: Option[(Long, Long)], yr: Option[(Long, Long)]): Int = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey"), min("l_partkey"), max("l_partkey"))
        .head()
      val xOk = xr.forall { case (lo, hi) => r.getLong(1) >= lo && r.getLong(0) <= hi }
      val yOk = yr.forall { case (lo, hi) => r.getLong(3) >= lo && r.getLong(2) <= hi }
      xOk && yOk
    }
  }

  private lazy val (zDir, xDir, nFiles) = {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val li = Tables.lineitem(spark, SparkSpec.sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val n = 16
    ZOrder.write(li, s"$base/z", "l_orderkey", "l_partkey", n)
    // comparison layout: range-clustered on x only
    li.repartitionByRange(n, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$base/x")
    (s"$base/z", s"$base/x", n)
  }

  test("z-order preserves the data (same rows, same aggregates)") {
    val a = spark.read.parquet(zDir).agg(count(lit(1)), sum("l_quantity")).head()
    val b = Tables.lineitem(spark, SparkSpec.sf0001)
      .agg(count(lit(1)), sum("l_quantity")).head()
    assert(a === b)
  }

  /** Execute a filtered scan and return (scan-output rows, files read) —
    * scan-output rows counts rows in row groups that SURVIVED parquet
    * footer min/max pruning (the execution-level evidence the envelope
    * audit can't give). */
  private def scanMetrics(dir: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
    val df = spark.read.parquet(dir).filter(pred)
    df.queryExecution.toRdd.count() // execute so metrics populate
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    (scans.map(_.metrics("numOutputRows").value).sum,
      scans.map(_.metrics("numFiles").value).sum)
  }

  test("row-group skipping is real at EXECUTION: the z-layout scan reads a fraction of the rows (round-6 verdict #7)") {
    val total = spark.read.parquet(zDir).count()
    val mmX = spark.read.parquet(zDir).agg(min("l_orderkey"), max("l_orderkey")).head()
    val mmY = spark.read.parquet(zDir).agg(min("l_partkey"), max("l_partkey")).head()
    val (loX, hiX) = (mmX.getLong(0), mmX.getLong(0) + (mmX.getLong(1) - mmX.getLong(0)) / 10)
    val (loY, hiY) = (mmY.getLong(0), mmY.getLong(0) + (mmY.getLong(1) - mmY.getLong(0)) / 10)
    val box = col("l_orderkey").between(loX, hiX) && col("l_partkey").between(loY, hiY)

    val (zRows, zFiles) = scanMetrics(zDir, box)
    val (xRows, xFiles) = scanMetrics(xDir, col("l_partkey").between(loY, hiY))
    info(s"scan rows surviving footer pruning: z-layout box=$zRows of $total ($zFiles files); " +
      s"x-layout y-slab=$xRows of $total ($xFiles files)")
    // the x-sorted layout is blind to partkey: footer pruning passes every
    // row group, so the scan emits (about) the whole table
    assert(xRows >= (total * 9) / 10, s"x-layout y-pred scan read $xRows of $total")
    // the z-layout's bounded boxes let footer pruning drop most row
    // groups for the 1%-selectivity box predicate
    assert(zRows <= total / 2, s"z-layout box scan read $zRows of $total")
    assert(zRows < xRows)
  }

  test("z-order prunes on BOTH dimensions; x-sort prunes only on x") {
    val (loX, hiX) = { // ~10% slab of orderkey
      val mm = spark.read.parquet(zDir).agg(min("l_orderkey"), max("l_orderkey")).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      (lo, lo + (hi - lo) / 10)
    }
    val (loY, hiY) = {
      val mm = spark.read.parquet(zDir).agg(min("l_partkey"), max("l_partkey")).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      (lo, lo + (hi - lo) / 10)
    }
    val zx = overlapping(zDir, Some((loX, hiX)), None)
    val zy = overlapping(zDir, None, Some((loY, hiY)))
    val xx = overlapping(xDir, Some((loX, hiX)), None)
    val xy = overlapping(xDir, None, Some((loY, hiY)))
    info(s"files overlapping: z-layout x-pred=$zx y-pred=$zy; x-layout x-pred=$xx y-pred=$xy of $nFiles")
    // the x-sorted layout is blind to y: every file overlaps a y-slab
    assert(xy === nFiles)
    // z-order skips most files on EITHER dimension
    assert(zx <= nFiles / 2, s"z-layout should skip half the files on x ($zx)")
    assert(zy <= nFiles / 2, s"z-layout should skip half the files on y ($zy)")
    assert(zy < xy)
  }
}
