package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-maintenance pass that keeps a 100 TB
  * lake scannable. Streaming sinks and incremental ingests leave thousands
  * of KB-scale files per partition; every downstream scan then pays one
  * task + one footer read per file. Compaction rewrites a directory into
  * ~`targetBytes` files, optionally sorted within each file so parquet
  * min/max row-group stats become selective (poor-man's clustering — the
  * same reason warehouses Z-order).
  *
  * Plan shape: one scan → ONE shuffle (round-robin for plain compaction;
  * RANGE partitioning when sort columns are given, so each output file
  * covers a disjoint key range and predicate pushdown skips whole FILES,
  * not just row groups) → sortWithinPartitions (no extra shuffle) →
  * write. Output file count derives from actual input bytes, not a
  * guessed constant.
  */
object Compaction {

  /** Bytes on disk of one parquet directory (driver-side listing — file
    * metadata only, never data). */
  def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }

  /** Compact `inDir` (parquet) into `outDir` with ~targetBytes files,
    * sorted within files by `sortCols` when given. Returns the file count
    * written. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024, sortCols: Seq[String] = Nil): Int = {
    val nFiles = math.max(1, math.ceil(dirBytes(inDir).toDouble / targetBytes).toInt)
    val in = spark.read.parquet(inDir)
    val sorted =
      if (sortCols.isEmpty) in.repartition(nFiles)
      else in.repartitionByRange(nFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    sorted.write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
