package graft

import graft.sources.{Compaction, Tables}
import org.apache.spark.sql.functions._

/** Compaction: many small files in, few right-sized files out, content
  * identical, and within-file sort makes parquet row-group stats selective. */
class CompactionSpec extends SparkSuite {

  test("compacts a fragmented directory into derived-count files, content-identical") {
    val src = java.nio.file.Files.createTempDirectory("cmp_src").toString + "/t"
    val out = java.nio.file.Files.createTempDirectory("cmp_out").toString + "/t"
    Tables.lineitem(spark, SparkSpec.sf0001).repartition(64)
      .write.mode("overwrite").parquet(src) // 64 tiny files
    val smallFiles = new java.io.File(src).listFiles().count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 64)

    val target = math.max(1L, Compaction.dirBytes(src) / 4) // aim for ~4 files
    val n = Compaction.compact(spark, src, out, target, sortCols = Seq("l_orderkey"))
    val outFiles = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(outFiles == n && n <= 5)

    val a = spark.read.parquet(src)
    val b = spark.read.parquet(out)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("range-clustered compaction gives files with disjoint key ranges") {
    val src = java.nio.file.Files.createTempDirectory("cmp2_src").toString + "/t"
    val out = java.nio.file.Files.createTempDirectory("cmp2_out").toString + "/t"
    Tables.lineitem(spark, SparkSpec.sf0001).repartition(8)
      .write.mode("overwrite").parquet(src)
    Compaction.compact(spark, src, out,
      math.max(1L, Compaction.dirBytes(src) / 4), sortCols = Seq("l_orderkey"))
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(perFile.length >= 2)
    // disjoint (range-partitioned) file key ranges: a filter on any key
    // value touches exactly one file
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
  }
}
