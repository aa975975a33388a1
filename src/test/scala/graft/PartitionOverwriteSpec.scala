package graft

import org.apache.spark.sql.functions._

/** Dynamic partition overwrite: `INSERT OVERWRITE` replaces ONLY the
  * partitions the incoming batch touches — the daily-reload contract for
  * hive-layout tables (static mode would wipe the whole table root). */
class PartitionOverwriteSpec extends SparkSuite {
  import spark.implicits._

  test("dynamic mode replaces touched partitions and preserves the rest") {
    val dir = java.nio.file.Files.createTempDirectory("dyn_overwrite").toString + "/t"
    val day1 = Seq((1L, "a", "d1"), (2L, "a", "d1"), (3L, "b", "d1"))
      .toDF("id", "part", "payload")
    day1.write.partitionBy("part").parquet(dir)

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the day-2 reload only carries partition 'a' — rewritten in place
      Seq((10L, "a", "d2")).toDF("id", "part", "payload")
        .write.mode("overwrite").partitionBy("part").parquet(dir)
      val got = spark.read.parquet(dir)
        .select(col("id"), col("part"), col("payload"))
        .as[(Long, String, String)].collect().toSet
      assert(got === Set((10L, "a", "d2"), (3L, "b", "d1")),
        s"partition b must survive, partition a must be replaced: $got")

      // contrast: static mode wipes everything else
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      Seq((20L, "a", "d3")).toDF("id", "part", "payload")
        .write.mode("overwrite").partitionBy("part").parquet(dir)
      assert(spark.read.parquet(dir).count() === 1)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
