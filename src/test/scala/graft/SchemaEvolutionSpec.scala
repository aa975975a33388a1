package graft

import org.apache.spark.sql.functions._

/** Lake-schema evolution: a table directory whose older files lack newly
  * added columns must still read as ONE relation (mergeSchema), with the
  * missing columns null-filled — the append-only evolution contract a
  * 100 TB lake depends on. */
class SchemaEvolutionSpec extends SparkSuite {
  import spark.implicits._

  test("mergeSchema unions file schemas and null-fills missing columns") {
    val dir = java.nio.file.Files.createTempDirectory("evo").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)

    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq == Seq("id", "score", "v"))
    assert(df.count() == 4)
    val scores = df.select("id", "score").collect()
      .map(r => r.getAs[Long]("id") -> Option(r.get(1))).toMap
    assert(scores(1L).isEmpty && scores(2L).isEmpty)
    assert(scores(3L).contains(30.0) && scores(4L).contains(40.0))
    // filters on the evolved column still push down over old files
    assert(df.filter(col("score") > 35.0).count() == 1)
  }
}
