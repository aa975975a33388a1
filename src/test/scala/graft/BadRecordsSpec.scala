package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Malformed-input semantics for the reference's CSV surface: PERMISSIVE
  * (default) quarantines bad rows into _corrupt_record, DROPMALFORMED
  * silently drops, FAILFAST aborts — the three contracts an ingest
  * pipeline chooses between. The reference reads CSVs with explicit
  * schemas but never states a policy; this pins each mode's behavior. */
class BadRecordsSpec extends SparkSuite {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("badcsv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "data.csv"),
      """id,price
        |1,10.5
        |2,not_a_number
        |3,30.0
        |4,
        |""".stripMargin)
    d
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("price", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE quarantines unparseable rows with the raw line intact") {
    val df = spark.read.schema(schema).option("header", "true")
      .option("mode", "PERMISSIVE").csv(dir).cache()
    // cache first: _corrupt_record cannot be queried alone (Spark refuses
    // a filter on only the corrupt column of a lazy scan)
    df.count()
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("_corrupt_record") === "2,not_a_number")
    // row 4's empty price is a legal NULL, not a corrupt row
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() === 3)
    df.unpersist()
  }

  test("DROPMALFORMED drops the bad row — but ONLY if the bad column is read") {
    val df = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("header", "true").option("mode", "DROPMALFORMED").csv(dir)
    // full-row read: the malformed price is parsed, the row drops
    assert(df.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3, 4))
    // pruned read: only `id` is parsed, so the malformed price is never
    // seen and the row SURVIVES — the column-pruning/mode interaction
    // every CSV ingest at scale must know about
    val spark0 = spark
    import spark0.implicits._
    assert(df.select(col("id")).as[Int].collect().sorted.toSeq === Seq(1, 2, 3, 4))
  }

  test("FAILFAST aborts the scan on the first bad row") {
    val e = intercept[Exception] {
      spark.read.schema(StructType(schema.fields.dropRight(1)))
        .option("header", "true").option("mode", "FAILFAST").csv(dir).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("malformed") || msg.contains("FAILFAST"))
  }
}
