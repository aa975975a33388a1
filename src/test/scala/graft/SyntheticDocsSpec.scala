package graft

import org.apache.spark.sql.functions._

/** DataSource V2 machinery: split planning, column pruning, determinism. */
class SyntheticDocsSpec extends SparkSuite {

  private def read(rows: Int, parts: Int) =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  test("generates exactly `rows` distinct ids across `partitions` splits") {
    val df = read(1000, 8)
    assert(df.count() === 1000)
    assert(df.select("doc_id").distinct().count() === 1000)
    assert(df.rdd.getNumPartitions === 8)
    // uneven split: 10 rows over 3 partitions still covers every id
    assert(read(10, 3).select("doc_id").distinct().count() === 10)
  }

  test("column pruning reaches the source: ReadSchema drops text") {
    val pruned = read(100, 2).select("doc_id", "lang")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("doc_id"))
    assert(!scan.contains("text"), s"text not pruned from scan: $scan")
  }

  test("content is the documented closed form and stable across reads") {
    val row = read(50, 4).filter(col("doc_id") === 13L).collect().head
    // id 13: lang = langs(1) = "de", 4 words of "w6"
    assert(row.getAs[String]("lang") === "de")
    assert(row.getAs[String]("text") === "w6 w6 w6 w6")
    assert(row.getAs[Long]("n_chars") === 11L)
    val a = read(200, 5).collect().map(_.toString).sorted.toSeq
    val b = read(200, 7).collect().map(_.toString).sorted.toSeq
    assert(a === b) // partitioning never changes content
  }

  test("short name resolves via ServiceLoader: .format and SQL CREATE TABLE USING") {
    val viaFormat = spark.read.format("graft-docs")
      .option("rows", "40").option("partitions", "3").load()
    assert(viaFormat.count() === 40)
    spark.sql("DROP TABLE IF EXISTS graft_docs_sql")
    spark.sql(
      "CREATE TABLE graft_docs_sql USING `graft-docs` OPTIONS (rows '40', partitions '3')")
    try {
      val viaSql = spark.sql("SELECT doc_id, lang FROM graft_docs_sql")
      assert(viaSql.count() === 40)
      assert(viaSql.columns.toSeq === Seq("doc_id", "lang"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_docs_sql")
  }
}
