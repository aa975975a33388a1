package graft

import graft.functions.KmvSketch
import graft.operators.Dedup

/** KMV sketch aggregator: invariants of the buffer algebra and estimate
  * accuracy of the registered query. */
class KmvSketchSpec extends SparkSuite {

  private val agg = KmvSketch.aggregator

  test("reduce keeps the k smallest distinct values, sorted") {
    val hashes = (1 to 100).map(i => f"${(i * 37) % 100}%032x")
    val buf = hashes.foldLeft(agg.zero)(agg.reduce)
    assert(buf.length === KmvSketch.K)
    assert(buf.toSeq === hashes.distinct.sorted.take(KmvSketch.K))
  }

  test("merge is equivalent to reducing the concatenation, in any split") {
    val hs = (1 to 60).map(i => f"${i * 977 % 997}%032x")
    val whole = hs.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(0, 10, 30, 59)) {
      val (a, b) = hs.splitAt(cut)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(merged.toSeq === whole.toSeq, s"cut=$cut")
    }
  }

  test("duplicates do not grow the sketch") {
    val buf = Seq("aa", "bb", "aa", "bb", "aa").foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq === Seq("aa", "bb"))
  }

  test("registered query estimates per-source distinct counts within 50%") {
    import org.apache.spark.sql.functions._
    val out = Dedup.kmvBySource(spark, SparkSpec.sf0001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("est_distinct")).toMap
    val exact = graft.sources.Tables.documents(spark, SparkSpec.sf0001)
      .groupBy(col("source"))
      .agg(countDistinct(md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    assert(out.nonEmpty)
    out.foreach { case (src, est) =>
      val n = exact(src).toDouble
      // k=16 sketch: loose bound, deterministic data
      assert(est > n * 0.5 && est < n * 2.0, s"$src: est=$est exact=$n")
    }
  }

  test("weekly rollup from daily sketches equals the direct weekly sketch bit-for-bit") {
    import org.apache.spark.sql.functions._
    val dir = SparkSpec.sf0001
    val kmv = udaf(agg)
    val base = graft.sources.Tables.events(spark, dir).select(
      expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7").as("wk"),
      to_date(col("ts")).as("day"), col("event_type"),
      md5(col("user_id").cast("string")).as("h"))
    val fromDaily = base.groupBy(col("wk"), col("day"), col("event_type"))
      .agg(kmv(col("h")).as("kmv"))
      .select(col("wk"), col("event_type"), explode(col("kmv")).as("h"))
      .groupBy(col("wk"), col("event_type")).agg(kmv(col("h")).as("kmv"))
    val direct = base.groupBy(col("wk"), col("event_type")).agg(kmv(col("h")).as("kmv"))
    val j = fromDaily.alias("a").join(direct.alias("b"), Seq("wk", "event_type"))
      .select(col("a.kmv").as("ka"), col("b.kmv").as("kb")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }
}
