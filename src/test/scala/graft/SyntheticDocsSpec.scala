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

  test("scale-bench corpus: deterministic, harness-shaped, LSH-findable near-dups") {
    import graft.sources.SyntheticDocs
    val n = 2000L
    // partitioning-invariant determinism (pure function of doc_id)
    val a = SyntheticDocs.corpus(spark, n, 4).collect().map(_.toString).sorted.toSeq
    val b = SyntheticDocs.corpus(spark, n, 9).collect().map(_.toString).sorted.toSeq
    assert(a === b)

    val df = SyntheticDocs.corpus(spark, n, 8).cache()
    assert(df.count() === n)
    assert(df.columns.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    // harness shape: 10-100 organic words/doc (+9-word boilerplate head on
    // 1-in-10 docs), 31-word vocabulary, 5 langs
    val wc = df.select(size(split(col("text"), " ")).as("w"))
      .agg(min(col("w")), max(col("w")), avg(col("w"))).collect().head
    assert(wc.getInt(0) >= 10 && wc.getInt(1) <= 110)
    assert(wc.getDouble(2) > 45 && wc.getDouble(2) < 65)
    val vocab = df.select(explode(split(col("text"), " ")).as("t"))
      .select(countDistinct(col("t"))).collect().head.getLong(0)
    assert(vocab === 31L)
    assert(df.select(countDistinct(col("lang"))).collect().head.getLong(0) === 5L)

    // the injected near-dups are FOUND by the production LSH pipeline,
    // so the synthetic scale points exercise the same candidate+verify
    // path the harness corpus does
    val dir = fixtureDir("documents" -> df)
    val pairs = graft.operators.NearDup.minhashPairs(spark, dir).cache()
    val found = pairs.count()
    // ~5% dup rate at 10% noise: a majority of injected dups must verify
    assert(found >= n / SyntheticDocs.DupStride / 2, s"only $found pairs")
    assert(pairs.filter(col("jaccard") < graft.operators.NearDup.JaccardThreshold).count() === 0)

    // DF-pruned LSH: candidates shrink, verified recall holds a floor —
    // the high-DF shingles it drops are what unrelated pairs collide on,
    // near-dups keep colliding on their shared rare shingles
    val cand = graft.operators.NearDup.lshCandidateCount(spark, dir)
    val candP = graft.operators.NearDup.lshPrunedCandidateCount(spark, dir)
    assert(candP < cand, s"pruned candidates $candP !< $cand")
    val prunedPairs = graft.operators.NearDup.minhashPairsPruned(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullPairs = pairs.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = prunedPairs.intersect(fullPairs).size.toDouble / fullPairs.size
    info(f"candidates $cand -> $candP, recall vs unpruned $recall%.3f")
    assert(recall >= 0.8, f"pruned recall $recall%.3f < 0.8")
    df.unpersist(); pairs.unpersist()
  }

  test("zipf corpus: open vocabulary, same dup structure, far fewer background candidates") {
    import graft.sources.SyntheticDocs
    val n = 2000L
    val a = SyntheticDocs.zipfCorpus(spark, n, 4).collect().map(_.toString).sorted.toSeq
    val b = SyntheticDocs.zipfCorpus(spark, n, 9).collect().map(_.toString).sorted.toSeq
    assert(a === b) // partitioning-invariant determinism

    val df = SyntheticDocs.zipfCorpus(spark, n, 8).cache()
    // open vocabulary: distinct words grow with the corpus (vs 31 fixed)
    val vocab = df.select(explode(split(col("text"), " ")).as("t"))
      .select(countDistinct(col("t"))).collect().head.getLong(0)
    assert(vocab > 5000L, s"zipf vocab $vocab unexpectedly small")

    // injected near-dups still found by the production LSH pipeline
    val dir = fixtureDir("documents" -> df)
    val pairs = graft.operators.NearDup.minhashPairs(spark, dir).cache()
    val found = pairs.count()
    assert(found >= n / SyntheticDocs.DupStride / 2, s"only $found pairs")

    // the regime claim: with an open vocabulary, band buckets hold only
    // true dups + boilerplate — candidate volume collapses vs fixed-vocab
    val dirV2 = fixtureDir("documents" -> SyntheticDocs.corpus(spark, n, 8))
    val candZipf = graft.operators.NearDup.lshCandidateCount(spark, dir)
    val candV2 = graft.operators.NearDup.lshCandidateCount(spark, dirV2)
    info(s"candidates: zipf $candZipf vs fixed-vocab $candV2")
    assert(candZipf < candV2 / 2, s"zipf $candZipf !<< fixed $candV2")
    df.unpersist(); pairs.unpersist()
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
