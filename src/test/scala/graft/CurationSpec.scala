package graft

import graft.operators.{Curation, Trend}
import org.apache.spark.sql.functions._

/** Fixture-driven semantics checks for the curation family (snapshot diff,
  * readability, DP counts, keyphrases) and the OLS trend fit. */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dataset diff classifies added/removed/changed/unchanged") {
    val a = docsDf(1L -> "one", 2L -> "two", 3L -> "three")
    val b = docsDf(1L -> "one", 2L -> "two EDITED", 4L -> "four")
    val out = Curation.datasetDiffOf(a, b).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out === Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("snapshot generator edits, deletes and adds the pinned cohorts") {
    val docs = graft.sources.Tables.documents(spark, SparkSpec.sf0001)
    val diff = Curation.datasetDiff(spark, SparkSpec.sf0001)
      .groupBy("status").agg(sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = docs.count()
    assert(diff("removed") === docs.filter(col("doc_id") % 17 === 3).count())
    assert(diff("added") === docs.filter(col("doc_id") % 29 === 7).count())
    // edited docs that were not deleted
    assert(diff("changed") ===
      docs.filter(col("doc_id") % 13 === 5 && col("doc_id") % 17 =!= 3).count())
    // diff rows total = survivors (n - removed) + removed + added
    assert(diff.values.sum === n + diff("added"))
  }

  test("readability counts sentences, syllables and words") {
    val d = fixtureDir("documents" -> docsDf(
      1L -> "The cat sat. The dog ran!",
      2L -> "incomprehensibility"))
    val rows = Curation.readability(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_words") === 6L)
    assert(r1.getAs[Long]("n_sents") === 2L)
    // syllables: the=1 cat=1 sat.=1 the=1 dog=1 ran!=1 (vowel groups)
    assert(r1.getAs[Long]("n_syll") === 6L)
    // flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert(r1.getAs[Double]("flesch") === 119.19)
    val r2 = rows(2L)
    assert(r2.getAs[Long]("n_words") === 1L && r2.getAs[Long]("n_sents") === 1L)
    // i-o-e-e-i-i-i-y vowel groups in "incomprehensibility" = 8
    assert(r2.getAs[Long]("n_syll") === 8L)
  }

  test("DP counts: noise is deterministic, bounded, and zero-mean-ish") {
    val out = Curation.dpCounts(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    val noises = out.map(r =>
      r.getAs[Double]("n_released") - r.getAs[Long]("n_true"))
    // Laplace(b=1) at 60-bit uniforms: |noise| <= ln(2^59) ~ 41
    assert(noises.forall(n => math.abs(n) <= 42.0))
    assert(noises.exists(_ > 0) && noises.exists(_ < 0)) // two-sided
    // rerun-stable
    val again = Curation.dpCounts(spark, SparkSpec.sf0001).collect()
      .map(r => r.getAs[Double]("n_released"))
    assert(again.toSeq === out.map(_.getAs[Double]("n_released")).toSeq)
  }

  test("keyphrases: stopword-delimited runs, degree/freq scoring, top-k") {
    val d = fixtureDir("documents" -> docsDf(
      1L -> "deep learning of the deep learning stack for a data pipeline"))
    val rows = Curation.keyphrases(spark, d).collect()
    val phrases = rows.map(_.getAs[String]("phrase")).toSet
    // runs: "deep learning" (x2), "deep learning stack", "data pipeline"
    assert(phrases.contains("deep learning stack"))
    assert(phrases.contains("deep learning"))
    assert(phrases.contains("data pipeline"))
    // the longer run outscores its sub-phrase: every member word carries
    // degree>=freq and the 3-word phrase sums three scores
    val byPhrase = rows.map(r => r.getAs[String]("phrase") ->
      r.getAs[Long]("score_micro")).toMap
    assert(byPhrase("deep learning stack") > byPhrase("deep learning"))
    assert(rows.map(_.getAs[Int]("rank")).toSeq.sorted === Seq(1, 2, 3))
  }

  test("OLS trend recovers an exact line and nulls degenerate groups") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"1995-${m}%02d-01 00:00:00")
    // nation 0: revenue cents = 1000 + 250*x for x=0..3 (exact line)
    // nation 1: a single month (degenerate)
    val orders = Seq(
      (1L, 10L, "O", 0.0, ts(1), "p"), (2L, 10L, "O", 0.0, ts(2), "p"),
      (3L, 10L, "O", 0.0, ts(3), "p"), (4L, 10L, "O", 0.0, ts(4), "p"),
      (5L, 20L, "O", 0.0, ts(2), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, 1L, 1L, 1, 1.0, 10.00, 0.0, 0.0, "N", "O", ts(1)),
      (2L, 1L, 1L, 1, 1.0, 12.50, 0.0, 0.0, "N", "O", ts(2)),
      (3L, 1L, 1L, 1, 1.0, 15.00, 0.0, 0.0, "N", "O", ts(3)),
      (4L, 1L, 1L, 1, 1.0, 17.50, 0.0, 0.0, "N", "O", ts(4)),
      (5L, 1L, 1L, 1, 1.0, 99.00, 0.0, 0.0, "N", "O", ts(2)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val cust = Seq((10L, "c10", 0, 0.0, "B"), (20L, "c20", 1, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val nat = Seq((0, "ALPHA", 0), (1, "BETA", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val dir = fixtureDir("orders" -> orders, "lineitem" -> li,
      "customer" -> cust, "nation" -> nat)
    val out = Trend.revenueTrend(spark, dir).collect()
      .map(r => r.getAs[String]("nation") -> r).toMap
    val a = out("ALPHA")
    assert(a.getAs[Long]("n_months") === 4L)
    assert(a.getAs[Double]("slope") === 250.0)
    assert(a.getAs[Double]("intercept") === 1000.0)
    val b = out("BETA")
    assert(b.getAs[Long]("n_months") === 1L)
    assert(b.isNullAt(b.fieldIndex("slope")))
    assert(b.isNullAt(b.fieldIndex("intercept")))
  }

  test("randomized response: coin replayed by hand, debias formula exact") {
    def coin(u: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rr|$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
      Integer.parseInt(hex, 16) % Curation.RrKeepDen != 0
    }
    // users 1..30: purchasers are multiples of 3 (10 true positives)
    val rows = (1L to 30L).map { u =>
      (u, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), u,
        if (u % 3 == 0) "purchase" else "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.randomizedResponse(spark, fixtureDir("events" -> rows))
      .collect().head
    val f = (1L to 30L).map(u => u % 3 == 0)
    val rep = (1L to 30L).map(u => if (coin(u)) u % 3 == 0 else u % 3 != 0)
    assert(r.getAs[Long]("n_users") === 30L)
    assert(r.getAs[Long]("n_true") === f.count(identity).toLong)
    assert(r.getAs[Long]("n_reported") === rep.count(identity).toLong)
    val p = Curation.RrKeepNum.toDouble / Curation.RrKeepDen
    val est = (rep.count(identity).toDouble / 30 + (p - 1.0)) / (2.0 * p - 1.0)
    assert(r.getAs[Double]("est_rate") === math.floor(est * 1e6 + 0.5) / 1e6)
  }

  test("randomized response: debias converges at population scale") {
    // 2000 users kill the coin's sampling noise (SE ≈ 0.019); sf0.001's 15
    // users sit at SE ≈ 0.22 where the DETERMINISTIC md5 draw happens to
    // land 0.37 off — accuracy is a law-of-large-numbers property, so it
    // is pinned where the law applies.
    val rows = (1L to 2000L).map { u =>
      (u, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), u,
        if (u % 3 == 0) "purchase" else "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.randomizedResponse(spark, fixtureDir("events" -> rows))
      .collect().head
    assert(r.getAs[Double]("true_rate") === 0.333)
    val err = math.abs(r.getAs[Double]("est_rate") - r.getAs[Double]("true_rate"))
    assert(err < 0.05, s"LDP estimate off by $err")
  }
}
