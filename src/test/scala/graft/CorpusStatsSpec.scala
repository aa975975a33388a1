package graft

import graft.operators.CorpusStats
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    fixtureDir("documents" -> rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("heaps: all-new-words corpus fits beta ~ 1, shared-vocab corpus ~ 0") {
    // 10 docs, each contributing 5 brand-new words: V(N) = N/... V = tokens
    val fresh = (1L to 10L).map(i => i -> (1 to 5).map(j => s"w${i}_$j").mkString(" "))
    val o1 = CorpusStats.heaps(spark, docs(fresh)).collect()
    assert(o1.length === 10)
    val beta1 = o1.head.getAs[Double]("beta")
    assert(math.abs(beta1 - 1.0) < 1e-4, s"beta $beta1")
    // vocab tracks tokens exactly at every cut
    o1.foreach(r => assert(r.getAs[Long]("vocab") === r.getAs[Long]("tokens")))
    // 10 docs all repeating the SAME 5 words: V constant -> beta = 0
    val same = (1L to 10L).map(i => i -> "alpha beta gamma delta epsilon")
    val o2 = CorpusStats.heaps(spark, docs(same)).collect()
    val beta2 = o2.head.getAs[Double]("beta")
    assert(math.abs(beta2) < 1e-4, s"beta $beta2")
    assert(o2.forall(_.getAs[Long]("vocab") === 5L))
  }

  test("heaps: open-vocabulary Zipf corpus grows sublinearly (0 < beta < 1)") {
    // the harness documents carry a FIXED ~31-word vocabulary (beta = 0
    // exactly — saturated at the first cut), so the realistic growth
    // check runs on the open-vocabulary Zipf synthetic corpus instead
    val d = java.nio.file.Files.createTempDirectory("heaps_zipf").toString
    graft.sources.SyntheticDocs.zipfCorpus(spark, 2000L)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = CorpusStats.heaps(spark, d).collect()
    val beta = out.head.getAs[Double]("beta")
    assert(beta > 0.0 && beta < 1.0, s"beta $beta")
    // both series are monotone in the prefix
    val toks = out.map(_.getAs[Long]("tokens"))
    val vocs = out.map(_.getAs[Long]("vocab"))
    assert(toks.sliding(2).forall(p => p(0) <= p(1)))
    assert(vocs.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("aes sample: weight-proportional, deterministic, exactly k") {
    // 100 light docs (w=50) vs 100 heavy (w=2000, 40x): the top-100
    // A-ES subset must be dominated by heavy docs
    val rows = (1L to 100L).map(i => (i, "x", "en", "light", 50L)) ++
      (101L to 200L).map(i => (i, "x", "en", "heavy", 2000L))
    val d = fixtureDir("documents" -> rows
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.operators.Sampling.sampleAes(spark, d).collect()
    assert(out.length === graft.operators.Sampling.AesK)
    val heavy = out.count(_.getAs[String]("source") == "heavy")
    assert(heavy > 75, s"heavy docs in sample: $heavy") // E[heavy] ~ 95+
    // rerun-stable: the subset is a pure function of the data
    val again = graft.operators.Sampling.sampleAes(spark, d).collect()
    assert(out.map(_.getLong(0)).toSet === again.map(_.getLong(0)).toSet)
  }

  test("abn: one-arm-converts contingency is significant; uniform is not") {
    def ev(id: Long, uid: Long, t: String, v: Double) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), uid, t, v, "{}")
    val probe = (1L to 400L).toDF("user_id")
      .select(col("user_id"), (conv(substring(md5(col("user_id").cast("string")), 1, 2),
        16, 10).cast("int") % 3).as("arm")).collect()
    def armUsers(a: Int, k: Int) =
      probe.filter(_.getAs[Int]("arm") == a).map(_.getLong(0)).take(k)
    var id = 0L
    def rows(users: Seq[Long], convert: Boolean) = users.flatMap { u =>
      id += 1
      val base = Seq(ev(id, u, "click", 1.0))
      if (convert) { id += 1; base :+ ev(id, u, "purchase", 500.0) } else base
    }
    // arm 0 converts 100%, arms 1/2 never -> chi2 = N (max association)
    val d1 = fixtureDir("events" ->
      (rows(armUsers(0, 10), convert = true) ++ rows(armUsers(1, 10), convert = false)
        ++ rows(armUsers(2, 10), convert = false))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r1 = graft.operators.Inference.abn(spark, d1).collect()(0)
    assert(r1.getAs[Double]("chi2") === 30.0) // chi2 = N for a pure split
    assert(r1.getAs[Boolean]("significant"))
    // every arm converts identically -> chi2 = 0, not significant
    val d2 = fixtureDir("events" ->
      (rows(armUsers(0, 4), convert = true) ++ rows(armUsers(1, 4), convert = true)
        ++ rows(armUsers(2, 4), convert = true)
        ++ rows(armUsers(0, 14).drop(4), convert = false)
        ++ rows(armUsers(1, 14).drop(4), convert = false)
        ++ rows(armUsers(2, 14).drop(4), convert = false))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r2 = graft.operators.Inference.abn(spark, d2).collect()(0)
    assert(r2.getAs[Double]("chi2") === 0.0) // identical rates in all arms
    assert(!r2.getAs[Boolean]("significant"))
  }

  test("srm: balanced split passes, degenerate all-one-arm split flags") {
    def ev(id: Long, uid: Long) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), uid, "click", 1.0, "{}")
    val probe = (1L to 200L).toDF("user_id")
      .select(col("user_id"), (conv(substring(md5(col("user_id").cast("string")), 1, 2),
        16, 10).cast("int") % 2).as("arm")).collect()
    val ctrl = probe.filter(_.getAs[Int]("arm") == 0).map(_.getLong(0))
    val trt = probe.filter(_.getAs[Int]("arm") == 1).map(_.getLong(0))
    // 3 control vs 1 treatment: chi2 = 4/4 = 1 < 3.84 -> no flag
    val d1 = fixtureDir("events" ->
      (ctrl.take(3) ++ trt.take(1)).zipWithIndex.map { case (u, i) => ev(i.toLong, u) }
        .toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r1 = CorpusStats.srm(spark, d1).collect()(0)
    assert(r1.getAs[Double]("chi2") === 1.0)
    assert(!r1.getAs[Boolean]("srm_flag"))
    // 20 control vs 0 treatment: chi2 = 400/20 = 20 -> flagged
    val d2 = fixtureDir("events" ->
      ctrl.take(20).zipWithIndex.map { case (u, i) => ev(i.toLong, u) }
        .toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r2 = CorpusStats.srm(spark, d2).collect()(0)
    assert(r2.getAs[Double]("chi2") === 20.0)
    assert(r2.getAs[Boolean]("srm_flag"))
  }
}
