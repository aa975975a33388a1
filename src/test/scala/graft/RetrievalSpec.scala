package graft

import graft.operators.{Retrieval, TextAnalysis}
import org.apache.spark.sql.functions._

/** RRF fusion on a hand-built corpus: dense ranks proven against an
  * in-test brute-force cosine, fusion scores recomputed from the returned
  * ranks, and the one-signal-only ids kept by the full-outer join. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  // vec_id 0 is the pinned query; cosines to it are 1.0, 0.6, 0.0
  private val emb = Seq(
    (0L, Seq(1.0f, 0.0f), 0),
    (1L, Seq(2.0f, 0.0f), 0),  // cos 1.0 -> dense rank 1
    (2L, Seq(0.6f, 0.8f), 0),  // cos 0.6 -> dense rank 2
    (3L, Seq(0.0f, 5.0f), 0))  // cos 0.0 -> dense rank 3
    .toDF("vec_id", "embedding", "label")

  // doc 7 hits two query terms repeatedly; doc 8 one term once; doc 1
  // appears in BOTH lists (has an embedding and a term hit)
  private val docs = Seq(
    (1L, "hash join pipelines", "en", "s", 19L),
    (7L, "hash hash vector vector vector", "en", "s", 30L),
    (8L, "one stream mention here", "en", "s", 24L),
    (9L, "nothing relevant at all", "en", "s", 23L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dense ranks match brute-force cosine; rrf recomputes from ranks; outer ids kept") {
    val d = fixtureDir("documents" -> docs, "embeddings" -> emb)
    val rows = Retrieval.rrfFusion(spark, d).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[Integer]("rank_sparse")).map(_.toInt),
          Option(r.getAs[Integer]("rank_dense")).map(_.toInt),
          r.getAs[Double]("rrf")))
    }.toMap

    // dense list = ids 1, 2, 3 in cosine order (query vec 0 excluded)
    assert(rows(1L)._2 === Some(1) && rows(2L)._2 === Some(2) && rows(3L)._2 === Some(3))
    // sparse list covers exactly the docs with a query-term hit
    val sparseRanked = rows.filter(_._2._1.isDefined).keySet
    assert(sparseRanked === Set(1L, 7L, 8L))
    assert(rows(7L)._1 === Some(1)) // strongest BM25 doc ranks first
    // doc 9 has neither signal and must be absent
    assert(!rows.contains(9L))
    // fusion arithmetic: every score equals its rank recomputation
    rows.foreach { case (id, (rs, rd, rrf)) =>
      val want = rs.map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0)
      assert(math.abs(rrf - want) < 1e-6, s"doc $id: $rrf vs $want")
    }
    // doc 1 carries both contributions, so it beats its dense-only score
    assert(rows(1L)._3 > 1.0 / (Retrieval.RrfK + 1))
  }

  test("fusion is deterministic under resharding") {
    val d = fixtureDir("documents" -> docs, "embeddings" -> emb)
    val a = Retrieval.rrfFusion(spark, d).collect().map(_.toString).sorted.toSeq
    val b = Retrieval.rrfFusion(spark, d).collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("dirichlet QL matches a driver-side hand model of the decomposition") {
    // corpus: C=11 tokens; cf(hash)=3, cf(vector)=1, cf(stream)=3;
    // query 0 = (hash, vector, stream); queries 1/2 have no in-corpus
    // terms and must be absent entirely
    val docWords = Map(
      1L -> Seq("hash", "hash", "vector"),
      2L -> Seq("hash", "stream", "stream", "stream"),
      3L -> Seq("other", "words", "only", "here"))
    val qdocs = docWords.toSeq.map { case (id, ws) =>
      (id, ws.mkString(" "), "en", "s", ws.mkString(" ").length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val mu = Retrieval.QlMu
    val c = docWords.values.map(_.length).sum
    val qterms = TextAnalysis.bm25QuerySet.head._2
    val cf = qterms.map(t => t -> docWords.values.map(_.count(_ == t)).sum)
      .filter(_._2 > 0).toMap
    val qcMu = cf.values.map(v =>
      math.floor(math.log((mu * v).toDouble / c) * 1e6 + 0.5).toLong).sum
    val want = docWords.flatMap { case (id, ws) =>
      val hits = cf.keys.map(t => t -> ws.count(_ == t)).filter(_._2 > 0).toSeq
      if (hits.isEmpty) None
      else {
        val hMu = hits.map { case (t, tf) =>
          math.floor(math.log(1.0 + (tf.toLong * c).toDouble / (mu * cf(t)))
            * 1e6 + 0.5).toLong
        }.sum
        val lenMu =
          math.floor(math.log((ws.length + mu).toDouble) * 1e6 + 0.5).toLong
        Some(id -> (hMu + qcMu - cf.size * lenMu) / 1e6)
      }
    }
    val out = Retrieval.qlDirichlet(spark, fixtureDir("documents" -> qdocs))
      .collect()
    assert(out.map(_.getAs[Long]("query_id")).toSet === Set(0L))
    val got = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ql")).toMap
    assert(got === want)
    // ranks follow score desc: doc 2 (4 hit tokens incl rare-term-free
    // stream mass) vs doc 1 (3 hits incl the rare 'vector')
    val ranks = out.map(r => r.getAs[Int]("rank") -> r.getAs[Long]("doc_id")).toMap
    val byScore = want.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert((1 to byScore.length).map(ranks) === byScore)
  }

  test("dirichlet QL harness ranking: dense ranks 1..k, scores descending") {
    val out = Retrieval.qlDirichlet(spark, SparkSpec.sf0001).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(out.nonEmpty)
    out.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to rows.length))
      val scores = sorted.map(_.getAs[Double]("ql")).toSeq
      assert(scores === scores.sorted.reverse, s"query $q not descending")
    }
  }

  test("map: AP hand-computed per ranking; an all-miss query scores 0") {
    // q1 truth {10, 11}; ranking [10, 99, 11]:
    //   AP = (P@1 + P@3)/2 = (1 + 2/3)/2, quantized:
    //   (1e6 div 1 + 2e6 div 3)/1e6/2 = (1000000 + 666666)/2e6 = 0.833333
    // q2 truth {20}; ranking [21, 22] has no hit -> AP = 0
    // q3 truth {30}; ranked nothing at all (missing from appr) -> AP = 0
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val appr = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      (2L, 21L, 1), (2L, 22L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.mapOf(truth, appr).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_exact") === 2L)
    assert(out(1L).getAs[Long]("n_hit") === 2L)
    assert(out(1L).getAs[Double]("ap") === 0.833333)
    assert(out(2L).getAs[Long]("n_hit") === 0L)
    assert(out(2L).getAs[Double]("ap") === 0.0)
    assert(out(3L).getAs[Long]("n_hit") === 0L)
    assert(out(3L).getAs[Double]("ap") === 0.0)
  }

  test("mrr: first-hit reciprocal per ranking; no-hit queries score 0; summary row") {
    // q1 truth {10, 11}; ranking [99, 11, 10]: first hit at rank 2 -> rr 0.5
    // q2 truth {20}; ranking [21] has no hit -> rr 0, NULL first_rank
    // q3 truth {30}; ranked nothing at all -> rr 0
    // summary: (500000 + 0 + 0) / 3 / 1e6 = 0.166667 (roundN)
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val appr = Seq((1L, 99L, 1), (1L, 11L, 2), (1L, 10L, 3), (2L, 21L, 1))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.mrrOf(truth, appr).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out.size === 4)
    assert(out(1L).getAs[Long]("first_rank") === 2L)
    assert(out(1L).getAs[Double]("rr") === 0.5)
    assert(out(2L).isNullAt(out(2L).fieldIndex("first_rank")))
    assert(out(2L).getAs[Double]("rr") === 0.0)
    assert(out(3L).getAs[Double]("rr") === 0.0)
    assert(out(-1L).isNullAt(out(-1L).fieldIndex("first_rank")))
    assert(out(-1L).getAs[Double]("rr") === 0.166667)
  }

  test("mrr: harness — positive iff recall positive, bounded by 1, summary is the mean") {
    val rows = Retrieval.annMrr(spark, SparkSpec.sf0001).collect()
    val per = rows.filter(_.getAs[Long]("query_id") >= 0L)
    val sm = rows.filter(_.getAs[Long]("query_id") === -1L)
    assert(per.nonEmpty && sm.length === 1)
    val rec = Retrieval.annRecall(spark, SparkSpec.sf0001).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall")).toMap
    assert(per.map(_.getAs[Long]("query_id")).toSet === rec.keySet)
    per.foreach { r =>
      val rr = r.getAs[Double]("rr")
      assert(rr >= 0.0 && rr <= 1.0)
      assert((rr > 0.0) === (rec(r.getAs[Long]("query_id")) > 0.0))
    }
    // summary = mean of the quantized per-query RRs (one final division)
    val want = math.floor(per.map(r => math.round(r.getAs[Double]("rr") * 1e6))
      .sum.toDouble / per.length / 1e6 * 1e6 + 0.5) / 1e6
    assert(math.abs(sm.head.getAs[Double]("rr") - want) < 2e-6)
  }

  test("map: harness AP is bounded by recall per query") {
    // AP ≤ n_hit/n_exact (each hit's precision ≤ 1) — ties recall and
    // map together on the real ANN pair without re-deriving either
    val ap = Retrieval.annMap(spark, SparkSpec.sf0001).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Double]("ap"), r.getAs[Long]("n_hit"),
          r.getAs[Long]("n_exact"))).toMap
    val rec = Retrieval.annRecall(spark, SparkSpec.sf0001).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall")).toMap
    assert(ap.nonEmpty && ap.keySet === rec.keySet)
    ap.foreach { case (q, (a, hit, ex)) =>
      assert(a >= 0.0 && a <= hit.toDouble / ex + 1e-9, s"query $q ap=$a")
    }
  }
}
