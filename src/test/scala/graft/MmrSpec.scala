package graft

import graft.operators.Retrieval

/** MMR diversification on a hand-built embedding geometry. */
class MmrSpec extends SparkSuite {
  import spark.implicits._

  test("mmr: near-duplicate of pick 1 is deferred in favor of a diverse doc") {
    // query 0 = e1. doc 1 = (1,.1) and doc 3 = (1,-.1) tie on relevance
    // (cos .9950, doc_id breaks to doc 1); doc 2 = (1,.11) is nearly as
    // relevant (.9940) but a near-duplicate of doc 1 (sim .99995), while
    // doc 3's sim to doc 1 is only .9802. At λ=0.7 the scores after pick
    // 1 are ~402466µ (doc 3) vs ~395818µ (doc 2): diversity wins pick 2.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.11f, 0.0f, 0.0f)),
      (3L, Array(1.0f, -0.1f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Retrieval.mmrOf(spark, emb, Seq(0L)).collect()
      .map(r => r.getAs[Int]("pick") -> r.getAs[Long]("doc_id")).toMap
    assert(out(1) === 1L) // pick 1 = argmax relevance
    assert(out(2) === 3L) // diversity beats the near-dup
    assert(out(3) === 2L) // the near-dup arrives last
    assert(out.size === 3) // only 3 candidates exist
  }

  test("mmr_multi: executor-side greedy equals the driver compat form; plan size is query-count independent") {
    // same hand-built geometry, TWO queries (0 and 4) — the queries-table
    // form must reproduce the driver greedy exactly
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.11f, 0.0f, 0.0f)),
      (3L, Array(1.0f, -0.1f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(canon(Retrieval.mmrMultiOf(spark, emb, Seq(0L, 4L))) ===
      canon(Retrieval.mmrOf(spark, emb, Seq(0L, 4L))))

    // the compat form unions one branch per query id; the multi form's
    // leaf count must NOT grow with the query set
    def leaves(qids: Seq[Long]) =
      Retrieval.mmrMultiOf(spark, emb, qids).queryExecution.optimizedPlan
        .collectLeaves().size
    assert(leaves(Seq(0L, 4L)) === leaves(Seq(0L, 1L, 2L, 3L, 4L)))
  }

  test("mmr on the corpus: picks are distinct, pick 1 is the top cosine") {
    val dir = SparkSpec.sf0001
    val rows = Retrieval.mmr(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.length === Retrieval.MmrPicks)
      val docs = rs.map(_.getAs[Long]("doc_id"))
      assert(docs.distinct.length === docs.length) // no doc picked twice
      assert(rs.map(_.getAs[Int]("pick")).sorted.toSeq === (1 to Retrieval.MmrPicks))
    }
  }
}
