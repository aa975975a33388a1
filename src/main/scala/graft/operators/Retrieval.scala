package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09 —
  * public) of the sparse BM25 ranking over `documents` and a dense
  * cosine ranking over `embeddings`, joined on the shared id space
  * (doc_id = vec_id; at sf0.1 embeddings covers a prefix of documents, so
  * the full-outer fusion keeps ids that only one signal ranked — the
  * production shape, where the embedded subset lags the crawl).
  *
  * RRF is the standard score-free fusion for RAG retrieval stacks:
  * rrf(d) = Σ_signals 1/(K + rank_signal(d)) over each signal's top-k
  * list, immune to the two signals' incomparable score scales.
  *
  * Scale shape: the sparse side is [[TextAnalysis.bm25]] (term-filter-first,
  * broadcast stats, native bounded-heap top-k); the dense side is ONE
  * pinned query vector against the corpus — a grand-aggregate broadcast
  * (structurally 1 row, tripwire-exempt by shape) and a narrow codegen'd
  * `vec_dot` scan, then the same native top-k. Fusion itself joins two
  * ≤k-row lists — driver-free, broadcast-sized. Multi-query batches swap
  * the 1-row broadcast for the IVF/LSH candidate paths in Similarity; the
  * fusion join is rank-list-sized either way.
  */
object Retrieval {

  /** RRF smoothing constant (the SIGIR'09 paper's k = 60). */
  val RrfK = 60
  val DenseTopK = 10
  /** Pinned dense query: the embedding of vec_id 0 (exists at every SF). */
  val RrfQueryVec = 0L

  private def vecD: Column = col("embedding").cast("array<double>")
  private def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(
      col("vec_id"), vecD.as("v"), sqrt(dot(vecD, vecD)).as("nrm"))
    // grand aggregate over the 1-row filter: provably single-row build side
    val qv = broadcast(emb.filter(col("vec_id") === RrfQueryVec)
      .agg(first(col("v")).as("qv"), first(col("nrm")).as("qnrm")))
    val scored = emb.filter(col("vec_id") =!= RrfQueryVec).crossJoin(qv)
      .select(col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
    val denseTop = graft.plans.TopK.topK(scored, Seq.empty,
      Seq(("cos", true), ("vec_id", false)), DenseTopK)
    val wD = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos").desc, col("vec_id")) // k rows: single partition is fine
    val dense = denseTop
      .select(col("vec_id").as("doc_id"), row_number().over(wD).as("rank_dense"))
    val wS = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id"))
    val sparse = TextAnalysis.bm25(spark, dir)
      .select(col("doc_id"), row_number().over(wS).as("rank_sparse"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_sparse"), col("rank_dense"),
        roundN(
          coalesce(lit(1.0) / (lit(RrfK) + col("rank_sparse")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("rank_dense")), lit(0.0)), 6).as("rrf"))
  }

  private val rrfSql = {
    val nrm = "sqrt(list_sum(list_transform(range(1, len(embedding) + 1), " +
      "i -> (embedding::DOUBLE[])[i] * (embedding::DOUBLE[])[i])))"
    val dotQc = "list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))"
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v, $nrm AS nrm FROM embeddings),
       |q AS (SELECT v, nrm FROM v WHERE vec_id = $RrfQueryVec),
       |sc AS (SELECT c.vec_id, $dotQc / (q.nrm * c.nrm) AS cos
       |       FROM v c CROSS JOIN q WHERE c.vec_id != $RrfQueryVec),
       |dense AS (SELECT vec_id AS doc_id,
       |            CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank_dense
       |          FROM sc QUALIFY rank_dense <= $DenseTopK),
       |sparse AS (SELECT doc_id,
       |             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank_sparse
       |           FROM (${TextAnalysis.bm25Sql}) b)
       |SELECT doc_id, rank_sparse, rank_dense,
       |  ${roundNSql(
        s"coalesce(1.0::DOUBLE / ($RrfK + rank_sparse), 0.0) + " +
          s"coalesce(1.0::DOUBLE / ($RrfK + rank_dense), 0.0)", 6)} AS rrf
       |FROM sparse FULL JOIN dense USING (doc_id)""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_retrieval_rrf", rrfFusion, Some(rrfSql)))
}
