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
  /** Multi-query batch: dense query vectors, 1:1 with the bm25QuerySet
    * ids (shared query_id space — query q = terms[q] + embedding[q]). */
  val RrfQueryVecs: Seq[Long] = TextAnalysis.bm25QuerySet.map(_._1)

  private def vecD: Column = col("embedding").cast("array<double>")
  private def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Per-query dense cosine ranks over the corpus for a SMALL pinned
    * query-vector batch. Each query is one corpus scan against a 1-row
    * grand-aggregate broadcast (the tripwire-exempt single-row shape),
    * unioned — a constant-×-scan plan that keeps every join
    * broadcast-hash and every window PARTITIONED by query_id. Large query
    * batches are the job of the bucketed/IVF paths in [[Similarity]]; this
    * is the exact-rank fusion input for a handful of standing queries. */
  private def denseRanks(spark: SparkSession, dir: String, qids: Seq[Long]): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(
      col("vec_id"), vecD.as("v"), sqrt(dot(vecD, vecD)).as("nrm"))
    val scored = qids.map { qid =>
      val qv = broadcast(emb.filter(col("vec_id") === qid)
        .agg(first(col("v")).as("qv"), first(col("nrm")).as("qnrm")))
      emb.filter(col("vec_id") =!= qid).crossJoin(qv)
        .select(lit(qid).as("query_id"), col("vec_id"),
          (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
    }.reduce(_ unionByName _)
    val top = graft.plans.TopK.topK(scored, Seq("query_id"),
      Seq(("cos", true), ("vec_id", false)), DenseTopK)
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    top.select(col("query_id"), col("vec_id").as("doc_id"),
      row_number().over(wD).as("rank_dense"))
  }

  /** Reciprocal-rank fusion of two per-query rank lists — the library-API
    * form. Inputs: (query_id, doc_id, rank_sparse) and (query_id, doc_id,
    * rank_dense); both are top-k lists, so the full-outer fusion join is
    * rank-list-sized (≤ 2k rows per query), never corpus-sized. */
  def rrfOf(sparse: DataFrame, dense: DataFrame): DataFrame =
    sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("rank_sparse"), col("rank_dense"),
        roundN(
          coalesce(lit(1.0) / (lit(RrfK) + col("rank_sparse")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("rank_dense")), lit(0.0)), 6).as("rrf"))

  /** Single-query RRF (round-5 form, kept for compatibility): the pinned
    * query through the same multi-query machinery, query_id dropped. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark; import spark2.implicits._
    val queries = TextAnalysis.bm25QueryTerms.map(t => (RrfQueryVec, t))
      .toDF("query_id", "term")
    val sparse = TextAnalysis.bm25Of(TextAnalysis.wordsOf(spark, dir), queries)
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_sparse"))
    rrfOf(sparse, denseRanks(spark, dir, Seq(RrfQueryVec)))
      .drop("query_id")
  }

  /** QUERIES-table RRF (round-5 verdict ask #5): the bm25QuerySet batch
    * fused with its matching dense query vectors, per-query ranks. */
  def rrfFusionMulti(spark: SparkSession, dir: String): DataFrame = {
    val sparse = TextAnalysis.bm25Multi(spark, dir)
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_sparse"))
    rrfOf(sparse, denseRanks(spark, dir, RrfQueryVecs))
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

  /** NDCG@k of the LSH-bucketed ANN against brute-force exact-cosine
    * ground truth, per query — the standard ranking-quality eval a
    * retrieval stack runs before swapping an approximate index in
    * (complements AnnRecallSpec's set-overlap recall floors with a
    * POSITION-sensitive, registered, oracle-checked metric).
    *
    * Binary relevance: the exact top-k IS the relevant set; gains are
    * quantized to integer micro-units (floor(1e6/log2(pos+1) + 0.5)) so
    * both engines sum identical integers and the single ndcg division is
    * one IEEE op on exact inputs — the exact-cents discipline. The brute
    * side is the whitelisted O(q·corpus) baseline (it IS the ground
    * truth); the LSH side and the ≤k-row joins are the scale path. */
  def annNdcg(spark: SparkSession, dir: String): DataFrame = {
    def gainMicro(pos: Column): Column =
      floor(lit(1e6) / log2(pos + lit(1)) + 0.5).cast("long")
    val truth = Similarity.knnBrute(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("rel"))
    val dcg = Similarity.knnLsh(spark, dir)
      .join(truth, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"),
        when(col("rel").isNotNull, gainMicro(col("rank"))).otherwise(0L).as("g"))
      .groupBy(col("query_id")).agg(sum(col("g")).as("dcg_micro"))
    val idcg = truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
      .select(col("query_id"), col("n_rel"),
        aggregate(sequence(lit(1L), col("n_rel")), lit(0L),
          (acc, i) => acc + gainMicro(i)).as("idcg_micro"))
    idcg.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"), col("idcg_micro"),
        roundN(coalesce(col("dcg_micro"), lit(0L)).cast("double") /
          col("idcg_micro"), 6).as("ndcg"))
  }

  private val annNdcgSql = {
    def gain(pos: String) = s"CAST(floor(1000000.0 / log2($pos + 1) + 0.5) AS BIGINT)"
    s"""WITH truth AS (${Similarity.knnBruteSql}),
       |appr AS (${Similarity.knnLshSql}),
       |dcg AS (SELECT a.query_id,
       |    CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN ${gain("a.rank")} ELSE 0 END) AS BIGINT) AS dcg_micro
       |  FROM appr a LEFT JOIN truth t
       |    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
       |  GROUP BY 1),
       |idcg AS (SELECT query_id, count(*) AS n_rel,
       |    CAST(list_sum(list_transform(range(1, count(*) + 1),
       |      i -> ${gain("i")})) AS BIGINT) AS idcg_micro
       |  FROM truth GROUP BY 1)
       |SELECT i.query_id, i.n_rel, CAST(coalesce(d.dcg_micro, 0) AS BIGINT) AS dcg_micro,
       |  i.idcg_micro,
       |  ${roundNSql("CAST(coalesce(d.dcg_micro, 0) AS DOUBLE) / i.idcg_micro", 6)} AS ndcg
       |FROM idcg i LEFT JOIN dcg d USING (query_id)""".stripMargin
  }

  private val rrfMultiSql = {
    val nrm = "sqrt(list_sum(list_transform(range(1, len(embedding) + 1), " +
      "i -> (embedding::DOUBLE[])[i] * (embedding::DOUBLE[])[i])))"
    val dotQc = "list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))"
    val qids = RrfQueryVecs.mkString(", ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v, $nrm AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v, nrm FROM v WHERE vec_id IN ($qids)),
       |sc AS (SELECT q.query_id, c.vec_id, $dotQc / (q.nrm * c.nrm) AS cos
       |       FROM v c CROSS JOIN q WHERE c.vec_id != q.query_id),
       |dense AS (SELECT query_id, vec_id AS doc_id,
       |            CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank_dense
       |          FROM sc QUALIFY rank_dense <= $DenseTopK),
       |sparse AS (SELECT query_id, doc_id, rank AS rank_sparse
       |           FROM (${TextAnalysis.bm25MultiSql}) b)
       |SELECT query_id, doc_id, rank_sparse, rank_dense,
       |  ${roundNSql(
        s"coalesce(1.0::DOUBLE / ($RrfK + rank_sparse), 0.0) + " +
          s"coalesce(1.0::DOUBLE / ($RrfK + rank_dense), 0.0)", 6)} AS rrf
       |FROM sparse FULL JOIN dense USING (query_id, doc_id)""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_retrieval_rrf", rrfFusion, Some(rrfSql)),
    Q("q_retrieval_rrf_multi", rrfFusionMulti, Some(rrfMultiSql)),
    Q("q_retrieval_ndcg", annNdcg, Some(annNdcgSql)))
}
