package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

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

  /** MMR picks per query (M of the DenseTopK candidates). */
  val MmrPicks = 5

  /** MMR trade-off λ: score = λ·relevance − (1−λ)·max-sim-to-selected. */
  val MmrLambda = 0.7

  /** Maximal-marginal-relevance diversified re-ranking (Carbonell &
    * Goldstein SIGIR'98 — public) of each query's dense top-k: pick 1 is
    * the most relevant candidate; each later pick maximizes
    * λ·rel − (1−λ)·max sim to the already-picked set — the standard
    * redundancy filter before a RAG context window is filled.
    *
    * Scale shape: candidate generation is the exact same plan as the RRF
    * dense side (1-row broadcast + narrow scan + native bounded-heap
    * top-k); everything after operates on ≤ DenseTopK rows per query —
    * the candidate×candidate sim table is k²-bounded BY CONSTRUCTION and
    * the greedy selection is a (queries·k²)-sized driver model (the
    * KMeans collect class), never a corpus operation.
    *
    * Exactness: relevance and pairwise sims quantize to integer micro
    * units once; each step's score floor(λ·rel_µ − (1−λ)·maxSim_µ + 0.5)
    * is the identical IEEE op sequence in both engines (the oracle
    * unrolls the M−1 greedy steps as CTEs), ties break on doc_id. */
  def mmr(spark: SparkSession, dir: String): DataFrame =
    mmrOf(spark, Tables.embeddings(spark, dir), RrfQueryVecs)

  /** Library form over any (vec_id, embedding) frame and query-id set. */
  def mmrOf(spark: SparkSession, embeddings: DataFrame, qids: Seq[Long]): DataFrame = {
    val emb = embeddings.select(
      col("vec_id"), vecD.as("v"), sqrt(dot(vecD, vecD)).as("nrm"))
    val scored = qids.map { qid =>
      val qv = broadcast(emb.filter(col("vec_id") === qid)
        .agg(first(col("v")).as("qv"), first(col("nrm")).as("qnrm")))
      emb.filter(col("vec_id") =!= qid).crossJoin(qv)
        .select(lit(qid).as("query_id"), col("vec_id"),
          (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"),
          col("v"), col("nrm"))
    }.reduce(_ unionByName _)
    val cand = graft.plans.TopK.topK(scored, Seq("query_id"),
      Seq(("cos", true), ("vec_id", false)), DenseTopK)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        floor(col("cos") * 1e6 + 0.5).cast("long").as("rel_mu"),
        col("v"), col("nrm"))
    val a = cand.select(col("query_id"), col("doc_id").as("a"),
      col("rel_mu"), col("v").as("va"), col("nrm").as("na"))
    val b = cand.select(col("query_id"), col("doc_id").as("b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pairs = a.join(b, "query_id").filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        floor(dot(col("va"), col("vb")) / (col("na") * col("nb")) * 1e6 + 0.5)
          .cast("long").as("sim_mu"))

    // ≤ queries·k (rel) and queries·k² (sim) rows by construction — the
    // driver-model collect class; bounds catch a widened candidate stage
    val rel = Guard.boundedCollect(
      cand.select(col("query_id"), col("doc_id"), col("rel_mu")),
      1 << 20, "MMR relevance candidates (queries*k)")
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sim = Guard.boundedCollect(pairs, 1 << 22, "MMR pairwise sims (queries*k^2)")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val byQ = rel.keys.groupBy(_._1)
    val out = byQ.toSeq.sortBy(_._1).flatMap { case (q, keys) =>
      val docs = keys.map(_._2).toSeq
      var selected = Vector.empty[Long]
      (1 to math.min(MmrPicks, docs.size)).map { pick =>
        val remaining = docs.filterNot(selected.contains)
        val best = remaining.map { d =>
          val score =
            if (selected.isEmpty) rel((q, d))
            else {
              val ms = selected.map(s => sim((q, d, s))).max
              math.floor(MmrLambda * rel((q, d)).toDouble -
                (1.0 - MmrLambda) * ms.toDouble + 0.5).toLong
            }
          (score, d)
        }.minBy { case (s, d) => (-s, d) }
        selected :+= best._2
        Row(q, pick, best._2)
      }
    }
    val schema = StructType(Seq(
      StructField("query_id", LongType), StructField("pick", IntegerType),
      StructField("doc_id", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
      .orderBy(col("query_id"), col("pick"))
  }

  /** QUERIES-TABLE MMR (round-6 verdict #3) — the production form of
    * [[mmr]]: same result, executor-side plan. Two structural upgrades
    * over the compat form: (1) candidate generation packs the query
    * table into ONE broadcast row (collect_list of (id, vec) structs)
    * and explodes it against a SINGLE corpus scan — plan size and scan
    * count are independent of |queries| (the compat form unions one
    * branch per query id); (2) the greedy selection runs per query in
    * `flatMapGroups` on the executors over the k²-bounded (rel, sim)
    * rows — the driver holds nothing. Identical integer micro-unit
    * arithmetic, same oracle as q_retrieval_mmr. */
  def mmrMulti(spark: SparkSession, dir: String): DataFrame =
    mmrMultiOf(spark, Tables.embeddings(spark, dir), RrfQueryVecs)

  def mmrMultiOf(spark: SparkSession, embeddings: DataFrame,
      qids: Seq[Long]): DataFrame = {
    val spark2 = spark; import spark2.implicits._
    val emb = embeddings.select(
      col("vec_id"), vecD.as("v"), sqrt(dot(vecD, vecD)).as("nrm"))
    // one broadcast row holding the whole query table; exploding it per
    // corpus row keeps the join the tripwire-exempt 1-row-BNLJ shape and
    // the corpus is scanned ONCE regardless of |queries|
    val qtab = emb.filter(col("vec_id").isInCollection(qids))
      .agg(collect_list(struct(col("vec_id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qnrm"))).as("qs"))
    val scored = emb.crossJoin(broadcast(qtab))
      .select(col("vec_id"), col("v"), col("nrm"), explode(col("qs")).as("q"))
      .filter(col("vec_id") =!= col("q.query_id"))
      .select(col("q.query_id").as("query_id"), col("vec_id"),
        (dot(col("q.qv"), col("v")) / (col("q.qnrm") * col("nrm"))).as("cos"),
        col("v"), col("nrm"))
    val cand = graft.plans.TopK.topK(scored, Seq("query_id"),
      Seq(("cos", true), ("vec_id", false)), DenseTopK)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        floor(col("cos") * 1e6 + 0.5).cast("long").as("rel_mu"),
        col("v"), col("nrm"))
    val a = cand.select(col("query_id"), col("doc_id").as("a"),
      col("rel_mu"), col("v").as("va"), col("nrm").as("na"))
    val b = cand.select(col("query_id"), col("doc_id").as("b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pairs = a.join(b, "query_id").filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a").as("doc_id"), col("b"),
        floor(dot(col("va"), col("vb")) / (col("na") * col("nb")) * 1e6 + 0.5)
          .cast("long").as("sim_mu"))
    // k² rows per query: each (candidate, other) sim edge + the
    // candidate's relevance; the greedy consumes one query's group on
    // whichever executor owns it
    val grouped = cand.select(col("query_id"), col("doc_id"), col("rel_mu"))
      .join(pairs, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"), col("rel_mu"),
        col("b"), col("sim_mu"))
      .as[(Long, Long, Long, Option[Long], Option[Long])]
    grouped
      .groupByKey(_._1)
      .flatMapGroups { (q: Long, it: Iterator[(Long, Long, Long, Option[Long], Option[Long])]) =>
        val rows = it.toSeq
        val rel = rows.map(r => r._2 -> r._3).toMap
        val sim = rows.collect { case (_, d, _, Some(bb), Some(s)) => (d, bb) -> s }.toMap
        val docs = rel.keys.toSeq
        var selected = Vector.empty[Long]
        (1 to math.min(MmrPicks, docs.size)).iterator.map { pick =>
          val remaining = docs.filterNot(selected.contains)
          val best = remaining.map { d =>
            val score =
              if (selected.isEmpty) rel(d)
              else {
                val ms = selected.map(s => sim((d, s))).max
                math.floor(MmrLambda * rel(d).toDouble -
                  (1.0 - MmrLambda) * ms.toDouble + 0.5).toLong
              }
            (score, d)
          }.minBy { case (s, d) => (-s, d) }
          selected :+= best._2
          (q, pick, best._2)
        }
      }
      .toDF("query_id", "pick", "doc_id")
      .select(col("query_id"), col("pick").cast("int").as("pick"), col("doc_id"))
      .orderBy(col("query_id"), col("pick"))
  }

  private val mmrSql = {
    val nrm = "sqrt(list_sum(list_transform(range(1, len(embedding) + 1), " +
      "i -> (embedding::DOUBLE[])[i] * (embedding::DOUBLE[])[i])))"
    val dotQc = "list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))"
    val dotAb = "list_sum(list_transform(range(1, len(va.v) + 1), i -> va.v[i] * vb.v[i]))"
    val qids = RrfQueryVecs.mkString(", ")
    def step(j: Int): String = {
      val prev = (1 to j - 1).map(i => s"SELECT query_id, doc_id, $i AS pick FROM sel$i")
        .mkString(" UNION ALL ")
      s"""ss$j AS ($prev),
         |ms$j AS (SELECT p.query_id, p.a AS doc_id, max(p.sim_mu) AS ms
         |         FROM pairs p JOIN ss$j s
         |           ON s.query_id = p.query_id AND s.doc_id = p.b
         |         GROUP BY 1, 2),
         |sc$j AS (SELECT c.query_id, c.doc_id,
         |           CAST(floor($MmrLambda * c.rel_mu -
         |             ${1.0 - MmrLambda} * m.ms + 0.5) AS BIGINT) AS mmr_mu
         |         FROM cand c
         |         JOIN ms$j m ON m.query_id = c.query_id AND m.doc_id = c.doc_id
         |         LEFT JOIN ss$j s
         |           ON s.query_id = c.query_id AND s.doc_id = c.doc_id
         |         WHERE s.doc_id IS NULL),
         |sel$j AS (SELECT query_id, doc_id FROM sc$j
         |          QUALIFY row_number() OVER (PARTITION BY query_id
         |            ORDER BY mmr_mu DESC, doc_id) = 1)""".stripMargin
    }
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v, $nrm AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v, nrm FROM v WHERE vec_id IN ($qids)),
       |sc AS (SELECT q.query_id, c.vec_id, $dotQc / (q.nrm * c.nrm) AS cos
       |       FROM v c CROSS JOIN q WHERE c.vec_id != q.query_id),
       |cand AS (SELECT query_id, vec_id AS doc_id,
       |           CAST(floor(cos * 1e6 + 0.5) AS BIGINT) AS rel_mu
       |         FROM sc
       |         QUALIFY row_number() OVER (PARTITION BY query_id
       |           ORDER BY cos DESC, vec_id) <= $DenseTopK),
       |pairs AS (SELECT a.query_id, a.doc_id AS a, b.doc_id AS b,
       |            CAST(floor($dotAb / (va.nrm * vb.nrm) * 1e6 + 0.5) AS BIGINT) AS sim_mu
       |          FROM cand a JOIN cand b
       |            ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
       |          JOIN v va ON va.vec_id = a.doc_id
       |          JOIN v vb ON vb.vec_id = b.doc_id),
       |sel1 AS (SELECT query_id, doc_id FROM cand
       |         QUALIFY row_number() OVER (PARTITION BY query_id
       |           ORDER BY rel_mu DESC, doc_id) = 1),
       |${(2 to MmrPicks).map(step).mkString(",\n")}
       |SELECT query_id, CAST(pick AS INT) AS pick, doc_id FROM (
       |  ${(1 to MmrPicks).map(i => s"SELECT query_id, doc_id, $i AS pick FROM sel$i")
         .mkString(" UNION ALL ")})
       |ORDER BY query_id, pick""".stripMargin
  }

  /** Recall@k of the LSH-bucketed ANN against the brute-force exact
    * top-k — the POSITION-INSENSITIVE companion of [[annNdcg]] (a
    * registered, oracle-checked form of the AnnRecallSpec floors):
    * recall = |approx ∩ exact| / |exact| per query, exact integer
    * counts, one final division. The brute side is the whitelisted
    * ground-truth baseline; everything else is ≤k-row joins. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = Similarity.knnBrute(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val appr = Similarity.knnLsh(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    truth.join(appr, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        roundN(col("n_hit").cast("double") / col("n_exact"), 6).as("recall"))
      .orderBy(col("query_id"))
  }

  private val annRecallSql =
    s"""WITH truth AS (${Similarity.knnBruteSql}),
       |appr AS (${Similarity.knnLshSql}),
       |g AS (SELECT t.query_id, count(*) AS n_exact,
       |        CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
       |      FROM truth t LEFT JOIN appr a
       |        ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
       |      GROUP BY 1)
       |SELECT query_id, n_exact, n_hit,
       |  ${roundNSql("CAST(n_hit AS DOUBLE) / n_exact", 6)} AS recall
       |FROM g ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- map

  /** Mean-average-precision of the LSH ANN ranking against the brute
    * exact top-k — the position-sensitive companion of
    * [[annRecall]] (recall says HOW MANY exact neighbors the
    * approximate index returns; AP says WHERE it puts them):
    * AP(q) = Σ_{i: hit at position i} P@i / n_exact, P@i = hits
    * so far / i over the approximate ranking.
    *
    * Exactness: each P@i quantizes as the exact integer division
    * (cum·1e6) div i (all positive — truncation identical cross-engine),
    * so AP's numerator is an order-free BIGINT sum; the final
    * /1e6/n_exact is one fixed double tree. A query the approximate
    * index misses entirely scores AP = 0 (the honest read), via the
    * right join from the truth side.
    *
    * Scale shape: the candidate work IS the two registered ANN plans;
    * the cumulative-precision window partitions by query_id over ≤ k
    * rows each. */
  def annMap(spark: SparkSession, dir: String): DataFrame =
    mapOf(
      Similarity.knnBrute(spark, dir)
        .select(col("query_id"), col("neighbor_id")),
      Similarity.knnLsh(spark, dir)
        .select(col("query_id"), col("neighbor_id"), col("rank")))

  /** The AP fold over (query_id, neighbor_id) truth and
    * (query_id, neighbor_id, rank) approximate frames — exposed so the
    * spec can drive it with hand-built rankings. */
  private[graft] def mapOf(truth: DataFrame, appr: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val scored = appr
      .join(truth.withColumn("rel", lit(1L)), Seq("query_id", "neighbor_id"), "left")
      .withColumn("hit", coalesce(col("rel"), lit(0L)))
      .withColumn("cum", sum(col("hit")).over(w))
      .withColumn("p_mu",
        when(col("hit") === 1L, expr("(cum * 1000000) div rank"))
          .otherwise(lit(0L)))
      .groupBy(col("query_id"))
      .agg(sum(col("p_mu")).as("ap_mu"), sum(col("hit")).as("n_hit"))
    truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(scored, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        roundN(coalesce(col("ap_mu"), lit(0L)).cast("double") / 1e6 /
          col("n_exact"), 6).as("ap"))
      .orderBy(col("query_id"))
  }

  private val annMapSql =
    s"""WITH truth AS (${Similarity.knnBruteSql}),
       |appr AS (${Similarity.knnLshSql}),
       |h AS (SELECT a.query_id, a.rank,
       |        CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       |      FROM appr a LEFT JOIN truth t
       |        ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
       |c AS (SELECT query_id, rank, hit,
       |        CAST(sum(hit) OVER (PARTITION BY query_id ORDER BY rank) AS BIGINT)
       |          AS cum
       |      FROM h),
       |p AS (SELECT query_id,
       |        CAST(sum(CASE WHEN hit = 1 THEN (cum * 1000000) // rank ELSE 0 END)
       |          AS BIGINT) AS ap_mu,
       |        CAST(sum(hit) AS BIGINT) AS n_hit
       |      FROM c GROUP BY 1),
       |nex AS (SELECT query_id, count(*) AS n_exact FROM truth GROUP BY 1)
       |SELECT nex.query_id, n_exact, coalesce(n_hit, 0) AS n_hit,
       |  ${roundNSql("CAST(coalesce(ap_mu, 0) AS DOUBLE) / 1e6 / n_exact", 6)} AS ap
       |FROM nex LEFT JOIN p USING (query_id)
       |ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- mrr

  /** Mean reciprocal rank of the LSH ANN against the brute exact top-k —
    * the "how soon does the FIRST true neighbor appear" read beside
    * [[annRecall]] (how many) and [[annMap]] (where on average; AP is the
    * right metric when every true neighbor matters, RR when the user
    * stops at the first good one): RR(q) = 1/rank of the first exact
    * neighbor in the approximate ranking, 0 when the index returns none
    * of them; the query_id = −1 summary row carries MRR = Σ RR / n over
    * all truth queries.
    *
    * Exactness: RR quantizes as the exact integer division
    * 1e6 div rank (positive operands — truncation identical
    * cross-engine, the [[annMap]] P@i contract), so the summary
    * numerator is an order-free BIGINT sum; each output is one final
    * /1e6 (+ the summary's /n).
    *
    * Scale shape: the candidate work IS the two registered ANN plans;
    * first-hit is a ≤k-row min per query; the per-query table is
    * localCheckpointed so its rows and the 1-row summary share one
    * computation (the union-from-one-aggregate rule). */
  def annMrr(spark: SparkSession, dir: String): DataFrame =
    mrrOf(
      Similarity.knnBrute(spark, dir)
        .select(col("query_id"), col("neighbor_id")),
      Similarity.knnLsh(spark, dir)
        .select(col("query_id"), col("neighbor_id"), col("rank")))

  /** The RR fold over (query_id, neighbor_id) truth and
    * (query_id, neighbor_id, rank) approximate frames — exposed so the
    * spec can drive it with hand-built rankings. */
  private[graft] def mrrOf(truth: DataFrame, appr: DataFrame): DataFrame = {
    val first = appr.join(truth, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(min(col("rank")).cast("long").as("first_rank"))
    val per = truth.select(col("query_id")).distinct()
      .join(first, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rank"),
        when(col("first_rank").isNull, lit(0L))
          .otherwise(expr("1000000 div first_rank")).as("rr_mu"))
      .localCheckpoint()
    val summary = per
      .agg(count(lit(1)).as("n"), sum(col("rr_mu")).as("s"))
      .select(lit(-1L).as("query_id"), lit(null).cast("long").as("first_rank"),
        roundN(col("s").cast("double") / col("n") / 1e6, 6).as("rr"))
    per.select(col("query_id"), col("first_rank"),
        roundN(col("rr_mu").cast("double") / 1e6, 6).as("rr"))
      .unionByName(summary)
      .orderBy(col("query_id"))
  }

  private val annMrrSql =
    s"""WITH truth AS (${Similarity.knnBruteSql}),
       |appr AS (${Similarity.knnLshSql}),
       |fh AS (SELECT a.query_id, CAST(min(a.rank) AS BIGINT) AS first_rank
       |       FROM appr a JOIN truth t
       |         ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
       |       GROUP BY 1),
       |qs AS (SELECT DISTINCT query_id FROM truth),
       |per AS (SELECT qs.query_id, first_rank,
       |          CASE WHEN first_rank IS NULL THEN 0
       |               ELSE 1000000 // first_rank END AS rr_mu
       |        FROM qs LEFT JOIN fh USING (query_id)),
       |sm AS (SELECT count(*) AS n, CAST(sum(rr_mu) AS BIGINT) AS s FROM per)
       |SELECT query_id, first_rank,
       |  ${roundNSql("CAST(rr_mu AS DOUBLE) / 1e6", 6)} AS rr
       |FROM per
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(NULL AS BIGINT),
       |  ${roundNSql("CAST(s AS DOUBLE) / n / 1e6", 6)}
       |FROM sm
       |ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ interleave

  /** Team-draft rounds (interleaved list length = 2 × rounds) and the
    * click-model cut: clicks land on the RRF-fused top-K. K must be
    * SMALLER than the interleaved list (fused top-10 covers every pick of
    * both teams at harness scale — measured all-ties degenerate), and the
    * fused top-3 differentiates the teams at every SF. */
  val InterleaveRounds = 5
  val InterleaveRelK = 3

  /** Team-draft interleaving (Radlinski, Kurup & Joachims CIKM'08) of the
    * sparse BM25 ranking vs the dense cosine ranking, per query — the
    * online-comparison primitive ranking teams use instead of A/B splits:
    * each round a coin decides which ranker picks first, each ranker
    * contributes its best not-yet-picked document, and clicks on the
    * interleaved list credit the contributing team. Clicks are simulated
    * by the RRF-fused top-10 — the fusion treats both signals
    * symmetrically, so the click model favors neither team by
    * construction. The coin is md5(query_id|round) parity — deterministic
    * and unbiased across rounds.
    *
    * Exactness: team lists and the relevance set are rank lists already
    * pinned by the bm25/dense/rrf machinery; the draft itself is pure
    * integer/array logic (filter + contains over ≤ 10-element arrays), so
    * the whole simulation is engine-independent; the oracle replays it as
    * a recursive CTE carrying the used-list per query.
    *
    * Scale shape: candidate generation is exactly the RRF-multi plan; the
    * draft runs as ONE aggregate-HOF over the per-query rank arrays —
    * queries × (2·rounds) array steps, driver holds nothing. */
  def interleave(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sparse = TextAnalysis.bm25Multi(spark, dir)
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_sparse"))
    val dense = denseRanks(spark, dir, RrfQueryVecs)
    val fused = rrfOf(sparse,
      dense.select(col("query_id"), col("doc_id"), col("rank_dense")))
    val wR = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    val rel = fused.withColumn("rk", row_number().over(wR))
      .filter(col("rk") <= InterleaveRelK)
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(col("doc_id"))).as("rel"))
    def ranked(df: DataFrame, rankCol: String, out: String) =
      df.groupBy(col("query_id")).agg(transform(
        sort_array(collect_list(struct(col(rankCol).as("r"), col("doc_id").as("d")))),
        x => x.getField("d")).as(out))
    val base = ranked(sparse, "rank_sparse", "a")
      .join(ranked(dense, "rank_dense", "b"), Seq("query_id"))
      .join(rel, Seq("query_id"))
    draftOf(base)
  }

  /** The team-draft fold over a (query_id, a, b, rel) frame — exposed so
    * the spec can drive it with hand-built rankings. */
  private[graft] def draftOf(base: DataFrame): DataFrame = {
    // the draft, as one fold over rounds; every piece re-derives from the
    // round number r and the accumulated used-list (cheap ≤10-element
    // array ops, recomputed rather than staged — HOF lambdas can't bind
    // intermediates)
    val coin = "(CAST(conv(substring(md5(concat(CAST(query_id AS STRING), '|', " +
      "CAST(r AS STRING))), 1, 2), 16, 10) AS INT) % 2)"
    val first = s"IF($coin = 0, a, b)"
    val second = s"IF($coin = 0, b, a)"
    // get(, 0), not [0]: an exhausted team's filter yields an EMPTY array
    // and [0] throws INVALID_ARRAY_INDEX; get() returns NULL = "no pick"
    val p1 = s"get(filter($first, x -> NOT array_contains(acc.used, x)), 0)"
    val used1 = s"IF($p1 IS NULL, acc.used, array_append(acc.used, $p1))"
    val p2 = s"get(filter($second, x -> NOT array_contains($used1, x)), 0)"
    val used2 = s"IF($p2 IS NULL, $used1, array_append($used1, $p2))"
    def hit(p: String) =
      s"IF($p IS NOT NULL AND array_contains(rel, $p), 1L, 0L)"
    val draft =
      s"""aggregate(
         |  sequence(1, $InterleaveRounds),
         |  named_struct('used', slice(a, 1, 0), 'ca', 0L, 'cb', 0L),
         |  (acc, r) -> named_struct(
         |    'used', $used2,
         |    'ca', acc.ca + IF($coin = 0, ${hit(p1)}, ${hit(p2)}),
         |    'cb', acc.cb + IF($coin = 0, ${hit(p2)}, ${hit(p1)})))""".stripMargin
    base.select(col("query_id"), expr(draft).as("d"))
      .select(col("query_id"), col("d.ca").as("clicks_sparse"),
        col("d.cb").as("clicks_dense"))
      .withColumn("winner",
        when(col("clicks_sparse") > col("clicks_dense"), lit("sparse"))
          .when(col("clicks_dense") > col("clicks_sparse"), lit("dense"))
          .otherwise(lit("tie")))
      .orderBy(col("query_id"))
  }

  private val interleaveSql = {
    val nrm = "sqrt(list_sum(list_transform(range(1, len(embedding) + 1), " +
      "i -> (embedding::DOUBLE[])[i] * (embedding::DOUBLE[])[i])))"
    val dotQc = "list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))"
    val qids = RrfQueryVecs.mkString(", ")
    val coin = "((('0x' || substr(md5(CAST(rec.query_id AS VARCHAR) || '|' || " +
      "CAST(rec.r + 1 AS VARCHAR)), 1, 2))::INT) % 2)"
    val first = s"(CASE WHEN $coin = 0 THEN qa.a ELSE qa.b END)"
    val second = s"(CASE WHEN $coin = 0 THEN qa.b ELSE qa.a END)"
    val p1 = s"list_filter($first, x -> NOT list_contains(rec.used, x))[1]"
    val used1 = s"(CASE WHEN $p1 IS NULL THEN rec.used" +
      s" ELSE list_append(rec.used, $p1) END)"
    val p2 = s"list_filter($second, x -> NOT list_contains($used1, x))[1]"
    val used2 = s"(CASE WHEN $p2 IS NULL THEN $used1" +
      s" ELSE list_append($used1, $p2) END)"
    def hit(p: String) =
      s"(CASE WHEN $p IS NOT NULL AND list_contains(qa.rel, $p) THEN 1 ELSE 0 END)"
    s"""WITH RECURSIVE
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS v, $nrm AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v, nrm FROM v WHERE vec_id IN ($qids)),
       |dsc AS (SELECT q.query_id, c.vec_id, $dotQc / (q.nrm * c.nrm) AS cos
       |        FROM v c CROSS JOIN q WHERE c.vec_id != q.query_id),
       |dense AS (SELECT query_id, vec_id AS doc_id,
       |            CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank_dense
       |          FROM dsc QUALIFY rank_dense <= $DenseTopK),
       |sparse AS (SELECT query_id, doc_id, rank AS rank_sparse
       |           FROM (${TextAnalysis.bm25MultiSql}) b),
       |fused AS (SELECT query_id, doc_id,
       |            coalesce(1.0::DOUBLE / ($RrfK + rank_sparse), 0.0) +
       |            coalesce(1.0::DOUBLE / ($RrfK + rank_dense), 0.0) AS rrf
       |          FROM sparse FULL JOIN dense USING (query_id, doc_id)),
       |rel AS (SELECT query_id, list_sort(list(doc_id)) AS rel FROM (
       |          SELECT query_id, doc_id FROM fused
       |          QUALIFY row_number() OVER (PARTITION BY query_id
       |            ORDER BY rrf DESC, doc_id) <= $InterleaveRelK)
       |        GROUP BY 1),
       |qa AS (SELECT s.query_id, s.a, d.b, r.rel
       |       FROM (SELECT query_id, list(doc_id ORDER BY rank_sparse) AS a
       |             FROM sparse GROUP BY 1) s
       |       JOIN (SELECT query_id, list(doc_id ORDER BY rank_dense) AS b
       |             FROM dense GROUP BY 1) d ON s.query_id = d.query_id
       |       JOIN rel r ON s.query_id = r.query_id),
       |rec AS (
       |  SELECT query_id, 0 AS r, CAST([] AS BIGINT[]) AS used,
       |    CAST(0 AS BIGINT) AS ca, CAST(0 AS BIGINT) AS cb
       |  FROM qa
       |  UNION ALL
       |  SELECT rec.query_id, rec.r + 1,
       |    $used2,
       |    rec.ca + (CASE WHEN $coin = 0 THEN ${hit(p1)} ELSE ${hit(p2)} END),
       |    rec.cb + (CASE WHEN $coin = 0 THEN ${hit(p2)} ELSE ${hit(p1)} END)
       |  FROM rec JOIN qa ON rec.query_id = qa.query_id
       |  WHERE rec.r < $InterleaveRounds)
       |SELECT query_id, ca AS clicks_sparse, cb AS clicks_dense,
       |  CASE WHEN ca > cb THEN 'sparse' WHEN cb > ca THEN 'dense'
       |       ELSE 'tie' END AS winner
       |FROM rec WHERE r = $InterleaveRounds
       |ORDER BY query_id""".stripMargin
  }

  // ------------------------------------------------------------------- prf

  /** Pseudo-relevance feedback: docs fed back / expansion terms added. */
  val PrfFbDocs = 3
  val PrfExpTerms = 2

  /** RM3-style pseudo-relevance-feedback query expansion (Lavrenko &
    * Croft 2001; Abdul-Jaleel et al., the RM3 TREC form) — the standard
    * lexical-recall fix in IR stacks: run BM25, take each query's top
    * [[PrfFbDocs]] docs as pseudo-relevant, score candidate expansion
    * terms by Σ_d tf(t,d)/|d| over the feedback docs (stopwords and the
    * original query terms excluded), add the top [[PrfExpTerms]] terms,
    * and re-run BM25 with the expanded query. Output: the expanded
    * ranking with each doc's original rank alongside (NULL = the
    * expansion surfaced a doc the original query missed — the recall
    * win PRF exists for).
    *
    * Exactness: term weights quantize per (doc, term) to integer
    * micro-units before the order-free sum; expansion pick ties break on
    * term; both BM25 passes are the established bm25Of micro-unit
    * contract. Scale shape: two bm25Of passes (term-filter-first,
    * broadcast stats, bounded-heap top-k) plus a feedback join bounded
    * by queries × [[PrfFbDocs]] docs; expansion ranking is a
    * query-partitioned window over the feedback docs' vocabulary. */
  def prf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark2 = spark; import spark2.implicits._
    val queries = TextAnalysis.bm25QuerySet
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val words = TextAnalysis.wordsOf(spark, dir)
    val base = TextAnalysis.bm25Of(words, queries)
    val fb = base.filter(col("rank") <= PrfFbDocs)
      .select(col("query_id"), col("doc_id"))
    val dl = words.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val exp = fb.join(words, Seq("doc_id"))
      .groupBy(col("query_id"), col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .join(dl, Seq("doc_id"))
      .groupBy(col("query_id"), col("term"))
      .agg(sum(floor(col("tf").cast("double") / col("dl") * 1e6 + 0.5)
        .cast("long")).as("w_mu"))
      .filter(!col("term").isInCollection(TextAnalysis.stopwords))
      .join(queries, Seq("query_id", "term"), "left_anti")
      .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("w_mu").desc, col("term"))))
      .filter(col("rk") <= PrfExpTerms)
      .select(col("query_id"), col("term"))
    val rerun = TextAnalysis.bm25Of(words, queries.unionByName(exp))
    rerun
      .join(base.select(col("query_id"), col("doc_id"),
        col("rank").as("rank_orig")), Seq("query_id", "doc_id"), "left_outer")
      .select(col("query_id"), col("doc_id"), col("bm25"),
        col("rank").as("rank_exp"), col("rank_orig"))
      .orderBy(col("query_id"), col("rank_exp"))
  }

  private val prfSql = {
    import TextAnalysis.{Bm25B, Bm25K1, Bm25TopK, normSql}
    val k1p1 = Bm25K1 + 1.0
    val oneMinusB = 1.0 - Bm25B
    val qvals = TextAnalysis.bm25QuerySet
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    val stop = TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")
    // one BM25 pass against the query CTE `qn`, emitting `${p}rank`
    def pass(p: String, qn: String) =
      s"""${p}tf AS (SELECT doc_id, term, count(*) AS tf FROM wn
         |       WHERE term IN (SELECT DISTINCT term FROM $qn) GROUP BY 1, 2),
         |${p}df AS (SELECT term, count(*) AS df FROM ${p}tf GROUP BY 1),
         |${p}sc AS (SELECT t.doc_id, t.term,
         |         CAST(floor(ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
         |           * (tf * $k1p1 / (tf + $Bm25K1 * ($oneMinusB + $Bm25B * dl / avgdl)))
         |           * 1e6 + 0.5) AS BIGINT) AS s_micro
         |       FROM ${p}tf t JOIN ${p}df USING (term) JOIN dl USING (doc_id)
         |         CROSS JOIN stats),
         |${p}per AS (SELECT CAST(q.query_id AS BIGINT) AS query_id, s.doc_id,
         |          sum(s_micro) / 1e6 AS bm25
         |        FROM ${p}sc s JOIN $qn q USING (term) GROUP BY 1, 2),
         |${p}rank AS (SELECT query_id, doc_id, bm25,
         |          CAST(row_number() OVER (PARTITION BY query_id
         |            ORDER BY bm25 DESC, doc_id) AS INT) AS rank
         |        FROM ${p}per QUALIFY rank <= $Bm25TopK)""".stripMargin
    s"""WITH q(query_id, term) AS (VALUES $qvals),
       |w AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS term FROM documents),
       |wn AS (SELECT doc_id, term FROM w WHERE term != ''),
       |dl AS (SELECT doc_id, count(*) AS dl FROM wn GROUP BY 1),
       |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |${pass("b", "q")},
       |fb AS (SELECT query_id, doc_id FROM brank WHERE rank <= $PrfFbDocs),
       |tfd AS (SELECT fb.query_id, wn.doc_id, wn.term, count(*) AS tf
       |        FROM fb JOIN wn ON wn.doc_id = fb.doc_id GROUP BY 1, 2, 3),
       |tw AS (SELECT query_id, term,
       |         CAST(sum(CAST(floor(CAST(tf AS DOUBLE) / dl * 1e6 + 0.5) AS BIGINT))
       |           AS BIGINT) AS w_mu
       |       FROM tfd JOIN dl USING (doc_id)
       |       WHERE term NOT IN ($stop) GROUP BY 1, 2),
       |twx AS (SELECT * FROM tw WHERE NOT EXISTS (
       |          SELECT 1 FROM q WHERE q.query_id = tw.query_id AND q.term = tw.term)),
       |ex AS (SELECT query_id, term FROM twx
       |       QUALIFY row_number() OVER (PARTITION BY query_id
       |         ORDER BY w_mu DESC, term) <= $PrfExpTerms),
       |q2 AS (SELECT query_id, term FROM q
       |       UNION ALL SELECT query_id, term FROM ex),
       |${pass("x", "q2")}
       |SELECT x.query_id, x.doc_id, x.bm25, x.rank AS rank_exp, b.rank AS rank_orig
       |FROM xrank x LEFT JOIN brank b USING (query_id, doc_id)
       |ORDER BY x.query_id, rank_exp""".stripMargin
  }

  // ------------------------------------------------------------- dirichlet

  /** Dirichlet smoothing mass (Zhai-Lafferty 2001). Standard systems use
    * µ ≈ 2000 for news-length documents; the synthetic corpus' short docs
    * pin µ = 50 so the document model isn't fully swamped by the prior. */
  val QlMu = 50L

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai-Lafferty
    * 2001) — the language-modeling alternative to BM25 over the same
    * queries table: score(q,d) = Σ_{t∈q} log((tf + µ·P(t|C)) / (|d| + µ)),
    * decomposed into the sparse form
    * Σ_{t: tf>0} log(1 + tf·C/(µ·cf_t)) + Σ_t log(µ·cf_t/C) − |q|·log(|d|+µ)
    * so only matching (doc, term) pairs are ever materialized. Candidate
    * set is docs with ≥1 query-term hit (the standard inverted-index
    * convention — a no-hit doc's score is query-constant minus the length
    * penalty and is not ranked); query terms absent from the corpus drop
    * (their smoothed probability is undefined at cf = 0).
    *
    * Exactness: every log term micro-quantizes per (doc, term) / per term
    * / per doc BEFORE integer summation (the bm25Of s_micro contract);
    * tf·C and µ·cf are exact BIGINT products inside one double division
    * per log. score_µ = hits_µ + qconst_µ − |q|·len_µ is exact integer
    * arithmetic; the final /1e6 is the only float step.
    *
    * Scale shape: identical to [[TextAnalysis.bm25Of]] — term-filter-first
    * pruning before any shuffle, broadcast cf/stats, one corpus-keyed
    * join on doc_id, native bounded-heap per-query top-k, rank window
    * partitioned by query_id. */
  def qlDirichlet(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark; import spark2.implicits._
    val queries = TextAnalysis.bm25QuerySet
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    qlOf(TextAnalysis.wordsOf(spark, dir), queries)
  }

  private[operators] def qlOf(words: DataFrame, queries: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // round-12 optimization: derive the corpus token total from dl
    // (Σ dl ≡ count of word rows) — dl's exchange is reused by the final
    // scored join (ReuseExchange), so this replaces a full fourth corpus
    // scan+explode with a doc-count-sized re-aggregation of shuffle files
    // (the lmScore recipe). Persisting `words` itself was tried and
    // rejected — see bm25Of's note (measured slower at every scale we
    // can measure, and corpus-sized memory pressure at the scale we
    // cannot).
    val dl = words.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val ctot = broadcast(dl.agg(sum(col("dl")).as("c_tot")))
    val cf = broadcast(
      words.join(broadcast(queries.select(col("term")).distinct()), Seq("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cf")))
    // per-query constant: nq in-corpus terms, Σ log(µ·cf/C) micro-units
    val qg = broadcast(queries.join(cf, Seq("term")).crossJoin(ctot)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("nq"),
        sum(floor(log((lit(QlMu) * col("cf")).cast("double") / col("c_tot"))
          * 1e6 + 0.5).cast("long")).as("qc_mu")))
    val tf = words.join(broadcast(queries.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val hits = tf.join(cf, Seq("term")).crossJoin(ctot)
      .select(col("doc_id"), col("term"),
        floor(log(lit(1.0) + (col("tf") * col("c_tot")).cast("double")
          / (lit(QlMu) * col("cf"))) * 1e6 + 0.5).cast("long").as("h_mu"))
      .join(broadcast(queries), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("h_mu")).as("hits_mu"), count(lit(1)).as("n_terms_hit"))
    val scored = hits
      .join(dl, Seq("doc_id"))
      .join(qg, Seq("query_id"))
      .select(col("query_id"), col("doc_id"), col("n_terms_hit"),
        ((col("hits_mu") + col("qc_mu") -
          col("nq") * floor(log((col("dl") + lit(QlMu)).cast("double"))
            * 1e6 + 0.5).cast("long")) / 1e6).as("ql"))
    graft.plans.TopK.topK(scored, Seq("query_id"),
      Seq(("ql", true), ("doc_id", false)), TextAnalysis.Bm25TopK)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("ql").desc, col("doc_id"))).cast("int"))
      .select(col("query_id"), col("doc_id"), col("ql"), col("n_terms_hit"),
        col("rank"))
  }

  private val qlSql = {
    import TextAnalysis.{Bm25TopK, normSql}
    val qvals = TextAnalysis.bm25QuerySet
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""WITH q(query_id, term) AS (VALUES $qvals),
       |w AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS term FROM documents),
       |wn AS (SELECT doc_id, term FROM w WHERE term != ''),
       |dl AS (SELECT doc_id, count(*) AS dl FROM wn GROUP BY 1),
       |ctot AS (SELECT count(*) AS c_tot FROM wn),
       |cf AS (SELECT term, count(*) AS cf FROM wn
       |       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
       |qg AS (SELECT CAST(q.query_id AS BIGINT) AS query_id,
       |         count(*) AS nq,
       |         CAST(sum(CAST(floor(ln(CAST($QlMu * cf AS DOUBLE) / c_tot)
       |           * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS qc_mu
       |       FROM q JOIN cf USING (term) CROSS JOIN ctot GROUP BY 1),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM wn
       |       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
       |h AS (SELECT tf.doc_id, tf.term,
       |        CAST(floor(ln(1.0 + CAST(tf * c_tot AS DOUBLE) / ($QlMu * cf))
       |          * 1e6 + 0.5) AS BIGINT) AS h_mu
       |      FROM tf JOIN cf USING (term) CROSS JOIN ctot),
       |per AS (SELECT CAST(q.query_id AS BIGINT) AS query_id, h.doc_id,
       |          CAST(sum(h_mu) AS BIGINT) AS hits_mu, count(*) AS n_terms_hit
       |        FROM h JOIN q USING (term) GROUP BY 1, 2),
       |sc AS (SELECT per.query_id, per.doc_id,
       |         (hits_mu + qc_mu
       |           - nq * CAST(floor(ln(CAST(dl + $QlMu AS DOUBLE)) * 1e6 + 0.5)
       |               AS BIGINT)) / 1e6 AS ql,
       |         n_terms_hit
       |       FROM per JOIN dl USING (doc_id) JOIN qg USING (query_id))
       |SELECT query_id, doc_id, ql, n_terms_hit,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY ql DESC, doc_id) AS INT)
       |    AS rank
       |FROM sc
       |QUALIFY rank <= $Bm25TopK""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_retrieval_ql", qlDirichlet, Some(qlSql)),
    Q("q_retrieval_prf", prf, Some(prfSql)),
    Q("q_retrieval_interleave", interleave, Some(interleaveSql)),
    Q("q_retrieval_rrf", rrfFusion, Some(rrfSql)),
    Q("q_retrieval_rrf_multi", rrfFusionMulti, Some(rrfMultiSql)),
    Q("q_retrieval_mmr", mmr, Some(mmrSql)),
    Q("q_retrieval_mmr_multi", mmrMulti, Some(mmrSql)),
    Q("q_retrieval_recall", annRecall, Some(annRecallSql)),
    Q("q_retrieval_map", annMap, Some(annMapSql)),
    Q("q_retrieval_mrr", annMrr, Some(annMrrSql)),
    Q("q_retrieval_ndcg", annNdcg, Some(annNdcgSql)))
}
