package graft.operators

import graft.Q
import graft.functions.Rounding.roundN
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization ANN — the classic memory-bound trade: split each
  * vector into M subspaces, k-means each subspace to K codewords, store
  * each vector as M small codes (here 8×4 bits = 4 bytes for a 256-byte
  * float vector), and answer queries by Asymmetric Distance Computation:
  * per query, a (M×K) table of exact subspace distances; a vector's
  * approximate distance is the sum of M table lookups over its codes.
  * Candidates then re-rank by exact cosine. (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — public.)
  *
  * Scale shape:
  *  - Training iterates ONE job per Lloyd round for ALL subspaces: the
  *    corpus explodes once into (vec_id, m, subvector) rows, assignment is
  *    the compiled `pq_assign` argmin dispatching per-m over the M
  *    codebooks shipped as ONE Broadcast held by the expression
  *    (driver-state by definition: M×K×(Dim/M) longs; plan size is
  *    M- and K-independent — functions/Codebooks.scala),
  *    and recompute is one hash aggregate grouped by (m, cid) —
  *    map-side-combinable, M×K×(Dim/M+1) longs per mapper on the wire.
  *  - ADC is relational here: codes ⋈ broadcast distance-table on
  *    (query, m, code), one sum per (query, vector). A columnar engine
  *    would scan packed codes with SIMD lookups; the plan shape (narrow
  *    scan + broadcast + partial agg) is the distributed equivalent.
  *  - Candidate cut = the native bounded-heap top-k operator
  *    (plans/TopK.scala) per query — no sort of the corpus-sized
  *    approx-distance relation. Exact re-rank touches only
  *    queries × CandidateFactor·TopK rows.
  *
  * Training and codes are exact-integer (millionth ticks, the KMeans
  * discipline) so the whole trajectory is deterministic; the final cosine
  * re-rank reuses the engine-wide rounded form. Registered rows-only (an
  * 8-codebook unrolled-SQL oracle is not reasonable); PqSpec asserts
  * determinism, code-range bounds, and recall@5 against the oracle-checked
  * brute-force query.
  */
object Pq {

  val M = 8 // subspaces
  val SubDim = Similarity.Dim / M
  val K = 16 // codewords per subspace
  val Iterations = 2
  /** Candidates re-ranked per query, as a multiple of TopK. 4 bits per
    * subspace is a coarse sketch on near-random unit vectors (the
    * synthetic corpus has little cluster structure for the codebooks to
    * exploit), so PQ leans on re-rank depth for recall — the standard
    * PQ deployment knob. */
  val CandidateFactor = 12

  /** Millionth-ticks of the UNIT-normalized vector: on the unit sphere,
    * squared L2 order is exactly cosine order (‖a−b‖² = 2−2·cosθ), so the
    * ADC ranking targets the same metric the re-rank and the brute-force
    * ground truth use. */
  private def ticks: Column = {
    val v = col("embedding").cast("array<double>")
    val nrm = sqrt(call_function("vec_dot", v, v))
    transform(v, x => floor(x / nrm * 1e6 + 0.5).cast("long"))
  }

  /** (vec_id, m, st): one row per vector per subspace. */
  private def subvectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), ticks.as("t"))
      .select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${M - 1}), m -> struct(m AS m, slice(t, m * $SubDim + 1, $SubDim) AS st))"))
        .as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.st").as("st"))

  /** Per-m packed assignment through the compiled argmin: ONE expression
    * holding all M codebooks via Broadcast (functions/Codebooks.scala),
    * dispatching on the `m` column — plan size independent of M and K,
    * vs the old M-way `when` chain over M literal codebooks (O(M·K·dim)
    * plan). Each call site broadcasts the current codebook state once. */
  private def packedAssign(spark: SparkSession,
      books: Array[Array[Array[Long]]]): Column =
    graft.functions.Codebooks.pqAssign(col("m"), col("st"),
      spark.sparkContext.broadcast(books))

  /** Train all M codebooks: one assignment+recompute job per round. */
  private[operators] def train(sub: DataFrame): Array[Array[Array[Long]]] = {
    val init = sub.filter(col("vec_id") < K).orderBy(col("m"), col("vec_id"))
      .select(col("m"), col("st")).collect()
      .groupBy(_.getAs[Int]("m"))
    var books: Array[Array[Array[Long]]] = Array.tabulate(M) { m =>
      init(m).map(_.getSeq[Long](1).toArray)
    }
    for (_ <- 1 to Iterations) {
      val assigned = sub.select(col("m"),
        pmod(packedAssign(sub.sparkSession, books), lit(64L)).cast("int").as("cid"),
        col("st"))
      val aggCols = (1 to SubDim).map(i =>
        sum(element_at(col("st"), i)).as(s"s$i")) :+ count(lit(1)).as("n")
      val stats: Array[Row] = assigned.groupBy(col("m"), col("cid"))
        .agg(aggCols.head, aggCols.tail: _*).collect()
      val next = books.map(_.map(_.clone()))
      stats.foreach { r =>
        val (m, cid, n) = (r.getAs[Int]("m"), r.getAs[Int]("cid"), r.getAs[Long]("n"))
        next(m)(cid) = (1 to SubDim).map(i =>
          math.floor(r.getAs[Long](s"s$i").toDouble / n + 0.5).toLong).toArray
      }
      books = next
    }
    books
  }

  /** Full PQ kNN: train → encode → ADC candidates → exact re-rank. */
  def knnPq(spark: SparkSession, dir: String): DataFrame = {
    val sub = subvectors(spark, dir).persist()
    try {
      val books = train(sub)

      // encode: (vec_id, m, code)
      val codes = sub.select(col("vec_id"), col("m"),
        pmod(packedAssign(spark, books), lit(64L)).cast("int").as("code"))

      // ADC tables: (query_id, m, code, d) — queries × M × K rows, exact ints
      val bookDf = spark.createDataFrame(
        for { m <- books.indices; c <- books(m).indices }
          yield (m, c, books(m)(c).toSeq))
        .toDF("bm", "code", "cent")
      val queries = sub.filter(col("vec_id") % Similarity.QueryStride === 0)
        .select(col("vec_id").as("query_id"), col("m").as("qm"), col("st").as("qst"))
      val tables = queries.join(broadcast(bookDf), col("qm") === col("bm"))
        .select(col("query_id"), col("qm").as("m"), col("code"),
          aggregate(zip_with(col("qst"), col("cent"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d"))

      // approx distance = sum of M lookups; drop self-matches
      val approx = codes.join(broadcast(tables), Seq("m", "code"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("d")).as("approx_d"))

      // candidate cut through the native bounded-heap top-k per query
      val candidates = graft.plans.TopK.topK(
        approx, Seq("query_id"), Seq(("approx_d", false), ("vec_id", false)),
        CandidateFactor * Similarity.TopK)

      // exact cosine re-rank on the candidate set only
      val vecs = Tables.embeddings(spark, dir).select(
        col("vec_id").as("v_id"), col("embedding").cast("array<double>").as("v"))
      val nrm = sqrt(call_function("vec_dot", col("v"), col("v")))
      val withNorm = vecs.select(col("v_id"), col("v"), nrm.as("nrm"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      candidates
        .join(withNorm.select(col("v_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn")), Seq("query_id"))
        .join(withNorm.select(col("v_id").as("vec_id"), col("v").as("cv"),
          col("nrm").as("cn")), Seq("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          roundN(call_function("vec_dot", col("qv"), col("cv")) /
            (col("qn") * col("cn")), 6).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= Similarity.TopK)
    } finally sub.unpersist()
  }

  /** Round-10 whitelist shrink #3: the scaladoc above said "an 8-codebook
    * unrolled-SQL oracle is not reasonable" — but the codebooks don't need
    * unrolling PER BOOK: in long form (m, cid, i, x) ONE Lloyd CTE chain
    * trains all M subspaces at once (the kmeansCtesSql construction keyed
    * by (m, cid) instead of cid), and the encode → ADC → candidate-cut →
    * re-rank tail is four more aggregates. Every step is integer-exact
    * (unit-tick quantization is one IEEE division per element on both
    * engines; distances, packing, and table lookups are BIGINT), so the
    * full train→encode→probe trajectory hash-matches. */
  private lazy val knnPqSql = {
    def step(d: String, cPrev: String, a: String, n: String, c: String) =
      s"""$a AS (SELECT vec_id, m, CAST(min(dist*64+cid) % 64 AS INTEGER) AS cid FROM $d GROUP BY 1, 2),
         |$n AS (SELECT m, cid, count(*) AS n FROM $a GROUP BY 1, 2),
         |$c AS MATERIALIZED (
         |  SELECT * FROM (
         |    SELECT a.m, a.cid, s.i,
         |      CAST(floor(CAST(sum(s.x) AS DOUBLE) / max(n.n) + 0.5) AS BIGINT) AS x
         |    FROM $a a JOIN sub s ON a.vec_id = s.vec_id AND a.m = s.m
         |              JOIN $n n ON a.m = n.m AND a.cid = n.cid
         |    GROUP BY 1, 2, 3)
         |  UNION ALL
         |  SELECT p.m, p.cid, p.i, p.x FROM $cPrev p
         |  WHERE NOT EXISTS (SELECT 1 FROM $n n WHERE n.m = p.m AND n.cid = p.cid))""".stripMargin
    def dist(c: String, d: String) =
      s"""$d AS (SELECT s.vec_id, s.m, c.cid, sum((s.x - c.x)*(s.x - c.x)) AS dist
         |  FROM sub s JOIN $c c ON s.m = c.m AND s.i = c.i GROUP BY 1, 2, 3)""".stripMargin
    val cosineSql = Similarity.cosineSql
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |tk AS MATERIALIZED (
       |  SELECT vec_id, list_transform(v, x -> CAST(floor(x / nrm * 1e6 + 0.5) AS BIGINT)) AS t
       |  FROM (SELECT vec_id, v,
       |          sqrt(list_sum(list_transform(range(1, ${Similarity.Dim + 1}), i -> v[i]*v[i]))) AS nrm
       |        FROM e)),
       |sub AS MATERIALIZED (
       |  SELECT vec_id, mm.m AS m, r.i AS i, t[mm.m * $SubDim + r.i] AS x
       |  FROM tk, range(0, $M) AS mm(m), range(1, ${SubDim + 1}) AS r(i)),
       |cidmap AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
       |           FROM (SELECT DISTINCT vec_id FROM tk WHERE vec_id < $K)),
       |c0 AS (SELECT s.m, cm.cid, s.i, s.x FROM sub s JOIN cidmap cm ON s.vec_id = cm.vec_id),
       |${dist("c0", "d1")},
       |${step("d1", "c0", "a1", "n1", "c1")},
       |${dist("c1", "d2")},
       |${step("d2", "c1", "a2", "n2", "c2")},
       |${dist("c2", "d3")},
       |codes AS MATERIALIZED (
       |  SELECT vec_id, m, CAST(min(dist*64+cid) % 64 AS INTEGER) AS code FROM d3 GROUP BY 1, 2),
       |qd AS (SELECT s.vec_id AS query_id, s.m, c.cid AS code, sum((s.x - c.x)*(s.x - c.x)) AS d
       |       FROM sub s JOIN c2 c ON s.m = c.m AND s.i = c.i
       |       WHERE s.vec_id % ${Similarity.QueryStride} = 0 GROUP BY 1, 2, 3),
       |ap AS (SELECT q.query_id, cd.vec_id, sum(q.d) AS approx_d
       |       FROM codes cd JOIN qd q ON cd.m = q.m AND cd.code = q.code
       |       WHERE cd.vec_id != q.query_id GROUP BY 1, 2),
       |cand AS (SELECT query_id, vec_id FROM (
       |           SELECT query_id, vec_id,
       |             row_number() OVER (PARTITION BY query_id ORDER BY approx_d, vec_id) AS rn
       |           FROM ap) WHERE rn <= ${CandidateFactor * Similarity.TopK}),
       |v0 AS (${Similarity.vectorsSql})
       |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosineSql AS sim,
       |  CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY $cosineSql DESC, c.vec_id) AS INT) AS rank
       |FROM cand JOIN v0 q ON q.vec_id = cand.query_id JOIN v0 c ON c.vec_id = cand.vec_id
       |QUALIFY rank <= ${Similarity.TopK}""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_sim_knn_pq", knnPq, Some(knnPqSql)))
}
