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

  val queries: Seq[Q] = Seq(
    Q("q_sim_knn_pq", knnPq, None))
}
