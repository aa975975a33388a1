package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over the embedding corpus — the training step
  * behind the IVF ANN index (operators/Similarity.scala `q_sim_knn_ivf`
  * assigns to FIXED centroids; this operator is where those centroids come
  * from in a real pipeline).
  *
  * Scale design (the Spark MLlib shape):
  *  - Assignment is a NARROW per-row map: the k×Dim centroid state is
  *    driver-sized by definition (k=8, Dim=64 → 512 longs), so each
  *    iteration embeds the centroids as literals and scans the corpus
  *    once, computing argmin-of-k distances inline — zero shuffle, no
  *    join, at any corpus size.
  *  - Recompute is ONE hash aggregate per iteration: `sum(element_at(t,i))`
  *    per dimension + count, grouped by the assigned cluster — 65 primitive
  *    map-side-combinable sums; the shuffle carries k×(Dim+1) longs per
  *    mapper, independent of corpus size. No explode, no window.
  *  - The argmin packs (dist, cid) into one BIGINT (`dist*64 + cid`,
  *    lower cid wins ties) so the champion is a `least(...)` of primitives
  *    inside whole-stage codegen — same trick as operators/Cdc.scala.
  *
  * Exactness (why this is oracle-checkable): embeddings quantize to
  * integer millionth-ticks; distances are exact BIGINT sums of squares;
  * recomputed centroid components round to integer ticks through the
  * engine-portable `floor(sum/n + 0.5)` (one IEEE double division on
  * exact inputs — identical bits both engines). Iteration count and
  * init (the k lowest vec_ids) are fixed, so the full trajectory is
  * deterministic. Inertia fits BIGINT while corpus < ~9e3 × tick²·Dim;
  * at larger corpora drop Ticks to 1e4 (the constant is a parameter,
  * not a plan property).
  */
object KMeans {

  val K = 8
  val Dim = 64
  val Ticks = 1e6
  val Iterations = 2 // recompute rounds; assignment runs Iterations+1 times

  /** Integer millionth-ticks of the embedding vector. */
  private def ticks: Column =
    transform(col("embedding"),
      x => floor(x.cast("double") * Ticks + 0.5).cast("long"))

  /** Packed argmin over the k literal centroids: min over j of
    * (squared-distance(t, c_j) * 64 + j), through the codegen'd
    * [[graft.functions.ArgMinSqDist]] — the centroid table compiles into
    * the generated code as a `long[][]` constant, so assignment is a tight
    * primitive loop inside whole-stage codegen, not k interpreted
    * higher-order-function folds per row. */
  private def packedAssign(cents: Array[Array[Long]]): Column =
    call_function("vec_argmin_sqdist", col("t"),
      typedLit(cents.map(_.toSeq).toSeq))

  /** The Lloyd loop over a persisted (vec_id, t) frame: init from the K
    * lowest vec_ids, `Iterations` assign+recompute rounds. Returns the
    * k×Dim tick centroids — driver-sized by definition (the justified
    * k-row collect pattern). */
  private def lloyd(v: DataFrame): Array[Array[Long]] = {
    // init: the K lowest vec_ids' tick vectors
    var cents: Array[Array[Long]] = v.orderBy(col("vec_id")).limit(K)
      .select(col("t")).collect()
      .map(_.getSeq[Long](0).toArray)

    for (_ <- 1 to Iterations) {
      val assigned = v.select(
        pmod(packedAssign(cents), lit(64L)).cast("int").as("cid"), col("t"))
      val aggCols = (1 to Dim).map(i =>
        sum(element_at(col("t"), i)).as(s"s$i")) :+ count(lit(1)).as("n")
      val stats: Array[Row] = assigned.groupBy(col("cid"))
        .agg(aggCols.head, aggCols.tail: _*).collect()
      val next = cents.map(_.clone()) // empty clusters keep their centroid
      stats.foreach { r =>
        val cid = r.getAs[Int]("cid")
        val n = r.getAs[Long]("n")
        next(cid) = (1 to Dim).map(i =>
          math.floor(r.getAs[Long](s"s$i").toDouble / n + 0.5).toLong).toArray
      }
      cents = next
    }
    cents
  }

  /** Trained centroid tick vectors for downstream index builds (the IVF
    * codebook in Similarity.knnIvfTrained). */
  def trainCentroids(spark: SparkSession, dir: String): Array[Array[Long]] = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), ticks.as("t"))
      .persist()
    try lloyd(v) finally v.unpersist()
  }

  /** Run Lloyd iterations; returns per-cluster (cid, n_members, inertia,
    * centroid_sum) after the final assignment. */
  def kmeans(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), ticks.as("t"))
      .persist()
    try {
      val cents = lloyd(v)
      val centroidSums = cents.zipWithIndex
        .map { case (c, j) => (j, c.sum) }.toSeq
      val sums = spark.createDataFrame(centroidSums)
        .toDF("cid2", "centroid_sum")
      v.select(packedAssign(cents).as("packed"))
        .groupBy(pmod(col("packed"), lit(64L)).cast("int").as("cid"))
        .agg(count(lit(1)).as("n_members"),
          sum(expr("packed div 64")).as("inertia"))
        .join(broadcast(sums), col("cid") === col("cid2"))
        .select(col("cid"), col("n_members"), col("inertia"), col("centroid_sum"))
        .orderBy(col("cid"))
    } finally v.unpersist()
  }

  /** The same trajectory unrolled in SQL: long-form (cid, i, x) centroids,
    * distances by list index, identical integer rounding. */
  private val kmeansSql = {
    def dist(c: String) =
      s"SELECT v.vec_id, c.cid, sum((v.t[c.i]-c.x)*(v.t[c.i]-c.x)) AS dist FROM v, $c c GROUP BY 1, 2"
    def step(d: String, cPrev: String, a: String, n: String, c: String) =
      s"""$a AS (SELECT vec_id, CAST(min(dist*64+cid) % 64 AS INTEGER) AS cid FROM $d GROUP BY 1),
         |$n AS (SELECT cid, count(*) AS n FROM $a GROUP BY 1),
         |$c AS (
         |  SELECT * FROM (
         |    SELECT $a.cid, r.i AS i,
         |      CAST(floor(CAST(sum(v.t[r.i]) AS DOUBLE) / max($n.n) + 0.5) AS BIGINT) AS x
         |    FROM $a JOIN v USING (vec_id) JOIN $n USING (cid), range(1, ${Dim + 1}) AS r(i)
         |    GROUP BY 1, 2)
         |  UNION ALL
         |  SELECT p.cid, p.i, p.x FROM $cPrev p WHERE p.cid NOT IN (SELECT cid FROM $n))""".stripMargin
    s"""WITH v AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS t
       |  FROM embeddings),
       |c0 AS (
       |  SELECT cid, r.i AS i, t[r.i] AS x
       |  FROM (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, t
       |        FROM (SELECT * FROM v ORDER BY vec_id LIMIT $K)) b,
       |       range(1, ${Dim + 1}) AS r(i)),
       |d1 AS (${dist("c0")}),
       |${step("d1", "c0", "a1", "n1", "c1")},
       |d2 AS (${dist("c1")}),
       |${step("d2", "c1", "a2", "n2", "c2")},
       |d3 AS (${dist("c2")}),
       |fin AS (SELECT vec_id, min(dist*64+cid) AS packed FROM d3 GROUP BY 1),
       |csum AS (SELECT cid, CAST(sum(x) AS BIGINT) AS centroid_sum FROM c2 GROUP BY 1)
       |SELECT CAST(packed % 64 AS INTEGER) AS cid, count(*) AS n_members,
       |  CAST(sum(packed // 64) AS BIGINT) AS inertia, csum.centroid_sum
       |FROM fin JOIN csum ON CAST(packed % 64 AS INTEGER) = csum.cid
       |GROUP BY 1, csum.centroid_sum
       |ORDER BY 1""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_embed_kmeans", kmeans, Some(kmeansSql), bench = true))
}
