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
  /** The Lloyd trajectory as a reusable WITH-chain body ending at `fin`
    * (vec_id, packed) and `c2` (final centroids) — shared by the kmeans
    * oracle and the cluster-cards oracle so both label the IDENTICAL
    * clustering. */
  private[operators] val kmeansCtesSql = {
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
    s"""v AS (
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
       |fin AS (SELECT vec_id, min(dist*64+cid) AS packed FROM d3 GROUP BY 1)""".stripMargin
  }

  private val kmeansSql =
    s"""WITH $kmeansCtesSql,
       |csum AS (SELECT cid, CAST(sum(x) AS BIGINT) AS centroid_sum FROM c2 GROUP BY 1)
       |SELECT CAST(packed % 64 AS INTEGER) AS cid, count(*) AS n_members,
       |  CAST(sum(packed // 64) AS BIGINT) AS inertia, csum.centroid_sum
       |FROM fin JOIN csum ON CAST(packed % 64 AS INTEGER) = csum.cid
       |GROUP BY 1, csum.centroid_sum
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- cards

  /** Distinctive terms kept per cluster / minimum in-cluster frequency. */
  val CardTopK = 3
  val CardMinTf = 5

  /** Cluster cards — the human-readable labels a curation pipeline
    * attaches to embedding clusters: per k-means cluster, the
    * [[CardTopK]] most DISTINCTIVE words of its member documents
    * (doc_id = vec_id id space) by term lift
    * (share-in-cluster / share-in-corpus), minimum [[CardMinTf]]
    * in-cluster occurrences so rare terms can't dominate.
    *
    * Exactness: the clustering is the exact registered Lloyd trajectory
    * ([[lloyd]] — the oracle replays it via the shared CTE chain); lift
    * stages to integers in two bounded steps, share_mu = (tf·1e6) div N
    * per side then (a_mu·1e6) div b_mu — each product ≤ 1e12, no BIGINT
    * edge at any corpus size, fully order-free. Ties break on term.
    *
    * Scale shape: assignment is the narrow packed-argmin scan; term
    * stats are two keyed aggregates; ranking is a cluster-partitioned
    * window over the (cluster × vocab) table — vocabulary-bounded. */
  def clusterCards(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), ticks.as("t"))
      .persist()
    val cents = try lloyd(v) finally v.unpersist()
    val asg = Tables.embeddings(spark, dir)
      .select(col("vec_id"), ticks.as("t"))
      .select(col("vec_id"), pmod(packedAssign(cents), lit(64L)).cast("int").as("cid"))
    val words = TextAnalysis.wordsOf(spark, dir)
    val inCluster = words.join(asg, words("doc_id") === asg("vec_id"))
      .groupBy(col("cid"), col("term")).agg(count(lit(1)).as("tf_c"))
    val nC = inCluster.groupBy(col("cid")).agg(sum(col("tf_c")).as("n_c"))
    val tot = words.groupBy(col("term")).agg(count(lit(1)).as("tf_tot"))
    val nTot = broadcast(tot.agg(sum(col("tf_tot")).as("n_tot")))
    inCluster
      .join(nC, Seq("cid"))
      .join(tot, Seq("term"))
      .crossJoin(nTot)
      .filter(col("tf_c") >= CardMinTf)
      .withColumn("a_mu", expr("(tf_c * 1000000) div n_c"))
      .withColumn("b_mu", expr("(tf_tot * 1000000) div n_tot"))
      .filter(col("b_mu") > 0L)
      .withColumn("lift_mu", expr("(a_mu * 1000000) div b_mu"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("cid"))
        .orderBy(col("lift_mu").desc, col("term"))))
      .filter(col("rk") <= CardTopK)
      .select(col("cid"), col("rk").cast("long").as("rk"), col("term"),
        col("tf_c"),
        graft.functions.Rounding.roundN(
          col("lift_mu").cast("double") / 1e6, 6).as("lift"))
      .orderBy(col("cid"), col("rk"))
  }

  private val clusterCardsSql = {
    import TextAnalysis.normSql
    s"""WITH $kmeansCtesSql,
       |asg AS (SELECT vec_id, CAST(packed % 64 AS INTEGER) AS cid FROM fin),
       |w AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS term FROM documents),
       |wn AS (SELECT doc_id, term FROM w WHERE term != ''),
       |ic AS (SELECT cid, term, count(*) AS tf_c
       |       FROM wn JOIN asg ON wn.doc_id = asg.vec_id GROUP BY 1, 2),
       |ncl AS (SELECT cid, CAST(sum(tf_c) AS BIGINT) AS n_c FROM ic GROUP BY 1),
       |tot AS (SELECT term, count(*) AS tf_tot FROM wn GROUP BY 1),
       |ntot AS (SELECT CAST(sum(tf_tot) AS BIGINT) AS n_tot FROM tot),
       |sc AS (SELECT ic.cid, ic.term, ic.tf_c,
       |         CAST((ic.tf_c * 1000000) // ncl.n_c AS BIGINT) AS a_mu,
       |         CAST((tot.tf_tot * 1000000) // ntot.n_tot AS BIGINT) AS b_mu
       |       FROM ic JOIN ncl USING (cid) JOIN tot USING (term) CROSS JOIN ntot
       |       WHERE ic.tf_c >= $CardMinTf),
       |lf AS (SELECT cid, term, tf_c,
       |         CAST((a_mu * 1000000) // b_mu AS BIGINT) AS lift_mu
       |       FROM sc WHERE b_mu > 0)
       |SELECT cid, CAST(rk AS BIGINT) AS rk, term, tf_c,
       |  ${roundNSqlRef("CAST(lift_mu AS DOUBLE) / 1e6", 6)} AS lift
       |FROM (SELECT *, row_number() OVER (PARTITION BY cid
       |        ORDER BY lift_mu DESC, term) AS rk FROM lf)
       |WHERE rk <= $CardTopK
       |ORDER BY cid, rk""".stripMargin
  }

  private def roundNSqlRef(e: String, n: Int): String =
    graft.functions.Rounding.roundNSql(e, n)

  // ------------------------------------------------ clustering quality

  /** Exact squared tick distance to one literal centroid (narrow per-row
    * HOF over the 64-element vector — no shuffle, no join). */
  private def sqDistTo(c: Array[Long]): Column =
    aggregate(
      zip_with(col("t"), typedLit(c.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, z) => acc + z)

  /** Simplified silhouette (Hruschka et al. — the centroid-distance form
    * every large-scale evaluator uses, because the classic silhouette's
    * mean pairwise distance is O(n²)): per point, a = distance to its own
    * centroid, b = distance to the nearest OTHER centroid,
    * s = (b − a) / max(a, b); reported as the per-cluster mean plus the
    * cid = -1 corpus row. The clustering is the exact registered Lloyd
    * trajectory ([[lloyd]] — the oracle replays it through the shared CTE
    * chain, whose `d3` table already holds every point-centroid distance).
    *
    * Exactness: squared distances are exact BIGINTs; sqrt / subtract /
    * divide is ONE fixed double tree on identical integers in both
    * engines, quantized to micro-units before the order-free integer
    * mean. A point equidistant-at-zero from two centroids scores 0.
    *
    * Scale shape: one narrow per-row scan computes all k distances inside
    * a bounded HOF (k×Dim literals ride in the plan); one k-row hash
    * aggregate; the corpus row derives from the localCheckpointed k-row
    * table. No window, no join, no second corpus pass. */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    val v0 = Tables.embeddings(spark, dir)
      .select(col("vec_id"), ticks.as("t")).persist()
    val cents = try lloyd(v0) finally v0.unpersist()
    val dCols = cents.indices.map(j => sqDistTo(cents(j)).as(s"d$j"))
    val dd = Tables.embeddings(spark, dir).select(ticks.as("t"))
      .select(dCols: _*)
    val packed = least(cents.indices.map(j =>
      col(s"d$j") * lit(64L) + lit(j.toLong)): _*)
    val withOwn = dd.select(
      (packed.as("packed") +: cents.indices.map(j => col(s"d$j"))): _*)
    val own = pmod(col("packed"), lit(64L)).cast("int")
    val a2 = expr("packed div 64")
    val b2 = least(cents.indices.map(j => when(own =!= j, col(s"d$j"))): _*)
    val s = withOwn.select(
      own.as("cid"),
      when(greatest(a2, b2) === 0L, lit(0L))
        .otherwise(floor((sqrt(b2) - sqrt(a2)) / sqrt(greatest(a2, b2))
          * lit(1e6) + lit(0.5)).cast("long"))
        .as("s_mu"))
    val g = s.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), sum(col("s_mu")).as("ssum"))
      .localCheckpoint()
    val overall = g
      .agg(sum(col("n_members")).as("n_members"), sum(col("ssum")).as("ssum"))
      .select(lit(-1).cast("int").as("cid"), col("n_members"),
        graft.functions.Rounding.roundN(
          col("ssum").cast("double") / col("n_members") / 1e6, 6).as("mean_sil"))
    g.select(col("cid"), col("n_members"),
        graft.functions.Rounding.roundN(
          col("ssum").cast("double") / col("n_members") / 1e6, 6).as("mean_sil"))
      .unionByName(overall)
      .orderBy(col("cid"))
  }

  private val silhouetteSql =
    s"""WITH $kmeansCtesSql,
       |own AS (SELECT vec_id, CAST(packed % 64 AS INTEGER) AS cid,
       |          CAST(packed // 64 AS BIGINT) AS a2 FROM fin),
       |ob AS (SELECT o.vec_id, CAST(min(d.dist) AS BIGINT) AS b2
       |       FROM own o JOIN d3 d ON d.vec_id = o.vec_id AND d.cid != o.cid
       |       GROUP BY 1),
       |s AS (SELECT o.cid,
       |        CASE WHEN greatest(a2, b2) = 0 THEN 0
       |             ELSE CAST(floor((sqrt(b2) - sqrt(a2)) / sqrt(greatest(a2, b2))
       |                    * 1e6 + 0.5) AS BIGINT)
       |        END AS s_mu
       |      FROM own o JOIN ob USING (vec_id)),
       |g AS (SELECT cid, count(*) AS n_members, CAST(sum(s_mu) AS BIGINT) AS ssum
       |      FROM s GROUP BY 1)
       |SELECT cid, n_members,
       |  ${roundNSqlRef("CAST(ssum AS DOUBLE) / n_members / 1e6", 6)} AS mean_sil
       |FROM g
       |UNION ALL
       |SELECT CAST(-1 AS INTEGER) AS cid, CAST(sum(n_members) AS BIGINT) AS n_members,
       |  ${roundNSqlRef("CAST(sum(ssum) AS DOUBLE) / sum(n_members) / 1e6", 6)} AS mean_sil
       |FROM g
       |ORDER BY cid""".stripMargin

  /** Davies-Bouldin index over the same Lloyd clustering: per cluster,
    * S_i = mean member-to-centroid distance, R_i = max over other
    * clusters of (S_i + S_j) / ‖c_i − c_j‖, and the cid = -1 row is the
    * index itself — the mean of the R_i (lower = better-separated).
    *
    * Exactness: member distances quantize to micro-ticks before the
    * order-free integer mean; S_i re-floors through one double division
    * on exact integers; centroid separations are exact BIGINT squared
    * sums (driver-side on the k×Dim literals — the oracle recomputes
    * them from the shared `c2` CTE); every ratio is a fixed double tree,
    * maxed (order-free) then micro-quantized before the k-row mean.
    * Coincident centroids (separation 0) are excluded from R_i's max and
    * a cluster with no valid pair carries NULL (dropped from the index
    * mean) — documented, like the psm empty-arm rule.
    *
    * Scale shape: assignment is the narrow packed-argmin scan; one k-row
    * aggregate; all pair work runs on the k²-row literal table. */
  def daviesBouldin(spark: SparkSession, dir: String): DataFrame = {
    val v0 = Tables.embeddings(spark, dir)
      .select(col("vec_id"), ticks.as("t")).persist()
    val cents = try lloyd(v0) finally v0.unpersist()
    val own = Tables.embeddings(spark, dir).select(ticks.as("t"))
      .select(packedAssign(cents).as("packed"))
      .select(pmod(col("packed"), lit(64L)).cast("int").as("cid"),
        floor(sqrt(expr("packed div 64")) * lit(1e6) + lit(0.5))
          .cast("long").as("a_us"))
    val g = own.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        floor(sum(col("a_us")).cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("s_mu"))
      .localCheckpoint()
    val pairRows = for {
      i <- cents.indices; j <- cents.indices if i != j
    } yield (i, j,
      cents(i).zip(cents(j)).map { case (a, b) => val d = a - b; d * d }.sum)
    val pairsDf = spark.createDataFrame(pairRows).toDF("ci", "cj", "m2")
    val r = pairsDf.filter(col("m2") > 0L)
      .join(g.select(col("cid").as("ci"), col("s_mu").as("si")), Seq("ci"))
      .join(g.select(col("cid").as("cj"), col("s_mu").as("sj")), Seq("cj"))
      .groupBy(col("ci"))
      .agg(max((col("si") + col("sj")).cast("double") / lit(1e6) / sqrt(col("m2")))
        .as("rmax"))
      .select(col("ci").as("cid"),
        floor(col("rmax") * lit(1e6) + lit(0.5)).cast("long").as("r_mu"))
    val q = g.join(r, Seq("cid"), "left")
      .select(col("cid"), col("n_members"), col("s_mu"), col("r_mu"))
      .localCheckpoint()
    val overall = q
      .agg(sum(col("n_members")).as("n_members"),
        sum(col("r_mu")).as("rs"), count(col("r_mu")).as("rc"))
      .select(lit(-1).cast("int").as("cid"), col("n_members"),
        lit(null).cast("double").as("s_intra"),
        when(col("rc") === 0L, lit(null).cast("double"))
          .otherwise(graft.functions.Rounding.roundN(
            col("rs").cast("double") / col("rc") / 1e6, 6)).as("db"))
    q.select(col("cid"), col("n_members"),
        graft.functions.Rounding.roundN(
          col("s_mu").cast("double") / 1e6, 6).as("s_intra"),
        graft.functions.Rounding.roundN(
          col("r_mu").cast("double") / 1e6, 6).as("db"))
      .unionByName(overall)
      .orderBy(col("cid"))
  }

  private val daviesBouldinSql =
    s"""WITH $kmeansCtesSql,
       |own AS (SELECT CAST(packed % 64 AS INTEGER) AS cid,
       |          CAST(floor(sqrt(packed // 64) * 1e6 + 0.5) AS BIGINT) AS a_us
       |        FROM fin),
       |g AS (SELECT cid, count(*) AS n_members,
       |        CAST(floor(CAST(sum(a_us) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS s_mu
       |      FROM own GROUP BY 1),
       |m AS (SELECT a.cid AS ci, b.cid AS cj,
       |        CAST(sum((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS m2
       |      FROM c2 a JOIN c2 b ON a.i = b.i AND a.cid != b.cid GROUP BY 1, 2),
       |r AS (SELECT m.ci AS cid,
       |        CAST(floor(max(CAST(gi.s_mu + gj.s_mu AS DOUBLE) / 1e6 / sqrt(m.m2))
       |          * 1e6 + 0.5) AS BIGINT) AS r_mu
       |      FROM m JOIN g gi ON gi.cid = m.ci JOIN g gj ON gj.cid = m.cj
       |      WHERE m.m2 > 0 GROUP BY 1),
       |q AS (SELECT g.cid, g.n_members, g.s_mu, r.r_mu
       |      FROM g LEFT JOIN r ON r.cid = g.cid)
       |SELECT cid, n_members,
       |  ${roundNSqlRef("CAST(s_mu AS DOUBLE) / 1e6", 6)} AS s_intra,
       |  ${roundNSqlRef("CAST(r_mu AS DOUBLE) / 1e6", 6)} AS db
       |FROM q
       |UNION ALL
       |SELECT CAST(-1 AS INTEGER) AS cid, CAST(sum(n_members) AS BIGINT) AS n_members,
       |  CAST(NULL AS DOUBLE) AS s_intra,
       |  CASE WHEN count(r_mu) = 0 THEN NULL
       |       ELSE ${roundNSqlRef("CAST(sum(r_mu) AS DOUBLE) / count(r_mu) / 1e6", 6)}
       |  END AS db
       |FROM q
       |ORDER BY cid""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_embed_kmeans", kmeans, Some(kmeansSql), bench = true),
    Q("q_embed_cluster_cards", clusterCards, Some(clusterCardsSql)),
    Q("q_embed_silhouette", silhouette, Some(silhouetteSql)),
    Q("q_embed_davies_bouldin", daviesBouldin, Some(daviesBouldinSql)))
}
