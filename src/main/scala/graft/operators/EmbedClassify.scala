package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space classification over the `embeddings` table's `label`
  * column — the pooling/eval half of an LLM-data labeling pipeline
  * (centroid prototypes per class, nearest-centroid assignment, and a
  * neighbor-vote classifier quality report).
  *
  * Numeric portability — the order-insensitive fixed-point pattern (see
  * the verify notes): per-label centroids are MEANS of floats, and float
  * addition is order-dependent, so both engines first quantize each
  * component to integer millionths (`floor(x·1e6 + 0.5)` — the repo's
  * standard half-up), sum exact BIGINTs (order-free), and divide back to
  * doubles at the end. Identical integers → identical doubles → hashable
  * oracle. Dots against the reassembled centroid arrays are sequential
  * left-folds in both engines (same guarantee the ANN family relies on).
  *
  * Scale notes (100 TB):
  *  - Centroid pooling is posexplode(Dim) + ONE map-side-combinable
  *    aggregation keyed by (label, dim): shuffle volume is
  *    labels × Dim × partitions partial rows — independent of corpus size.
  *  - The centroid table (labels × Dim) always fits in memory; the classify
  *    pass broadcasts it and is a NARROW per-row argmax over codegen'd
  *    `vec_dot` — zero shuffle, scan-speed, like IVF assignment.
  *  - The kNN eval rides the existing LSH sign buckets: candidate volume is
  *    O(corpus · bucket population), never all-pairs.
  */
object EmbedClassify {

  val EvalK = Similarity.TopK

  /** Quantize a double to integer millionths — exact, order-free summand. */
  private def q6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")

  /** (label, dim, qx) exploded fixed-point components. */
  private def components(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding").cast("array<double>")).as(Seq("dim0", "x")))
      .select(col("label"), (col("dim0") + 1).as("dim"), q6(col("x")).as("qx"))

  private val componentsSql =
    """SELECT label, CAST(i AS INT) AS dim,
      |  CAST(floor((embedding::DOUBLE[])[i] * 1e6 + 0.5) AS BIGINT) AS qx
      |FROM embeddings CROSS JOIN range(1, 65) r(i)""".stripMargin

  /** Per-label per-dimension centroid (mean of quantized components). */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    components(spark, dir)
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("qx")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"), col("n"),
        roundN(col("s").cast("double") / 1e6 / col("n"), 6).as("cent"))

  private val centroidsSql =
    s"""WITH x AS ($componentsSql)
       |SELECT label, dim, count(*) AS n,
       |  ${roundNSql("CAST(sum(qx) AS DOUBLE) / 1e6 / count(*)", 6)} AS cent
       |FROM x GROUP BY 1, 2""".stripMargin

  /** Centroid ARRAYS (label, cv, cnrm) — reassembled in dim order so the
    * downstream dot is the same sequential fold in both engines. */
  private def centroidArrays(spark: SparkSession, dir: String): DataFrame =
    components(spark, dir)
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("qx")).cast("double") / 1e6 / count(lit(1))).as("cent"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cent")))),
        s => s.getField("cent")).as("cv"))
      .withColumn("cnrm", sqrt(call_function("vec_dot", col("cv"), col("cv"))))

  private val centroidArraysSql =
    s"""SELECT label,
       |  list(cent ORDER BY dim) AS cv,
       |  sqrt(list_sum(list_transform(list(cent ORDER BY dim), c -> c * c))) AS cnrm
       |FROM (SELECT label, dim, CAST(sum(qx) AS DOUBLE) / 1e6 / count(*) AS cent
       |      FROM ($componentsSql) GROUP BY 1, 2)
       |GROUP BY label""".stripMargin

  /** Nearest-centroid classification: every vector scored against every
    * class prototype, argmax by rounded cosine with label tie-break.
    *
    * The class prototypes (labels × Dim doubles — a handful of rows by
    * definition) are collected and shipped as LITERALS, the justified
    * k-sized-codebook pattern (KMeans/IVF scaladoc): the classify pass is
    * then a NARROW per-row argmax over codegen'd `vec_dot` — no join of
    * any kind, no per-vector window shuffle, zero shuffles total
    * (Round3PlansSpec pins the shape). The previous form crossJoined the
    * broadcast centroid table (corpus × labels intermediate rows + a
    * corpus-wide row_number shuffle) — strictly worse at every scale. */
  def nearestCentroid(spark: SparkSession, dir: String): DataFrame = {
    // label type is whatever the table carries (int here, string
    // elsewhere) — lit() and the struct comparator handle both; the
    // collect order only fixes the literal array layout, not the argmax
    val cents: IndexedSeq[(Any, Array[Double], Double)] =
      centroidArrays(spark, dir).collect().toIndexedSeq
        .map(r => (r.get(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
        .sortBy(_._1.toString)
    require(cents.nonEmpty, "no labels in embeddings table")
    val vecs = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
    val scored = array(cents.map { case (lbl, cv, cnrm) =>
      struct(
        roundN(call_function("vec_dot", col("v"), lit(cv)) / (col("nrm") * lit(cnrm)), 6)
          .as("sim"),
        lit(lbl).as("pred_label"))
    }: _*)
    val best = array_sort(scored,
      (l, r) => when(l.getField("sim") > r.getField("sim"), -1)
        .when(l.getField("sim") < r.getField("sim"), 1)
        .otherwise(when(l.getField("pred_label") < r.getField("pred_label"), -1)
          .when(l.getField("pred_label") > r.getField("pred_label"), 1)
          .otherwise(0)))
    vecs
      .withColumn("best", element_at(best, 1))
      .select(col("vec_id"), col("label"),
        col("best").getField("pred_label").as("pred_label"),
        col("best").getField("sim").as("sim"))
      .withColumn("correct", col("label") === col("pred_label"))
  }

  private val nearestCentroidSql =
    s"""WITH cent AS ($centroidArraysSql),
       |v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |vn AS (SELECT vec_id, label, v,
       |         sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i]))) AS nrm
       |       FROM v),
       |scored AS (
       |  SELECT vn.vec_id, vn.label, cent.label AS pred_label,
       |    ${roundNSql("list_sum(list_transform(range(1, 65), i -> vn.v[i] * cent.cv[i])) / (vn.nrm * cent.cnrm)", 6)} AS sim
       |  FROM vn CROSS JOIN cent)
       |SELECT vec_id, label, pred_label, sim, label = pred_label AS correct
       |FROM scored
       |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, pred_label) = 1""".stripMargin

  /** kNN-classifier quality report: each vector is classified by majority
    * label among its EvalK nearest in-LSH-bucket neighbors (rounded-cosine
    * ranking, id tie-break; vote ties → smaller label), then accuracy is
    * aggregated per true label. Vectors alone in their bucket have no
    * neighbors and drop out of the denominator (inner-join semantics,
    * identical in the oracle). */
  def knnEval(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
      .withColumn("bkt", Similarity.bucket(col("v")))
      .persist()
    val q = base.alias("q")
    val c = base.alias("c")
    val sim = roundN(
      call_function("vec_dot", col("q.v"), col("c.v")) / (col("q.nrm") * col("c.nrm")), 6)
    val wk = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("neighbor_id"))
    val neighbors = q.join(c, col("q.bkt") === col("c.bkt") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("q.label").as("label"),
        col("c.vec_id").as("neighbor_id"), col("c.label").as("n_label"), sim.as("sim"))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= EvalK)
    val wv = Window.partitionBy(col("vec_id")).orderBy(col("votes").desc, col("n_label"))
    val pred = neighbors
      .groupBy(col("vec_id"), col("label"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("n_label").as("pred_label"))
    pred.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label") === col("pred_label"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("label"), col("n"), col("n_correct"),
        roundN(col("n_correct").cast("double") / col("n"), 6).as("accuracy"))
  }

  private val knnEvalSql = {
    val dotQC = "list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i]))"
    s"""WITH v0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |vn AS (SELECT vec_id, label, v,
       |         sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i]))) AS nrm,
       |         ${Similarity.bucketSql} AS bkt
       |       FROM v0),
       |nb AS (
       |  SELECT q.vec_id, q.label, c.vec_id AS neighbor_id, c.label AS n_label,
       |    ${roundNSql(s"$dotQC / (q.nrm * c.nrm)", 6)} AS sim,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${roundNSql(s"$dotQC / (q.nrm * c.nrm)", 6)} DESC, c.vec_id) AS rank
       |  FROM vn q JOIN vn c ON q.bkt = c.bkt AND q.vec_id != c.vec_id
       |  QUALIFY rank <= $EvalK),
       |votes AS (
       |  SELECT vec_id, label, n_label, count(*) AS votes FROM nb GROUP BY 1, 2, 3),
       |pred AS (
       |  SELECT vec_id, label, n_label AS pred_label FROM votes
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY votes DESC, n_label) = 1)
       |SELECT label, count(*) AS n,
       |  CAST(sum(CASE WHEN label = pred_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  ${roundNSql("CAST(sum(CASE WHEN label = pred_label THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS accuracy
       |FROM pred GROUP BY label""".stripMargin
  }

  /** Embedding drift between deterministic train/eval splits: per label,
    * the cosine between the two splits' centroids plus a norm ratio — the
    * "did my eval set drift away from train in embedding space" audit a
    * labeling pipeline runs before trusting eval numbers. Splits use the
    * engine's standard md5-byte gate on vec_id (~50/50), centroid math is
    * the exact fixed-point pooling above, and both centroid arrays are
    * reassembled in dim order so every dot is the same sequential fold.
    *
    * Scale: ONE (label, split, dim)-keyed aggregate (≤ labels×2×Dim keys)
    * then label-sized work. */
  def embedDrift(spark: SparkSession, dir: String): DataFrame = {
    val split = when(
      conv(substring(md5(col("vec_id").cast("string")), 1, 2), 16, 10)
        .cast("int") < 128, "train").otherwise("eval")
    val comp = Tables.embeddings(spark, dir)
      .select(col("label"), split.as("split"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim0", "x")))
      .select(col("label"), col("split"), (col("dim0") + 1).as("dim"), q6(col("x")).as("qx"))
    val cents = comp
      .groupBy(col("label"), col("split"), col("dim"))
      .agg((sum(col("qx")).cast("double") / 1e6 / count(lit(1))).as("cent"),
        count(lit(1)).as("n"))
      .groupBy(col("label"), col("split"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cent")))),
        s => s.getField("cent")).as("cv"),
        max(col("n")).as("n"))
    val t = cents.filter(col("split") === "train")
      .select(col("label"), col("cv").as("tv"), col("n").as("n_train"))
    val e = cents.filter(col("split") === "eval")
      .select(col("label"), col("cv").as("ev"), col("n").as("n_eval"))
    t.join(e, "label")
      .select(col("label"), col("n_train"), col("n_eval"),
        roundN(call_function("vec_dot", col("tv"), col("ev")) /
          (sqrt(call_function("vec_dot", col("tv"), col("tv"))) *
            sqrt(call_function("vec_dot", col("ev"), col("ev")))), 6).as("centroid_cos"),
        roundN(sqrt(call_function("vec_dot", col("ev"), col("ev"))) /
          sqrt(call_function("vec_dot", col("tv"), col("tv"))), 6).as("norm_ratio"))
      .orderBy(col("label"))
  }

  private val embedDriftSql =
    s"""WITH c AS (
       |  SELECT label,
       |    CASE WHEN ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 2))::INT < 128
       |         THEN 'train' ELSE 'eval' END AS split,
       |    CAST(i AS INT) AS dim,
       |    CAST(floor((embedding::DOUBLE[])[i] * 1e6 + 0.5) AS BIGINT) AS qx
       |  FROM embeddings CROSS JOIN range(1, 65) r(i)),
       |g AS (SELECT label, split, dim,
       |        CAST(sum(qx) AS DOUBLE) / 1e6 / count(*) AS cent, count(*) AS n
       |      FROM c GROUP BY 1, 2, 3),
       |v AS (SELECT label, split, list(cent ORDER BY dim) AS cv, CAST(max(n) AS BIGINT) AS n
       |      FROM g GROUP BY 1, 2),
       |t AS (SELECT label, cv AS tv, n AS n_train FROM v WHERE split = 'train'),
       |e AS (SELECT label, cv AS ev, n AS n_eval FROM v WHERE split = 'eval')
       |SELECT label, n_train, n_eval,
       |  ${roundNSql(
        "list_sum(list_transform(range(1, 65), i -> tv[i] * ev[i])) / " +
          "(sqrt(list_sum(list_transform(range(1, 65), i -> tv[i] * tv[i]))) * " +
          "sqrt(list_sum(list_transform(range(1, 65), i -> ev[i] * ev[i]))))", 6)} AS centroid_cos,
       |  ${roundNSql(
        "sqrt(list_sum(list_transform(range(1, 65), i -> ev[i] * ev[i]))) / " +
          "sqrt(list_sum(list_transform(range(1, 65), i -> tv[i] * tv[i])))", 6)} AS norm_ratio
       |FROM t JOIN e USING (label)
       |ORDER BY label""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_embed_drift", embedDrift, Some(embedDriftSql)),
    Q("q_embed_centroids", centroids, Some(centroidsSql)),
    Q("q_embed_nearest_centroid", nearestCentroid, Some(nearestCentroidSql), bench = true),
    Q("q_sim_knn_eval", knnEval, Some(knnEvalSql)),
  )
}
