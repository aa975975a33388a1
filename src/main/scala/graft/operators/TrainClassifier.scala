package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine training of a linear quality classifier — the "distill the
  * heuristic into a model" step of a training-data pipeline (a FastText-ish
  * linear filter fit on weak labels, here the `q_text_quality` rule),
  * expressed as class-balanced batch gradient descent where EVERY
  * iteration is one narrow scan plus a grand aggregate.
  *
  * Scale design (the same shape as [[KMeans]]):
  *  - The model is 4 doubles — driver-sized by definition. Each iteration
  *    embeds the weights as literals, scans the cached feature frame once,
  *    and reduces to ONE row of integer gradient sums (map-side combined;
  *    the shuffle carries 4 longs per partition regardless of corpus size).
  *  - No shuffle of the corpus, no window, no join anywhere: feature
  *    extraction is per-row; training is 1 count + T gradient grand
  *    aggregates + 1 accuracy pass — T+2 scan-speed jobs at 100 TB.
  *  - Class balancing (each example weighted inversely to its class
  *    frequency) is what makes GD learn the 9%-minority boundary instead
  *    of collapsing to the majority prior; the weights derive from the
  *    exact label counts, so they are as deterministic as everything else.
  *
  * Exactness (why a float-training loop is oracle-checkable at all):
  *  - The link is the ALGEBRAIC sigmoid s(m) = 0.5 + 0.5·m/(1+|m|) — no
  *    exp(), so no libm: both engines evaluate the same correctly-rounded
  *    IEEE +,*,/,abs sequence bit-identically. (The gradient form
  *    (s(m)−y)·x is the logistic-loss gradient with s swapped for the
  *    rational surrogate — the standard fast-sigmoid trade, chosen here
  *    for cross-engine reproducibility.)
  *  - Per-document gradient contributions round to integer MICRO-UNITS
  *    (floor(g·1e6 + 0.5) as BIGINT) before summing, so the aggregate is
  *    an order-independent integer sum — immune to partitioning, task
  *    order, and engine reduction trees. The weight update then performs
  *    one fixed sequence of exact-input double ops, so the whole weight
  *    TRAJECTORY is deterministic and identical in Spark and DuckDB
  *    (the oracle unrolls the T iterations as chained CTEs).
  */
object TrainClassifier {

  val Iterations = 8
  val Lr = 1.0
  private val MicroSql = "1000000.0"

  import TextAnalysis.{normSql, stopSqlList, stopwords}

  /** (x1, x2, x3, y): scaled token count, stopword ratio, scaled average
    * token length; weak label = the q_text_quality pass rule. */
  private[operators] def features(spark: SparkSession, dir: String): DataFrame = {
    val w = col("w")
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.normText(col("text")).as("norm"))
      .select(col("doc_id"), col("norm"), split(col("norm"), " ").as("w"))
      .select(col("doc_id"), size(w).as("nt"),
        size(filter(w, t => t.isInCollection(stopwords))).as("ns"),
        length(regexp_replace(col("norm"), " ", "")).as("nwc"))
      .select(col("doc_id"),
        (col("nt").cast("double") / lit(100.0)).as("x1"),
        (col("ns") / col("nt").cast("double")).as("x2"),
        ((col("nwc") / col("nt").cast("double")) / lit(10.0)).as("x3"),
        when(col("nt") >= 10 && col("ns") > 0, lit(1.0)).otherwise(lit(0.0)).as("y"))
  }

  private val featureSql =
    s"""f0 AS (SELECT doc_id, string_split($normSql, ' ') AS w,
       |         length(replace($normSql, ' ', '')) AS nwc FROM documents),
       |f1 AS (SELECT doc_id, len(w) AS nt,
       |         len(list_filter(w, t -> list_contains($stopSqlList, t))) AS ns,
       |         nwc FROM f0),
       |f AS (SELECT doc_id, CAST(nt AS DOUBLE) / 100.0 AS x1,
       |        ns / CAST(nt AS DOUBLE) AS x2,
       |        (nwc / CAST(nt AS DOUBLE)) / 10.0 AS x3,
       |        CASE WHEN nt >= 10 AND ns > 0 THEN CAST(1.0 AS DOUBLE)
       |             ELSE CAST(0.0 AS DOUBLE) END AS y
       |      FROM f1)""".stripMargin

  /** margin under the current weights, association pinned to
    * ((b + w1·x1) + w2·x2) + w3·x3 in both engines. */
  private[operators] def margin(ws: Array[Double]): Column =
    lit(ws(0)) + lit(ws(1)) * col("x1") + lit(ws(2)) * col("x2") +
      lit(ws(3)) * col("x3")

  /** rational sigmoid surrogate — exp-free, bit-portable. */
  private[operators] def sigma(m: Column): Column =
    lit(0.5) + lit(0.5) * (m / (lit(1.0) + abs(m)))

  private def microSum(g: Column): Column =
    sum(floor(g * lit(1000000.0) + lit(0.5)).cast("long"))

  /** Run the class-balanced GD loop over a cached feature frame; returns
    * (weights, n, n1, oneClass). Shared by the training query and the
    * calibration audit so both score with the IDENTICAL weight
    * trajectory. */
  private[operators] def fit(f: DataFrame): (Array[Double], Long, Long, Boolean) = {
    // exact label counts -> inverse-frequency class weights (guarded: a
    // single-class corpus degrades to unweighted GD, never a div-by-zero)
    val cr = f.agg(count(lit(1)).as("n"),
      sum(when(col("y") === lit(1.0), 1L).otherwise(0L)).as("n1")).collect()(0)
    val (n, n1) = (cr.getAs[Long]("n"), cr.getAs[Long]("n1"))
    val oneClass = n1 == 0L || n1 == n
    val cw1 = if (oneClass) 1.0 else n.toDouble / (2.0 * n1.toDouble)
    val cw0 = if (oneClass) 1.0 else n.toDouble / (2.0 * (n - n1).toDouble)
    val cw = when(col("y") === lit(1.0), lit(cw1)).otherwise(lit(cw0))

    val ws = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to Iterations) {
      val d = (sigma(margin(ws)) - col("y")) * cw
      val r = f.agg(
        microSum(d).as("gb"), microSum(d * col("x1")).as("g1"),
        microSum(d * col("x2")).as("g2"), microSum(d * col("x3")).as("g3")).collect()(0)
      for (j <- 0 to 3) {
        val g = r.getAs[Long](Seq("gb", "g1", "g2", "g3")(j))
        ws(j) = ws(j) - Lr * (g.toDouble / 1000000.0 / n)
      }
    }
    (ws, n, n1, oneClass)
  }

  def trainQualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = features(spark, dir).cache()
    val (ws, n, n1, oneClass) = fit(f)

    val pos = margin(ws) >= lit(0.0)
    val ar = f.agg(
      sum(when(pos === (col("y") === lit(1.0)), 1L).otherwise(0L)).as("ok"),
      sum(when((col("y") === lit(1.0)) && pos, 1L).otherwise(0L)).as("tp"),
      sum(when((col("y") === lit(0.0)) && !pos, 1L).otherwise(0L)).as("tn")).collect()(0)
    f.unpersist()
    val acc = ar.getAs[Long]("ok").toDouble / n
    val balAcc =
      if (oneClass) acc
      else 0.5 * (ar.getAs[Long]("tp").toDouble / n1 +
        ar.getAs[Long]("tn").toDouble / (n - n1))
    Seq(
      "bias" -> ws(0), "w_ntokens" -> ws(1), "w_stop_ratio" -> ws(2),
      "w_avg_len" -> ws(3), "train_accuracy" -> acc,
      "balanced_accuracy" -> balAcc)
      .toDF("param", "value")
  }

  private def iterSql(t: Int, p: String = "", src: String = "f"): String = {
    val cwCase = "(CASE WHEN f.y = 1.0 THEN c.cw1 ELSE c.cw0 END)"
    val prev = if (t == 1) s"${p}w0" else s"${p}w${t - 1}"
    val m = s"(w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3)"
    val sg = s"(0.5 + 0.5 * ($m / (1.0 + abs($m))))"
    val d = s"(($sg - f.y) * $cwCase)"
    def ms(g: String) = s"sum(CAST(floor($g * $MicroSql + 0.5) AS BIGINT))"
    s"""${p}g$t AS (SELECT ${ms(d)} AS gb, ${ms(s"($d * f.x1)")} AS g1,
       |  ${ms(s"($d * f.x2)")} AS g2, ${ms(s"($d * f.x3)")} AS g3,
       |  max(c.n) AS n, max(w.b) AS pb, max(w.w1) AS p1,
       |  max(w.w2) AS p2, max(w.w3) AS p3
       |  FROM $src f CROSS JOIN $prev w CROSS JOIN ${p}cw c),
       |${p}w$t AS (SELECT pb - $Lr * (CAST(gb AS DOUBLE) / $MicroSql / n) AS b,
       |  p1 - $Lr * (CAST(g1 AS DOUBLE) / $MicroSql / n) AS w1,
       |  p2 - $Lr * (CAST(g2 AS DOUBLE) / $MicroSql / n) AS w2,
       |  p3 - $Lr * (CAST(g3 AS DOUBLE) / $MicroSql / n) AS w3
       |  FROM ${p}g$t)""".stripMargin
  }

  /** The feature CTE chain (defines `f` with doc_id) for oracles that
    * need to re-slice features before training — the CV query. */
  private[operators] def featureSqlShared: String = featureSql

  /** Fold-scoped training chain: the same unrolled GD ladder reading its
    * features from `src` (an already-defined CTE), every CTE name
    * prefixed with `p` so several folds coexist in one oracle query.
    * Ends at `${p}w$Iterations`. */
  private[operators] def trainCtesSqlFrom(p: String, src: String): String =
    s"""${p}cnt AS (SELECT count(*) AS n,
       |          sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS n1 FROM $src),
       |${p}cw AS (SELECT n, n1,
       |         CASE WHEN n1 = 0 OR n1 = n THEN CAST(1.0 AS DOUBLE)
       |              ELSE CAST(n AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE)) END AS cw1,
       |         CASE WHEN n1 = 0 OR n1 = n THEN CAST(1.0 AS DOUBLE)
       |              ELSE CAST(n AS DOUBLE) / (2.0 * CAST(n - n1 AS DOUBLE)) END AS cw0
       |       FROM ${p}cnt),
       |${p}w0 AS (SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS w1,
       |              CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3),
       |${(1 to Iterations).map(iterSql(_, p, src)).mkString(",\n")}""".stripMargin

  /** The shared WITH-chain: features → class weights → unrolled GD
    * iterations, ending at w$Iterations. Reused by the calibration
    * oracle so both queries train the identical model. */
  private[operators] val trainCtesSql: String =
    s"""$featureSql,
       |cnt AS (SELECT count(*) AS n,
       |          sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS n1 FROM f),
       |cw AS (SELECT n, n1,
       |         CASE WHEN n1 = 0 OR n1 = n THEN CAST(1.0 AS DOUBLE)
       |              ELSE CAST(n AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE)) END AS cw1,
       |         CASE WHEN n1 = 0 OR n1 = n THEN CAST(1.0 AS DOUBLE)
       |              ELSE CAST(n AS DOUBLE) / (2.0 * CAST(n - n1 AS DOUBLE)) END AS cw0
       |       FROM cnt),
       |w0 AS (SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS w1,
       |              CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3),
       |${(1 to Iterations).map(t => iterSql(t)).mkString(",\n")}""".stripMargin

  private val trainSql: String = {
    val wd = s"w$Iterations"
    val mFinal = s"(w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3)"
    s"""WITH $trainCtesSql,
       |acc AS (SELECT CAST(sum(CASE WHEN ($mFinal >= 0.0) = (f.y = 1.0)
       |                 THEN 1 ELSE 0 END) AS DOUBLE) / max(c.n) AS acc,
       |          sum(CASE WHEN f.y = 1.0 AND $mFinal >= 0.0 THEN 1 ELSE 0 END) AS tp,
       |          sum(CASE WHEN f.y = 0.0 AND $mFinal < 0.0 THEN 1 ELSE 0 END) AS tn,
       |          max(c.n) AS n, max(c.n1) AS n1
       |        FROM f CROSS JOIN $wd w CROSS JOIN cw c)
       |SELECT 'bias' AS param, b AS value FROM $wd
       |UNION ALL SELECT 'w_ntokens', w1 FROM $wd
       |UNION ALL SELECT 'w_stop_ratio', w2 FROM $wd
       |UNION ALL SELECT 'w_avg_len', w3 FROM $wd
       |UNION ALL SELECT 'train_accuracy', acc FROM acc
       |UNION ALL SELECT 'balanced_accuracy',
       |  CASE WHEN n1 = 0 OR n1 = n THEN acc
       |       ELSE 0.5 * (CAST(tp AS DOUBLE) / n1 + CAST(tn AS DOUBLE) / (n - n1))
       |  END FROM acc""".stripMargin
  }

  /** Calibration audit (reliability diagram) of the trained classifier:
    * score every doc with the final weights, bin the predicted
    * probability into deciles, and report per bin the count, the mean
    * prediction, and the ACTUAL positive rate — the gap column is the
    * model-trust metric an eval pipeline tracks before using scores as
    * sampling weights.
    *
    * Exactness: mean prediction would be an order-dependent float sum, so
    * per-doc probabilities round to integer micro-units before summing
    * (the same trick the gradient aggregate uses) — the per-bin aggregate
    * is an exact integer sum in both engines, divided back to a double
    * once. Scale: T+1 scan-speed grand aggregates (training) + one
    * 10-group hash aggregate; nothing corpus-sized moves. */
  def calibration(spark: SparkSession, dir: String): DataFrame = {
    val f = features(spark, dir).cache()
    val (ws, _, _, _) = fit(f)
    // f stays cached: the returned plan re-reads it at execution time
    // (the harness clears cache per query)
    val p = sigma(margin(ws))
    f.select(least(lit(9), floor(p * 10).cast("int")).as("bin"),
        p.as("p"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("p") * lit(1000000.0) + lit(0.5)).cast("long")).as("micro_p"),
        sum(when(col("y") === lit(1.0), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"),
        graft.functions.Rounding.roundN(
          col("micro_p").cast("double") / lit(1000000.0) / col("n"), 6).as("mean_pred"),
        graft.functions.Rounding.roundN(
          col("n_pos").cast("double") / col("n"), 6).as("frac_pos"))
  }

  private val calibrationSql: String = {
    val wd = s"w$Iterations"
    val m = s"(w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3)"
    val sg = s"(0.5 + 0.5 * ($m / (1.0 + abs($m))))"
    s"""WITH $trainCtesSql,
       |sc AS (SELECT least(9, CAST(floor($sg * 10) AS INT)) AS bin,
       |         $sg AS p, f.y AS y
       |       FROM f CROSS JOIN $wd w),
       |b AS (SELECT bin, count(*) AS n,
       |        sum(CAST(floor(p * $MicroSql + 0.5) AS BIGINT)) AS micro_p,
       |        sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS n_pos
       |      FROM sc GROUP BY bin)
       |SELECT bin, n,
       |  ${graft.functions.Rounding.roundNSql(s"CAST(micro_p AS DOUBLE) / $MicroSql / n", 6)} AS mean_pred,
       |  ${graft.functions.Rounding.roundNSql("CAST(n_pos AS DOUBLE) / n", 6)} AS frac_pos
       |FROM b""".stripMargin
  }

  // ----------------------------------------------------------- quantile GD

  /** Pinball-loss quantile level, base step size, iteration count. The
    * Robbins-Monro 1/√t decay is what lets a SUBgradient method settle:
    * pinball gradients don't shrink near the optimum, so a fixed step
    * oscillates forever (measured: coverage bouncing 0.3-1.0), while
    * lr₀/√t lands coverage at 0.906 ≈ τ on the harness corpus. Each
    * iteration's step is computed ONCE in Scala and embedded as the same
    * double literal in both engines. */
  val QTau = 0.9
  val QrLr = 0.1
  val QrIterations = 24

  private def qrStep(t: Int): Double = QrLr / math.sqrt(t.toDouble)

  /** Same text features, continuous target: document length in
    * kilo-chars. */
  private def qrFeatures(spark: SparkSession, dir: String): DataFrame = {
    val w = col("w")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        TextAnalysis.normText(col("text")).as("norm"))
      .select(col("doc_id"), col("n_chars"), col("norm"),
        split(col("norm"), " ").as("w"))
      .select(col("doc_id"), size(w).as("nt"),
        size(filter(w, t => t.isInCollection(stopwords))).as("ns"),
        length(regexp_replace(col("norm"), " ", "")).as("nwc"), col("n_chars"))
      .select(col("doc_id"),
        (col("nt").cast("double") / lit(100.0)).as("x1"),
        (col("ns") / col("nt").cast("double")).as("x2"),
        ((col("nwc") / col("nt").cast("double")) / lit(10.0)).as("x3"),
        (col("n_chars").cast("double") / lit(1000.0)).as("y"))
  }

  private val qrFeatureSql =
    s"""f0 AS (SELECT doc_id, n_chars, string_split($normSql, ' ') AS w,
       |         length(replace($normSql, ' ', '')) AS nwc FROM documents),
       |f1 AS (SELECT doc_id, n_chars, len(w) AS nt,
       |         len(list_filter(w, t -> list_contains($stopSqlList, t))) AS ns,
       |         nwc FROM f0),
       |f AS (SELECT doc_id, CAST(nt AS DOUBLE) / 100.0 AS x1,
       |        ns / CAST(nt AS DOUBLE) AS x2,
       |        (nwc / CAST(nt AS DOUBLE)) / 10.0 AS x3,
       |        CAST(n_chars AS DOUBLE) / 1000.0 AS y
       |      FROM f1)""".stripMargin

  /** Quantile (pinball-loss) regression of document length on the
    * quality features — the P90-predictor counterpart of the
    * classification trainer: batch subgradient descent on
    * ρ_τ(y − ŷ) = (y − ŷ)·(τ − 1{y < ŷ}), τ = 0.9, with the subgradient
    * at the kink pinned to the 1{·} = 0 branch (ties count as
    * under-prediction). Reports the learned plane, the empirical
    * COVERAGE P(y ≤ ŷ) — which GD drives toward τ — and the mean
    * pinball loss.
    *
    * Exactness: the [[fit]] contract verbatim — per-row subgradient and
    * loss contributions round to integer micro-units before the grand
    * aggregates (order-free BIGINT sums); weight updates are fixed
    * double sequences on exact inputs; NO transcendental anywhere (the
    * pinball subgradient is pure comparison + affine), so the whole
    * trajectory is bit-identical cross-engine and the oracle unrolls it
    * as chained CTEs. Scale: the model is 4 doubles; each iteration is
    * one narrow scan + 1-row aggregate — T+2 scan-speed jobs, no
    * shuffle, no window, no join. */
  def quantileRegression(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = qrFeatures(spark, dir).cache()
    val n = f.count()
    val ws = Array(0.0, 0.0, 0.0, 0.0)
    for (t <- 1 to QrIterations) {
      val ind = when(margin(ws) > col("y"), lit(1.0)).otherwise(lit(0.0))
      val d = ind - lit(QTau)
      val r = f.agg(
        microSum(d).as("gb"), microSum(d * col("x1")).as("g1"),
        microSum(d * col("x2")).as("g2"), microSum(d * col("x3")).as("g3"))
        .collect()(0)
      for (j <- 0 to 3) {
        val g = r.getAs[Long](Seq("gb", "g1", "g2", "g3")(j))
        ws(j) = ws(j) - qrStep(t) * (g.toDouble / 1000000.0 / n)
      }
    }
    val pred = margin(ws)
    val indF = when(pred > col("y"), lit(1.0)).otherwise(lit(0.0))
    val pin = (col("y") - pred) * (lit(QTau) - indF)
    val er = f.agg(
      sum(when(col("y") <= pred, 1L).otherwise(0L)).as("cov"),
      sum(floor(pin * lit(1000000.0) + lit(0.5)).cast("long")).as("pin_mu"))
      .collect()(0)
    f.unpersist()
    Seq(
      "bias" -> ws(0), "w_ntokens" -> ws(1), "w_stop_ratio" -> ws(2),
      "w_avg_len" -> ws(3),
      "coverage" -> er.getAs[Long]("cov").toDouble / n,
      "avg_pinball" -> er.getAs[Long]("pin_mu").toDouble / 1000000.0 / n)
      .toDF("param", "value")
  }

  private def qrIterSql(t: Int): String = {
    val prev = if (t == 1) "qw0" else s"qw${t - 1}"
    val m = s"(w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3)"
    // CAST everything to DOUBLE: DuckDB's DECIMAL would make 1.0 - 0.9
    // exactly 0.1 while Spark's doubles give 0.09999999999999998
    val d = s"((CASE WHEN $m > f.y THEN CAST(1.0 AS DOUBLE)" +
      s" ELSE CAST(0.0 AS DOUBLE) END) - CAST($QTau AS DOUBLE))"
    def ms(g: String) = s"sum(CAST(floor($g * $MicroSql + 0.5) AS BIGINT))"
    val lr = qrStep(t)
    s"""qg$t AS MATERIALIZED (SELECT ${ms(d)} AS gb, ${ms(s"($d * f.x1)")} AS g1,
       |  ${ms(s"($d * f.x2)")} AS g2, ${ms(s"($d * f.x3)")} AS g3,
       |  max(c.n) AS n, max(w.b) AS pb, max(w.w1) AS p1,
       |  max(w.w2) AS p2, max(w.w3) AS p3
       |  FROM f CROSS JOIN $prev w CROSS JOIN qcnt c),
       |qw$t AS MATERIALIZED (SELECT
       |  pb - $lr * (CAST(gb AS DOUBLE) / $MicroSql / n) AS b,
       |  p1 - $lr * (CAST(g1 AS DOUBLE) / $MicroSql / n) AS w1,
       |  p2 - $lr * (CAST(g2 AS DOUBLE) / $MicroSql / n) AS w2,
       |  p3 - $lr * (CAST(g3 AS DOUBLE) / $MicroSql / n) AS w3
       |  FROM qg$t)""".stripMargin
  }

  private val quantileSql: String = {
    val wd = s"qw$QrIterations"
    val m = s"(w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3)"
    val ind = s"(CASE WHEN $m > f.y THEN CAST(1.0 AS DOUBLE)" +
      s" ELSE CAST(0.0 AS DOUBLE) END)"
    val pin = s"((f.y - $m) * (CAST($QTau AS DOUBLE) - $ind))"
    s"""WITH $qrFeatureSql,
       |qcnt AS (SELECT count(*) AS n FROM f),
       |qw0 AS (SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS w1,
       |              CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3),
       |${(1 to QrIterations).map(qrIterSql).mkString(",\n")},
       |ev AS (SELECT
       |         CAST(sum(CASE WHEN f.y <= $m THEN 1 ELSE 0 END) AS BIGINT) AS cov,
       |         CAST(sum(CAST(floor($pin * $MicroSql + 0.5) AS BIGINT)) AS BIGINT)
       |           AS pin_mu,
       |         max(c.n) AS n
       |       FROM f CROSS JOIN $wd w CROSS JOIN qcnt c)
       |SELECT 'bias' AS param, b AS value FROM $wd
       |UNION ALL SELECT 'w_ntokens', w1 FROM $wd
       |UNION ALL SELECT 'w_stop_ratio', w2 FROM $wd
       |UNION ALL SELECT 'w_avg_len', w3 FROM $wd
       |UNION ALL SELECT 'coverage', CAST(cov AS DOUBLE) / n FROM ev
       |UNION ALL SELECT 'avg_pinball', CAST(pin_mu AS DOUBLE) / $MicroSql / n FROM ev""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_train_quality_clf", trainQualityClassifier, Some(trainSql)),
    Q("q_train_quantile", quantileRegression, Some(quantileSql)),
    Q("q_train_calibration", calibration, Some(calibrationSql)))
}
