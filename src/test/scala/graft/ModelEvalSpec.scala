package graft

import graft.operators.ModelEval
import org.apache.spark.sql.functions._

/** Hand-pinned metric math for the classifier-eval family, plus sanity
  * bounds on the real corpus queries. */
class ModelEvalSpec extends SparkSuite {
  import spark.implicits._

  private val dir = SparkSpec.sf0001

  private def firstD(df: org.apache.spark.sql.DataFrame, c: String): Double =
    df.collect()(0).getAs[Double](c)

  test("aucOf: hand case — 3 of 4 pairs concordant = 0.75") {
    // pos scores {9, 7}, neg {8, 6}: concordant pairs (9,8) (9,6) (7,6)
    val sc = Seq((9L, 1.0), (8L, 0.0), (7L, 1.0), (6L, 0.0)).toDF("mu", "y")
    assert(firstD(ModelEval.aucOf(sc), "auc") === 0.75)
  }

  test("aucOf: ties at one score contribute half credit") {
    // one pos and one neg at the SAME score: single pair, tied -> 0.5
    val sc = Seq((5L, 1.0), (5L, 0.0)).toDF("mu", "y")
    assert(firstD(ModelEval.aucOf(sc), "auc") === 0.5)
    // perfect separation -> 1.0; inverted -> 0.0
    assert(firstD(ModelEval.aucOf(Seq((2L, 1.0), (1L, 0.0)).toDF("mu", "y")), "auc") === 1.0)
    assert(firstD(ModelEval.aucOf(Seq((1L, 1.0), (2L, 0.0)).toDF("mu", "y")), "auc") === 0.0)
  }

  test("aucOf: single-class input yields NULL, not a crash or Infinity") {
    val sc = Seq((3L, 1.0), (2L, 1.0)).toDF("mu", "y")
    val r = ModelEval.aucOf(sc).collect()(0)
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("apOf: hand case — AP = (1 + 2/3) / 2") {
    // descending: 9(+) P=1, 8(-), 7(+) P=2/3 -> AP = (1 + 2/3)/2
    val sc = Seq((9L, 1.0), (8L, 0.0), (7L, 1.0), (6L, 0.0)).toDF("mu", "y")
    assert(math.abs(firstD(ModelEval.apOf(sc), "avg_precision") - 5.0 / 6.0) < 1e-5)
    // all-positive corpus: precision 1 at every step -> AP = 1
    assert(firstD(ModelEval.apOf(Seq((2L, 1.0), (1L, 1.0)).toDF("mu", "y")),
      "avg_precision") === 1.0)
  }

  test("trained-model metrics on the corpus are coherent") {
    val a = ModelEval.auc(spark, dir).collect()(0)
    assert(a.getAs[Long]("n_pos") > 0 && a.getAs[Long]("n_neg") > 0)
    val auc = a.getAs[Double]("auc")
    assert(auc > 0.5 && auc <= 1.0, s"auc $auc") // better than chance
    val c = ModelEval.confusion(spark, dir).collect()(0)
    val Seq(tp, fp, fn, tn) = Seq("tp", "fp", "fn", "tn").map(c.getAs[Long])
    assert(tp + fp + fn + tn === a.getAs[Long]("n_pos") + a.getAs[Long]("n_neg"))
    // accuracy consistent with the counts
    val acc = c.getAs[Double]("accuracy")
    assert(math.abs(acc - (tp + tn).toDouble / (tp + fp + fn + tn)) < 1e-6)
    // AP of a better-than-chance model beats the positive base rate
    val ap = firstD(ModelEval.averagePrecision(spark, dir), "avg_precision")
    val base = a.getAs[Long]("n_pos").toDouble /
      (a.getAs[Long]("n_pos") + a.getAs[Long]("n_neg"))
    assert(ap > base, s"ap $ap <= base rate $base")
  }

  test("cross-validation: folds partition the corpus; held-out AUC beats chance; summary is the fold mean") {
    val rows = ModelEval.crossVal(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("fold")).toSeq === Seq(-1, 0, 1, 2))
    val folds = rows.filter(_.getAs[Int]("fold") >= 0)
    val mean = rows.find(_.getAs[Int]("fold") == -1).get
    // fold test sets partition the corpus: counts sum to the full-corpus
    // scored population (the summary row carries the sums)
    val a = ModelEval.auc(spark, dir).collect()(0)
    assert(mean.getAs[Long]("n_pos") === a.getAs[Long]("n_pos"))
    assert(mean.getAs[Long]("n_neg") === a.getAs[Long]("n_neg"))
    assert(folds.map(_.getAs[Long]("n_pos")).sum === a.getAs[Long]("n_pos"))
    // every held-out fold AUC beats chance on the separable weak label
    folds.foreach { r =>
      val auc = r.getAs[Double]("auc")
      assert(auc > 0.5 && auc <= 1.0, s"fold ${r.getAs[Int]("fold")} auc $auc")
    }
    // summary auc = fixed-order mean of the rounded fold aucs
    val aucs = folds.map(_.getAs[Double]("auc"))
    val expect = // roundN's formula on the fixed-order sum
      math.floor(((aucs(0) + aucs(1) + aucs(2)) / 3.0) * 1e6 + 0.5) / 1e6
    assert(mean.getAs[Double]("auc") === expect)
  }

  test("lift: quintile table is self-consistent and reconciles with auc totals") {
    val rows = ModelEval.lift(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    val n = rows.map(_.getAs[Long]("n")).sum
    val x = rows.map(_.getAs[Long]("n_pos")).sum
    // population totals match the AUC query's positive/negative counts
    val a = ModelEval.auc(spark, dir).collect().head
    assert(x === a.getAs[Long]("n_pos"))
    assert(n - x === a.getAs[Long]("n_neg"))
    // ntile(5) bucket sizes: floor(n/5) or +1 for the first n%5 buckets
    val want = (1 to 5).map(b => n / 5 + (if (b <= (n % 5)) 1L else 0L))
    assert(rows.map(_.getAs[Long]("n")).toSeq === want)
    rows.foreach { r =>
      val (nb, xb) = (r.getAs[Long]("n"), r.getAs[Long]("n_pos"))
      assert(r.getAs[Double]("rate") ===
        math.floor(xb.toDouble / nb * 1e6 + 0.5) / 1e6)
      assert(r.getAs[Double]("lift") ===
        math.floor((xb * n).toDouble / (nb * x) * 1e6 + 0.5) / 1e6)
    }
    // cumulative gains are nondecreasing and end at exactly 1
    val gains = rows.map(_.getAs[Double]("cum_gain")).toSeq
    assert(gains === gains.sorted)
    assert(gains.last === 1.0)
    // the score actually ranks: the top quintile outperforms the bottom
    assert(rows.head.getAs[Double]("rate") > rows.last.getAs[Double]("rate"))
  }
}
