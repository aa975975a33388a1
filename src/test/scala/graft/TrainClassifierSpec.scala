package graft

import graft.operators.TrainClassifier
import org.apache.spark.sql.functions._

/** GD classifier on hand-built corpora: learns a separable boundary well
  * past the majority prior, survives a single-class corpus, and is
  * partition-invariant (the exactness claim behind the oracle check). */
class TrainClassifierSpec extends SparkSuite {
  import spark.implicits._

  // 24 quality docs (long, stopword-rich) vs 8 junk docs (short/no stops):
  // linearly separable in (n_tokens, stop_ratio), imbalanced like a corpus
  private def corpus = {
    val good = (1L to 24L).map { i =>
      (i, ("the quick brown fox jumps over the lazy dog and runs on " * 3) + i, "en", "s", 100L)
    }
    val junk = (100L to 107L).map(i => (i, s"zzz$i qqq", "en", "s", 8L))
    (good ++ junk).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("learns the separable quality boundary: balanced accuracy near 1") {
    val d = fixtureDir("documents" -> corpus)
    val out = TrainClassifier.trainQualityClassifier(spark, d).collect()
      .map(r => r.getAs[String]("param") -> r.getAs[Double]("value")).toMap
    assert(out("balanced_accuracy") > 0.95,
      s"balanced accuracy ${out("balanced_accuracy")} — did not separate")
    assert(out("train_accuracy") > 0.9)
    // more tokens must push toward quality on this corpus
    assert(out("w_ntokens") > 0.0)
  }

  test("single-class corpus: class-weight guard keeps training finite") {
    val d = fixtureDir("documents" -> (1L to 10L).map { i =>
      (i, "the quick brown fox jumps over the lazy dog and more words here", "en", "s", 60L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = TrainClassifier.trainQualityClassifier(spark, d).collect()
      .map(r => r.getAs[String]("param") -> r.getAs[Double]("value")).toMap
    assert(out.values.forall(v => !v.isNaN && !v.isInfinite))
    assert(out("train_accuracy") === 1.0) // all-positive corpus, positive model
  }

  test("calibration: bins partition the corpus, separable model is confident") {
    val d = fixtureDir("documents" -> corpus)
    val rows = TrainClassifier.calibration(spark, d).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 32) // every doc in exactly one bin
    rows.foreach { r =>
      val mp = r.getAs[Double]("mean_pred")
      val fp = r.getAs[Double]("frac_pos")
      assert(mp >= 0.0 && mp <= 1.0)
      assert(fp >= 0.0 && fp <= 1.0)
      val bin = r.getAs[Int]("bin")
      assert(mp >= bin / 10.0 - 1e-6 && mp <= (bin + 1) / 10.0 + 1e-6,
        s"mean_pred $mp outside its decile $bin")
    }
    // on a separable corpus the model is calibrated at the extremes: the
    // top-score bin must be (nearly) all positive, the bottom all negative
    val byBin = rows.map(r => r.getAs[Int]("bin") -> r.getAs[Double]("frac_pos")).toMap
    assert(byBin(byBin.keys.max) > 0.9)
    assert(byBin(byBin.keys.min) < 0.1)
  }

  test("weight trajectory is partition-invariant (exact integer gradients)") {
    val d8 = fixtureDir("documents" -> corpus.repartition(8))
    val d3 = fixtureDir("documents" -> corpus.repartition(3))
    val a = TrainClassifier.trainQualityClassifier(spark, d8).collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = TrainClassifier.trainQualityClassifier(spark, d3).collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a === b) // bitwise-equal doubles, not approximate
  }
}
