package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals on hand-computed fixtures. */
class RepetitionSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = fixtureDir(
    "documents" -> Seq(
      // 6 tokens: "a b a b a b" -> 2 distinct of 6 words; bigrams:
      // [a b, b a, a b, b a, a b] -> top "a b" n=3 of 5; trigrams:
      // [a b a, b a b, a b a, b a b] -> 2 distinct of 4; no adjacent repeats
      (1L, "a b a b a b", "en", "fx", 11L),
      // all same word: dup_word 1 - 1/4; adjacent repeats 3; top bigram "x x" 3/3
      (2L, "x x x x", "en", "fx", 7L),
      // all distinct: zero repetition anywhere
      (3L, "p q r s t", "en", "fx", 9L),
      // single token: no bigrams/trigrams, fractions zero
      (4L, "solo", "en", "fx", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("repetition signals match hand computation") {
    val rows = TextAnalysis.repetition(spark, dir)
      .orderBy("doc_id").collect()
    val r1 = rows(0)
    assert(r1.getAs[Double]("dup_word_frac") === math.floor((1 - 2.0 / 6) * 1e4 + 0.5) / 1e4)
    assert(r1.getAs[Double]("dup_trigram_frac") === 0.5)
    assert(r1.getAs[Int]("n_adjacent_repeats") === 0)
    assert(r1.getAs[String]("top_bigram") === "a b")
    assert(r1.getAs[Long]("top_bigram_n") === 3L)
    assert(r1.getAs[Double]("top_bigram_frac") === 0.6)

    val r2 = rows(1)
    assert(r2.getAs[Double]("dup_word_frac") === 0.75)
    assert(r2.getAs[Int]("n_adjacent_repeats") === 3)
    assert(r2.getAs[String]("top_bigram") === "x x")
    assert(r2.getAs[Double]("top_bigram_frac") === 1.0)

    val r3 = rows(2)
    assert(r3.getAs[Double]("dup_word_frac") === 0.0)
    assert(r3.getAs[Double]("dup_trigram_frac") === 0.0)
    assert(r3.getAs[Double]("top_bigram_frac") === math.floor(0.25 * 1e4 + 0.5) / 1e4)

    val r4 = rows(3)
    assert(r4.getAs[Long]("n_tokens") === 1L)
    assert(r4.isNullAt(r4.fieldIndex("top_bigram")))
    assert(r4.getAs[Long]("top_bigram_n") === 0L)
    assert(r4.getAs[Double]("top_bigram_frac") === 0.0)
  }

  test("narrow signals produce no shuffle; bigram mode exactly one agg shuffle") {
    // the full query has exactly the shuffles its scale note promises:
    // groupBy(doc_id,bigram) + the window + the join — nothing data-volume
    val plan = TextAnalysis.repetition(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"top-1 should rank-push:\n$plan")
  }
}
