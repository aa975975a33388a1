package graft

import org.apache.spark.sql.functions._

/** Fixture-level behavior checks for the round-5 additions: exact KS
  * drift, RFM segmentation, and PII redaction (the sf0.01 oracle sweep
  * covers engine-vs-DuckDB exactness; these pin the SEMANTICS on inputs
  * small enough to verify by hand). */
class Round5OpsSpec extends SparkSuite {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String =
    fixtureDir("events" -> rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}")))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("ks distance is exact on a hand-computed pair of distributions") {
    // purchase values {1.00, 2.00}, click values {2.00, 3.00}:
    // D = max(|F1-F2|) = 0.5 (at v=1.00 and v=2.00)
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "purchase", 1.00),
      (2L, ts("2024-01-01 00:00:01"), 1L, "purchase", 2.00),
      (3L, ts("2024-01-01 00:00:02"), 2L, "click", 2.00),
      (4L, ts("2024-01-01 00:00:03"), 2L, "click", 3.00),
      (5L, ts("2024-01-01 00:00:04"), 3L, "signup", 9.99))) // ignored type
    val r = operators.Scans.ksDrift(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 2 && r(0).getLong(1) == 2)
    assert(r(0).getDouble(2) == 0.5)
  }

  test("ks of a distribution against itself is zero") {
    val rows = (1 to 20).flatMap { i =>
      Seq((i.toLong * 2, ts("2024-01-01 00:00:00"), 1L, "purchase", i * 1.5),
        (i.toLong * 2 + 1, ts("2024-01-01 00:00:00"), 2L, "click", i * 1.5))
    }
    val r = operators.Scans.ksDrift(spark, eventsDir(rows)).collect()
    assert(r(0).getDouble(2) == 0.0)
  }

  test("mann-whitney midrank U is exact on a hand-computed tie case") {
    // A={1.00, 2.00}, B={2.00, 3.00}: midrank at the tie -> R1=3.5, U1=0.5
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "purchase", 1.00),
      (2L, ts("2024-01-01 00:00:01"), 1L, "purchase", 2.00),
      (3L, ts("2024-01-01 00:00:02"), 2L, "click", 2.00),
      (4L, ts("2024-01-01 00:00:03"), 2L, "click", 3.00)))
    val r = operators.Scans.mannWhitney(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 2 && r(0).getLong(1) == 2)
    assert(r(0).getLong(2) == 1) // 2*U1
    assert(r(0).getDouble(3) == 0.5)
  }

  test("mann-whitney of identical distributions gives U = n1*n2/2") {
    val rows = (1 to 10).flatMap { i =>
      Seq((i.toLong * 2, ts("2024-01-01 00:00:00"), 1L, "purchase", i * 2.0),
        (i.toLong * 2 + 1, ts("2024-01-01 00:00:00"), 2L, "click", i * 2.0))
    }
    val r = operators.Scans.mannWhitney(spark, eventsDir(rows)).collect()
    assert(r(0).getDouble(3) == 50.0) // 10*10/2
  }

  test("rfm anchors recency at the corpus max and scores deterministically") {
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-10 00:00:00"), 1L, "purchase", 10.00), // u1: recent buyer
      (2L, ts("2024-01-01 00:00:00"), 2L, "click", 0.0), // u2: stale, no buys
      (3L, ts("2024-01-05 00:00:00"), 3L, "purchase", 2.50),
      (4L, ts("2024-01-10 12:00:00"), 3L, "purchase", 2.50))) // u3: 2 buys, anchor
    val r = operators.Events.rfm(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 0) // u1 last event on anchor date (same day)
    assert(r(2L).getLong(1) == 9) // u2 9 days stale
    assert(r(2L).getLong(2) == 0 && r(2L).getLong(3) == 0) // no purchases
    assert(r(3L).getLong(2) == 2 && r(3L).getLong(3) == 500)
    // scores are a permutation-stable total order: u2 least on F and M
    assert(r(2L).getInt(5) == 1 && r(2L).getInt(6) == 1)
  }

  test("bigram LM scores deterministic transitions above word salad") {
    val dir = fixtureDir("documents" -> Seq(
      (1L, "the cat sat the cat sat the cat sat the cat sat", "en", "web", 1L),
      (2L, "cat the sat cat tree dog sat blue the red cat green", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = operators.TextAnalysis.lmBigram(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 1's transitions are near-deterministic -> higher avg logprob,
    // lower perplexity than doc 2's word salad
    assert(r(1L).getDouble(2) > r(2L).getDouble(2))
    assert(r(1L).getDouble(3) < r(2L).getDouble(3))
    assert(r(1L).getLong(1) == 11 && r(2L).getLong(1) == 11)
  }

  test("dau/wau counts a user once per day and once per trailing window") {
    // u1 active on day 1 twice (counts once), u2 on day 5; on day 5 both
    // are weekly-active (day 1 contributes through day 7)
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 02:00:00"), 1L, "view", 1.0),
      (3L, ts("2024-01-05 01:00:00"), 2L, "click", 1.0)))
    val r = operators.Events.dauWau(spark, dir).collect()
      .map(x => x.getDate(0).toString -> x).toMap
    assert(r.size == 2) // only observed days emit rows
    assert(r("2024-01-01").getLong(1) == 1 && r("2024-01-01").getLong(2) == 1)
    assert(r("2024-01-05").getLong(1) == 1 && r("2024-01-05").getLong(2) == 2)
    assert(r("2024-01-05").getDouble(3) == 0.5)
  }

  test("redaction replaces every scanned pattern and counts the original") {
    val dir = fixtureDir("documents" -> Seq(
      (1L, "Contact a@b.com via https://x.example/path at 10.0.0.1 now", "en", "web", 1L),
      (2L, "clean text only", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = operators.TextAnalysis.piiRedact(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    val red = r(1L).getString(2)
    assert(r(1L).getInt(1) == 3)
    assert(red.contains("<EMAIL>") && red.contains("<URL>") && red.contains("<IP>"))
    assert(!red.contains("a@b.com") && !red.contains("10.0.0.1"))
    assert(r(2L).getInt(1) == 0 && r(2L).getString(2) == "clean text only")
  }
}
