package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic samplers on hand-built corpora. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  /** Engine's hash gate replicated independently: first md5 byte of the
    * decimal doc_id string. */
  private def hashByte(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(id.toString.getBytes("UTF-8"))(0) & 0xff
  }

  test("temperature rebalance: rarest language kept whole, dominant language halved") {
    // 8 "en" docs vs 2 "fr" docs: rate(en)=sqrt(2/8)=0.5 -> thresh 128
    val docs = (1L to 8L).map(i => (i, s"doc $i", "en", "s", 10L)) ++
      Seq((100L, "s", "fr", "s", 1L), (101L, "s", "fr", "s", 1L))
    val d = fixtureDir("documents" -> docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val kept = Sampling.sampleTemperature(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(kept.contains(100L) && kept.contains(101L)) // rate 1.0
    val expectedEn = (1L to 8L).filter(hashByte(_) < 128).toSet
    assert(kept.filter(_ <= 8L) === expectedEn)
  }

  test("token budget: inclusive prefix per source in id order") {
    val docs = Seq(
      (1L, "a", "en", "s1", 2000L), (2L, "b", "en", "s1", 2000L),
      (3L, "c", "en", "s1", 1500L), (4L, "d", "en", "s1", 1000L),
      (9L, "e", "en", "s2", 4999L), (10L, "f", "en", "s2", 2L))
    val d = fixtureDir("documents" -> docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Sampling.sampleTokenBudget(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum_chars")).toMap
    // s1: cum 2000, 4000, 5500 (over), 6500 (over) -> keep 1, 2 only
    // s2: cum 4999, 5001 (over) -> keep 9 only
    assert(rows.keySet === Set(1L, 2L, 9L))
    assert(rows(2L) === 4000L && rows(9L) === 4999L)
  }

  test("epoch mixture: every doc appears exactly floor(rate)+fractional-gate times, epochs 1..copies") {
    val docs = (1L to 120L).map(i => (i, s"text $i", "en", s"src${i % 5}", 10L))
    val d = fixtureDir("documents" -> docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = Sampling.sampleEpochs(spark, d).collect()
      .groupBy(r => r.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("epoch")).sorted.toSeq }
    // independent replication of the rate derivation (quarter-units)
    def srcByte(s: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8"))(0) & 0xff
    }
    val want = docs.flatMap { case (id, _, _, src, _) =>
      val q = (srcByte(src) % 12) + 3
      val copies = q / 4 + (if (hashByte(id) < (q % 4) * 64) 1 else 0)
      if (copies > 0) Some(id -> (1L to copies.toLong).toSeq) else None
    }.toMap
    assert(got === want)
    // upsampling must actually occur in this fixture (some rate >= 2x)
    assert(got.values.exists(_.length >= 2))
  }

  test("reservoir: exactly min(k, n) per source, draw is a 1..k permutation prefix") {
    val docs = (1L to 50L).map(i => (i, s"text $i", "en", "big", 10L)) ++
      Seq((900L, "t", "en", "tiny", 1L), (901L, "t", "en", "tiny", 1L))
    val d = fixtureDir("documents" -> docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Sampling.sampleReservoir(spark, d).collect()
      .groupBy(_.getAs[String]("source"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Int]("draw")).sorted.toSeq }
    assert(rows("big") === (1 to Sampling.ReservoirK))
    assert(rows("tiny") === Seq(1, 2)) // n < k: the whole source survives
  }

  test("hash sampler and split are stable under repartitioning") {
    val docs = (1L to 200L).map(i => (i, s"text $i", "en", s"src${i % 3}", 10L))
    val d = fixtureDir("documents" -> docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val once = Sampling.sampleHash(spark, d).collect().map(_.getAs[Long]("doc_id")).toSet
    val again = Sampling.sampleHash(spark, d).repartition(7).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(once === again)
    val splits = Sampling.splitAssign(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(splits.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(splits.size === 200)
  }

  test("shard shuffle: total order is a rerun-stable permutation with balanced shards") {
    val out = operators.Sampling.shardShuffle(spark, SparkSpec.sf0001)
    val rows = out.collect()
    val n = sources.Tables.documents(spark, SparkSpec.sf0001).count()
    assert(rows.length.toLong === n) // every doc exactly once
    // per shard, pos is exactly 1..size (a materialized total order)
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("pos")).sorted.toSeq === (1 to rs.length))
    }
    // balance: uniform hash sharding keeps shards within 2x of each other
    val sizes = rows.groupBy(_.getAs[Int]("shard")).values.map(_.length)
    assert(sizes.max <= 2 * sizes.min, s"skewed shards: $sizes")
    // rerun under a different upstream partitioning: byte-identical order
    val re = operators.Sampling.shardShuffle(spark, SparkSpec.sf0001)
      .repartition(7).collect()
    assert(re.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq ===
      rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq)
  }
}
