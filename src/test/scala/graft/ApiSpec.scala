package graft

import graft.api._
import org.apache.spark.sql.functions._

/** Library façade (graft.api): the Dataset-first syntax delegates to the
  * operator cores with identical results. */
class ApiSpec extends SparkSuite {
  import spark.implicits._

  test("topKPerGroup through the façade equals the direct call") {
    val df = Seq((1, 10), (1, 20), (1, 30), (2, 5), (2, 50)).toDF("g", "v")
    val got = df.topKPerGroup(Seq("g"), Seq(("v", true)), 2)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === Set((1, 30), (1, 20), (2, 50), (2, 5)))
  }

  test("cdcSnapshot through the façade applies latest-wins") {
    val log = Seq(
      (1L, 1, "I", 100L), (1L, 2, "U", 200L),
      (2L, 1, "I", 300L), (2L, 2, "D", 0L)).toDF("key", "seq", "op", "cents")
    val snap = log.cdcSnapshot().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(snap === Set((1L, "U", 2.0)))
  }

  test("graph ops through the façade: components, bfs, triangles") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L),
      (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val cc = edges.connectedComponents().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc(3L) === cc(1L))
    assert(cc(11L) === cc(10L))
    assert(cc(1L) !== cc(10L))
    val d = edges.bfsDistances(Seq(Tuple1(1L)).toDF("node"), 2).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(d(1L) === 0 && d(2L) === 1 && d(3L) === 1 && !d.contains(10L))
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("lo", "hi").triangles()
    assert(tri.count() === 1)
  }

  test("round-6 façade additions: asof, auc, funnel, concurrency, mmr") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 7L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    assert(left.asOfJoin(right, "user_id", "ts", Seq("value"))
      .head().getAs[Double]("asof_value") === 5.0)
    val fwd = left.asOfJoinForward(right, "user_id", "ts", Seq("value")).head()
    assert(fwd.isNullAt(fwd.fieldIndex("asof_value"))) // nothing at/after

    val auc = Seq((2L, 1.0), (1L, 0.0)).toDF("mu", "y").aucOf()
      .head().getAs[Double]("auc")
    assert(auc === 1.0)
    assert(Seq((2L, 1.0), (1L, 0.0)).toDF("mu", "y").averagePrecisionOf()
      .head().getAs[Double]("avg_precision") === 1.0)

    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val fu = ev.funnelSteps(Seq("a", "b")).collect()
      .map(r => r.getAs[Int]("step_no") -> r.getAs[Long]("n_users")).toMap
    assert(fu === Map(1 -> 1L, 2 -> 1L))
    assert(ev.maxConcurrentSessions().head().getAs[Long]("max_concurrent") === 1L)

    val emb = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    assert(emb.mmrPicks(Seq(0L)).count() === 1L)

    // dedup + ingest façade (round 10): same cores the q_ queries run
    val text = "the quick brown fox jumps over the lazy dog and then runs far away home"
    val docs = Seq(
      (1L, text), (2L, text.replace("home", "now")), (3L, "totally unrelated words"))
      .toDF("doc_id", "text")
    val setsim = docs.setSimPairs().select("id_a", "id_b").as[(Long, Long)].collect()
    assert(setsim.toSet === Set((1L, 2L)))
    val near = docs.nearDupPairs().select("id_a", "id_b").as[(Long, Long)].collect()
    assert(near.toSet === Set((1L, 2L)))
    // size-gated form: identical pairs below the 150k-doc crossover
    val auto = docs.nearDupPairsAuto().select("id_a", "id_b").as[(Long, Long)].collect()
    assert(auto.toSet === near.toSet)
    val chunks = Seq((1L, text), (2L, text.toUpperCase)).toDF("doc_id", "text")
      .ingestChunks()
    assert(chunks.select("fp").distinct().count() === 1L) // case-folds dedup
  }
}
