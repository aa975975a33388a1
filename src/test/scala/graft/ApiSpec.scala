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
}
