package graft

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._

/** Connected-components correctness: canonical min-labeling on known
  * topologies, convergence on a diameter-7 chain (multiple propagation
  * rounds), and cluster-materialize semantics vs the greedy per-pair drop. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("components: chain, triangle, pair, and min-labels") {
    val edges = Seq(
      (1L, 2L), (2L, 3L),            // chain     -> cluster 1
      (20L, 21L), (21L, 22L), (22L, 20L), // triangle -> cluster 20
      (11L, 10L)                     // pair, reversed order -> cluster 10
    ).toDF("a", "b")
    val got = Graph.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 10L -> 10L, 11L -> 10L))
  }

  test("components: long chain needs multiple rounds and still converges") {
    // min label enters at the far end: 8-7-6-...-1 (diameter 7)
    val edges = (1L until 8L).map(i => (i + 1, i)).toDF("a", "b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got.size == 8 && got.values.forall(_ == 1L))
  }

  test("components agree with a union-find reference on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(1500)((rnd.nextInt(800).toLong, rnd.nextInt(800).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find reference
    val parent = Array.tabulate(800)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n.toInt).toLong).toMap
    val got = Graph.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == want.keySet)
    // same partition AND same canonical (min-id) labels
    assert(got == want)
  }

  test("triangles: oriented two-join finds each triangle exactly once") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // triangle 1-2-3
      (3L, 4L),                     // pendant edge, no triangle
      (1L, 4L), (2L, 4L)            // 4 closes two more: 1-2-4, (1-3-4? needs 3-4 yes), (2-3-4? needs 2-3 yes)
    ).toDF("a", "b")
    val got = Graph.triangles(edges)
      .as[(Long, Long, Long)].collect().toSet
    // all 4 triangles of K4 on {1,2,3,4}, each exactly once, ordered a<b<c
    assert(got === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    assert(Graph.triangles(edges).count() === 4)
  }

  test("cluster materialize keeps exactly one doc per transitive cluster") {
    // docs 1,2,3 form a transitive near-dup chain: 1~2 and 2~3 are verified
    // pairs but 1~3 is NOT (the case greedy per-pair handles correctly only
    // by luck of id ordering; cluster semantics make it explicit).
    val docs = Seq(
      (1L, "a b c d e f g h", "en", "web"),
      (2L, "a b c d e f g x", "en", "web"),
      (3L, "a b c d e f g h i j k l m n o p", "en", "web"),
      (9L, "totally different content here nothing shared", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = fixtureDir("documents" -> docs)
    val clusters = Dedup.nearDupClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    // every clustered doc resolves to the min id of its component
    clusters.foreach { case (d, c) => assert(c <= d && clusters(c) == c) }
    val kept = Dedup.materializeClusters(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    // one keeper per cluster + all unclustered docs
    val keepers = clusters.values.toSet
    val unclustered = Set(1L, 2L, 3L, 9L) -- clusters.keySet
    assert(kept == keepers ++ unclustered)
    assert(kept.contains(9L))
  }

  test("adamic-adar: hand-computed weights, pair set, and big-basket downweight") {
    // order 1 {10,20}, order 2 {10,20,30}, order 3 {10,40}, order 4 {50};
    // duplicate lineitem row for (1,10) must collapse via distinct
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 10L),
      (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 40L),
      (4L, 50L))
      .toDF("l_orderkey", "l_partkey")
    def wMu(deg: Int): Long =
      math.floor(1.0 / math.log(deg.toDouble) * 1e6 + 0.5).toLong
    val want = Map(
      (10L, 20L) -> (2L, wMu(2) + wMu(3)),
      (10L, 30L) -> (1L, wMu(3)),
      (20L, 30L) -> (1L, wMu(3)),
      (10L, 40L) -> (1L, wMu(2)))
    val out = Graph.adamicAdar(spark, fixtureDir("lineitem" -> li)).collect()
    val got = out.map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) ->
      ((r.getAs[Long]("common_orders"),
        math.floor(r.getAs[Double]("aa") * 1e6 + 0.5).toLong))).toMap
    assert(got === want)
    // the pair seen only in the 2-part basket outranks one seen only in
    // the 3-part basket (the down-weighting AA exists for)
    assert(want((10L, 40L))._2 > want((10L, 30L))._2)
    // output ordering: descending aa, ties by part ids
    val aas = out.map(_.getAs[Double]("aa")).toSeq
    assert(aas === aas.sorted.reverse)
  }
}
