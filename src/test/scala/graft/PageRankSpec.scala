package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank (operators/Graph.pageRank): hand-computed tiny graph, mass
  * conservation, and the degree-importance ordering. */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  test("two-node symmetric graph converges to uniform ranks") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges).as[(Long, Double)].collect().toMap
    // symmetric 2-cycle: stationary distribution is uniform 0.5/0.5 and
    // the power method stays there from the uniform start
    assert(ranks(1L) === 0.5 && ranks(2L) === 0.5)
  }

  test("star graph: hub outranks leaves, ranks sum to ~1") {
    // hub 0 connected to leaves 1..4 (symmetric edges)
    val edges = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val ranks = Graph.pageRank(edges).as[(Long, Double)].collect().toMap
    assert(ranks(0L) > ranks(1L) * 2, s"hub should dominate: $ranks")
    assert((1L to 4L).map(ranks).distinct.size === 1) // leaves symmetric
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
  }

  test("co-purchase instantiation conserves mass at sf0.001") {
    val df = Graph.pageRankCoPurchase(spark, SparkSpec.sf0001)
    val total = df.agg(sum(col("rank"))).head().getDouble(0)
    // symmetric graph, no dangling mass: Σrank = 1 up to the per-round
    // 1e-12 quantization (n nodes × iters × half-tick)
    assert(math.abs(total - 1.0) < 1e-6, s"mass drifted: $total")
    assert(df.filter(col("rank") <= 0).isEmpty)
  }
}
