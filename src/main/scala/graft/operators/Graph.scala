package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster-level
  * primitive behind transitive near-dup deduplication (keep ONE doc per
  * duplicate *cluster*, not per pair; the reference's duplicate-group intent
  * is validate.py:160-172's group-count, which this generalizes to fuzzy
  * matches).
  *
  * Algorithm: alternating min-label propagation to a fixpoint. Every node
  * starts labeled with its own id; each round, a node's label drops to the
  * minimum label in its closed neighborhood. At the fixpoint every node
  * carries min(id) of its component — a deterministic canonical labeling,
  * independent of iteration order, so it is oracle-checkable (DuckDB
  * recursive CTE computes the same min-reachable-id).
  *
  * Scale notes (100 TB):
  *  - Each round is one shuffle-join (edges ⋈ labels on node id) plus one
  *    map-side-combinable min-aggregate — no driver-side graph state, no
  *    collect; the edge list never leaves the cluster.
  *  - Rounds needed = graph diameter. Near-dup graphs are dense little
  *    cliques (diameter 1-2 after LSH verification), so propagation beats
  *    the O(log²n)-round large-star/small-star variant in practice; for
  *    adversarially long chains, `maxIter` caps the cost and the loop
  *    throws rather than silently returning a non-fixpoint labeling.
  *  - `localCheckpoint` truncates the per-round lineage (iterative plans
  *    otherwise grow exponentially in Catalyst); on a real cluster with a
  *    fault-tolerance requirement swap for `checkpoint` + checkpointDir —
  *    one line, same plan.
  */
object Graph {

  /** Connected components of the undirected graph given by `edges`
    * (first two columns = endpoint ids). Returns (node, cluster) where
    * cluster = min node id of the component. Isolated nodes (absent from
    * `edges`) are absent from the output — callers treat missing as
    * "own cluster". */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
    // symmetrize once; both directions ride the same shuffle partitioning
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("cluster"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // min label over the closed neighborhood {self} ∪ N(node)
      val viaNeighbors = sym
        .join(labels.select(col("node").as("dst"), col("cluster")), Seq("dst"))
        .select(col("src").as("node"), col("cluster"))
      val next = viaNeighbors.union(labels)
        .groupBy(col("node")).agg(min(col("cluster")).as("cluster"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("cluster", "prev"), Seq("node"))
        .filter(col("cluster") < col("prev")).count()
      labels = next
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
