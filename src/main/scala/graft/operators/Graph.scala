package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  // -------------------------------------------------------------- PageRank

  val PrIters = 5
  val PrDamping = 0.85

  /** PageRank by the power method for a FIXED iteration count — the other
    * iterative-graph primitive (importance scoring, where components give
    * membership). Fixed iterations keep the operator deterministic, and
    * each round quantizes ranks to 12 decimals (roundN — identical IEEE-754
    * ops both engines), so engine and oracle stay bit-identical round by
    * round: summation-order drift (~1e-19 here) can never cross a 5e-13
    * rounding boundary. The DuckDB oracle is the same recurrence unrolled
    * as chained CTEs.
    *
    * Scale notes: one shuffle-join (edges ⋈ ranks on src) + one
    * map-side-combinable sum per round — the connectedComponents cost
    * model; `localCheckpoint` truncates per-round lineage. Edges here are
    * symmetric (both directions present), so out-degree ≥ 1 everywhere and
    * there is no dangling-mass term. */
  def pageRank(edges: DataFrame, iters: Int = PrIters,
      damping: Double = PrDamping): DataFrame = {
    val e = edges.select(col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val n = broadcast(deg.agg(count(lit(1)).as("n")))
    var ranks = deg.crossJoin(n)
      .select(col("src").as("node"), (lit(1.0) / col("n")).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      ranks = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("mass"))
        .crossJoin(n)
        .select(col("node"),
          roundN(lit(1 - damping) / col("n") + lit(damping) * col("mass"), 12).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Registered instantiation: PageRank over the part co-purchase graph
    * (parts sharing an order are linked; both directions kept, so the
    * graph is symmetric). Per-order pair generation is a self-join bounded
    * by order size — never a global cross product. */
  def pageRankCoPurchase(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val edges = li.alias("a")
      .join(li.alias("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    pageRank(edges)
  }

  private val pageRankSql: String = {
    val rounds = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    ${roundNSql(s"(1 - $PrDamping) / n.n + $PrDamping * sum(r${i - 1}.rank / deg.outdeg)", 12)} AS rank
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node
         |         JOIN deg ON e.src = deg.src
         |         CROSS JOIN n
         |  GROUP BY e.dst, n.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey),
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT src AS node, 1.0 / n.n AS rank FROM deg CROSS JOIN n),
       |$rounds
       |SELECT node, rank FROM r$PrIters""".stripMargin
  }

  // ------------------------------------------------------------ Triangles

  /** Triangle enumeration over an ORIENTED edge list (first col < second
    * col, one row per undirected edge): the classic two-join form —
    * path a→b→c (a<b<c by orientation) closed by the a→c edge. Ordering
    * every edge low-id→high-id means each triangle appears exactly ONCE,
    * no post-dedup. Scale notes: at real scale the orientation key is
    * DEGREE (low-degree→high-degree), which bounds join fan-out by
    * arboricity — same plan, different ordering column; both joins are
    * equi-joins on edge endpoints and shuffle edge-list-sized data only. */
  def triangles(edges: DataFrame): DataFrame = {
    val a = edges.columns(0); val b = edges.columns(1)
    val e = edges.select(col(a).as("lo"), col(b).as("hi"))
    e.alias("ab")
      .join(e.alias("bc"), col("ab.hi") === col("bc.lo"))
      .join(e.alias("ac"),
        col("ac.lo") === col("ab.lo") && col("ac.hi") === col("bc.hi"))
      .select(col("ab.lo").as("id_a"), col("ab.hi").as("id_b"), col("bc.hi").as("id_c"))
  }

  /** Registered instantiation: mutual-near-dup triangles over the verified
    * MinHash pair list (clusters of three pairwise-similar docs — the
    * signal that a dup cluster is a true clique, not a chain). Pair
    * generation is size-gated ([[NearDup.minhashPairsAuto]]): identical
    * below the 150k-doc crossover, DF-pruned above it. */
  def nearDupTriangles(spark: SparkSession, dir: String): DataFrame =
    triangles(NearDup.minhashPairsAuto(spark, dir).select(col("id_a"), col("id_b")))

  private val trianglesSql =
    s"""WITH pairs AS (${NearDup.minhashPairsAutoSql}),
       |e AS (SELECT id_a AS lo, id_b AS hi FROM pairs)
       |SELECT ab.lo AS id_a, ab.hi AS id_b, bc.hi AS id_c
       |FROM e ab JOIN e bc ON ab.hi = bc.lo
       |          JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi""".stripMargin

  /** BFS hop distances from a seed set — bounded-round frontier
    * propagation, the "blast radius" query (recall scope, contamination
    * spread, related-item depth). Each round is ONE shuffle-join (edges ⋈
    * current distances on src) + a min-aggregate; `localCheckpoint`
    * truncates lineage per round (the Graph/BPE iterative discipline —
    * without it round r replays rounds 1..r-1). Distances are small
    * integers, so the oracle unrolls the identical rounds exactly. */
  val BfsHops = 3
  val BfsSeedMod = 199

  def bfsDistances(edges: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    val e = edges.select(col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
    var dist = seeds.select(col(seeds.columns(0)).as("node"), lit(0).as("d"))
      .localCheckpoint()
    for (h <- 1 to hops) {
      val next = dist.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), lit(h).as("d"))
      dist = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    dist
  }

  def bfsCoPurchase(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val edges = li.alias("a")
      .join(li.alias("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    val seeds = Tables.part(spark, dir)
      .filter(col("p_partkey") % BfsSeedMod === 0)
      .select(col("p_partkey").as("node"))
    bfsDistances(edges, seeds, BfsHops).orderBy(col("node"))
  }

  private val bfsSql: String = {
    val rounds = (1 to BfsHops).map { h =>
      s"""d$h AS (
         |  SELECT node, CAST(min(d) AS INTEGER) AS d FROM (
         |    SELECT node, d FROM d${h - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, $h AS d FROM e JOIN d${h - 1} p ON e.src = p.node)
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |d0 AS (
       |  SELECT p_partkey AS node, 0 AS d FROM part WHERE p_partkey % $BfsSeedMod = 0),
       |$rounds
       |SELECT node, d FROM d$BfsHops ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------ adamic-adar

  /** Pairs reported by the link-prediction ranking. */
  val AaTopK = 50

  /** Adamic-Adar link prediction over the order-part bipartite graph —
    * the classic common-neighbor score (Adamic & Adar 2003) that
    * down-weights promiscuous neighbors: for a part pair (a, b),
    * aa = Σ over shared orders o of 1/ln(|o|), where |o| is the order's
    * distinct-part degree. Complements `q_basket_affinity` (raw support
    * counts) exactly the way the literature motivates: a pair co-bought
    * only inside huge catch-all baskets scores near zero here.
    *
    * Exactness: each order's weight 1/ln(deg) quantizes to micro-units
    * ONCE (one division on an exact BIGINT degree), so per-pair scores
    * are order-free integer sums; ln(1) never divides (an order with one
    * part yields no pairs, and the deg ≥ 2 filter makes the plan
    * ANSI-safe regardless of reordering). Ranking compares exact aa_µ
    * integers, ties (part_a, part_b).
    *
    * Scale shape: per-order pair generation is the pageRankCoPurchase
    * self-join — equi-join on orderkey, bounded by order size, never a
    * global cross product; weights broadcast-join on orderkey; the
    * global top-k goes through the native bounded-heap operator (no
    * global sort). */
  def adamicAdar(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val w = li.groupBy(col("o")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2)
      .select(col("o"),
        floor(lit(1.0) / log(col("d").cast("double")) * 1e6 + 0.5)
          .cast("long").as("w_mu"))
    val pairs = li.alias("a")
      .join(li.alias("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("part_a"), col("b.p").as("part_b"), col("a.o").as("o"))
    val ag = pairs.join(w, Seq("o"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("common_orders"), sum(col("w_mu")).as("aa_mu"))
    graft.plans.TopK.topK(ag, Seq.empty,
      Seq(("aa_mu", true), ("part_a", false), ("part_b", false)), AaTopK)
      .orderBy(col("aa_mu").desc, col("part_a"), col("part_b"))
      .select(col("part_a"), col("part_b"), col("common_orders"),
        (col("aa_mu") / 1e6).as("aa"))
  }

  private val adamicAdarSql =
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |w AS (SELECT o,
       |        CAST(floor(1.0 / ln(CAST(d AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS w_mu
       |      FROM (SELECT o, count(*) AS d FROM li GROUP BY 1) WHERE d >= 2),
       |pairs AS (SELECT a.p AS part_a, b.p AS part_b, a.o
       |          FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
       |ag AS (SELECT part_a, part_b, count(*) AS common_orders,
       |         CAST(sum(w_mu) AS BIGINT) AS aa_mu
       |       FROM pairs JOIN w USING (o) GROUP BY 1, 2)
       |SELECT part_a, part_b, common_orders, aa_mu / 1e6 AS aa
       |FROM ag
       |ORDER BY aa_mu DESC, part_a, part_b
       |LIMIT $AaTopK""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_graph_pagerank", pageRankCoPurchase, Some(pageRankSql)),
    Q("q_graph_triangles", nearDupTriangles, Some(trianglesSql)),
    Q("q_graph_bfs", bfsCoPurchase, Some(bfsSql)),
    Q("q_graph_adamic_adar", adamicAdar, Some(adamicAdarSql)),
  )
}
