package graft.plans

import graft.Q
import graft.sources.Tables
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions._

/** Native top-k-per-group: a whole custom operator through Catalyst's
  * deepest extension point — logical node + planner strategy + physical
  * execs, injected via `SparkSessionExtensions` (SURVEY.md §7's ladder
  * step (c); the scalar-expression steps (a)/(b) are
  * functions/VectorExpressions.scala).
  *
  * Why Spark's built-ins aren't this operator: the idiomatic form —
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` — SORTS every
  * partition by (g, o). Spark 3.5+'s WindowGroupLimit prunes each group
  * to k rows but still sorts to find them, and the Window itself sorts
  * again. For top-k over a 100 TB fact table that is an O(n log n)
  * sort-spill per partition for an answer that needs O(n log k) and
  * k rows of memory per group.
  *
  * Physical shape (mirrors partial/final aggregation):
  *  - `GraftTopKExec(partial=true)`  — per input partition, one bounded
  *    binary heap per group key keeps the k first rows under the sort
  *    order. Map-side: output is ≤ k rows per (group × partition).
  *  - Exchange on the group key — inserted by EnsureRequirements because
  *    the final exec declares `ClusteredDistribution(group)`.
  *  - `GraftTopKExec(partial=false)` — merges the per-partition champions:
  *    declares a required child ordering on (group, order), so Spark
  *    inserts a (spillable) sort of the partial survivors — k rows per
  *    (group × partition) when the partial filter bites — and the final
  *    pass is a streaming first-k-per-group scan with O(1) state.
  * Partial memory is O(groups-in-partition × k) rows. That bound is the
  * operator's own scale hazard when the group key is NEAR-UNIQUE per row
  * (millions of single-row groups: the heap map saves nothing and its
  * per-row copies + GC cost ~3× a plain sort — measured on the textrank
  * edge-cap window, 93 s vs 29 s at 50k docs), so the partial pass
  * monitors its observed groups-per-row ratio and degrades to a pure
  * passthrough when groups are tiny — a partial top-k is a lossy filter,
  * so forwarding extra rows is always correct, and the final sorted scan
  * still emits exactly k per group. Row order within a group is
  * unspecified (a set operator) — callers sort the k·|groups| survivors
  * if they need presentation order.
  */
case class TopKPerGroup(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      GraftTopKExec(g, o, k, partial = false,
        GraftTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class GraftTopKExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "GraftTopKPartial" else "GraftTopKFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (group.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(group) :: Nil

  /** Final pass consumes (group, order)-sorted input — when the partial
    * filter bit, that sort covers only k·groups·partitions survivor rows;
    * when it degraded to passthrough, the sort is the same spillable cost
    * the window form would have paid. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(group.map(SortOrder(_, Ascending)) ++ order)

  /** The final pass's streaming first-k filter preserves its input order,
    * so its output carries the same (group, order) sequence it required of
    * its child. Declaring it lets EnsureRequirements elide the otherwise
    * redundant second sort a parent Window (same partition/order spec)
    * would insert over the k·|groups| survivors. */
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil
    else group.map(SortOrder(_, Ascending)) ++ order

  override lazy val metrics: Map[String, SQLMetric] =
    if (partial) Map(
      "passthroughParts" -> SQLMetrics.createMetric(sparkContext,
        "partitions degraded to passthrough"))
    else Map.empty

  /** Row interval between groups-per-row checks in the partial pass —
    * rounded down to a power of two so the hot-loop check stays a mask.
    * Injectable (`spark.graft.topk.checkEvery`) so a unit spec can force
    * the degrade path on a small dataset. */
  private val checkMask: Long = {
    val raw = conf.getConfString("spark.graft.topk.checkEvery", "65536")
      .toIntOption.filter(_ > 0).getOrElse(65536)
    java.lang.Integer.highestOneBit(raw).toLong - 1L
  }

  /** Absolute retained-row budget for the partial heap map (the map has no
    * spill path): once groups×k would exceed this, new groups stop being
    * admitted and the partition degrades to passthrough. Round-12: default
    * tightened 8.4M → 2M rows — the budget is PER TASK and every core runs
    * one task, so the old ceiling allowed ~1 GB of heap-map objects × 32
    * concurrent tasks on an 8 GB driver JVM (measured java.lang.OOM on the
    * 500k-doc textrank edge-cap window, whose (doc,src) group count per
    * task sat just under the old budget while the retention check below
    * was marginal). A genuine top-k that needs more state than this
    * degrades to the spillable sort, which is the safe plan. */
  private val maxRetainedRows: Long =
    conf.getConfString("spark.graft.topk.maxRetainedRows", "2097152")
      .toLongOption.filter(_ > 0).getOrElse(2097152L)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val (g, o, cap) = (group, order, k)
    val (mask, maxRetained) = (checkMask, maxRetainedRows)
    val passthroughMetric = if (partial) metrics("passthroughParts") else null
    if (partial) child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, schema)
      val ord = RowOrdering.create(o, schema)
      // max-heap on the retained set: root = the row that sorts LAST, so
      // a newcomer that sorts before the root evicts it
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      var n = 0L
      var evicted = 0L
      var passthrough = false
      var pending: InternalRow = null
      while (iter.hasNext && !passthrough) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // absolute-budget degrade: admitting this group would push the
          // worst-case retained set past the budget — forward the current
          // row and the remainder untouched instead of growing the map
          if ((heaps.size + 1).toLong * cap > maxRetained) {
            passthrough = true
            pending = row.copy()
          } else {
            // initial capacity only — the queue grows to cap as needed, so a
            // large k doesn't pre-allocate (or integer-overflow) a huge array
            heap = new java.util.PriorityQueue[InternalRow](math.min(cap, 1024) + 1, cmp)
            heaps.put(key.copy(), heap)
          }
        }
        if (!passthrough) {
          if (heap.size < cap) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
            evicted += 1
          } else evicted += 1 // rejected outright — still not retained
          n += 1
          // retention degrade (round-12: replaces the groups×2 > n
          // tiny-group check, which only caught the <2 rows/group case):
          // if the heap map is retaining more than 3/4 of what it has
          // seen, it is paying per-row copy + map + GC for (almost) no
          // volume reduction — forward the remainder untouched (correct:
          // the final sorted scan re-selects exactly k per group from any
          // superset). Directly measures reduction, so it also catches the
          // mid-density regime (rows/group ≤ k over millions of groups,
          // e.g. the 500k-doc textrank edge-cap window at ~1.9 rows/group
          // with k=8, where NOTHING is evicted and the old check sat just
          // under its threshold while the map exhausted the heap — that
          // regime measures retention 1.0). Threshold 3/4, not 1/2: a
          // heap already cutting a third of its input is doing real work
          // per retained row, and every pathological case above measures
          // retention ≈ 1.0 — degrade only on clear evidence.
          if ((n & mask) == 0 && (n - evicted) * 4L > n * 3L) passthrough = true
        }
      }
      if (passthrough) passthroughMetric.add(1L)
      import scala.jdk.CollectionConverters._
      val rest = if (pending != null) Iterator.single(pending) ++ iter else iter
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala) ++ rest
    }, preservesPartitioning = true)
    else child.execute().mapPartitions({ iter =>
      // input is (group, order)-sorted: stream the first k of each group
      val keyProj = UnsafeProjection.create(g, schema)
      var prevKey: UnsafeRow = null
      var kept = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (prevKey == null || key != prevKey) {
          prevKey = key.copy()
          kept = 0
        }
        kept += 1
        kept <= cap
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftTopKExec =
    copy(child = newChild)
}

/** Dataset-level entry point + the registered query. */
object TopK {

  /** Keep the first k rows per group under `order` ((column, descending)
    * specs). Columns resolve against the analyzed plan, so the logical
    * node enters the optimizer fully resolved. */
  def topK(df: DataFrame, group: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val node = TopKPerGroup(
      group.map(attr),
      order.map { case (c, desc) =>
        SortOrder(attr(c), if (desc) Descending else Ascending)
      },
      k, analyzed)
    org.apache.spark.sql.GraftPlanBridge.ofRows(df.sparkSession, node)
  }

  val TopN = 3

  /** Top-3 most expensive lineitems per return flag, through the native
    * operator; ties broken by (orderkey, linenumber) so the set is unique. */
  def topkNative(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("returnflag"), col("l_orderkey").as("orderkey"),
      col("l_linenumber").as("linenumber"), col("l_extendedprice").as("price"))
    topK(li, Seq("returnflag"),
      Seq(("price", true), ("orderkey", false), ("linenumber", false)), TopN)
      .orderBy(col("returnflag"), col("price").desc, col("orderkey"), col("linenumber"))
  }

  private val topkNativeSql =
    s"""SELECT returnflag, orderkey, linenumber, price FROM (
       |  SELECT l_returnflag AS returnflag, l_orderkey AS orderkey,
       |    l_linenumber AS linenumber, l_extendedprice AS price,
       |    row_number() OVER (PARTITION BY l_returnflag
       |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
       |  FROM lineitem)
       |WHERE rn <= $TopN
       |ORDER BY returnflag, price DESC, orderkey, linenumber""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_topk_native", topkNative, Some(topkNativeSql), bench = true))
}
