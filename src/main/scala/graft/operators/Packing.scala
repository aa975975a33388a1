package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy sequence PACKING — the training-batch assembly operator: concat
  * documents into fixed-token-budget sequences ("bins") so GPU batches
  * waste no padding. Each doc lands in exactly one bin; a bin closes when
  * the next doc would overflow the budget (an over-budget doc gets a bin
  * of its own).
  *
  * Distribution contract: docs are sharded by doc_id % NumShards and
  * packed per shard in doc_id order — the result is a pure function of the
  * data (NOT of the physical partitioning), which is what makes packing
  * reproducible across cluster sizes AND lets a DuckDB recursive CTE
  * verify it end to end.
  *
  * This is the one operator family where `mapPartitions` is the right
  * tool (brief's option (d)): a stateful sequential fold per shard has no
  * declarative form — Catalyst windows can compute running sums, but the
  * bin boundary depends on the running value being RESET at each boundary,
  * which is exactly the recurrence a per-partition scan implements. Each
  * shard is hash-routed to one partition and scanned once — O(rows),
  * no driver state, scales with shard count. */
object Packing {

  val TokenBudget = 512
  val NumShards = 8

  def packGreedy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"),
        pmod(col("doc_id"), lit(NumShards)).cast("long").as("shard"),
        size(split(TextAnalysis.normText(col("text")), " ")).cast("long").as("n_tokens"))
      .repartition(NumShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
    rows.mapPartitions { it =>
      var curShard = -1L
      var bin = 0L
      var fill = 0L
      it.map { case (id, shard, t) =>
        if (shard != curShard) { curShard = shard; bin = 0L; fill = t }
        else if (fill + t <= TokenBudget) { fill += t }
        else { bin += 1L; fill = t }
        (id, shard, bin, t)
      }
    }.toDF("doc_id", "shard", "bin", "n_tokens")
  }

  /** Oracle replays the same per-shard greedy recurrence sequentially. */
  private val packGreedySql =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, doc_id % $NumShards AS shard,
       |    len(string_split(${TextAnalysis.normSql}, ' ')) AS n_tokens,
       |    row_number() OVER (PARTITION BY doc_id % $NumShards ORDER BY doc_id) AS rn
       |  FROM documents),
       |p(shard, rn, doc_id, n_tokens, bin, fill) AS (
       |  SELECT shard, rn, doc_id, n_tokens, 0::BIGINT, n_tokens::BIGINT
       |  FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
       |    CASE WHEN p.fill + d.n_tokens <= $TokenBudget THEN p.bin ELSE p.bin + 1 END,
       |    CASE WHEN p.fill + d.n_tokens <= $TokenBudget THEN p.fill + d.n_tokens
       |         ELSE d.n_tokens::BIGINT END
       |  FROM d JOIN p ON d.shard = p.shard AND d.rn = p.rn + 1)
       |SELECT doc_id, shard, bin, n_tokens::BIGINT AS n_tokens FROM p""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_text_pack", packGreedy, Some(packGreedySql), bench = true),
  )
}
