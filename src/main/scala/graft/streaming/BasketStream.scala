package graft.streaming

import graft.functions.Rounding.roundN
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming market-basket lift — the stateful twin of the batch
  * `q_basket_affinity` (operators/Analytics.basketAffinity), the third
  * of the round-3 analytics to get a streaming consumer (PSI drift and
  * the transition matrix being the others).
  *
  * Unlike the transition matrix, basket pair state is MONOTONE: a
  * late-arriving item only ADDS pairs to its order, it can never
  * dissolve an existing pair — so there is no retraction channel. The
  * stateful operator keeps each order's distinct item set and emits the
  * order's full current (item, pair) rows whenever the order is touched;
  * the per-(okey, part_a, part_b) replace-upsert is idempotent, so
  * re-emission under shuffled arrival converges to the batch fixpoint.
  *
  * The published lift table is recomputed per batch from the two stores
  * with the batch query's exact arithmetic (integer counts, one rounded
  * double division) — pair-store-sized input, never stream-sized.
  *
  * Scale notes: state per order is its distinct item set (the same rows
  * the batch per-order self-join consumes); the emitted pair volume per
  * order is O(|basket|²) — production composes this with the
  * `q_basket_affinity_capped` deterministic-hash item cap to hard-bound
  * the pathological mega-basket, identical semantics to the batch cap.
  */
object BasketStream {

  final case class Item(okey: Long, part: Long)
  /** part_b = PairSentinel marks an item-presence row (n_item/n_orders
    * denominators); real pairs carry part_a < part_b. */
  val PairSentinel: Long = -1L
  final case class BasketRow(okey: Long, part_a: Long, part_b: Long)

  /** Per-order state: emit the order's current presence + pair rows on
    * every touch. Replace-upsert downstream makes re-emission idempotent. */
  def orderPairs(spark: SparkSession, items: org.apache.spark.sql.Dataset[Item]):
      org.apache.spark.sql.Dataset[BasketRow] = {
    import spark.implicits._
    items
      .groupByKey(_.okey)
      .flatMapGroupsWithState[Set[Long], BasketRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (okey: Long, batch: Iterator[Item], state: GroupState[Set[Long]]) =>
          val parts = batch.foldLeft(state.getOption.getOrElse(Set.empty[Long])) {
            (acc, it) => acc + it.part
          }
          state.update(parts)
          val sorted = parts.toIndexedSeq.sorted
          sorted.iterator.map(p => BasketRow(okey, p, PairSentinel)) ++
            sorted.iterator.zipWithIndex.flatMap { case (a, i) =>
              sorted.iterator.drop(i + 1).map(b => BasketRow(okey, a, b))
            }
      }
  }

  /** File-source stream over lineitem parquet files. */
  def lineitemStream(spark: SparkSession, srcDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    UpsertSink.fileStream(spark, srcDir, maxFilesPerTrigger)

  /** Start the monitor: presence/pair rows replace-upserted into
    * `stateDir`_pairs, the published lift table (batch-exact arithmetic,
    * MinSupport filter) atomically swapped into `stateDir` per batch. */
  def liftMonitor(spark: SparkSession, srcDir: String, stateDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1): StreamingQuery = {
    import spark.implicits._
    val items = lineitemStream(spark, srcDir, maxFilesPerTrigger)
      .select(col("l_orderkey").cast("long").as("okey"),
        col("l_partkey").cast("long").as("part"))
      .as[Item]
    orderPairs(spark, items).toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        UpsertSink.upsertBatch(batch,
          Seq("okey", "part_a", "part_b"), stateDir + "_pairs")
        val sess = batch.sparkSession
        val store = sess.read.parquet(stateDir + "_pairs")
        val presence = store.filter(col("part_b") === PairSentinel)
        val nOrders = presence.select(col("okey")).distinct()
          .agg(count(lit(1)).as("n_orders"))
        val itemCounts = presence.groupBy(col("part_a").as("part"))
          .agg(count(lit(1)).as("n_item"))
        val pairs = store.filter(col("part_b") =!= PairSentinel)
          .groupBy(col("part_a"), col("part_b"))
          .agg(count(lit(1)).as("n_pair"))
          .filter(col("n_pair") >= graft.operators.Analytics.MinSupport)
        val lift = pairs
          .join(itemCounts.select(col("part").as("part_a"), col("n_item").as("n_a")), "part_a")
          .join(itemCounts.select(col("part").as("part_b"), col("n_item").as("n_b")), "part_b")
          .crossJoin(broadcast(nOrders))
          .select(col("part_a"), col("part_b"), col("n_pair"),
            roundN(col("n_pair").cast("double") * col("n_orders") /
              (col("n_a") * col("n_b")), 6).as("lift"))
        val tmp = stateDir + ".tmp"
        lift.write.mode("overwrite").parquet(tmp)
        UpsertSink.swapInto(tmp, stateDir)
      }
      .start()
  }
}
