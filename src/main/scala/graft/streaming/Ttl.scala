package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Opt-in event-time TTL for keyed streaming state — closing the engine's
  * last unbounded resource (round-6 verdict #1): the per-KEY caps
  * (`DefaultJourneyCap`/`DefaultBasketCap`/`DefaultTouchCap`/
  * `DefaultTimesCap`) bound what one key holds, but the KEY COUNT grows
  * with every user/order/key ever seen. With a [[Ttl]] passed, a stateful
  * twin runs `GroupStateTimeout.EventTimeTimeout` and EVICTS a key's state
  * once the watermark passes `ttlMs` beyond the key's last activity
  * (the max of its last event time and the watermark at its last touch),
  * so state size is O(keys active within the TTL horizon), not O(keys
  * ever seen).
  *
  * The replay-exactness trade (why `NoTimeout` stays the API default):
  * the engine's primary spec'd guarantee is streaming ≡ batch under
  * ARBITRARY arrival order — replaying an archive whose files are not
  * time-ordered must converge to the batch answer exactly. A TTL breaks
  * that in two documented ways: (1) an idle key's state is GONE once the
  * watermark passes its deadline, so a key that reappears re-initializes
  * as fresh (its pre-eviction events no longer participate); (2) the
  * watermark that drives eviction also DROPS input rows older than the
  * watermark (Spark's stateful operators filter late data when the input
  * carries a watermarked column) — accepting a row for a key that may
  * already be evicted would make results depend on eviction timing, so
  * dropping is the coherent semantic. Production streams whose arrival
  * skew is bounded by `lateness` lose nothing; `StreamTtlSpec` pins the
  * per-twin eviction semantics.
  */
final case class Ttl(ttlMs: Long, lateness: String = "0 seconds") {
  require(ttlMs > 0, "TTL must be positive")
}

object Ttl {

  /** Attach an event-time watermark derived from the dataset's `ts_us`
    * microsecond column (every event-time twin carries one) so
    * `EventTimeTimeout` can fire. The added `event_time` column rides
    * along unreferenced by the typed encoder. */
  def watermarked[T: Encoder](ds: Dataset[T], lateness: String): Dataset[T] =
    ds.withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", lateness)
      .as[T]

  /** Eviction deadline for a key touched this batch: idle once the
    * watermark passes `ttlMs` beyond its last activity. The max with the
    * current watermark keeps the deadline strictly ahead of it (Spark
    * rejects timeouts at/behind the watermark) even when the batch's
    * events are all older than the watermark's position. */
  def deadline(state: GroupState[_], batchMaxTsMs: Long, ttlMs: Long): Long =
    math.max(state.getCurrentWatermarkMs, batchMaxTsMs) + ttlMs
}
