package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deployment presets bundling every stateful twin's bounding knobs into
  * one named configuration, so "run this stream safely in production" is a
  * single decision instead of six per-stream parameters. Two operating
  * points:
  *
  *  - [[StreamDefaults.replay]] — the configuration baked into each
  *    twin's parameter defaults: per-key caps ON, key-count TTL OFF
  *    (`NoTimeout`). This is the point at which the engine's primary
  *    guarantee holds exactly: streaming ≡ batch under ARBITRARY arrival
  *    order, replay + checkpoint-restart spec'd per twin.
  *  - [[StreamDefaults.production]] — every unbounded resource bounded:
  *    the same per-key caps, PLUS an event-time idle TTL (7-day horizon,
  *    1-hour watermark lateness) on the event-time twins and a
  *    processing-time idle TTL (24 h) on the processing-time twins, so
  *    state is O(keys active within the horizon), never O(keys ever
  *    seen). The replay-exactness trade (evicted keys re-initialize as
  *    fresh; rows older than the watermark are dropped) is documented on
  *    [[Ttl]] and spec-pinned per twin in StreamTtlSpec.
  *
  * Exemptions — stateful streams with NO TTL knob, each bounded another
  * way (the documented-exemption list StreamDefaultsSpec pins):
  *  - sketch monitors (KmvMonitor, CmsMonitor): state is ≤ K counters /
  *    K hashes per group BY CONSTRUCTION, independent of key cardinality;
  *  - windowed/session aggregations (EventStreams, RevenueMonitor,
  *    DriftMonitor, ForecastMonitor, AbtestMonitor, NearDupStream,
  *    DocIngest): Spark's own watermark evicts closed windows;
  *  - sinks (UpsertSink, ManifestSink): hold no streaming state — their
  *    footprint is the output table itself.
  */
final case class StreamDefaults(
    idleTtl: Option[Ttl],
    idleTtlProcMs: Option[Long],
    touchCap: Option[Int],
    basketCap: Option[Int],
    timesCap: Option[Int],
    journeyCap: Option[Int]) {

  /** True iff every bounding knob is engaged — what `production` promises. */
  def fullyBounded: Boolean =
    idleTtl.isDefined && idleTtlProcMs.isDefined && touchCap.isDefined &&
      basketCap.isDefined && timesCap.isDefined && journeyCap.isDefined

  // One applier per parameterized stateful twin: the preset IS the knob
  // wiring, so call sites cannot mix presets per-parameter.
  def attributedPurchases(spark: SparkSession,
      events: Dataset[AttributionStream.Ev]): Dataset[AttributionStream.AttRow] =
    AttributionStream.attributedPurchases(spark, events, touchCap, idleTtl)

  def orderPairs(spark: SparkSession,
      items: Dataset[BasketStream.Item]): Dataset[BasketStream.BasketRow] =
    BasketStream.orderPairs(spark, items, basketCap, idleTtlProcMs)

  def bursts(spark: SparkSession,
      events: Dataset[DebounceStream.Ev]): Dataset[DebounceStream.Burst] =
    DebounceStream.bursts(spark, events, timesCap, idleTtl)

  def userTransitions(spark: SparkSession,
      events: Dataset[TransitionStream.Ev]): Dataset[TransitionStream.UserTrans] =
    TransitionStream.userTransitions(spark, events, journeyCap, idleTtl)

  def cdcLatestWins(spark: SparkSession, srcDir: String): Dataset[CdcStream.KeyState] =
    CdcStream.latestWins(spark, srcDir, idleTtlProcMs)

  def funnel(spark: SparkSession,
      events: Dataset[Stateful.FunnelEvent]): Dataset[Stateful.FunnelResult] =
    Stateful.funnelState(spark, events, idleTtl)
}

object StreamDefaults {

  /** Production event-time idle horizon: 7 days of event time, 1 hour of
    * accepted arrival skew — the usual log-shipping contract. */
  val ProductionIdleTtl: Ttl = Ttl(ttlMs = 7L * 24 * 3600 * 1000, lateness = "1 hour")

  /** Production processing-time idle horizon for the two twins whose
    * sources carry no event time (basket assembly, CDC latest-wins). */
  val ProductionProcTtlMs: Long = 24L * 3600 * 1000

  val replay: StreamDefaults = StreamDefaults(
    idleTtl = None,
    idleTtlProcMs = None,
    touchCap = AttributionStream.DefaultTouchCap,
    basketCap = BasketStream.DefaultBasketCap,
    timesCap = DebounceStream.DefaultTimesCap,
    journeyCap = TransitionStream.DefaultJourneyCap)

  val production: StreamDefaults = replay.copy(
    idleTtl = Some(ProductionIdleTtl),
    idleTtlProcMs = Some(ProductionProcTtlMs))
}
