package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Event-time TTL eviction for keyed streaming state (round-6 verdict #1):
  * per-key caps bound what one key holds, the [[graft.streaming.Ttl]] knob
  * bounds HOW MANY keys are held. Each test pins the documented per-twin
  * eviction semantic: the state-store row count DROPS once the watermark
  * passes an idle key's deadline, and a reappearing key re-initializes as
  * fresh. Timeline convention: seconds → microseconds via `sec`; watermark
  * lateness 0s, TTL 60s; key 99 is the "clock" key whose later events
  * advance the watermark (eviction fires one batch after the watermark
  * passes the deadline — Spark uses the previous batch's watermark). */
class StreamTtlSpec extends SparkSuite {
  import spark.implicits._

  private def sec(n: Long): Long = n * 1000000L
  private val ttl = Ttl(ttlMs = 60000L) // 60s of event time

  private def memQuery(df: org.apache.spark.sql.DataFrame, name: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ttl_${name}_ck").toString)
      .start()

  private def stateRows(q: StreamingQuery): Long =
    q.lastProgress.stateOperators.head.numRowsTotal

  /** For the ProcessingTimeTimeout twins: `processAllAvailable` can never
    * return there (a proc-time timeout can always fire, so the stream
    * always schedules another batch and `noNewData` is never signaled) —
    * poll the observable condition under a deadline instead. */
  private def eventually(cond: => Boolean, msg: String): Unit = {
    val deadline = System.currentTimeMillis + 60000
    while (!cond && System.currentTimeMillis < deadline) Thread.sleep(100)
    assert(cond, msg)
  }

  private def procTimeQuery(df: org.apache.spark.sql.DataFrame, name: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ttl_${name}_ck").toString)
      .start()

  test("transition: idle journey state is GONE after the watermark passes; reappearing user is a fresh journey") {
    import TransitionStream.{Ev, UserTrans}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = TransitionStream.userTransitions(spark, input.toDS(), idleTtl = Some(ttl))
    val q = memQuery(out.toDF(), "ttl_trans")

    // batch 1: user 1's journey C -> C; deadline = 1001s + 60s
    input.addData(Ev(1L, sec(1000), 1L, "C"), Ev(1L, sec(1001), 2L, "C"))
    q.processAllAvailable()
    assert(stateRows(q) === 1L) // user 1 held
    // batch 2: TWO clock keys push the watermark to 2000s (> 1061s); the
    // watermark advance schedules a follow-up batch that processes user
    // 1's timeout inside the same processAllAvailable — without eviction
    // this would be 3 state rows
    input.addData(Ev(98L, sec(2000), 3L, "X"), Ev(99L, sec(2000), 4L, "X"))
    q.processAllAvailable()
    assert(stateRows(q) === 2L) // user 1's row is GONE; both clock keys remain
    val before = spark.table("ttl_trans").count()

    // batch 4: user 1 returns with A -> B; a fresh journey emits ONLY the
    // new pair — no (C, A) bridge, no re-emitted (C, C)
    input.addData(Ev(1L, sec(3000), 5L, "A"), Ev(1L, sec(3001), 6L, "B"))
    q.processAllAvailable()
    val fresh = spark.table("ttl_trans").as[UserTrans].collect().drop(before.toInt)
      .filter(_.user_id == 1L)
    q.stop()
    assert(fresh.toSet === Set(UserTrans(1L, "A", "B", 1L)))
  }

  test("funnel: evicted journey re-initializes at stage 0 (the verdict's example semantic)") {
    import Stateful.{FunnelEvent, FunnelResult}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = Stateful.funnelState(spark, input.toDS(), idleTtl = Some(ttl))
    val q = memQuery(out.toDF(), "ttl_funnel")

    input.addData(FunnelEvent(1L, "view", sec(1000)), FunnelEvent(1L, "click", sec(1010)))
    q.processAllAvailable()
    input.addData(FunnelEvent(99L, "view", sec(2000)))
    q.processAllAvailable()
    input.addData(FunnelEvent(99L, "view", sec(2010)))
    q.processAllAvailable()
    assert(stateRows(q) === 1L)
    val before = spark.table("ttl_funnel").count()

    // user 1 returns with a PURCHASE: with the old state this would
    // complete stage 3; as a fresh journey (no view) it is stage 0
    input.addData(FunnelEvent(1L, "purchase", sec(3000)))
    q.processAllAvailable()
    val fresh = spark.table("ttl_funnel").as[FunnelResult].collect().drop(before.toInt)
      .filter(_.user_id == 1L)
    q.stop()
    assert(fresh.length === 1 && fresh.head.stage_reached === 0 && fresh.head.t_view.isEmpty)
  }

  test("steps funnel: eviction finalizes, reappearance re-chains from scratch") {
    import Stateful.{FunnelEvent, StepsResult}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val steps = Seq("view", "click", "purchase")
    val out = Stateful.funnelStepsState(spark, input.toDS(), steps, idleTtl = Some(ttl))
    val q = memQuery(out.toDF(), "ttl_steps")

    input.addData(FunnelEvent(1L, "view", sec(1000)), FunnelEvent(1L, "click", sec(1010)))
    q.processAllAvailable()
    input.addData(FunnelEvent(99L, "view", sec(2000)))
    q.processAllAvailable()
    input.addData(FunnelEvent(99L, "view", sec(2010)))
    q.processAllAvailable()
    assert(stateRows(q) === 1L)
    val before = spark.table("ttl_steps").count()

    input.addData(FunnelEvent(1L, "click", sec(3000)))
    q.processAllAvailable()
    val fresh = spark.table("ttl_steps").as[StepsResult].collect().drop(before.toInt)
      .filter(_.user_id == 1L)
    q.stop()
    // fresh journey: a click with no prior view chains to stage 0
    assert(fresh.length === 1 && fresh.head.stage_reached === 0)
  }

  test("running stats: an evicted user's accumulator restarts from zero") {
    import Stateful.{TsEvent, UserStat}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val out = Stateful.runningUserStatsTtl(spark, input.toDS(), ttl)
    val q = memQuery(out.toDF(), "ttl_stats")

    input.addData(TsEvent(1L, 5.0, sec(1000)))
    q.processAllAvailable()
    input.addData(TsEvent(99L, 1.0, sec(2000)))
    q.processAllAvailable()
    input.addData(TsEvent(99L, 1.0, sec(2010)))
    q.processAllAvailable()
    assert(stateRows(q) === 1L)
    val before = spark.table("ttl_stats").count()

    input.addData(TsEvent(1L, 7.0, sec(3000)))
    q.processAllAvailable()
    val fresh = spark.table("ttl_stats").as[UserStat].collect().drop(before.toInt)
      .filter(_.user_id == 1L)
    q.stop()
    assert(fresh.toSeq === Seq(UserStat(1L, 1L, 7.0))) // not (2, 12.0)
  }

  test("debounce: no bridging across an eviction; ttl >= gap means no burst is ever split") {
    import DebounceStream.{Ev, Burst}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    // ttl (60s) < DebounceGapUs (300s) here ONLY to keep the fixture
    // timeline short; production guidance (scaladoc) is ttl >= gap
    val out = DebounceStream.bursts(spark, input.toDS(), idleTtl = Some(ttl))
    val q = memQuery(out.toDF(), "ttl_debounce")

    // one burst: 1000s, 1100s (gap 100s < 300s)
    input.addData(Ev(1L, "A", sec(1000), 1L), Ev(1L, "A", sec(1100), 2L))
    q.processAllAvailable()
    input.addData(Ev(99L, "A", sec(2000), 3L))
    q.processAllAvailable()
    input.addData(Ev(99L, "A", sec(2010), 4L))
    q.processAllAvailable()
    assert(stateRows(q) === 1L)
    val before = spark.table("ttl_debounce").count()

    // key 1 returns: a fresh key derives ONLY the new burst — the old
    // (1000s, n=2) burst is not re-emitted and cannot be extended
    input.addData(Ev(1L, "A", sec(3000), 5L))
    q.processAllAvailable()
    val fresh = spark.table("ttl_debounce").as[Burst].collect().drop(before.toInt)
      .filter(_.user_id == 1L)
    q.stop()
    assert(fresh.toSet === Set(Burst(1L, "A", sec(3000), 1L, 0L)))
  }

  test("attribution: a post-eviction purchase cannot reach the evicted touch") {
    import AttributionStream.{Ev, AttRow}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = AttributionStream.attributedPurchases(spark, input.toDS(), idleTtl = Some(ttl))
    val q = memQuery(out.toDF(), "ttl_attr")

    input.addData(Ev(1L, sec(1000), 1L, "click", 0L))
    q.processAllAvailable()
    input.addData(Ev(99L, sec(2000), 2L, "view", 0L))
    q.processAllAvailable()
    input.addData(Ev(99L, sec(2010), 3L, "view", 0L))
    q.processAllAvailable()
    assert(stateRows(q) === 1L)
    val before = spark.table("ttl_attr").count()

    // the touch is gone: the fresh journey's purchase lands in 'none'
    // (without TTL this attributes to the 1000s click)
    input.addData(Ev(1L, sec(3000), 4L, "purchase", 500L))
    q.processAllAvailable()
    val fresh = spark.table("ttl_attr").as[AttRow].collect().drop(before.toInt)
      .filter(_.user_id == 1L)
    q.stop()
    assert(fresh.toSeq === Seq(AttRow(1L, 4L, "none", 500L)))
  }

  test("basket: processing-time idle TTL evicts a finished order; a late item opens a fresh basket") {
    import BasketStream.{Item, BasketRow, PairSentinel}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Item]
    val out = BasketStream.orderPairs(spark, input.toDS(), idleTtlProcMs = Some(500L))
    val q = procTimeQuery(out.toDF(), "ttl_basket")

    input.addData(Item(1L, 10L), Item(1L, 20L))
    // 2 presence rows + the (10, 20) pair
    eventually(spark.table("ttl_basket").count() >= 3, "order 1 rows not emitted")
    Thread.sleep(1500) // wall-clock past the 500ms processing-time TTL
    input.addData(Item(2L, 30L))
    // a later trigger processes order 1's timeout: its state row is GONE
    eventually(stateRows(q) === 1L, s"expected eviction, state rows = ${stateRows(q)}")
    val before = spark.table("ttl_basket").count()

    // late item on the evicted order: fresh basket {40} — presence row
    // only, NO (10, 40)/(20, 40) pairs across the eviction boundary
    input.addData(Item(1L, 40L))
    eventually(spark.table("ttl_basket").count() > before, "late item not emitted")
    val fresh = spark.table("ttl_basket").as[BasketRow].collect().drop(before.toInt)
      .filter(_.okey == 1L)
    q.stop()
    assert(fresh.toSet === Set(BasketRow(1L, 40L, PairSentinel, 1L)))
  }

  test("cdc: opt-in processing-time TTL evicts idle champions — including the documented regress case") {
    val src = java.nio.file.Files.createTempDirectory("ttl_cdc_src").toString
    import CdcStream.{Change, KeyState}
    def file(rows: Change*): Unit =
      rows.toSeq.toDS().toDF().repartition(1).write.mode("append").parquet(src)

    file(Change(1L, 5, "U", 100L))
    val out = CdcStream.latestWins(spark, src, idleTtlProcMs = Some(500L))
    val q = procTimeQuery(out.toDF(), "ttl_cdc")
    eventually(spark.table("ttl_cdc").count() >= 1, "key 1 snapshot not emitted")
    Thread.sleep(1500)
    file(Change(2L, 1, "I", 10L))
    // a later trigger processes key 1's timeout: its champion is GONE
    eventually(stateRows(q) === 1L, s"expected eviction, state rows = ${stateRows(q)}")
    val before = spark.table("ttl_cdc").count()

    // the DOCUMENTED trade (scaladoc on latestWins): an out-of-order
    // change with a SMALLER seq arriving after eviction wins the
    // reopened key — this is why the CDC TTL is strictly opt-in
    file(Change(1L, 3, "U", 50L))
    eventually(spark.table("ttl_cdc").count() > before, "reopened key not emitted")
    val fresh = spark.table("ttl_cdc").as[KeyState].collect().drop(before.toInt)
      .filter(_.key == 1L)
    q.stop()
    assert(fresh.toSeq === Seq(KeyState(1L, "U", 0.5, live = true)))
  }
}
