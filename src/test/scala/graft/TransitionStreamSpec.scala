package graft

import graft.operators.Events
import graft.streaming.TransitionStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the transition matrix under SHUFFLED arrival:
  * the random repartition interleaves every user's events across files,
  * so most transitions are created, retracted, and re-created as later
  * micro-batches land in-between — the full out-of-order contract. */
class TransitionStreamSpec extends SparkSuite {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streamed matrix equals batch q_events_markov after shuffled replay") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("markov_src").toString
    // random split: arrival order within each user is arbitrary
    graft.sources.Tables.events(spark, dir)
      .repartition(5).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("markov_state").toString + "/matrix"
    val q = TransitionStream.matrixMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("markov_ck").toString)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(stateDir)
    val batch = Events.transitionMatrix(spark, dir)
    assert(canon(streamed) === canon(batch))
  }

  test("restart from checkpoint: late files after a stop still converge to batch") {
    val dir = SparkSpec.sf0001
    val ev = graft.sources.Tables.events(spark, dir).cache()
    val src = java.nio.file.Files.createTempDirectory("markov2_src").toString
    ev.filter(col("event_id") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("markov2_state").toString + "/matrix"
    val ck = java.nio.file.Files.createTempDirectory("markov2_ck").toString
    val q1 = TransitionStream.matrixMonitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()

    ev.filter(col("event_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    ev.unpersist()
    val q2 = TransitionStream.matrixMonitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    assert(canon(spark.read.parquet(stateDir)) ===
      canon(Events.transitionMatrix(spark, dir)))
  }

  test("journeyCap bounds state and converges to batch q_events_markov_capped") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("markovc_src").toString
    graft.sources.Tables.events(spark, dir)
      .repartition(5).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("markovc_state").toString + "/matrix"
    // JourneyCap = 50 bites on this fixture (users run 60-90 events), so
    // the capped stream must DIFFER from the uncapped matrix and EQUAL the
    // batch capped one — including late-displacement retractions
    val q = TransitionStream.matrixMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("markovc_ck").toString,
      journeyCap = Some(Events.JourneyCap))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(stateDir)
    assert(canon(streamed) === canon(Events.transitionMatrixCapped(spark, dir)))
    assert(canon(streamed) !== canon(Events.transitionMatrix(spark, dir)))
  }

  test("default cap bounds a hot key: zero-config state keeps only the first DefaultJourneyCap events") {
    import TransitionStream.{Ev, UserTrans}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cap = TransitionStream.DefaultJourneyCap.get
    val input = MemoryStream[Ev]
    // NO cap argument: the zero-config path must be bounded by default
    val out = TransitionStream.userTransitions(spark, input.toDS())
    val q = out.writeStream.format("memory").queryName("trans_hot")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("trans_hot_ck").toString)
      .start()

    def ev(ts: Long) = Ev(1L, ts, ts, if (ts % 2 == 1) "A" else "B")
    // batch 1: one hot user, cap + 100 alternating A/B events, LATE-first
    // (ts 101..cap+100) so the early arrivals must later displace them
    input.addData((101L to (cap + 100L)).map(ev))
    q.processAllAvailable()
    // batch 2: the true earliest 100 events land late — first-k keeps
    // ts 1..cap and must retract transitions contributed by ts > cap
    input.addData((1L to 100L).map(ev))
    q.processAllAvailable()
    val progress = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal)
    q.stop()

    // latest emission per pair wins (update semantics)
    val rows = spark.table("trans_hot").as[UserTrans].collect()
    val latest = rows.zipWithIndex
      .groupBy(r => (r._1.from_type, r._1.to_type))
      .map { case (k, v) => k -> v.maxBy(_._2)._1.n }
      .filter(_._2 > 0)
    // expected: transitions over ts 1..cap ONLY (odd ts = A, even = B):
    // cap/2 (A,B) pairs and cap/2 - 1 (B,A) pairs, nothing else survives
    assert(latest === Map(("A", "B") -> (cap / 2).toLong, ("B", "A") -> (cap / 2 - 1).toLong))
    // one state row per key, regardless of the 1100-event journey
    assert(progress.nonEmpty && progress.forall(_ === 1L))
  }

  test("late event between two seen events retracts the stale transition") {
    import TransitionStream.{Ev, UserTrans}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = TransitionStream.userTransitions(spark, input.toDS())
    val q = out.writeStream.format("memory").queryName("trans_mem")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("trans_ck").toString)
      .start()

    // batch 1: A(t=1) -> C(t=3): one transition (A,C)
    input.addData(Ev(1L, 1L, 1L, "A"), Ev(1L, 3L, 3L, "C"))
    q.processAllAvailable()
    // batch 2: late B(t=2) lands between: (A,C) must retract to 0,
    // (A,B) and (B,C) appear
    input.addData(Ev(1L, 2L, 2L, "B"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("trans_mem").as[UserTrans].collect()
    // last emission per pair wins (update semantics)
    val latest = rows.zipWithIndex
      .groupBy(r => (r._1.from_type, r._1.to_type))
      .map { case (k, v) => k -> v.maxBy(_._2)._1.n }
    assert(latest(("A", "C")) === 0L) // retracted
    assert(latest(("A", "B")) === 1L)
    assert(latest(("B", "C")) === 1L)
  }
}
