package graft

import graft.operators.Events
import graft.streaming.DebounceStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the telemetry debounce under SHUFFLED arrival:
  * the random repartition interleaves each key's events across files, so
  * bursts are repeatedly extended, bridged, and re-anchored by
  * late-arriving timestamps — the full out-of-order contract, exercised
  * end-to-end through the zero-row retraction channel. */
class DebounceStreamSpec extends SparkSuite {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streamed bursts equal batch q_events_debounce after shuffled replay") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("deb_src").toString
    graft.sources.Tables.events(spark, dir)
      .repartition(5).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("deb_state").toString + "/bursts"
    val q = DebounceStream.burstMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("deb_ck").toString)
    q.processAllAvailable()
    q.stop()

    assert(canon(spark.read.parquet(stateDir)) ===
      canon(Events.debounce(spark, dir)))
  }

  test("restart from checkpoint: late files still converge to batch") {
    val dir = SparkSpec.sf0001
    val ev = graft.sources.Tables.events(spark, dir).cache()
    val src = java.nio.file.Files.createTempDirectory("deb2_src").toString
    ev.filter(col("event_id") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("deb2_state").toString + "/bursts"
    val ck = java.nio.file.Files.createTempDirectory("deb2_ck").toString
    val q1 = DebounceStream.burstMonitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()

    ev.filter(col("event_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    ev.unpersist()
    val q2 = DebounceStream.burstMonitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    assert(canon(spark.read.parquet(stateDir)) ===
      canon(Events.debounce(spark, dir)))
  }

  test("timesCap bounds state and equals debounce of each key's first-k events") {
    val dir = SparkSpec.sf0001
    val cap = 5
    val src = java.nio.file.Files.createTempDirectory("debc_src").toString
    graft.sources.Tables.events(spark, dir)
      .repartition(5).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("debc_state").toString + "/bursts"
    val q = DebounceStream.burstMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("debc_ck").toString,
      timesCap = Some(cap))
    q.processAllAvailable()
    q.stop()

    // batch equivalent: debounce over each key's first cap events
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val firstK = graft.sources.Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= cap).drop("rn")
    val expected = Events.debounceOf(firstK)
    val streamed = spark.read.parquet(stateDir)
    assert(canon(streamed) === canon(expected))
    // the cap must actually bite on this fixture, or the test proves nothing
    assert(canon(streamed) !== canon(Events.debounce(spark, dir)))
  }
}
