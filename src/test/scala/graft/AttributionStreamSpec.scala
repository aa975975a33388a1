package graft

import graft.operators.Events
import graft.streaming.AttributionStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for last-touch attribution under SHUFFLED arrival:
  * the random repartition interleaves touches and purchases across files,
  * so purchases are routinely attributed, re-attributed by later-arriving
  * earlier touches, and pulled out of 'none' as micro-batches land. */
class AttributionStreamSpec extends SparkSuite {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streamed rollup equals batch q_events_attribution after shuffled replay") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("att_src").toString
    graft.sources.Tables.events(spark, dir)
      .repartition(5).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("att_state").toString + "/rollup"
    val q = AttributionStream.attributionMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("att_ck").toString)
    q.processAllAvailable()
    q.stop()

    assert(canon(spark.read.parquet(stateDir)) ===
      canon(Events.attribution(spark, dir)))
  }

  test("restart from checkpoint: late files after a stop still converge to batch") {
    val dir = SparkSpec.sf0001
    val ev = graft.sources.Tables.events(spark, dir).cache()
    val src = java.nio.file.Files.createTempDirectory("att2_src").toString
    ev.filter(col("event_id") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("att2_state").toString + "/rollup"
    val ck = java.nio.file.Files.createTempDirectory("att2_ck").toString
    val q1 = AttributionStream.attributionMonitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()

    ev.filter(col("event_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    ev.unpersist()
    val q2 = AttributionStream.attributionMonitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    assert(canon(spark.read.parquet(stateDir)) ===
      canon(Events.attribution(spark, dir)))
  }

  test("non-binding touchCap stays batch-exact") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("att3_src").toString
    graft.sources.Tables.events(spark, dir)
      .repartition(3).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("att3_state").toString + "/rollup"
    val q = AttributionStream.attributionMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("att3_ck").toString,
      touchCap = Some(1000000))
    q.processAllAvailable()
    q.stop()
    assert(canon(spark.read.parquet(stateDir)) ===
      canon(Events.attribution(spark, dir)))
  }

  test("late earlier touch re-attributes; purchase leaves 'none'; cap evicts") {
    import AttributionStream.{Ev, AttRow}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = AttributionStream.attributedPurchases(spark, input.toDS(),
      touchCap = Some(2))
    val q = out.writeStream.format("memory").queryName("att_mem")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("att_mem_ck").toString)
      .start()

    // batch 1: purchase with no touch -> 'none'
    input.addData(Ev(1L, 10L, 3L, "purchase", 500L))
    q.processAllAvailable()
    // batch 2: earlier view lands late -> purchase moves to 'view'
    input.addData(Ev(1L, 5L, 1L, "view", 0L))
    q.processAllAvailable()
    // batch 3: two later clicks evict the view from capped state (cap=2);
    // they are AFTER the purchase so the purchase falls back to 'none'
    input.addData(Ev(1L, 20L, 4L, "click", 0L), Ev(1L, 30L, 5L, "click", 0L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("att_mem").as[AttRow].collect()
    val emissions = rows.zipWithIndex.filter(_._1.purchase_id == 3L)
    val channels = emissions.sortBy(_._2).map(_._1.channel).toSeq
    assert(channels === Seq("none", "view", "none"))
  }
}
