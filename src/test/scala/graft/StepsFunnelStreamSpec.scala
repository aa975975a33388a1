package graft

import graft.streaming.{EventStreams, Stateful}
import org.apache.spark.sql.functions._

/** Streaming steps-funnel ≡ batch funnelStepsOf after replay, under
  * out-of-order arrival and a checkpoint restart. */
class StepsFunnelStreamSpec extends SparkSuite {
  import spark.implicits._

  private val steps = graft.operators.Events.FunnelSteps

  private def runUpdate(df: org.apache.spark.sql.Dataset[_], name: String,
      ck: String): Unit = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** last emitted stage per user from the update-mode memory sink */
  private def finalStages(table: String): Map[Long, Int] = {
    val rows = spark.table(table)
      .withColumn("seq", monotonically_increasing_id()).collect()
    rows.groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
      u -> rs.maxBy(_.getAs[Long]("seq")).getAs[Int]("stage_reached")
    }
  }

  private def batchStepCounts(src: String): Map[Int, Long] = {
    val out = graft.operators.Events
      .funnelStepsOf(spark.read.parquet(src), steps).collect()
    out.map(r => r.getAs[Int]("step_no") -> r.getAs[Long]("n_users")).toMap
  }

  private def streamedStepCounts(stages: Map[Long, Int]): Map[Int, Long] =
    (1 to steps.length).map { k =>
      k -> stages.values.count(_ >= k).toLong
    }.toMap

  test("shuffled replay reaches the batch per-step counts at sf0.001") {
    val src = java.nio.file.Files.createTempDirectory("ev_steps").toString
    // shuffle event order across files: out-of-order arrival by construction
    graft.sources.Tables.events(spark, SparkSpec.sf0001)
      .orderBy(md5(col("event_id").cast("string"))).repartition(4)
      .write.mode("overwrite").parquet(src)
    val stream = EventStreams.eventsStream(spark, src)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[Stateful.FunnelEvent]
    val ck = java.nio.file.Files.createTempDirectory("ck_steps").toString
    runUpdate(Stateful.funnelStepsState(spark, stream, steps), "steps_stream", ck)
    val streamed = streamedStepCounts(finalStages("steps_stream"))
    val batch = batchStepCounts(src)
    (1 to steps.length).foreach { k =>
      assert(streamed(k) === batch.getOrElse(k, 0L), s"step $k")
    }
  }

  test("checkpoint restart mid-stream converges to the same fixpoint") {
    val src = java.nio.file.Files.createTempDirectory("ev_steps2").toString
    val ev = graft.sources.Tables.events(spark, SparkSpec.sf0001)
      .orderBy(md5(col("event_id").cast("string")))
    val Array(first, second) = ev.randomSplit(Array(0.5, 0.5), seed = 7)
    val ck = java.nio.file.Files.createTempDirectory("ck_steps2").toString
    val store = java.nio.file.Files.createTempDirectory("st_steps2").toString + "/stages"
    first.repartition(2).write.mode("overwrite").parquet(src)
    def run(): Unit = {
      val stream = EventStreams.eventsStream(spark, src)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
        .as[Stateful.FunnelEvent]
      val q = graft.streaming.UpsertSink.keyedParquetUpsert(
        Stateful.funnelStepsState(spark, stream, steps).toDF(),
        Seq("user_id"), store, ck)
      q.processAllAvailable()
      q.stop()
    }
    run()
    // restart from the SAME checkpoint and store after more files land
    second.repartition(2).write.mode("append").parquet(src)
    run()
    val stages = spark.read.parquet(store).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage_reached")).toMap
    val streamed = streamedStepCounts(stages)
    val batch = batchStepCounts(src)
    (1 to steps.length).foreach { k =>
      assert(streamed(k) === batch.getOrElse(k, 0L), s"step $k after restart")
    }
  }
}
