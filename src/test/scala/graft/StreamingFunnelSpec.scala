package graft

import graft.sources.Tables
import graft.streaming.{EventStreams, Stateful}
import org.apache.spark.sql.functions._

/** Streaming funnel ≡ batch funnel after replay, including the
  * out-of-order hazard (late earlier view re-selecting an earlier click). */
class StreamingFunnelSpec extends SparkSuite {
  import spark.implicits._

  private def runUpdate(df: org.apache.spark.sql.Dataset[_], name: String): Unit = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ck_$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** final state per user = last update emitted for that user */
  private def finalStates(table: String): Map[Long, (Option[Long], Option[Long], Option[Long], Int)] = {
    // memory sink in update mode appends each update; the LAST row per user
    // is the fixpoint. Micro-batches are sequential, so we tag arrival by
    // monotonically_increasing_id order within the sink table.
    val rows = spark.table(table)
      .withColumn("seq", monotonically_increasing_id()).collect()
    rows.groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
      val r = rs.maxBy(_.getAs[Long]("seq"))
      def opt(f: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[Long](f))
      u -> (opt("t_view"), opt("t_click"), opt("t_purchase"), r.getAs[Int]("stage_reached"))
    }
  }

  test("replayed streaming funnel equals the batch funnel at sf0.001") {
    val src = java.nio.file.Files.createTempDirectory("ev_funnel").toString
    Tables.events(spark, SparkSpec.sf0001).repartition(3)
      .write.mode("overwrite").parquet(src)

    val stream = EventStreams.eventsStream(spark, src)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[Stateful.FunnelEvent]
    runUpdate(Stateful.funnelState(spark, stream), "funnel_stream")

    val streamed = finalStates("funnel_stream")
      .collect { case (u, (Some(v), c, p, st)) => u -> ((v, c, p, st)) }
    // Events.funnel reads <dir>/events.parquet; build the same relation
    // directly over the replayed files (identical definition)
    val batchDf = {
      val e = spark.read.parquet(src)
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left_outer").join(p, Seq("user_id"), "left_outer")
    }
    val expected = batchDf.collect().map { r =>
      def opt(f: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(f))) None
        else {
          val t = r.getAs[java.sql.Timestamp](f)
          Some(t.getTime / 1000 * 1000000L + t.getNanos / 1000)
        }
      val (v, c, p) = (opt("t_view"), opt("t_click"), opt("t_purchase"))
      r.getAs[Long]("user_id") -> ((v.get, c, p, 1 + c.size + p.size))
    }.toMap
    assert(streamed === expected)
    assert(streamed.nonEmpty)
  }

  test("late earlier view re-selects an earlier click (out-of-order exactness)") {
    import graft.streaming.Stateful.{FunnelEvent, FunnelState}
    // simulate two micro-batches through the state transition directly
    val s0 = FunnelState(None, Nil, Nil)
    // batch 1: view@100, click@50 (click BEFORE the known view -> no stage 2)
    val s1 = FunnelState(Some(100L), List(50L), Nil)
    val tClick1 = s1.t_view.flatMap(v => s1.clicks.filter(_ > v).minOption)
    assert(tClick1 === None)
    // batch 2: late view@10 arrives -> click@50 now qualifies
    val s2 = s1.copy(t_view = Some(10L))
    val tClick2 = s2.t_view.flatMap(v => s2.clicks.filter(_ > v).minOption)
    assert(tClick2 === Some(50L))
    assert(s0.t_view.isEmpty) // silence unused warning
  }
}
