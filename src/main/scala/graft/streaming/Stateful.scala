package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state streaming operator via
  * `KeyValueGroupedDataset.mapGroupsWithState` — the API the engine exposes
  * for stateful logic that windows/session_window can't express (running
  * per-key accumulators, custom eviction). The reference has no stateful
  * streaming at all (SURVEY.md §2.8), so this is a north-star extension.
  *
  * Scale notes: state lives in the state store partitioned by user_id
  * (shuffle on the grouping key once, then incremental per-batch updates);
  * state size is O(distinct users), not O(events). A production deployment
  * bounds it with a timeout (`GroupStateTimeout`) — kept NoTimeout here so
  * replay tests are exactly comparable to batch.
  */
object Stateful {

  final case class Event(user_id: Long, value: Double)
  final case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user event count + value sum, updated per micro-batch. */
  def runningUserStats(spark: SparkSession, events: Dataset[Event]): Dataset[UserStat] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.n_events
          var t = prev.total_value
          batch.foreach { e => n += 1; t += e.value }
          val next = UserStat(uid, n, t)
          state.update(next)
          next
      }
  }

  /** Convenience: run the stateful stream from a file-source events dir to
    * a memory sink (update mode), returning the sink table name. */
  def runToMemory(spark: SparkSession, srcDir: String, sinkName: String): Unit = {
    import spark.implicits._
    val events = EventStreams.eventsStream(spark, srcDir)
      .selectExpr("user_id", "value").as[Event]
    val q = runningUserStats(spark, events)
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(sinkName)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ck_$sinkName").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
