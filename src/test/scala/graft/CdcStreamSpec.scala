package graft

import graft.operators.Cdc
import graft.streaming.CdcStream
import org.apache.spark.sql.functions._

/** Streaming CDC (streaming/CdcStream.scala): after replaying the
  * changelog in shuffled file batches, the keyed store must equal the
  * batch applyLog snapshot (plus tombstone rows flagged dead). */
class CdcStreamSpec extends SparkSuite {

  test("streamed changelog converges to the batch snapshot under shuffled arrival") {
    val src = java.nio.file.Files.createTempDirectory("cdc_src").toString
    // repartition(5) scatters (key, seq) rows across files arbitrarily —
    // deletes may arrive before the inserts they tombstone
    Cdc.changelog(spark, SparkSpec.sf0001).repartition(5)
      .write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("cdc_state").toString + "/snap"
    val ck = java.nio.file.Files.createTempDirectory("cdc_ck").toString
    val q = CdcStream.run(spark, src, stateDir, ck)
    q.processAllAvailable()
    q.stop()

    val store = spark.read.parquet(stateDir)
    val live = store.filter(col("live"))
      .select(col("key").as("orderkey"), col("op"), col("price"))
    val want = Cdc.applyLog(spark.read.parquet(src))
    assert(live.exceptAll(want).isEmpty && want.exceptAll(live).isEmpty)

    // tombstoned keys: present, dead, and exactly the mod-7 keys
    val spark0 = spark
    import spark0.implicits._
    val dead = store.filter(!col("live")).select(col("key")).as[Long].collect()
    assert(dead.nonEmpty && dead.forall(_ % 7 == 0))
    val mod7 = Cdc.changelog(spark, SparkSpec.sf0001)
      .filter(col("key") % 7 === 0).select(col("key")).distinct().count()
    assert(dead.length.toLong === mod7)
  }

  test("restart from checkpoint resumes state (late files after a stop)") {
    val src = java.nio.file.Files.createTempDirectory("cdc2_src").toString
    val log = Cdc.changelog(spark, SparkSpec.sf0001).cache()
    // phase 1: only inserts arrive, then the query STOPS
    log.filter(col("seq") === 1).repartition(2)
      .write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("cdc2_state").toString + "/snap"
    val ck = java.nio.file.Files.createTempDirectory("cdc2_ck").toString
    val q1 = CdcStream.run(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()
    // mid-flight check: store holds pure inserts, nothing dead
    val mid = spark.read.parquet(stateDir)
    assert(mid.filter(!col("live")).isEmpty)

    // phase 2: updates + deletes land while no query is running; a NEW
    // query on the SAME checkpoint must pick up exactly the new files
    log.filter(col("seq") > 1).repartition(2)
      .write.mode("append").parquet(src)
    val q2 = CdcStream.run(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()
    log.unpersist()

    val live = spark.read.parquet(stateDir).filter(col("live"))
      .select(col("key").as("orderkey"), col("op"), col("price"))
    val want = Cdc.cdcApply(spark, SparkSpec.sf0001)
    assert(live.exceptAll(want).isEmpty && want.exceptAll(live).isEmpty)
  }
}
