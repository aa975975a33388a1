package graft

import graft.operators.Analytics
import graft.streaming.BasketStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch for market-basket lift under shuffled arrival: the
  * random repartition scatters each order's items across micro-batches,
  * so most pairs form incrementally as late items join their basket. */
class BasketStreamSpec extends SparkSuite {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("streamed lift equals batch q_basket_affinity after shuffled replay") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("basket_src").toString
    graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .repartition(5).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("basket_state").toString + "/lift"
    val q = BasketStream.liftMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("basket_ck").toString)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(stateDir)
    val batch = Analytics.basketAffinity(spark, dir)
    assert(canon(streamed) === canon(batch))
  }

  test("restart from checkpoint: late files after a stop still converge to batch") {
    val dir = SparkSpec.sf0001
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).cache()
    val src = java.nio.file.Files.createTempDirectory("basket2_src").toString
    li.filter(col("l_partkey") % 2 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val stateDir = java.nio.file.Files.createTempDirectory("basket2_state").toString + "/lift"
    val ck = java.nio.file.Files.createTempDirectory("basket2_ck").toString
    val q1 = BasketStream.liftMonitor(spark, src, stateDir, ck)
    q1.processAllAvailable()
    q1.stop()

    li.filter(col("l_partkey") % 2 === 1)
      .repartition(2).write.mode("append").parquet(src)
    li.unpersist()
    val q2 = BasketStream.liftMonitor(spark, src, stateDir, ck)
    q2.processAllAvailable()
    q2.stop()

    assert(canon(spark.read.parquet(stateDir)) ===
      canon(Analytics.basketAffinity(spark, dir)))
  }

  test("basketCap bounds state and converges to batch q_basket_affinity_capped") {
    val dir = SparkSpec.sf0001
    val src = java.nio.file.Files.createTempDirectory("basketc_src").toString
    graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .repartition(5).write.mode("overwrite").parquet(src)

    val stateDir = java.nio.file.Files.createTempDirectory("basketc_state").toString + "/lift"
    // BasketCap = 8 bites on this fixture (baskets reach 13 items), so the
    // capped stream must DIFFER from uncapped lift and EQUAL batch capped
    val q = BasketStream.liftMonitor(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("basketc_ck").toString,
      basketCap = Some(Analytics.BasketCap))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(stateDir)
    assert(canon(streamed) === canon(Analytics.basketAffinityCapped(spark, dir)))
    assert(canon(streamed) !== canon(Analytics.basketAffinity(spark, dir)))
  }

  test("late item joins its basket: pairs grow monotonically, duplicates are idempotent") {
    import BasketStream.{BasketRow, Item}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Item]
    val out = BasketStream.orderPairs(spark, input.toDS())
    val q = out.writeStream.format("memory").queryName("basket_mem")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("basket_ck2").toString)
      .start()

    input.addData(Item(1L, 10L), Item(1L, 20L))
    q.processAllAvailable()
    input.addData(Item(1L, 30L), Item(1L, 10L)) // one new item, one duplicate
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("basket_mem").as[BasketRow].collect()
    // final emission contains all three pairs; replace-upsert keyed on
    // (okey, a, b) makes the re-emitted (10,20) idempotent
    val pairs = rows.filter(_.part_b != BasketStream.PairSentinel)
      .map(r => (r.part_a, r.part_b)).distinct.sorted
    assert(pairs.toSeq === Seq((10L, 20L), (10L, 30L), (20L, 30L)))
    val presence = rows.filter(_.part_b == BasketStream.PairSentinel)
      .map(_.part_a).distinct.sorted
    assert(presence.toSeq === Seq(10L, 20L, 30L))
  }
}
