package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** CDC changelog apply (operators/Cdc.scala): semantics + plan shape. */
class CdcSpec extends SparkSuite {

  private lazy val log = Cdc.changelog(spark, SparkSpec.sf0001)
  private lazy val snap = Cdc.applyLog(log).cache()

  test("deletes drop keys, updates win over inserts") {
    val spark0 = spark
    import spark0.implicits._
    val keys = snap.select(col("orderkey")).as[Long].collect().toSet
    // no surviving key is ≡0 (mod 7); every mod-3 (non-mod-7) key shows 'U'
    assert(keys.forall(_ % 7 != 0))
    val ops = snap.select(col("orderkey"), col("op")).as[(Long, String)].collect()
    ops.foreach { case (k, op) =>
      if (k % 3 == 0) assert(op === "U", s"key $k should be updated")
      else assert(op === "I", s"key $k should be the original insert")
    }
    // updated rows carry the +500-cent price bump
    val priced = Cdc.changelog(spark, SparkSpec.sf0001)
      .filter(col("seq") === 1).select(col("key"), col("cents"))
      .as[(Long, Long)].collect().toMap
    snap.as[(Long, String, Double)].collect().foreach { case (k, op, price) =>
      val base = priced(k)
      val want = if (op == "U") (base + 500L) / 100.0 else base / 100.0
      assert(price === want)
    }
  }

  test("apply is idempotent under log replay (duplicate delivery)") {
    val replayed = Cdc.applyLog(log.unionByName(log))
    assert(replayed.exceptAll(snap).isEmpty && snap.exceptAll(replayed).isEmpty)
  }

  test("latest-wins is a hash aggregate, not a window sort") {
    val plan = snap.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort in the CDC path:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"),
      s"expected hash aggregate:\n$plan")
  }
}
