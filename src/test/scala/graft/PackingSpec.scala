package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Packing invariants: full coverage, budget respected (except
  * single-doc overflow bins), dense bin ids per shard, and a result
  * that is a pure function of the data (stable across repartitioning). */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val packed = Packing.packGreedy(spark, SparkSpec.sf0001)
    .as[(Long, Long, Long, Long)].collect()

  test("every document lands in exactly one bin") {
    val n = graft.sources.Tables.documents(spark, SparkSpec.sf0001).count()
    assert(packed.length.toLong == n)
    assert(packed.map(_._1).distinct.length.toLong == n)
  }

  test("bins respect the token budget unless a single doc overflows it") {
    packed.groupBy(r => (r._2, r._3)).foreach { case ((shard, bin), docs) =>
      val total = docs.map(_._4).sum
      assert(total <= Packing.TokenBudget || docs.length == 1,
        s"shard=$shard bin=$bin total=$total docs=${docs.length}")
    }
  }

  test("bin ids are dense from 0 within each shard") {
    packed.groupBy(_._2).foreach { case (_, docs) =>
      val bins = docs.map(_._3).distinct.sorted
      assert(bins.toSeq == (0L until bins.length).toSeq)
    }
  }

  test("packing is deterministic across reruns") {
    val again = Packing.packGreedy(spark, SparkSpec.sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }
}
