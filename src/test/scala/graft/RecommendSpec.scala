package graft

import graft.operators.Recommend
import org.apache.spark.sql.functions._

/** Hand fixtures for item-item cosine CF and diff-in-differences. */
class RecommendSpec extends SparkSuite {
  import spark.implicits._

  test("item sim: cosine from co-occurrence, top-k ranked, symmetric") {
    // orders: {1,2}, {1,2}, {1,3}  =>  n1=3 n2=2 n3=1
    // cos(1,2)=2/sqrt(6)=.8165, cos(1,3)=1/sqrt(3)=.5774
    val li = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val d = fixtureDir("lineitem" -> li)
    val out = Recommend.itemSim(spark, d).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor"), r.getAs[Long]("co"), r.getAs[Double]("cosine")))
      .toMap
    assert(out((1L, 1))._1 === 2L) // item 1's best neighbor is 2
    assert(math.abs(out((1L, 1))._3 - 0.816497) < 1e-6)
    assert(out((1L, 2)) === ((3L, 1L, 0.57735)))
    assert(out((2L, 1))._1 === 1L) // symmetry: 2 sees 1 back
    assert(out((3L, 1))._1 === 1L)
    // no self-pairs anywhere
    assert(out.values.forall(_ != null))
  }

  test("did: constructed lift shows up only in the treatment's second period") {
    // find one control and one treatment user id under the md5 arm
    val probe = (1L to 50L).toDF("user_id")
      .select(col("user_id"), (conv(substring(md5(col("user_id").cast("string")), 1, 2),
        16, 10).cast("int") % 2).as("arm")).collect()
    val ctrl = probe.filter(_.getAs[Int]("arm") == 0).map(_.getLong(0)).head
    val trt = probe.filter(_.getAs[Int]("arm") == 1).map(_.getLong(0)).head
    def ev(id: Long, uid: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), uid, "purchase", v, "{}")
    // span 01-01..01-11, mid = 01-06: control flat 10/10; treatment 10 -> 25
    val d = fixtureDir("events" -> Seq(
      ev(1, ctrl, 1, 10.0), ev(2, ctrl, 11, 10.0),
      ev(3, trt, 1, 10.0), ev(4, trt, 11, 25.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Recommend.did(spark, d).collect()(0)
    assert(r.getAs[Double]("mean_c1") === 10.0)
    assert(r.getAs[Double]("mean_c2") === 10.0)
    assert(r.getAs[Double]("mean_t2") === 25.0)
    assert(r.getAs[Double]("did") === 15.0) // (25-10) - (10-10)
  }

  test("did: an arm missing a period yields NULL, not a crash") {
    def ev(id: Long, uid: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), uid, "purchase", v, "{}")
    val probe = (1L to 50L).toDF("user_id")
      .select(col("user_id"), (conv(substring(md5(col("user_id").cast("string")), 1, 2),
        16, 10).cast("int") % 2).as("arm")).collect()
    val ctrl = probe.filter(_.getAs[Int]("arm") == 0).map(_.getLong(0)).head
    // only control users, only period 1 -> every treatment cell empty
    val d = fixtureDir("events" -> Seq(ev(1, ctrl, 1, 10.0), ev(2, ctrl, 2, 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Recommend.did(spark, d).collect()(0)
    assert(r.isNullAt(r.fieldIndex("did")))
  }

  test("coverage: hand-computed exposure Gini; isolated item drops coverage") {
    // orders {1,2}, {1,2}, {1,3}, {4}: part 4 is cataloged but never
    // co-occurs -> exposure 0. Top-3 lists: 1->[2,3], 2->[1], 3->[1]
    // exposures: 1:2, 2:1, 3:1, 4:0 -> coverage 3/4
    // Gini over {0,1,1,2} (grouped identity): (0 + 0 + 6)/(4*4) = 0.375
    val li = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val r = Recommend.coverage(spark, fixtureDir("lineitem" -> li))
      .collect().head
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Long]("n_recommended") === 3L)
    assert(r.getAs[Double]("coverage") === 0.75)
    assert(r.getAs[Double]("exposure_gini") === 0.375)
  }
}
