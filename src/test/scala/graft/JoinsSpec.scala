package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** Join-type completeness (operators/Joins.scala): semantics on controlled
  * fixtures plus the plan property the scale notes promise. */
class JoinsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = fixtureDir(
    "customer" -> Seq(
      (1L, "alice", "BUILDING"), (2L, "bob", "MACHINERY"), (3L, "carol", "BUILDING"))
      .toDF("c_custkey", "c_name", "c_mktsegment"),
    "orders" -> Seq(
      (10L, 1L, "O"), (11L, 1L, "F"), (12L, 2L, "F"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus"),
    "part" -> Seq((100L, "B1"), (200L, "B2"), (300L, "B3"))
      .toDF("p_partkey", "p_brand"),
    "lineitem" -> Seq(
      (10L, 100L, 5.0, "R", "2024-01-01"),
      (10L, 100L, 7.0, "A", "2024-01-01"),
      (11L, 200L, 11.0, "R", "2024-01-02"))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_returnflag", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp")))

  test("semi join keeps only customers with an open order, no duplication") {
    val out = Joins.customersWithOpenOrders(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L)) // only alice has status O
    assert(out.length === 1) // one order row, one output row — no fan-out
  }

  test("left outer keeps unsold parts at zero") {
    val out = Joins.partSalesIncludingUnsold(spark, dir)
      .orderBy("p_partkey").collect()
    assert(out.length === 3)
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((100L, 2L), (200L, 1L), (300L, 0L)))
    assert(out(2).getDouble(3) === 0.0)
  }

  test("left outer's fact side is pre-aggregated then broadcast") {
    val plan = Joins.partSalesIncludingUnsold(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
      s"expected broadcast left-outer over the aggregated side:\n$plan")
  }

  test("bloom prefilter: no false negatives, false positives exactly counted") {
    val rows = Joins.bloomPrefilterAudit(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pass = r.getAs[Long]("n_bloom_pass")
      val exact = r.getAs[Long]("n_exact_match")
      val fp = r.getAs[Long]("n_false_pos")
      // pass = (pass ∧ exact) + fp; a Bloom filter must NEVER drop a true
      // match, so (pass ∧ exact) must equal exact
      assert(pass - fp == exact, s"bloom dropped a true match: $r")
      assert(pass <= r.getAs[Long]("n_rows"))
    }
  }

  test("full outer keeps days present in only one series") {
    val out = Joins.dailyReturnVsAccept(spark, dir)
      .orderBy("day").collect()
    // 2024-01-01 has both flags; 2024-01-02 only R
    assert(out.length === 2)
    assert(out(0).getAs[Double]("returned_rev") === 5.0)
    assert(out(0).getAs[Double]("accepted_rev") === 7.0)
    assert(out(1).getAs[Double]("returned_rev") === 11.0)
    assert(out(1).isNullAt(out(1).fieldIndex("accepted_rev")))
  }
}
