package graft

import graft.operators.Kpis
import org.apache.spark.sql.functions._

/** HLL approximate KPIs: estimates must track the exact distinct counts
  * within a loose multiple of the configured 1% rsd. */
class ApproxKpiSpec extends SparkSuite {

  test("approx_count_distinct tracks exact counts within 5% everywhere") {
    val exact = Kpis.kpiOrder(spark, SparkSpec.sf0001)
      .select(col("order_date"), col("total_orders"), col("unique_customers"))
      .collect().map(r => r.getAs[java.sql.Date]("order_date").toString ->
        (r.getAs[Long]("total_orders"), r.getAs[Long]("unique_customers"))).toMap
    val approx = Kpis.kpiOrderApprox(spark, SparkSpec.sf0001).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (eo, ec) = exact(r.getAs[java.sql.Date]("order_date").toString)
      val ao = r.getAs[Long]("total_orders")
      val ac = r.getAs[Long]("unique_customers")
      assert(math.abs(ao - eo) <= math.max(1L, (eo * 0.05).toLong), s"orders $ao vs $eo")
      assert(math.abs(ac - ec) <= math.max(1L, (ec * 0.05).toLong), s"customers $ac vs $ec")
    }
  }

  test("sums in the approx variant stay exact") {
    val exact = Kpis.kpiOrder(spark, SparkSpec.sf0001)
      .select(col("order_date"), col("total_revenue")).collect()
      .map(r => r.get(0).toString -> r.getDouble(1)).toMap
    Kpis.kpiOrderApprox(spark, SparkSpec.sf0001)
      .select(col("order_date"), col("total_revenue")).collect()
      .foreach(r => assert(r.getDouble(1) === exact(r.get(0).toString)))
  }
}
