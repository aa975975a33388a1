package graft

import graft.pipeline.EcommercePipeline

/** The §2.9 semantic quirks on a hand-computable fixture: the KPIs must
  * reproduce the reference's ACTUAL semantics (fan-out-row counting), not
  * the "correct" ones. */
class KpiQuirksSpec extends SparkSuite {

  // One order (returned) with 3 items, one order (delivered) with 1 item,
  // all on the same day, all for product 1 (category Beauty, price 10).
  private val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_quirk").toString
    def put(rel: String, content: String): Unit = {
      val f = new java.io.File(s"$d/$rel")
      f.getParentFile.mkdirs()
      java.nio.file.Files.writeString(f.toPath, content)
    }
    put("products.csv",
      "id,sku,cost,category,name,brand,retail_price,department\n1,s,1.0,Beauty,n,b,10.0,dep")
    put("orders/p.csv",
      "order_id,user_id,status,created_at,returned_at,shipped_at,delivered_at,num_of_item\n" +
        "1,100,returned,2025-03-08T10:00:00,,,,2\n2,200,delivered,2025-03-08T11:00:00,,,,1")
    put("order_items/p.csv",
      "id,order_id,user_id,product_id,status,created_at,shipped_at,delivered_at,returned_at,sale_price\n" +
        "1,1,100,1,returned,2025-03-08T10:00:00,,,,10.0\n" +
        "2,1,100,1,returned,2025-03-08T10:00:00,,,,10.0\n" +
        "3,1,100,1,delivered,2025-03-08T10:00:00,,,,10.0\n" +
        "4,2,200,1,delivered,2025-03-08T11:00:00,,,,10.0")
    d
  }

  lazy val pipe = new EcommercePipeline(spark, dir)

  test("return_rate counts fan-out rows / distinct orders — exceeds 100%") {
    val row = pipe.orderKpis.head()
    // numerator: 3 joined rows carry o.status='returned' (order 1 x 3 items);
    // denominator: 2 distinct orders -> 3/2*100 = 150.0
    assert(row.getAs[Double]("return_rate") === 150.0)
    assert(row.getAs[Long]("total_orders") === 2L)
    assert(row.getAs[Long]("unique_customers") === 2L)
  }

  test("fan-out return_rate >= order-based on EVERY sf0.1 group (property, not fixture)") {
    // the §2.9.1 quirk as a data-scale property: on the harness join at
    // sf0.1, the reference's row-counting numerator dominates the
    // order-counting one in every order_date group (each returned order
    // contributes >= 1 joined row), and strictly exceeds it somewhere
    // (some returned order has > 1 lineitem — the fan-out actually bites)
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    val joined = Tables.orders(spark, dir).alias("o")
      .join(Tables.lineitem(spark, dir).alias("li"),
        col("o.o_orderkey") === col("li.l_orderkey"), "inner")
      .withColumn("order_date", to_date(col("o.o_orderdate")))
    val rates = joined.groupBy(col("order_date")).agg(
      (count(when(col("o.o_orderstatus") === "F", 1)) /
        countDistinct(col("o.o_orderkey")) * 100).as("row_rate"),
      (countDistinct(when(col("o.o_orderstatus") === "F", col("o.o_orderkey"))) /
        countDistinct(col("o.o_orderkey")) * 100).as("order_rate"))
      .collect()
    assert(rates.nonEmpty)
    rates.foreach(r =>
      assert(r.getDouble(1) >= r.getDouble(2) - 1e-9,
        s"${r.get(0)}: row ${r.getDouble(1)} < order ${r.getDouble(2)}"))
    assert(rates.exists(r => r.getDouble(1) > r.getDouble(2) + 1e-9),
      "fan-out never exceeded the order-based rate — quirk not exercised")
  }

  test("total_items_sold sums num_of_item over fan-out rows, not per order") {
    val row = pipe.orderKpis.head()
    // order 1 (num_of_item=2) fans out x3, order 2 (1) x1 -> 2*3 + 1 = 7,
    // NOT the per-order 2+1=3
    assert(row.getAs[Long]("total_items_sold") === 7L)
  }

  test("avg_order_value is the average ITEM price, not per-order total") {
    val row = pipe.categoryKpis.head()
    assert(row.getAs[Double]("avg_order_value") === 10.0) // item-level avg
    assert(row.getAs[Double]("daily_revenue") === 40.0)
  }

  test("avg_return_rate is the ITEM-status fraction (2 of 4 items returned)") {
    val row = pipe.categoryKpis.head()
    assert(row.getAs[Double]("avg_return_rate") === 50.0)
  }
}
