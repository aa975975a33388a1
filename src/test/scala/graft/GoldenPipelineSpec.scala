package graft

import graft.pipeline.EcommercePipeline
import org.apache.spark.sql.Row

/** Reference-parity gate: runs the full pipeline against the reference's
  * own shipped data (`/root/reference/Data`, read in place) and asserts the
  * notebook's published golden outputs verbatim (cells 13 and 17 — the only
  * expected values the reference publishes; SURVEY.md §5.2). */
class GoldenPipelineSpec extends SparkSuite {

  lazy val pipe = new EcommercePipeline(spark, SparkSpec.referenceData)

  test("reference data loads with the declared schemas and row counts") {
    assert(pipe.products.count() === 10000L)
    assert(pipe.orders.count() === 9000L)
    assert(pipe.orderItems.count() === 27007L)
  }

  test("validation passes on the reference's shipped data") {
    assert(pipe.validate() === Right(()))
  }

  test("category KPIs reproduce the notebook golden rows (cell 13)") {
    val kpis = pipe.categoryKpis
    assert(kpis.count() === 217L) // 7 categories x 31 days, dense
    val beauty = kpis.filter("category = 'Beauty' AND order_date = DATE'2025-03-08'").head()
    assert(beauty.getAs[Double]("daily_revenue") === 10540.85)
    assert(beauty.getAs[Double]("avg_order_value") === 82.35)
    assert(beauty.getAs[Double]("avg_return_rate") === 16.41)
  }

  test("order KPIs reproduce the notebook golden rows (cell 17)") {
    val kpis = pipe.orderKpis
    assert(kpis.count() === 31L) // 2025-03-08 .. 2025-04-07
    val d = kpis.filter("order_date = DATE'2025-03-08'").head()
    assert(d.getAs[Long]("total_orders") === 286L)
    assert(d.getAs[Double]("total_revenue") === 69188.47)
    assert(d.getAs[Long]("total_items_sold") === 3262L)
    // fan-out-row return_rate — the §2.9.1 quirk: >23.78 (order-based) by design
    assert(d.getAs[Double]("return_rate") === 75.17)
    assert(d.getAs[Long]("unique_customers") === 281L)
  }

  test("run() gates on validation and writes both keyed KPI tables") {
    val out = java.nio.file.Files.createTempDirectory("graft_run").toString
    assert(pipe.run(out) === 0)
    val cat = spark.read.parquet(s"$out/category_kpis")
    assert(cat.count() === 217L)
    // partitionBy(category) layout: category is a partition column
    assert(cat.columns.contains("category"))
    assert(spark.read.parquet(s"$out/order_kpis").count() === 31L)
  }
}
