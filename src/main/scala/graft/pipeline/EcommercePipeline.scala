package graft.pipeline

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference pipeline's end-to-end surface, re-expressed Spark-first: a
  * user of the reference can point this class at the same CSV layout
  * (`products.csv`, `orders/`, `order_items/`) and get the same validation
  * gate and the same two KPI tables.
  *
  * Reference mapping:
  *  - CSV loads with explicit schemas — validate.py:78-84, transform.py:79-81
  *    (S1 single-file scan, S2 folder-of-parts scan), inputs cached for reuse
  *    across validation rules + both KPI queries (S5, transform.py:84-86).
  *  - `validate()` — validate.py:100-175, fail-fast sequential rule order
  *    (emptiness → required fields → referential integrity → duplicates,
  *    SURVEY.md §2.9.6). Improvements over the reference kept
  *    semantics-neutral: `isEmpty` instead of full `count()==0`, and ONE
  *    single-pass aggregate for all null checks of a table instead of one
  *    Spark job per field (validate.py:108-129 ran ~20 scans).
  *  - `categoryKpis`/`orderKpis` — transform.py:94-121/123-147 verbatim,
  *    including the §2.9 quirks: item-level avg_return_rate, fan-out-row
  *    return_rate numerator and fan-out-summed total_items_sold over the
  *    joined relation, `round(_, 2)` outermost (Spark HALF_UP, matching the
  *    notebook's golden outputs cell 13/17).
  *
  * Scale notes (100 TB): products is a dimension → broadcast; the
  * fact-to-header join shuffles on order_id (SMJ at real scale, AQE may
  * broadcast at test scale); aggregations are declarative so Catalyst plans
  * partial+final HashAggregate with the countDistinct Expand rewrite.
  */
object EcommercePipeline {
  final case class ValidationError(table: String, rule: String, detail: String)
}

final class EcommercePipeline(spark: SparkSession, dataDir: String) {
  import EcommercePipeline.ValidationError

  private def readCsv(schema: org.apache.spark.sql.types.StructType, path: String): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S1: one file, explicit schema, no inference. */
  lazy val products: DataFrame = readCsv(Schemas.products, s"$dataDir/products.csv").cache()
  /** S2: folder of part files scanned as one table. */
  lazy val orders: DataFrame = readCsv(Schemas.orders, s"$dataDir/orders").cache()
  lazy val orderItems: DataFrame = readCsv(Schemas.orderItems, s"$dataDir/order_items").cache()

  // ------------------------------------------------------------ validation

  /** All rules for one table, in the reference's order; first failure wins. */
  private def tableRules(name: String, df: DataFrame,
      schema: org.apache.spark.sql.types.StructType): Option[ValidationError] = {
    if (df.isEmpty) // emptiness guard (validate.py:87-92) without a full scan
      return Some(ValidationError(name, "non_empty", "table has no rows"))
    // Single-pass null audit: one aggregate job for every required field.
    val required = Schemas.requiredFields(schema)
    val counts = df.agg(
      count(when(col(required.head).isNull, 1)).as(required.head),
      required.tail.map(f => count(when(col(f).isNull, 1)).as(f)): _*).head()
    required.find(f => counts.getAs[Long](f) > 0).map { f =>
      ValidationError(name, "required_field",
        s"$f has ${counts.getAs[Long](f)} null values")
    }
  }

  /** FK violation keys via left-anti join (validate.py:135-156). */
  private def fkViolations(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame =
    fact.join(dim, fact(factKey) === dim(dimKey), "left_anti")
      .select(col(factKey)).distinct()

  private def dupKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).count().filter("count > 1").select(col(key))

  /** Fail-fast sequential validation (validate.py:100-175): first failing
    * rule short-circuits, mirroring the reference's Step Functions gate. */
  def validate(): Either[ValidationError, Unit] = {
    val perTable = Seq(
      ("products", products, Schemas.products),
      ("orders", orders, Schemas.orders),
      ("order_items", orderItems, Schemas.orderItems))
    for ((n, df, s) <- perTable; e <- tableRules(n, df, s)) return Left(e)

    val badProducts = fkViolations(orderItems, "product_id", products.select("id"), "id")
    if (!badProducts.isEmpty)
      return Left(ValidationError("order_items", "fk_product",
        s"product_ids with no product row: ${badProducts.count()}"))
    val badOrders = fkViolations(orderItems, "order_id", orders.select("order_id"), "order_id")
    if (!badOrders.isEmpty)
      return Left(ValidationError("order_items", "fk_order",
        s"order_ids with no order row: ${badOrders.count()}"))

    if (!dupKeys(orders, "order_id").isEmpty)
      return Left(ValidationError("orders", "unique_key", "duplicate order_id values"))
    if (!dupKeys(orderItems, "id").isEmpty)
      return Left(ValidationError("order_items", "unique_key", "duplicate id values"))
    Right(())
  }

  // ------------------------------------------------------------ KPI queries

  /** Category-level KPIs (transform.py:94-121; golden rows notebook cell 13).
    * Output schema: (category, order_date, daily_revenue, avg_order_value,
    * avg_return_rate). */
  def categoryKpis: DataFrame = {
    val oi = orderItems.alias("oi")
    val o = orders.alias("o")
    val p = products.alias("p")
    oi.join(o, col("oi.order_id") === col("o.order_id"), "inner")
      .join(broadcast(p), col("oi.product_id") === col("p.id"), "inner")
      .withColumn("order_date", to_date(col("oi.created_at")))
      .groupBy(col("p.category"), col("order_date"))
      .agg(
        round(sum(col("oi.sale_price")), 2).as("daily_revenue"),
        round(avg(col("oi.sale_price")), 2).as("avg_order_value"),
        round(count(when(col("oi.status") === "returned", 1)) / count(lit(1)) * 100, 2)
          .as("avg_return_rate"))
      .orderBy(col("category"), col("order_date"))
  }

  /** Order-level KPIs (transform.py:123-147; golden rows notebook cell 17).
    * Quirks preserved: return_rate numerator and total_items_sold both count
    * post-join fan-out rows (SURVEY.md §2.9.1). Output schema: (order_date,
    * total_orders, total_revenue, total_items_sold, return_rate,
    * unique_customers). */
  def orderKpis: DataFrame = {
    val o = orders.alias("o")
    val oi = orderItems.alias("oi")
    o.join(oi, col("o.order_id") === col("oi.order_id"), "inner")
      .withColumn("order_date", to_date(col("o.created_at")))
      .groupBy(col("order_date"))
      .agg(
        countDistinct(col("o.order_id")).as("total_orders"),
        round(sum(col("oi.sale_price")), 2).as("total_revenue"),
        sum(col("o.num_of_item")).as("total_items_sold"),
        round(count(when(col("o.status") === "returned", 1)) /
          countDistinct(col("o.order_id")) * 100, 2).as("return_rate"),
        countDistinct(col("o.user_id")).as("unique_customers"))
      .orderBy(col("order_date"))
  }

  /** Full run with the reference's exit-code gate semantics
    * (validate.py:177-189 → transform.py:204-224): returns 1 and writes
    * nothing if validation fails, else writes both KPI tables keyed the way
    * the reference keys its DynamoDB tables and returns 0. */
  def run(outDir: String): Int = validate() match {
    case Left(_) => 1
    case Right(_) =>
      KeyedSink.write(categoryKpis, s"$outDir/category_kpis", Seq("category"))
      KeyedSink.write(orderKpis, s"$outDir/order_kpis", Seq.empty)
      0
  }
}
