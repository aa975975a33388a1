package graft.schema

import org.apache.spark.sql.types._

/** The reference pipeline's declared schemas, reproduced verbatim so a user
  * of the reference can point this library at the same CSV inputs.
  *
  * Sources: reference validate.py:22-55 == transform.py:28-61 (the two jobs
  * declare identical StructTypes; the EDA notebook's variant — everything
  * nullable, order_id as string — is explicitly NOT authoritative, see
  * SURVEY.md §1.1). Nullability is load-bearing: required-field validation
  * derives from `field.nullable` (validate.py:108-129), which
  * [[graft.pipeline.EcommercePipeline]] mirrors.
  */
object Schemas {

  /** products table (validate.py:22-31). */
  val products: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("sku", StringType, nullable = false),
    StructField("cost", FloatType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("brand", StringType, nullable = true),
    StructField("retail_price", FloatType, nullable = false),
    StructField("department", StringType, nullable = false)))

  /** orders table (validate.py:33-42). */
  val orders: StructType = StructType(Seq(
    StructField("order_id", IntegerType, nullable = false),
    StructField("user_id", IntegerType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("returned_at", TimestampType, nullable = true),
    StructField("shipped_at", TimestampType, nullable = true),
    StructField("delivered_at", TimestampType, nullable = true),
    StructField("num_of_item", IntegerType, nullable = false)))

  /** order_items table (validate.py:44-55). */
  val orderItems: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("order_id", IntegerType, nullable = false),
    StructField("user_id", IntegerType, nullable = false),
    StructField("product_id", IntegerType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("shipped_at", TimestampType, nullable = true),
    StructField("delivered_at", TimestampType, nullable = true),
    StructField("returned_at", TimestampType, nullable = true),
    StructField("sale_price", FloatType, nullable = false)))

  /** Non-nullable field names, the validator's required-field list. */
  def requiredFields(s: StructType): Seq[String] =
    s.fields.filterNot(_.nullable).map(_.name).toSeq
}
