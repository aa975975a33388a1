package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

/** SCD Type-2 merge semantics on a controlled dimension. */
class ScdSpec extends SparkSuite {
  import spark.implicits._

  private def date(s: String) = java.sql.Date.valueOf(s)

  // key 1: history + current (price 10 since 2001); key 2: current only;
  // key 3: current only
  private lazy val dim = Seq(
    (1L, "b1", 5.0, date("2000-01-01"), Option(date("2001-01-01")), false),
    (1L, "b1", 10.0, date("2001-01-01"), None: Option[java.sql.Date], true),
    (2L, "b2", 20.0, date("2001-01-01"), None: Option[java.sql.Date], true),
    (3L, "b3", 30.0, date("2001-01-01"), None: Option[java.sql.Date], true))
    .toDF("key", "brand", "price", "valid_from", "valid_to", "is_current")

  // key 1 changes price; key 2 is a NO-OP (same attrs); key 9 is new
  private lazy val updates = Seq(
    (1L, "b1", 11.0), (2L, "b2", 20.0), (9L, "b9", 90.0))
    .toDF("key", "brand", "price")

  private lazy val out =
    Scd.applyScd2(dim, updates, "key", Seq("brand", "price"), lit("2002-06-01"))
      .orderBy("key", "valid_from").collect()

  test("changed key gets closed old version plus new current version") {
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.length === 3) // history + closed + new current
    val closed = k1(1)
    assert(closed.getAs[java.sql.Date]("valid_to").toString === "2002-06-01")
    assert(!closed.getAs[Boolean]("is_current"))
    assert(closed.getAs[Double]("price") === 10.0)
    val current = k1(2)
    assert(current.getAs[Boolean]("is_current"))
    assert(current.getAs[Double]("price") === 11.0)
    assert(current.getAs[java.sql.Date]("valid_from").toString === "2002-06-01")
    assert(current.isNullAt(current.fieldIndex("valid_to")))
  }

  test("no-op update leaves the row untouched; unmentioned key passes through") {
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && k2(0).getAs[Boolean]("is_current"))
    assert(k2(0).getAs[java.sql.Date]("valid_from").toString === "2001-01-01")
    val k3 = out.filter(_.getLong(0) == 3L)
    assert(k3.length === 1 && k3(0).getAs[Boolean]("is_current"))
  }

  test("new key is inserted as a first version") {
    val k9 = out.filter(_.getLong(0) == 9L)
    assert(k9.length === 1)
    assert(k9(0).getAs[Boolean]("is_current"))
    assert(k9(0).getAs[java.sql.Date]("valid_from").toString === "2002-06-01")
  }

  test("row count: dim + changed + new (no-op adds nothing)") {
    assert(out.length === dim.count() + 1 + 1)
  }

  test("idempotence: re-applying the same updates is a no-op") {
    val once = Scd.applyScd2(dim, updates, "key", Seq("brand", "price"), lit("2002-06-01"))
    val twice = Scd.applyScd2(once, updates, "key", Seq("brand", "price"), lit("2002-07-01"))
    // every update now matches its current version exactly -> nothing closes,
    // nothing inserts; row sets are identical
    assert(twice.count() === once.count())
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("registered part instantiation: every current key is unique") {
    val cur = Scd.scd2Part(spark, SparkSpec.sf0001).filter(col("is_current"))
    assert(cur.groupBy("key").count().filter(col("count") > 1).isEmpty)
  }

  test("temporal join: exactly one version matches per fact (no drop, no fan-out)") {
    val out = Scd.temporalJoin(spark, SparkSpec.sf0001)
    val joined = out.agg(sum(col("n_rows"))).head().getLong(0)
    val facts = sources.Tables.lineitem(spark, SparkSpec.sf0001).count()
    assert(joined === facts)
  }

  test("temporal join prices pre-2000 facts at v1 and post-2000 at v2") {
    // a mod-10 part: v1 price until 2000-01-01, then +10%; check one key's
    // contribution by recomputing with an explicit CASE
    val li = sources.Tables.lineitem(spark, SparkSpec.sf0001)
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_partkey"), to_date(col("l_shipdate")).as("d"),
        col("l_quantity").cast("long").as("qty"))
    val p = sources.Tables.part(spark, SparkSpec.sf0001)
      .filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey"), col("p_brand"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long").as("v1c"),
        // mirror roundN(roundN(p*1.1, 2)*100, 0)'s exact IEEE op order
        floor((floor(col("p_retailprice") * 1.1 * 100 + 0.5) / 100) * 100 + 0.5)
          .cast("long").as("v2c"))
    val manual = li.join(p, col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        (col("qty") * when(col("d") < lit("2000-01-01"), col("v1c"))
          .otherwise(col("v2c"))).as("amt"))
      .groupBy(col("brand"))
      .agg((sum(col("amt")).cast("double") / 100.0).as("amount_mod10"))
    // the full temporal join minus the non-mod-10 (single-version) parts
    val all = Scd.temporalJoin(spark, SparkSpec.sf0001)
      .select(col("brand"), col("amount"))
    val rest = sources.Tables.lineitem(spark, SparkSpec.sf0001)
      .filter(col("l_partkey") % 10 =!= 0)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"))
      .join(sources.Tables.part(spark, SparkSpec.sf0001),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg((sum(col("qty") * floor(col("p_retailprice") * 100 + 0.5).cast("long"))
        .cast("double") / 100.0).as("amount_rest"))
    val spark0 = spark
    import spark0.implicits._
    val gotMap = all.as[(String, Double)].collect().toMap
    val m1 = manual.as[(String, Double)].collect().toMap
    val m2 = rest.as[(String, Double)].collect().toMap
    gotMap.foreach { case (brand, amount) =>
      val want = m1.getOrElse(brand, 0.0) + m2.getOrElse(brand, 0.0)
      assert(math.abs(amount - want) < 1e-6, s"brand $brand: $amount vs $want")
    }
  }
}
