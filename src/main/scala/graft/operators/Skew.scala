package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation join patterns, oracle-checked to be result-identical to
  * the plain join they replace.
  *
  * Salted join: when fact-side join keys are heavily skewed (one hot
  * order/user/partition key), a plain shuffle join lands the hot key's
  * entire volume on one reducer. Salting splits each key into `Salts`
  * sub-keys: the fact side gets a DETERMINISTIC salt derived from another
  * column, the build side replicates each row once per salt, and the join
  * key becomes (key, salt) — hot keys now spread across `Salts` reducers at
  * the cost of replicating the (smaller) build side ×Salts. AQE's runtime
  * skew-join splitting handles moderate skew automatically; explicit
  * salting is the plan-level fallback for pathological keys and is the
  * pattern that must hold at 100 TB.
  */
object Skew {

  val Salts = 8

  /** lineitem ⋈ orders with an (orderkey, salt) composite key — result is
    * exactly the plain q_join_inner_items_orders relation. */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(col("l_linenumber"), lit(Salts)))
      .alias("li")
    val o = Tables.orders(spark, dir)
      .withColumn("salt", explode(array((0 until Salts).map(lit): _*)))
      .alias("o")
    li.join(o,
        col("li.l_orderkey") === col("o.o_orderkey") && col("li.salt") === col("o.salt"),
        "inner")
      .select(
        col("li.l_orderkey"), col("li.l_linenumber"), col("li.l_extendedprice"),
        col("o.o_custkey"), col("o.o_orderstatus"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_join_salted_skew", joinSalted, Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_custkey, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin)),
  )
}
