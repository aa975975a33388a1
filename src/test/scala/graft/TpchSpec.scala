package graft

import graft.operators.Tpch
import org.apache.spark.sql.functions._

/** Classic decision-support shapes (operators/Tpch.scala): result sanity at
  * sf0.001 plus the plan properties each query exists to demonstrate. */
class TpchSpec extends SparkSuite {

  test("pricing summary groups by (returnflag, linestatus) with exact counts") {
    val out = Tpch.pricingSummary(spark, SparkSpec.sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 6) // |returnflag| x |linestatus|
    // count_order must add back to the filtered row count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = sources.Tables.lineitem(spark, SparkSpec.sf0001)
      .filter(to_date(col("l_shipdate")) <= lit("2000-12-01")).count()
    assert(total === expected)
    // avg consistency: sum_qty / count_order == avg_qty (2dp)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_qty")
      val recomputed = math.floor(
        r.getAs[Long]("sum_qty").toDouble / r.getAs[Long]("count_order") * 100 + 0.5) / 100
      assert(avg === recomputed)
    }
  }

  test("pricing summary pushes the date filter into the parquet scan") {
    val plan = Tpch.pricingSummary(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // filter exists above the scan; scan reads only the 6 referenced columns
    assert(plan.contains("l_returnflag"))
    val readSchema = "ReadSchema: .*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
  }

  test("shipping priority returns at most 10 rows, descending revenue") {
    val rows = Tpch.shippingPriority(spark, SparkSpec.sf0001).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("shipping priority takes top-k without a full global sort") {
    val plan = Tpch.shippingPriority(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("local supplier volume: every nation is in ASIA and revenue positive") {
    val spark0 = spark
    import spark0.implicits._
    val out = Tpch.localSupplierVolume(spark, SparkSpec.sf0001)
    val asiaNations = sources.Tables.nation(spark, SparkSpec.sf0001).alias("n")
      .join(sources.Tables.region(spark, SparkSpec.sf0001).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name")).as[String].collect().toSet
    out.collect().foreach { r =>
      assert(asiaNations.contains(r.getAs[String]("nation")))
      assert(r.getAs[Double]("revenue") > 0)
    }
  }

  test("priority check plans a LEFT SEMI join (orders never fan out)") {
    val df = Tpch.priorityCheck(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
    // every priority count is bounded by the order count in the window
    val total = df.collect().map(_.getAs[Long]("order_count")).sum
    val windowOrders = sources.Tables.orders(spark, SparkSpec.sf0001)
      .filter(to_date(col("o_orderdate")) >= lit("1997-01-01") &&
        to_date(col("o_orderdate")) < lit("1998-01-01")).count()
    assert(total > 0 && total <= windowOrders)
  }

  test("custdist keeps customers with zero qualifying orders (outer join)") {
    val spark0 = spark
    import spark0.implicits._
    val out = Tpch.custDistribution(spark, SparkSpec.sf0001).collect()
    // distribution must account for EVERY customer exactly once
    val customers = sources.Tables.customer(spark, SparkSpec.sf0001).count()
    assert(out.map(_.getAs[Long]("custdist")).sum === customers)
    // the ON-clause predicate excludes URGENT orders: a customer with only
    // urgent orders lands in the c_count=0 bucket rather than vanishing
    val zeroBucket = out.find(_.getAs[Long]("c_count") === 0L)
    val onlyUrgent = sources.Tables.orders(spark, SparkSpec.sf0001)
      .groupBy(col("o_custkey"))
      .agg(max(when(col("o_orderpriority") =!= "1-URGENT", 1).otherwise(0)).as("any"))
      .filter(col("any") === 0).count()
    val noOrders = customers - sources.Tables.orders(spark, SparkSpec.sf0001)
      .select(col("o_custkey")).distinct().count()
    assert(zeroBucket.map(_.getAs[Long]("custdist")).getOrElse(0L) === onlyUrgent + noOrders)
  }

  test("brand revenue keeps the equi hash join despite the OR predicate") {
    val plan = Tpch.brandRevenue(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected hash join, not BNLJ:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"OR predicate broke the equi-join:\n$plan")
  }

  test("returned items: top-20 via TakeOrderedAndProject, only R-flag revenue") {
    val df = Tpch.returnedItems(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("top supplier: winner holds the max per-supplier revenue") {
    val spark0 = spark
    import spark0.implicits._
    val out = Tpch.topSupplier(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    val winner = out.head.getAs[Double]("total_rev")
    // recompute every supplier's rounded revenue; none may beat the winner
    val all = sources.Tables.lineitem(spark, SparkSpec.sf0001)
      .filter(to_date(col("l_shipdate")) >= lit("1997-01-01") &&
        to_date(col("l_shipdate")) < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"))
      .as[(Long, Double)].collect()
    val maxRev = all.map(t => math.floor(t._2 * 100 + 0.5) / 100).max
    assert(winner === maxRev)
  }

  test("no-urgent high-balance: every kept customer beats the mean and is urgent-free") {
    val spark0 = spark
    import spark0.implicits._
    val out = Tpch.noUrgentHighBalance(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    // cross-check totals against a driver-side fold
    val c = sources.Tables.customer(spark, SparkSpec.sf0001)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .as[(Long, Int, Double)].collect()
    val cents = c.map { case (k, n, b) => (k, n, math.floor(b * 100 + 0.5).toLong) }
    val pos = cents.filter(_._3 > 0)
    val (sumCents, nPos) = (pos.map(_._3).sum, pos.length.toLong)
    val urgent = sources.Tables.orders(spark, SparkSpec.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).as[Long].collect().toSet
    val kept = cents.filter { case (k, _, ct) => ct * nPos > sumCents && !urgent.contains(k) }
    assert(out.map(_.getAs[Long]("numcust")).sum === kept.length)
  }

  test("nation volume covers both directions of the pair, never same-nation") {
    val rows = Tpch.nationVolume(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sn, cn) = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))
      assert(Set(sn, cn) === Set("NATION_3", "NATION_7"))
      assert(sn !== cn)
      assert(r.getAs[Double]("revenue") > 0)
    }
  }

  test("market share is a valid fraction of the total") {
    val rows = Tpch.marketShare(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nv = r.getAs[Double]("nation_volume")
      val tv = r.getAs[Double]("total_volume")
      val sh = r.getAs[Double]("mkt_share")
      assert(nv >= 0 && nv <= tv)
      assert(sh >= 0.0 && sh <= 1.0)
      assert(math.abs(sh - math.floor(nv / tv * 1e6 + 0.5) / 1e6) < 1e-12)
    }
  }

  test("forecast revenue matches a hand-computed fold at sf0.001") {
    val li = sources.Tables.lineitem(spark, SparkSpec.sf0001)
      .filter(to_date(col("l_shipdate")) >= lit("1997-01-01") &&
        to_date(col("l_shipdate")) < lit("1998-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .select(col("l_extendedprice"), col("l_discount")).collect()
    val manual = li.map(r => r.getDouble(0) * r.getDouble(1)).sum
    val expected = math.floor(manual * 100 + 0.5) / 100
    val row = graft.operators.Tpch.forecastRevenue(spark, SparkSpec.sf0001).head()
    assert(row.getAs[Long]("n_rows") === li.length)
    assert(math.abs(row.getAs[Double]("revenue") - expected) <= 0.01)
  }
}
