package graft

import graft.operators.{Concurrency, FeatureEng}
import org.apache.spark.sql.functions._

/** Hand fixtures for LOO target encoding, winsorized means, and the
  * concurrency sweep (touching intervals + cross-midnight carry). */
class FeatureEngSpec extends SparkSuite {
  import spark.implicits._

  test("target encode: LOO mean excludes self; singleton category is NULL") {
    val d = fixtureDir("orders" -> Seq(
      (1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 40.0), (4L, "B", 99.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice"))
    val out = FeatureEng.targetEncode(spark, d).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        Option(r.getAs[java.lang.Double]("loo_mean_price")).map(_.toDouble)).toMap
    assert(out(1L) === Some(30.0))
    assert(out(2L) === Some(25.0))
    assert(out(3L) === Some(15.0))
    assert(out(4L) === None) // n = 1 -> leakage-safe NULL, not 0/0
  }

  test("winsorize: 1..20 clips the top to 19, mean = 10.45") {
    def ev(id: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", v, "{}")
    val d = fixtureDir("events" -> (1 to 20).map(i => ev(i.toLong, i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = FeatureEng.winsorize(spark, d).collect()(0)
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Double]("p05") === 1.0) // ceil(0.05*20)=1 -> first value
    assert(r.getAs[Double]("p95") === 19.0) // ceil(0.95*20)=19 -> 19th value
    assert(r.getAs[Double]("mean_winsorized") === 10.45) // (190+19)/20/... cents exact
  }

  private def ev(id: Long, uid: Long, ts: String) =
    (id, java.sql.Timestamp.valueOf(ts), uid, "click", 1.0, "{}")

  test("concurrency: overlapping and touching sessions count together") {
    // u1 10:00-10:10, u2 10:05-10:15 overlap -> 2;
    // u3 10:15-10:20 TOUCHES u2's close instant -> still 2 (start before end)
    val d = fixtureDir("events" -> Seq(
      ev(1, 1, "2024-01-01 10:00:00"), ev(2, 1, "2024-01-01 10:10:00"),
      ev(3, 2, "2024-01-01 10:05:00"), ev(4, 2, "2024-01-01 10:15:00"),
      ev(5, 3, "2024-01-01 10:15:00"), ev(6, 3, "2024-01-01 10:20:00"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Concurrency.maxConcurrent(spark, d).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("max_concurrent") === 2L)
  }

  test("concurrency: a session open across midnight carries into the next day") {
    // u1's single session spans 23:40 -> 00:20 (gap 40min < ... both gaps
    // 20min so one session); day2 has ONLY the close boundary, so its max
    // comes from the carry term, not the within-day peak
    val d = fixtureDir("events" -> Seq(
      ev(1, 1, "2024-01-01 23:40:00"), ev(2, 1, "2024-01-02 00:00:00"),
      ev(3, 1, "2024-01-02 00:20:00"),
      ev(4, 2, "2024-01-01 23:50:00")) // second session inside day 1
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Concurrency.maxConcurrent(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("max_concurrent")).toMap
    assert(out("2024-01-01") === 2L) // u1 open + u2's instant session
    assert(out("2024-01-02") === 1L) // carry=1, peak_in_day=-1 -> greatest
  }

  test("woe/iv: hand model on a predictive fixture; one-sided category NULL") {
    // A: 9 good / 1 bad; B: 1 good / 9 bad; C: 2 good / 0 bad (one-sided)
    var id = 0L
    def rows(cat: String, good: Int, bad: Int) =
      (1 to good).map { _ => id += 1; (id, cat, "F") } ++
        (1 to bad).map { _ => id += 1; (id, cat, "O") }
    val orders = (rows("A", 9, 1) ++ rows("B", 1, 9) ++ rows("C", 2, 0))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
    val out = FeatureEng.woeIv(spark, fixtureDir("orders" -> orders)).collect()
      .map(r => r.getAs[String]("category") -> r).toMap
    val (gt, bt) = (12L, 10L)
    def woeMu(g: Long, b: Long): Long =
      math.floor(math.log((g * bt).toDouble / (b * gt)) * 1e6 + 0.5).toLong
    def ivMu(g: Long, b: Long): Long =
      math.floor((g * bt - b * gt).toDouble / (gt * bt) *
        (woeMu(g, b).toDouble / 1e6) * 1e6 + 0.5).toLong
    assert(out("A").getAs[Double]("woe") === woeMu(9, 1) / 1e6)
    assert(out("B").getAs[Double]("woe") === woeMu(1, 9) / 1e6)
    assert(out("C").isNullAt(out("C").fieldIndex("woe")))
    assert(out("C").isNullAt(out("C").fieldIndex("iv")))
    assert(out("A").getAs[Double]("iv") === ivMu(9, 1) / 1e6)
    // predictive direction: A leans good (woe > 0), B leans bad (< 0);
    // every non-null IV contribution is non-negative by construction
    assert(out("A").getAs[Double]("woe") > 0 && out("B").getAs[Double]("woe") < 0)
    val tot = out("__TOTAL__")
    assert(tot.getAs[Long]("n_good") === gt && tot.getAs[Long]("n_bad") === bt)
    assert(tot.getAs[Double]("iv") === (ivMu(9, 1) + ivMu(1, 9)) / 1e6)
    assert(tot.getAs[Double]("iv") > 1.0) // strongly predictive fixture
  }

  test("mutual info: predictive feature gives MI = H(Y) and NMI = 1; " +
    "constant feature gives MI = 0 and NULL NMI") {
    // priority perfectly predicts status (4 U->F, 4 L->O); every order in
    // the same month, so the month feature is a single-category constant.
    var id = 0L
    def rows(pri: String, st: String, k: Int) =
      (1 to k).map { _ =>
        id += 1; (id, pri, st, java.sql.Date.valueOf("2024-03-15"))
      }
    val orders = (rows("1-URGENT", "F", 4) ++ rows("5-LOW", "O", 4))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus", "o_orderdate")
    val out = FeatureEng.mutualInfo(spark, fixtureDir("orders" -> orders))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    val ln2q = math.floor(math.log(2.0) * 1e6 + 0.5) / 1e6 // 0.693147
    val pri = out("priority")
    assert(pri.getAs[Long]("n") === 8L)
    assert(pri.getAs[Double]("mi") === ln2q)
    assert(pri.getAs[Double]("hx") === ln2q)
    assert(pri.getAs[Double]("hy") === ln2q)
    assert(pri.getAs[Double]("nmi") === 1.0)
    val mon = out("month")
    assert(mon.getAs[Double]("mi") === 0.0)
    assert(mon.getAs[Double]("hx") === 0.0) // one category
    assert(mon.getAs[Double]("hy") === ln2q)
    assert(mon.isNullAt(mon.fieldIndex("nmi"))) // 0-entropy marginal
  }

  test("mutual info: TPC-H features are near-independent of the label") {
    val out = FeatureEng.mutualInfo(spark, SparkSpec.sf0001).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Double]("mi") < 0.01,
        s"${r.getAs[String]("feature")} unexpectedly informative")
      assert(r.getAs[Double]("hy") > 0.0)
    }
  }

  test("woe/iv: TPC-H priority vs status is near-independent (IV ~ 0)") {
    val out = FeatureEng.woeIv(spark, SparkSpec.sf0001).collect()
    val tot = out.find(_.getAs[String]("category") == "__TOTAL__").get
    assert(out.length === 6)
    assert(tot.getAs[Double]("iv") >= 0.0 && tot.getAs[Double]("iv") < 0.1,
      s"IV = ${tot.getAs[Double]("iv")}")
  }
}
