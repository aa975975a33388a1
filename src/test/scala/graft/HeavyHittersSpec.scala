package graft

import graft.functions.HeavyHitters
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Misra-Gries guarantees under eviction and distributed merge, plus the
  * two-pass exactness of the registered query. */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  // skewed stream: "hot" x300, "warm" x120, 600 singletons — k=9 forces
  // constant eviction (609 distinct >> 9 counters)
  private lazy val items: Seq[String] =
    Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++ (1 to 600).map(i => s"rare$i")
  private val k = 9
  private lazy val n = items.length

  private def summarize(partitions: Int): Map[String, Long] =
    spark.createDataset(scala.util.Random.shuffle(items))
      .repartition(partitions)
      .select(HeavyHitters.aggregator(k).toColumn.name("mg"))
      .head()

  test("coverage: items above n/(k+1) always survive, any partitioning") {
    val threshold = n.toDouble / (k + 1) // 1020/10 = 102
    for (parts <- Seq(1, 4, 13)) {
      val mg = summarize(parts)
      assert(mg.contains("hot"), s"hot lost at $parts partitions: $mg")
      assert(mg.contains("warm"), s"warm (${120} > $threshold) lost: $mg")
      assert(mg.size <= k)
    }
  }

  test("estimate bounds: est <= true <= est + n/(k+1) for tracked items") {
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mg = summarize(4)
    mg.foreach { case (item, est) =>
      val t = truth(item)
      assert(est <= t, s"$item overestimated: $est > $t")
      assert(t <= est + n / (k + 1), s"$item bound violated: $t > $est + ${n / (k + 1)}")
    }
  }

  test("reduce eviction: absorbing an unseen item decrements all counters") {
    val agg = HeavyHitters.aggregator(2)
    val full = Map("a" -> 3L, "b" -> 1L)
    val out = agg.reduce(full, "c") // b hits zero and drops; c absorbed
    assert(out === Map("a" -> 2L))
  }

  test("merge caps the summary at k entries with the (k+1)-th count subtracted") {
    val agg = HeavyHitters.aggregator(2)
    val merged = agg.merge(Map("a" -> 10L, "b" -> 4L), Map("b" -> 2L, "c" -> 3L))
    // summed: a=10 b=6 c=3; 3rd largest = 3 → a=7 b=3, c dropped
    assert(merged === Map("a" -> 7L, "b" -> 3L))
  }

  test("registered two-pass query equals the exact threshold computation") {
    val out = TextAnalysis.heavyHitters(spark, SparkSpec.sf0001)
      .select("word", "n").as[(String, Long)].collect().toMap
    // exact reference computed wholly in Spark (the oracle re-checks in DuckDB)
    val words = graft.sources.Tables.documents(spark, SparkSpec.sf0001)
      .select(explode(split(TextAnalysis.normText(col("text")), " ")).as("word"))
    val total = words.count()
    val exact = words.groupBy("word").count()
      .filter(col("count") > total / (HeavyHitters.K + 1.0))
      .as[(String, Long)].collect().toMap
    assert(out === exact)
  }
}
