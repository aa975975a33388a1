package graft

import graft.operators.{EmbedClassify, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan-shape evidence for the round-3 scale claims: the properties PLANS.md
  * asserts must hold in the actual physical plans, not just prose. */
class Round3PlansSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  private val dir = SparkSpec.sf0001

  private def executed(df: DataFrame) = {
    df.collect() // finalize any adaptive plan
    df.queryExecution.executedPlan
  }

  private def shuffles(df: DataFrame): Int =
    collect(executed(df)) { case s: ShuffleExchangeExec => s }.size

  test("chunking is a narrow plan: zero shuffles") {
    assert(shuffles(TextAnalysis.chunk(spark, dir)) === 0)
  }

  test("nearest-centroid classify is a narrow literal argmax: zero shuffles, no join") {
    val df = EmbedClassify.nearestCentroid(spark, dir)
    assert(shuffles(df) === 0)
    val str = df.queryExecution.executedPlan.toString
    assert(!str.contains("Join"), s"expected no join of any kind:\n$str")
  }

  test("temperature sampler joins rates via broadcast, corpus side stays narrow") {
    val str = executed(Sampling.sampleTemperature(spark, dir)).toString
    assert(str.contains("BroadcastExchange"))
    assert(!str.contains("SortMergeJoin"))
  }

  test("lm score: the vocabulary side broadcasts into the scoring join") {
    val str = executed(TextAnalysis.lmScore(spark, dir)).toString
    assert(str.contains("BroadcastExchange"))
  }
}
