package graft

import graft.operators.Guard

/** Driver-model collect guard (operators/Guard.scala): the limit(max+1)
  * ships at most max+1 rows and the require names the violated bound. */
class GuardSpec extends SparkSuite {

  test("within the bound returns every row") {
    val df = spark.range(10).toDF("id")
    assert(Guard.boundedCollect(df, 10, "ten rows").length === 10)
  }

  test("past the bound fails fast with the site name") {
    val df = spark.range(11).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Guard.boundedCollect(df, 10, "markov transition matrix")
    }
    assert(e.getMessage.contains("markov transition matrix"))
    assert(e.getMessage.contains("10"))
  }
}
