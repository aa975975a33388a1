package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (operators/Pq.scala): determinism, structure,
  * and recall@5 against the oracle-checked brute-force ground truth. */
class PqSpec extends SparkSuite {

  test("PQ kNN is deterministic and returns TopK rows per query") {
    val a = Pq.knnPq(spark, SparkSpec.sf0001).collect()
    val b = Pq.knnPq(spark, SparkSpec.sf0001).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)
    val perQuery = a.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (_, rows) =>
      assert(rows.length === Similarity.TopK)
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to Similarity.TopK))
    }
    // no self-matches
    a.foreach(r => assert(r.getAs[Long]("query_id") !== r.getAs[Long]("neighbor_id")))
  }

  test("recall@5 vs brute force clears the ADC floor") {
    val spark0 = spark
    import spark0.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.knnBrute(spark, SparkSpec.sf0001))
    val got = pairs(Pq.knnPq(spark, SparkSpec.sf0001))
    val recall = (got & truth).size.toDouble / truth.size
    // 4 bits/subspace on 64-dim synthetic embeddings: expect strong recall
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  test("candidate cut runs through the native top-k operator") {
    val plan = Pq.knnPq(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKFinal"), s"native top-k missing from plan:\n$plan")
  }
}
