package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Distributed k-means (operators/KMeans.scala) vs an independent
  * driver-side fold of the same trajectory at sf0.001. */
class KMeansSpec extends SparkSuite {

  private def ticksOf(dir: String): Array[(Long, Array[Long])] = {
    val spark0 = spark
    import spark0.implicits._
    sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1e6 + 0.5).cast("long")).as("t"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, t) => (id, t.toArray) }
      .sortBy(_._1)
  }

  private def refKmeans(vs: Array[(Long, Array[Long])])
      : Map[Int, (Long, Long, Long)] = {
    val dim = vs.head._2.length
    var cents = vs.take(KMeans.K).map(_._2.clone())
    def assign(t: Array[Long]): (Int, Long) = {
      var best = Long.MaxValue
      cents.zipWithIndex.foreach { case (c, j) =>
        var d = 0L
        var i = 0
        while (i < dim) { val e = t(i) - c(i); d += e * e; i += 1 }
        val packed = d * 64 + j
        if (packed < best) best = packed
      }
      ((best % 64).toInt, best / 64)
    }
    for (_ <- 1 to KMeans.Iterations) {
      val byCid = vs.map { case (_, t) => (assign(t)._1, t) }.groupBy(_._1)
      val next = cents.map(_.clone())
      byCid.foreach { case (cid, members) =>
        val n = members.length.toLong
        next(cid) = Array.tabulate(dim) { i =>
          math.floor(members.map(_._2(i)).sum.toDouble / n + 0.5).toLong
        }
      }
      cents = next
    }
    vs.map { case (_, t) => assign(t) }
      .groupBy(_._1)
      .map { case (cid, xs) =>
        cid -> (xs.length.toLong, xs.map(_._2).sum, cents(cid).sum)
      }
  }

  test("cluster sizes, inertia, and centroid sums match the reference fold exactly") {
    val spark0 = spark
    import spark0.implicits._
    val got = KMeans.kmeans(spark, SparkSpec.sf0001)
      .as[(Int, Long, Long, Long)].collect()
      .map { case (cid, n, in, cs) => cid -> (n, in, cs) }.toMap
    val want = refKmeans(ticksOf(SparkSpec.sf0001))
    assert(got === want)
    assert(got.values.map(_._1).sum ===
      sources.Tables.embeddings(spark, SparkSpec.sf0001).count())
  }

  test("assignment pass is shuffle-free (centroids ride as literals)") {
    val plan = KMeans.kmeans(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the only exchanges are the final k-row aggregate + its tiny
    // broadcast join; the corpus-side scan must not shuffle vectors
    assert(!plan.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$plan")
  }

  test("iterations strictly reduce inertia on this corpus") {
    val vs = ticksOf(SparkSpec.sf0001)
    // inertia with the INITIAL centroids (no Lloyd steps)
    val init = vs.take(KMeans.K).map(_._2)
    val dim = vs.head._2.length
    def inertia(cents: Array[Array[Long]]): Long =
      vs.map { case (_, t) =>
        cents.map { c =>
          var d = 0L; var i = 0
          while (i < dim) { val e = t(i) - c(i); d += e * e; i += 1 }
          d
        }.min
      }.sum
    val spark0 = spark
    import spark0.implicits._
    val finalInertia = KMeans.kmeans(spark, SparkSpec.sf0001)
      .agg(sum(col("inertia"))).as[Long].head()
    assert(finalInertia < inertia(init))
  }
}
