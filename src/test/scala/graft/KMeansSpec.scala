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

  private def sqDists(t: Array[Long], cents: Array[Array[Long]]): Array[Long] =
    cents.map { c =>
      var d = 0L; var i = 0
      while (i < t.length) { val e = t(i) - c(i); d += e * e; i += 1 }
      d
    }

  private def assignTo(t: Array[Long], cents: Array[Array[Long]]): (Int, Long) = {
    val best = sqDists(t, cents).zipWithIndex.map { case (d, j) => d * 64 + j }.min
    ((best % 64).toInt, best / 64)
  }

  /** Final centroids of the exact registered Lloyd trajectory, folded
    * driver-side independently of the engine. */
  private def refCentroids(vs: Array[(Long, Array[Long])]): Array[Array[Long]] = {
    val dim = vs.head._2.length
    var cents = vs.take(KMeans.K).map(_._2.clone())
    for (_ <- 1 to KMeans.Iterations) {
      val byCid = vs.map { case (_, t) => (assignTo(t, cents)._1, t) }.groupBy(_._1)
      val next = cents.map(_.clone())
      byCid.foreach { case (cid, members) =>
        val n = members.length.toLong
        next(cid) = Array.tabulate(dim) { i =>
          math.floor(members.map(_._2(i)).sum.toDouble / n + 0.5).toLong
        }
      }
      cents = next
    }
    cents
  }

  private def refKmeans(vs: Array[(Long, Array[Long])])
      : Map[Int, (Long, Long, Long)] = {
    val cents = refCentroids(vs)
    vs.map { case (_, t) => assignTo(t, cents) }
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

  test("silhouette matches a driver-side fold of the same trajectory") {
    val vs = ticksOf(SparkSpec.sf0001)
    val cents = refCentroids(vs)
    val smu = vs.map { case (_, t) =>
      val ds = sqDists(t, cents)
      val (cid, a2) = assignTo(t, cents)
      val b2 = ds.zipWithIndex.collect { case (d, j) if j != cid => d }.min
      val s =
        if (math.max(a2, b2) == 0L) 0L
        else math.floor((math.sqrt(b2.toDouble) - math.sqrt(a2.toDouble)) /
          math.sqrt(math.max(a2, b2).toDouble) * 1e6 + 0.5).toLong
      (cid, s)
    }
    val byCid = smu.groupBy(_._1).map { case (cid, xs) =>
      cid -> (xs.length.toLong, xs.map(_._2).sum)
    }
    def mean(n: Long, ssum: Long): Double =
      math.floor(ssum.toDouble / n / 1e6 * 1e6 + 0.5) / 1e6
    val got = KMeans.silhouette(spark, SparkSpec.sf0001).collect()
      .map(r => r.getAs[Int]("cid") ->
        (r.getAs[Long]("n_members"), r.getAs[Double]("mean_sil"))).toMap
    byCid.foreach { case (cid, (n, ssum)) =>
      assert(got(cid) === ((n, mean(n, ssum))), s"cid $cid")
    }
    val (totN, totS) = (smu.length.toLong, smu.map(_._2).sum)
    assert(got(-1) === ((totN, mean(totN, totS))))
  }

  test("davies-bouldin matches a driver-side fold; separated fixture scores low") {
    val vs = ticksOf(SparkSpec.sf0001)
    val cents = refCentroids(vs)
    val aUs = vs.map { case (_, t) =>
      val (cid, a2) = assignTo(t, cents)
      (cid, math.floor(math.sqrt(a2.toDouble) * 1e6 + 0.5).toLong)
    }
    val sMu = aUs.groupBy(_._1).map { case (cid, xs) =>
      cid -> math.floor(xs.map(_._2).sum.toDouble / xs.length + 0.5).toLong
    }
    val rMu = sMu.keys.map { i =>
      val ratios = sMu.keys.filter(_ != i).flatMap { j =>
        val m2 = sqDists(cents(i), Array(cents(j)))(0)
        if (m2 == 0L) None
        else Some((sMu(i) + sMu(j)).toDouble / 1e6 / math.sqrt(m2.toDouble))
      }
      i -> (if (ratios.isEmpty) None
            else Some(math.floor(ratios.max * 1e6 + 0.5).toLong))
    }.toMap
    val got = KMeans.daviesBouldin(spark, SparkSpec.sf0001).collect()
      .map(r => r.getAs[Int]("cid") -> r).toMap
    rMu.foreach { case (cid, rm) =>
      val r = got(cid)
      assert(math.floor(r.getAs[Double]("s_intra") * 1e6 + 0.5).toLong === sMu(cid))
      rm match {
        case Some(v) =>
          assert(math.floor(r.getAs[Double]("db") * 1e6 + 0.5).toLong === v)
        case None => assert(r.isNullAt(r.fieldIndex("db")))
      }
    }
    val valid = rMu.values.flatten.toSeq
    val wantDb = math.floor(
      valid.sum.toDouble / valid.length / 1e6 * 1e6 + 0.5) / 1e6
    assert(got(-1).getAs[Double]("db") === wantDb)
  }

  test("well-separated planted clusters: silhouette near 1, DB index small") {
    // 8 tight clusters, one per axis-direction corner, vec_ids 1..8 are the
    // Lloyd seeds (one per cluster) so the trajectory locks onto the truth
    val rows = for {
      j <- 0 until KMeans.K
      p <- 0 until 5
    } yield {
      val base = Array.fill(64)(0.0f)
      base(j) = 1.0f
      if (p > 0) base(8 + p) = 0.001f * p // tiny intra-cluster jitter
      (j + 1L + 8L * p, base.toSeq)
    }
    val spark0 = spark
    import spark0.implicits._
    val d = fixtureDir("embeddings" -> rows.toDF("vec_id", "embedding"))
    val sil = KMeans.silhouette(spark, d).collect()
    assert(sil.length === KMeans.K + 1)
    sil.foreach(r => assert(r.getAs[Double]("mean_sil") > 0.95,
      s"cid ${r.getAs[Int]("cid")}"))
    val db = KMeans.daviesBouldin(spark, d).collect()
      .find(_.getAs[Int]("cid") == -1).get
    assert(db.getAs[Double]("db") < 0.1)
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
