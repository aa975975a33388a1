package graft

import graft.functions.Codebooks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The broadcast-codebook contract (functions/Codebooks.scala): plan size
  * must be independent of codebook size K, and the compiled expressions
  * must be bit-identical to the literal forms they replaced. */
class CodebookPlanSpec extends SparkSuite {
  import spark.implicits._

  private def vecsDf: DataFrame =
    Seq(
      (1L, Array(1.0, 0.0, 0.5, -0.25)),
      (2L, Array(0.1, 0.9, -0.4, 0.2)),
      (3L, Array(-0.7, 0.3, 0.3, 0.6)),
      (4L, Array(0.0, -1.0, 0.2, 0.8))
    ).toDF("vec_id", "v")
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))

  private def codebook(k: Int): Array[(Array[Double], Double)] =
    Array.tabulate(k) { j =>
      val c = Array.tabulate(4)(i => math.sin(j * 4 + i + 1.0))
      (c, math.sqrt(c.map(x => x * x).sum))
    }

  test("cosineRankCids: plan size independent of K (8 vs 64 centroids)") {
    def planLen(k: Int): Int = {
      val bc = spark.sparkContext.broadcast(codebook(k))
      vecsDf.select(Codebooks.cosineRankCids(col("v"), col("nrm"), bc).as("r"))
        .queryExecution.optimizedPlan.toString.length
    }
    val (p8, p64) = (planLen(8), planLen(64))
    info(s"optimized plan chars — K=8: $p8, K=64: $p64")
    // only the broadcast id digits may differ between the two plans; an
    // inlined literal codebook would add thousands of chars at K=64
    assert(math.abs(p8 - p64) <= 8, s"plan grew with K: $p8 vs $p64")
  }

  test("cosineRankCids: order matches the literal array_sort form bit-for-bit") {
    val cents = codebook(8)
    val bc = spark.sparkContext.broadcast(cents)
    val got = vecsDf
      .select(col("vec_id"), Codebooks.cosineRankCids(col("v"), col("nrm"), bc).as("r"))
      .as[(Long, Seq[Int])].collect().toMap
    // reference: the pre-round-5 literal construction (lit per centroid,
    // roundN, array_sort comparator on (sim DESC, cid ASC))
    import graft.functions.Rounding.roundN
    val sims = array(cents.map { case (cv, cn) =>
      roundN(call_function("vec_dot", col("v"), lit(cv)) / (col("nrm") * lit(cn)), 6)
    }: _*)
    val ranked = array_sort(
      transform(sims, (s, i) => struct(s.as("sim"), i.as("cid"))),
      (l, r) => when(l.getField("sim") > r.getField("sim"), -1)
        .when(l.getField("sim") < r.getField("sim"), 1)
        .otherwise(l.getField("cid") - r.getField("cid")))
    val exp = vecsDf
      .select(col("vec_id"), transform(ranked, p => p.getField("cid")).as("r"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == exp)
  }

  test("pqAssign: plan size independent of M and K; matches vec_argmin_sqdist") {
    def books(m: Int, k: Int): Array[Array[Array[Long]]] =
      Array.tabulate(m)(mi => Array.tabulate(k)(j =>
        Array.tabulate(2)(i => (mi * 31 + j * 7 + i * 3 - 10).toLong)))
    val sub = Seq(
      (0, Array(1L, -2L)), (1, Array(5L, 5L)), (0, Array(-8L, 0L)), (1, Array(2L, -9L))
    ).toDF("m", "st")
    def planLen(m: Int, k: Int): Int = {
      val bc = spark.sparkContext.broadcast(books(m, k))
      sub.select(Codebooks.pqAssign(col("m"), col("st"), bc).as("a"))
        .queryExecution.optimizedPlan.toString.length
    }
    val (small, large) = (planLen(2, 4), planLen(8, 64))
    info(s"optimized plan chars — M=2,K=4: $small, M=8,K=64: $large")
    assert(math.abs(small - large) <= 8, s"plan grew with M·K: $small vs $large")

    // exact equivalence with the literal-codebook argmin on each subspace
    val b = books(2, 4)
    val bc = spark.sparkContext.broadcast(b)
    val got = sub.select(col("m"), col("st"),
        Codebooks.pqAssign(col("m"), col("st"), bc).as("a"))
      .as[(Int, Seq[Long], Long)].collect()
    got.foreach { case (m, st, a) =>
      val exp = Seq((st, b(m))).toDF("st", "book")
        .select(call_function("vec_argmin_sqdist", col("st"),
          typedLit(b(m).map(_.toSeq).toSeq)).as("p"))
        .as[Long].head()
      assert(a == exp, s"m=$m st=$st: $a != $exp")
    }
  }

  test("pqAssign fails fast on out-of-range subspace and dim mismatch") {
    val bc = spark.sparkContext.broadcast(
      Array(Array(Array(1L, 2L), Array(3L, 4L))))
    val badM = Seq((5, Array(1L, 2L))).toDF("m", "st")
      .select(Codebooks.pqAssign(col("m"), col("st"), bc))
    val badDim = Seq((0, Array(1L, 2L, 3L))).toDF("m", "st")
      .select(Codebooks.pqAssign(col("m"), col("st"), bc))
    intercept[Exception](badM.collect())
    intercept[Exception](badDim.collect())
  }
}
