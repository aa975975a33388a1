package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the Gram/power-iteration pair (the sf0.01 oracle
  * sweep pins engine-vs-DuckDB exactness; these pin the MATH). */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  /** 64-dim corpus with a planted dominant direction along axis `axis`. */
  private def planted(axis: Int): String = {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { id =>
      val v = Array.fill(operators.Pca.Dim)((rnd.nextDouble() - 0.5) * 0.02f)
      v(axis - 1) = (if (id % 2 == 0) 0.5 else -0.5) + rnd.nextDouble() * 0.01
      (id.toLong, v.map(_.toFloat).toSeq, 0)
    }
    fixtureDir("embeddings" -> rows.toDF("vec_id", "embedding", "label"))
  }

  test("gram matrix is symmetric with nonnegative diagonal") {
    val g = operators.Pca.gram(spark, SparkSpec.sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (i <- 1 to operators.Pca.Dim; j <- i to operators.Pca.Dim) {
      assert(g(i -> j) == g(j -> i), s"asymmetry at ($i,$j)")
      if (i == j) assert(g(i -> j) >= 0L)
    }
  }

  test("fused-aggregator gram equals the explode form cell-for-cell") {
    val emb = spark.read.parquet(s"${SparkSpec.sf0001}/embeddings.parquet")
    val a = operators.Pca.gramOf(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = operators.Pca.gramOfFused(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a.size == b.size && a == b)
  }

  test("all-zero Gram keeps the initial v in every round (zero-corpus edge)") {
    import org.apache.spark.sql.functions._
    // degenerate corpus: every embedding identically zero -> Gram = 0,
    // every matvec m = 0, so the m != 0 guard must keep v at its
    // initialization (the SQL mirror pins the same CASE guard)
    val zero = spark.range(5).select(
      col("id").as("vec_id"),
      array_repeat(lit(0.0f), operators.Pca.Dim).as("embedding"))
    val v = operators.Pca.pcaPowerOf(spark, zero).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(v.size == operators.Pca.Dim)
    assert(v.values.forall(_ == operators.Pca.VTicks))
  }

  test("power iteration recovers a planted dominant direction") {
    val dir = planted(axis = 17)
    val v = operators.Pca.pcaPowerOf(spark,
        spark.read.parquet(s"$dir/embeddings.parquet")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val top = v.maxBy { case (_, x) => math.abs(x) }
    assert(top._1 == 17, s"dominant component was ${top._1}")
    assert(math.abs(top._2) == operators.Pca.VTicks) // normalized to max
    // every off-axis component is far smaller than the planted one
    v.filter(_._1 != 17).values.foreach(x =>
      assert(math.abs(x) < operators.Pca.VTicks / 5))
  }
}
