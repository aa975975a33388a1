package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimensionality reduction over the embedding corpus: the distributed
  * Gram (second-moment) matrix and the top principal direction via power
  * iteration — the whitening / spectral-dedup preprocessing step of an
  * embedding pipeline (reference has no equivalent; extension surface).
  *
  * Scale design (the RowMatrix.computeGramian shape, re-expressed
  * declaratively):
  *  - The Gram matrix is ONE explode + hash aggregate: each row fans out
  *    to Dim² (i, j, tᵢ·tⱼ) terms — a CONSTANT 4096× factor, map-side
  *    combined to ≤ Dim² rows per partition before the shuffle, so the
  *    exchange carries ≤ 4096·mappers longs at any corpus size. The
  *    per-partition typed-Aggregator outer-product fold is the
  *    constant-factor alternative; the explode form stays inside
  *    whole-stage codegen and its shuffle is already corpus-independent.
  *  - Power iteration runs on the COLLECTED Dim²-long Gram — driver-sized
  *    by definition (the KMeans k×Dim argument): T matrix-vector rounds
  *    of exact integer arithmetic, then the Dim-row result re-enters the
  *    engine. No corpus pass beyond the one Gram aggregate.
  *
  * Exactness (why both queries are oracle-checkable): embeddings
  * quantize to integer millionth-ticks (float→double cast is exact, one
  * IEEE multiply + floor — the KMeans discipline); Gram entries are
  * exact BIGINT sums of tick products divided once by the corpus count
  * (one IEEE double division on exact inputs, floored back to ticks);
  * each power round is an exact integer matvec followed by max-abs
  * normalization quantized to [[VTicks]] (again one double divide ×
  * one multiply on exact longs — bit-identical in both engines). The
  * corpus is uncentered (synthetic embeddings are near-zero-mean by
  * construction); centering adds two rank-1 terms whose cross products
  * overflow BIGINT — at that point the same plan runs on DECIMAL(38,0).
  * Overflow budget: |tick| ≤ 1e6 ⇒ Gram sum ≤ rows·1e12 (BIGINT-safe to
  * ~9e6 rows; DECIMAL beyond), matvec ≤ Dim·1e12·VTicks ≈ 6.4e17. The
  * budget is ENFORCED, not just documented (round-5 advice): both
  * engines' plans guard on the corpus count and fail loudly past
  * [[GramRowBudget]] — Spark's non-ANSI sum(LongType) would wrap silently
  * while DuckDB promotes to HUGEINT, so the out-of-budget behavior would
  * otherwise be a silent cross-engine divergence. */
object Pca {

  val Dim = 64
  val Ticks = 1e6
  val VTicks = 10000L
  val Rounds = 8
  /** Max corpus rows before a worst-case Gram cell (rows·1e12) can exceed
    * BIGINT: 9.22e18 / 1e12 ≈ 9.2e6, held with margin. Past this, rerun
    * the same plan on DECIMAL(38,0). */
  val GramRowBudget = 9000000L

  private def ticks = transform(col("embedding"),
    x => floor(x.cast("double") * Ticks + 0.5).cast("long"))

  /** (i, j, c): c = floor(Σ tᵢ·tⱼ / n + 0.5) in tick² units, all Dim²
    * cells (the full matrix, so the matvec below needs no triangle
    * mirroring). */
  def gramOf(emb: DataFrame): DataFrame = {
    val terms = emb.select(ticks.as("t"))
      .select(explode(sequence(lit(1), lit(Dim))).as("i"), col("t"))
      .select(col("i"), explode(sequence(lit(1), lit(Dim))).as("j"),
        (element_at(col("t"), col("i")) * element_at(col("t"), col("j")))
          .as("p"))
    val n = emb.select(count(lit(1)).as("n"))
    terms.groupBy(col("i"), col("j")).agg(sum(col("p")).as("s"))
      .crossJoin(broadcast(n))
      // budget guard lives in a FILTER (a projected assert column would be
      // pruned away): assert_true is null when the corpus is in budget, so
      // the filter keeps every row — and throws past GramRowBudget
      .filter(assert_true(col("n") <= GramRowBudget,
        lit(s"Gram BIGINT overflow budget: corpus rows > $GramRowBudget; " +
          "rerun on DECIMAL(38,0)")).isNull)
      .select(col("i"), col("j"),
        floor(col("s").cast("double") / col("n") + 0.5).cast("long").as("c"))
  }

  def gram(spark: SparkSession, dir: String): DataFrame =
    gramOf(Tables.embeddings(spark, dir))

  /** The constant-factor alternative to [[gramOf]]: a typed Aggregator
    * folding each row's Dim² outer product into one Array[Long] buffer —
    * zero explode, zero per-pair row materialization; the shuffle carries
    * ONE 4096-long buffer per partition. Identical integer arithmetic
    * (PcaSpec asserts cell-for-cell equality with the explode form), so
    * either can back [[pcaPowerOf]]; the explode form stays the registered
    * query because it is the oracle-expressible shape. */
  def gramOfFused(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.{Encoder, Encoders}
    val agg = new Aggregator[Seq[Long], Array[Long], Seq[Long]] {
      def zero: Array[Long] = new Array[Long](Dim * Dim)
      def reduce(b: Array[Long], t: Seq[Long]): Array[Long] = {
        val a = t.toArray
        var i = 0
        while (i < Dim) {
          val ti = a(i); var j = 0
          while (j < Dim) { b(i * Dim + j) += ti * a(j); j += 1 }
          i += 1
        }
        b
      }
      def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var k = 0
        while (k < x.length) { x(k) += y(k); k += 1 }
        x
      }
      def finish(b: Array[Long]): Seq[Long] = b.toSeq
      def bufferEncoder: Encoder[Array[Long]] = Encoders.javaSerialization
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
    val gramUdaf = udaf(agg)
    val n = emb.select(count(lit(1)).as("n"))
    emb.select(ticks.as("t"))
      .agg(gramUdaf(col("t")).as("m"))
      .select(posexplode(col("m")).as(Seq("pos", "s")))
      .crossJoin(broadcast(n))
      .filter(assert_true(col("n") <= GramRowBudget,
        lit(s"Gram BIGINT overflow budget: corpus rows > $GramRowBudget; " +
          "rerun on DECIMAL(38,0)")).isNull)
      .select((col("pos") / Dim).cast("int").plus(1).as("i"),
        pmod(col("pos"), lit(Dim)).cast("int").plus(1).as("j"),
        floor(col("s").cast("double") / col("n") + 0.5).cast("long").as("c"))
  }

  /** Top principal direction (uncentered) by [[Rounds]] power-iteration
    * rounds over the collected Gram, v₀ = all-[[VTicks]]; each round
    * normalizes by max-|component| and re-quantizes, so the trajectory is
    * engine-exact. Returns (i, v) in [[VTicks]] units. */
  def pcaPowerOf(spark: SparkSession, emb: DataFrame): DataFrame = {
    val g = Array.ofDim[Long](Dim + 1, Dim + 1)
    gramOf(emb).collect().foreach { r =>
      g(r.getAs[Int]("i"))(r.getAs[Int]("j")) = r.getAs[Long]("c")
    }
    var v = Array.fill(Dim + 1)(VTicks); v(0) = 0L
    for (_ <- 1 to Rounds) {
      val w = Array.tabulate(Dim + 1) { i =>
        if (i == 0) 0L else (1 to Dim).map(j => g(i)(j) * v(j)).sum
      }
      val m = w.map(math.abs).max
      if (m != 0L)
        v = w.map(wi => math.floor(wi.toDouble / m.toDouble * VTicks.toDouble + 0.5).toLong)
    }
    import spark.implicits._
    (1 to Dim).map(i => (i, v(i))).toDF("i", "v")
  }

  def pcaPower(spark: SparkSession, dir: String): DataFrame =
    pcaPowerOf(spark, Tables.embeddings(spark, dir))

  /** DuckDB mirror of [[ticks]]/[[gramOf]] as a CTE chain ending in
    * g(i, j, c). */
  private val gramCte =
    s"""t AS (SELECT list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS t
       |  FROM embeddings),
       |nn AS (SELECT count(*) AS n FROM t),
       |g0 AS (SELECT r1.i AS i, r2.j AS j, sum(t.t[r1.i] * t.t[r2.j]) AS s
       |  FROM t, range(1, ${Dim + 1}) r1(i), range(1, ${Dim + 1}) r2(j)
       |  GROUP BY 1, 2),
       |g AS (SELECT i, j,
       |  CASE WHEN n > $GramRowBudget
       |    THEN CAST(error('Gram BIGINT overflow budget exceeded') AS BIGINT)
       |    ELSE CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) END AS c
       |  FROM g0, nn)""".stripMargin

  private val gramSql = s"WITH $gramCte\nSELECT i, j, c FROM g"

  private val pcaSql = {
    val v0 = s"v0 AS (SELECT i, CAST($VTicks AS BIGINT) AS v FROM range(1, ${Dim + 1}) r(i))"
    // m = 0 (all-zero Gram) keeps the previous round's v — the same guard
    // the Scala iteration applies (round-5 advice: floor(w/0·…) is NULL in
    // DuckDB, which silently diverged from Spark on the zero-corpus edge).
    // Each v CTE is MATERIALIZED: the guard references v(r-1) twice (via
    // w_r and directly), and DuckDB's default CTE inlining would expand
    // the chain 2^Rounds times — planning alone then never finishes.
    val rounds = (1 to Rounds).map { r =>
      s"""w$r AS MATERIALIZED (SELECT g.i AS i, sum(g.c * v${r - 1}.v) AS w
         |  FROM g JOIN v${r - 1} ON g.j = v${r - 1}.i GROUP BY 1),
         |m$r AS (SELECT max(abs(w)) AS m FROM w$r),
         |v$r AS MATERIALIZED (SELECT w$r.i AS i,
         |    CASE WHEN m = 0 THEN p.v
         |      ELSE CAST(floor(CAST(w AS DOUBLE) / CAST(m AS DOUBLE)
         |        * ${VTicks}.0 + 0.5) AS BIGINT) END AS v
         |  FROM w$r JOIN v${r - 1} p ON w$r.i = p.i, m$r)""".stripMargin
    }.mkString(",\n")
    s"WITH $gramCte,\n$v0,\n$rounds\nSELECT i, v FROM v$Rounds"
  }

  /** Per-dimension mean/std of the embedding corpus — the whitening
    * statistics an embedding pipeline fits before PCA/SQ8 quantization
    * (subtract mean, divide by std). One explode + map-side-combined
    * aggregate (the [[gramOf]] shape at Dim instead of Dim² fanout);
    * sums ride the same integer TICKS with the same [[GramRowBudget]]
    * guard (Σt² approaches 2⁶³ at ~9e6 rows — beyond, lift to DECIMAL).
    * mean and var then derive from identical BIGINTs with a pinned
    * double-op sequence, so both engines agree bit-for-bit. */
  def whitenStats(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.embeddings(spark, dir).select(ticks.as("t"))
      .select(explode(sequence(lit(1), lit(Dim))).as("dim"), col("t"))
      .select(col("dim"), element_at(col("t"), col("dim")).as("v"))
    val g = terms.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("st"),
        sum(col("v") * col("v")).as("sq"))
      .filter(assert_true(col("n") <= GramRowBudget,
        lit(s"whitening BIGINT overflow budget: corpus rows > $GramRowBudget; " +
          "rerun on DECIMAL(38,0)")).isNull)
    val meanT = col("st").cast("double") / col("n")
    val varT = col("sq").cast("double") / col("n") - meanT * meanT
    g.select(col("dim"), col("n"),
      graft.functions.Rounding.roundN(meanT / lit(1e6), 6).as("mean"),
      graft.functions.Rounding.roundN(
        sqrt(greatest(varT, lit(0.0))) / lit(1e6), 6).as("std"))
      .orderBy(col("dim"))
  }

  private val whitenStatsSql =
    s"""WITH t AS (SELECT list_transform(embedding::DOUBLE[],
       |             x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS t
       |           FROM embeddings),
       |x AS (SELECT u.i AS dim, (t)[u.i] AS v
       |      FROM t, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u),
       |g AS (SELECT dim, count(*) AS n, CAST(sum(v) AS BIGINT) AS st,
       |        CAST(sum(v * v) AS BIGINT) AS sq
       |      FROM x GROUP BY 1)
       |SELECT CAST(dim AS INT) AS dim, n,
       |  ${graft.functions.Rounding.roundNSql(
        "CAST(st AS DOUBLE) / n / 1e6", 6)} AS mean,
       |  ${graft.functions.Rounding.roundNSql(
        "sqrt(greatest(CAST(sq AS DOUBLE) / n - (CAST(st AS DOUBLE) / n) * (CAST(st AS DOUBLE) / n), 0.0)) / 1e6", 6)} AS std
       |FROM g ORDER BY 1""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_embed_gram", gram, Some(gramSql)),
    Q("q_embed_whiten", whitenStats, Some(whitenStatsSql)),
    Q("q_embed_pca_power", pcaPower, Some(pcaSql)))
}
