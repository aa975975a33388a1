package graft

import graft.operators.SetSim
import org.apache.spark.sql.functions._

/** Prefix-filtered exact set-similarity join: losslessness vs the
  * brute-force all-pairs definition, plus targeted pair semantics. */
class SetSimSpec extends SparkSuite {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val nearDup = base.replace("kappa", "lambda") // 9/11 jaccard ~0.818
  private val distinct = "completely different words about catalyst optimizer shuffles"

  private lazy val dir = fixtureDir(
    "documents" -> Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, nearDup, "en", "s", nearDup.length.toLong),
      (3L, distinct, "en", "s", distinct.length.toLong),
      (4L, base, "en", "s", base.length.toLong) // exact duplicate of 1
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("finds exact and near-dup pairs above 0.7, never the distinct doc") {
    val rows = SetSim.prefixJaccardPairs(spark, dir).collect()
    val pairs = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val exact = rows.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 4L).get
    assert(exact.getAs[Double]("jacc") === 1.0)
    assert(exact.getAs[Long]("inter") === exact.getAs[Long]("uni"))
    // near-dup: 9 shared of 11 distinct-union words -> 0.8182
    val near = rows.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L).get
    assert(near.getAs[Long]("inter") === 9L && near.getAs[Long]("uni") === 11L)
    assert(near.getAs[Double]("jacc") === 0.8182)
  }

  test("lossless vs brute-force all-pairs on the sf0.001 corpus") {
    val docs = graft.sources.Tables.documents(spark, SparkSpec.sf0001)
    val toks = SetSim.tokenTableOf(docs)
    val a = toks.alias("a")
    val b = toks.alias("b")
    val inter = a.join(b, col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val sz = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val brute = inter
      .join(sz.select(col("doc_id").as("id_a"), col("sz").as("sa")), "id_a")
      .join(sz.select(col("doc_id").as("id_b"), col("sz").as("sb")), "id_b")
      .filter(col("inter") * (SetSim.TDen + SetSim.TNum) >=
        (col("sa") + col("sb")) * SetSim.TNum)
      .select(col("id_a"), col("id_b"), col("inter"))
      .as[(Long, Long, Long)].collect().toSet
    val pruned = SetSim.prefixJaccardPairs(spark, SparkSpec.sf0001)
      .select(col("id_a"), col("id_b"), col("inter"))
      .as[(Long, Long, Long)].collect().toSet
    assert(pruned === brute)
    assert(brute.nonEmpty) // the corpus has near-dups; the test must bite
  }

  test("prefix index is smaller than the token table (pruning is real)") {
    val docs = graft.sources.Tables.documents(spark, SparkSpec.sf0001)
    val nTok = SetSim.tokenTableOf(docs).count()
    // re-derive the prefix size through the public pipeline: every doc's
    // prefix has sz - ceil(0.7*sz) + 1 tokens
    val expected = SetSim.tokenTableOf(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .select(sum(col("sz") - ceil(col("sz") * SetSim.TNum / SetSim.TDen) + 1))
      .as[Long].head()
    assert(expected < nTok / 2) // rarest-first prefixes carry <50% of tokens
  }
}
