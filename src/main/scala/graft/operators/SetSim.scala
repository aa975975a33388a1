package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering (AllPairs/PPJoin
  * family, Bayardo et al. WWW'07 / Xiao et al. WWW'08 — public algorithms):
  * find every document pair whose word-set Jaccard is >= the threshold,
  * with NO false negatives, without MinHash approximation and without the
  * all-pairs join.
  *
  * This complements the existing dedup family: MinHash-LSH
  * ([[NearDup.minhashLshPairs]]) is probabilistic (band collisions can
  * miss true pairs); 1-hash blocking ([[NearDup.ngramJaccardPairs]]) is
  * lossy by construction. The prefix filter is LOSSLESS: under one global
  * token order (rarest-first), two sets with Jaccard >= t MUST share a
  * token inside each other's (|x| - ceil(t*|x|) + 1)-prefix — so joining
  * prefixes only generates every qualifying pair. The oracle below is the
  * brute-force all-pairs definition; the hash match at sf0.01 is the
  * empirical losslessness proof on top of the lemma.
  *
  * Scale notes (100 TB):
  *  - No global rank is materialized for the token order: tokens order by
  *    the (document-frequency, token) PAIR directly, a total order that
  *    needs only the df table (one map-side-combinable groupBy) joined
  *    back on the token key — the TF-IDF join shape, vocab-partitioned,
  *    never a vocab-sized window.
  *  - Prefix selection is a window partitioned BY DOC (bounded by doc
  *    length, never corpus-sized); rarest-first ordering makes prefix
  *    tokens the most selective join keys in the corpus, so candidate
  *    fanout per token is minimal — the frequent tokens that would
  *    quadratically blow up a token join never enter the prefix index.
  *  - Candidates carry the size filter t*max(|a|,|b|) <= min(|a|,|b|) as
  *    exact integer arithmetic before any verify work.
  *  - Verify is O(candidates x doc length) via the token table join; the
  *    Jaccard predicate (17*inter >= 7*(sa+sb)) and the emitted quantized
  *    value are integer-exact in both engines.
  */
object SetSim {

  /** Jaccard threshold 0.7 as an exact rational (avoids float predicates). */
  val TNum = 7
  val TDen = 10

  /** (doc_id, tok) with per-doc distinct tokens, plus (doc_id, sz). */
  private[graft] def tokenTableOf(docs: DataFrame): DataFrame =
    TextAnalysis.withWordsOf(docs)
      .select(col("doc_id"), explode(array_distinct(col("w"))).as("tok"))

  /** All pairs with word-set Jaccard >= 0.7, exact, via prefix filtering. */
  def prefixJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    prefixJaccardPairsOf(Tables.documents(spark, dir))

  /** [[prefixJaccardPairs]] over any documents-shaped frame — library API.
    * Verification joins the candidate pairs back to the per-doc TOKEN
    * ARRAYS and intersects in-row (`array_intersect`) — O(candidates ×
    * doc length) work with no second corpus-wide shuffle, vs the naive
    * re-join through the exploded token table which shuffles the whole
    * corpus again per side. */
  def prefixJaccardPairsOf(docs: DataFrame): DataFrame = {
    val base = TextAnalysis.withWordsOf(docs)
      .select(col("doc_id"), array_distinct(col("w")).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
      .persist()
    val toks = base.select(col("doc_id"), col("sz"), explode(col("toks")).as("tok"))
    val dfTbl = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // prefix length p = sz - ceil(t*sz) + 1, ceil via integer arithmetic
    val p = col("sz") - floor((col("sz") * TNum + (TDen - 1)) / TDen) + 1
    val prefix = toks
      .join(dfTbl, "tok")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
      .filter(col("rn") <= p)
      .select(col("doc_id"), col("tok"), col("sz"))
    val a = prefix.alias("a")
    val b = prefix.alias("b")
    val cand = a.join(b, col("a.tok") === col("b.tok") &&
        col("a.doc_id") < col("b.doc_id") &&
        // size filter: J >= t forces t*max <= min (exact integers)
        least(col("a.sz"), col("b.sz")) * TDen >=
          greatest(col("a.sz"), col("b.sz")) * TNum)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sz").as("sa"), col("b.sz").as("sb"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(base.select(col("doc_id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(base.select(col("doc_id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      // J >= 7/10  <=>  10*inter >= 7*uni  <=>  17*inter >= 7*(sa+sb)
      .filter(col("inter") * (TDen + TNum) >= (col("sa") + col("sb")) * TNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        roundN(col("inter") / col("uni").cast("double"), 4).as("jacc"))
      .orderBy(col("id_a"), col("id_b"))
  }

  import TextAnalysis.normSql

  /** Brute-force all-pairs oracle: any pair sharing >= 1 token, exact
    * Jaccard via list_intersect — the definition the prefix filter must
    * reproduce bit-for-bit (losslessness check). */
  private val prefixJaccardSql =
    s"""WITH s AS (SELECT doc_id, list_distinct(string_split($normSql, ' ')) AS toks
       |           FROM documents),
       |z AS (SELECT doc_id, toks, len(toks) AS sz FROM s),
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM s),
       |c AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |      FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id),
       |j AS (SELECT c.id_a, c.id_b,
       |        CAST(len(list_intersect(za.toks, zb.toks)) AS BIGINT) AS inter,
       |        CAST(za.sz + zb.sz - len(list_intersect(za.toks, zb.toks)) AS BIGINT) AS uni
       |      FROM c
       |      JOIN z za ON za.doc_id = c.id_a
       |      JOIN z zb ON zb.doc_id = c.id_b)
       |SELECT id_a, id_b, inter, uni,
       |  ${roundNSql("inter / CAST(uni AS DOUBLE)", 4)} AS jacc
       |FROM j WHERE $TDen * inter >= $TNum * uni
       |ORDER BY id_a, id_b""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q_dedup_setsim_prefix", prefixJaccardPairs, Some(prefixJaccardSql)))
}
