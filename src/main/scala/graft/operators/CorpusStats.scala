package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-growth statistics: the Heaps-law fit V(N) ≈ K·N^β (vocabulary
  * size vs token count) every tokenizer/dedup decision implicitly
  * assumes, plus the sample-ratio-mismatch guardrail every experiment
  * readout runs first.
  *
  * Scale design (Heaps): the whole curve comes from ONE corpus pass —
  * vocabulary at prefix cut p is the count of terms whose FIRST
  * occurrence doc falls at or below the cut (term → min(doc_id), a
  * vocab-sized aggregate), and prefix token counts are conditional sums
  * over the per-doc token table. Cuts derive from a 1-row max-id grand
  * aggregate (the tripwire-exempt broadcast shape); the β/ln K fit is
  * OLS over the [[HeapsPoints]] (config-sized) (ln N, ln V) points with
  * both logs micro-quantized before the integer sufficient-statistic
  * sums — identical in both engines. */
object CorpusStats {

  /** Number of doc-id prefix cuts the growth curve samples. */
  val HeapsPoints = 10

  def heaps(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the normalized word arrays feed BOTH the per-doc token
    // counts and the first-occurrence vocabulary aggregate — the regex
    // normalization is the expensive part and must not run twice
    val words = TextAnalysis.withWordsOf(Tables.documents(spark, dir))
      .select(col("doc_id"), col("w"))
      .persist()
    val perDoc = words.select(col("doc_id"),
      size(filter(col("w"), t => t =!= "")).as("nt"))
    val firstOcc = words
      .select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
    val cuts = broadcast(perDoc.agg(max(col("doc_id")).as("mx")))
    def cut(p: Int) = floor(col("mx") * p / lit(HeapsPoints)).cast("long")
    // ONE pass per table: all cuts as conditional aggregate columns
    // (mirrors the oracle), stacked back to (p, tokens, vocab) rows
    val vCols = (1 to HeapsPoints).map(p =>
      sum(when(col("first_doc") <= cut(p), 1L).otherwise(0L)).as(s"v$p"))
    val tCols = (1 to HeapsPoints).map(p =>
      sum(when(col("doc_id") <= cut(p), col("nt")).otherwise(0L)).as(s"t$p"))
    val v = firstOcc.crossJoin(cuts).agg(vCols.head, vCols.tail: _*)
    val t = perDoc.crossJoin(cuts).agg(tCols.head, tCols.tail: _*)
    val stackArgs = (1 to HeapsPoints)
      .map(p => s"$p, t$p, v$p").mkString(", ")
    val pts = v.crossJoin(t)
      .select(expr(s"stack($HeapsPoints, $stackArgs) AS (p, tokens, vocab)"))
    // OLS of ln V on ln N over the micro-quantized points (skip empty
    // prefixes — ln undefined); points are config-sized literals
    val lx = floor(log(col("tokens").cast("double")) * 1e6 + 0.5).cast("long")
    val ly = floor(log(col("vocab").cast("double")) * 1e6 + 0.5).cast("long")
    val q = pts.filter(col("tokens") > 0 && col("vocab") > 0)
      .select(col("p"), col("tokens"), col("vocab"), lx.as("x"), ly.as("y"))
    val fit = broadcast(q.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0L,
          lit(null).cast("double"))
          .otherwise((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("beta")))
    pts.crossJoin(fit)
      .select(col("p"), col("tokens"), col("vocab"), roundN(col("beta"), 6).as("beta"))
      .orderBy(col("p"))
  }

  private val heapsSql = {
    val vocabCases = (1 to HeapsPoints).map(p =>
      s"sum(CASE WHEN first_doc <= CAST(floor(mx * $p / $HeapsPoints.0) AS BIGINT) THEN 1 ELSE 0 END) AS v$p").mkString(", ")
    val tokenCases = (1 to HeapsPoints).map(p =>
      s"sum(CASE WHEN doc_id <= CAST(floor(mx * $p / $HeapsPoints.0) AS BIGINT) THEN nt ELSE 0 END) AS t$p").mkString(", ")
    val unions = (1 to HeapsPoints).map(p =>
      s"SELECT $p AS p, CAST(t.t$p AS BIGINT) AS tokens, CAST(v.v$p AS BIGINT) AS vocab FROM v CROSS JOIN t")
      .mkString(" UNION ALL ")
    s"""WITH w AS (SELECT doc_id, string_split(${TextAnalysis.normSql}, ' ') AS w
       |           FROM documents),
       |pd AS (SELECT doc_id, len(list_filter(w, x -> x <> '')) AS nt FROM w),
       |fo AS (SELECT t.term, min(w.doc_id) AS first_doc
       |       FROM w, LATERAL (SELECT unnest(w.w) AS term) t
       |       WHERE t.term <> '' GROUP BY 1),
       |mxx AS (SELECT max(doc_id) AS mx FROM pd),
       |v AS (SELECT $vocabCases FROM fo CROSS JOIN mxx),
       |t AS (SELECT $tokenCases FROM pd CROSS JOIN mxx),
       |pts AS ($unions),
       |q AS (SELECT p, tokens, vocab,
       |        CAST(floor(ln(CAST(tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
       |        CAST(floor(ln(CAST(vocab AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
       |      FROM pts WHERE tokens > 0 AND vocab > 0),
       |f AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
       |        CAST(sum(x * y) AS BIGINT) AS sxy
       |      FROM q),
       |b AS (SELECT CASE WHEN n * sxx - sx * sx = 0 THEN NULL
       |               ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
       |                    CAST(n * sxx - sx * sx AS DOUBLE)
       |             END AS beta
       |      FROM f)
       |SELECT pts.p, pts.tokens, pts.vocab,
       |  ${roundNSql("b.beta", 6)} AS beta
       |FROM pts CROSS JOIN b
       |ORDER BY pts.p""".stripMargin
  }

  // ------------------------------------------------------------------ srm

  /** Sample-ratio mismatch: χ² of the md5-arm user split against the
    * designed 50/50 — the first guardrail of any experiment readout.
    * One user-keyed distinct + a 2-cell aggregate;
    * χ² = (n_c − n_t)²/(n_c + n_t) exactly for equal expected counts. */
  def srm(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir).select(col("user_id")).distinct()
      .select(Inference.armCol(col("user_id")).as("arm"))
    users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"))
      .select(col("n_c"), col("n_t"),
        when(col("n_c") + col("n_t") === 0L, lit(null).cast("double"))
          .otherwise(roundN(
            ((col("n_c") - col("n_t")) * (col("n_c") - col("n_t"))).cast("double") /
              (col("n_c") + col("n_t")), 6)).as("chi2"),
        when(col("n_c") + col("n_t") === 0L, lit(null).cast("boolean"))
          .otherwise(
            ((col("n_c") - col("n_t")) * (col("n_c") - col("n_t"))).cast("double") /
              (col("n_c") + col("n_t")) > 3.841459).as("srm_flag"))
  }

  private val srmSql =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |a AS (SELECT ${Inference.armSql} AS arm FROM u),
       |g AS (SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t
       |      FROM a)
       |SELECT n_c, n_t,
       |  CASE WHEN n_c + n_t = 0 THEN NULL
       |       ELSE ${roundNSql("CAST((n_c - n_t) * (n_c - n_t) AS DOUBLE) / (n_c + n_t)", 6)}
       |  END AS chi2,
       |  CASE WHEN n_c + n_t = 0 THEN NULL
       |       ELSE CAST((n_c - n_t) * (n_c - n_t) AS DOUBLE) / (n_c + n_t) > 3.841459
       |  END AS srm_flag
       |FROM g""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_text_heaps", heaps, Some(heapsSql)),
    Q("q_events_srm", srm, Some(srmSql)))
}
