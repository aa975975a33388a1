package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus curation & release operators: snapshot diffing (dataset
  * versioning), readability scoring, and differentially-private release
  * counts. These are the jobs that run BETWEEN pipeline stages on a
  * training corpus: "what changed since the last crawl snapshot", "how
  * hard is this text", "publish per-slice counts without leaking rows".
  *
  * Scale notes (100 TB):
  *  - The snapshot diff never joins document payloads: each side is first
  *    projected to (doc_id, md5(text), source) — a 3-column scan — so the
  *    full-outer join shuffles 48-byte rows, not documents. One
  *    co-partitioned join + one map-side-combinable count.
  *  - Readability is a pure narrow map over the scan (regex per word, no
  *    shuffle at all before the final per-doc projection).
  *  - DP counts aggregate first (slice-sized output), then apply noise as
  *    a per-row expression on the aggregate — noise cost is O(slices),
  *    never O(rows).
  */
object Curation {

  // ------------------------------------------------------------ dataset diff

  /** Deterministic "next crawl" snapshot derived from the corpus itself so
    * the diff operator has a reproducible, oracle-expressible second side:
    * ~6% of docs deleted (doc_id % 17 == 3), ~8% edited (doc_id % 13 == 5,
    * text gains a ' rev2' suffix), ~3% new (doc_id % 29 == 7 re-ingested
    * under doc_id + 1,000,000). */
  private[operators] def snapshotOf(docs: DataFrame): DataFrame = {
    val edited = docs
      .filter(col("doc_id") % 17 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 13 === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
    val added = docs.filter(col("doc_id") % 29 === 7)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    edited.unionByName(added)
  }

  /** Snapshot diff between two corpus versions: per (source, status) doc
    * counts with status in added/removed/changed/unchanged. The library
    * form [[datasetDiffOf]] takes any two documents-shaped frames. */
  def datasetDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    datasetDiffOf(docs, snapshotOf(docs))
  }

  def datasetDiffOf(a: DataFrame, b: DataFrame): DataFrame = {
    def sig(df: DataFrame) = df.select(col("doc_id"),
      md5(col("text")).as("sig"), col("source"))
    val l = sig(a).alias("a")
    val r = sig(b).alias("b")
    l.join(r, col("a.doc_id") === col("b.doc_id"), "full_outer")
      .select(
        coalesce(col("a.source"), col("b.source")).as("source"),
        when(col("b.doc_id").isNull, "removed")
          .when(col("a.doc_id").isNull, "added")
          .when(col("a.sig") =!= col("b.sig"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("source"), col("status"))
  }

  private val datasetDiffSql =
    """WITH a AS (SELECT doc_id, md5(text) AS sig, source FROM documents),
      |b AS (SELECT doc_id, md5(CASE WHEN doc_id % 13 = 5 THEN text || ' rev2'
      |                              ELSE text END) AS sig, source
      |      FROM documents WHERE doc_id % 17 != 3
      |      UNION ALL
      |      SELECT doc_id + 1000000, md5(text), source
      |      FROM documents WHERE doc_id % 29 = 7)
      |SELECT coalesce(a.source, b.source) AS source,
      |  CASE WHEN b.doc_id IS NULL THEN 'removed'
      |       WHEN a.doc_id IS NULL THEN 'added'
      |       WHEN a.sig != b.sig THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  count(*) AS n
      |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- readability

  /** Flesch reading ease per document with a regex syllable approximation
    * (vowel groups [aeiouy]+, min 1 per word — the standard public
    * heuristic) and [.!?]+ sentence runs (min 1). All three inputs are
    * exact integers; the Flesch formula is then three float ops on
    * identical integer ratios in both engines, quantized to 2 decimals. */
  def readability(spark: SparkSession, dir: String): DataFrame =
    readabilityOf(Tables.documents(spark, dir))

  def readabilityOf(docs: DataFrame): DataFrame = {
    val withW = TextAnalysis.withWordsOf(docs)
    val syl = aggregate(col("w"), lit(0L), (acc, t) =>
      acc + greatest(lit(1L),
        size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))).cast("long")))
    val sents = greatest(lit(1L),
      size(regexp_extract_all(col("norm"), lit("[.!?]+"), lit(0))).cast("long"))
    withW.select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        sents.as("n_sents"), syl.as("n_syll"))
      .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
        roundN(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sents"))
          - lit(84.6) * (col("n_syll").cast("double") / col("n_words")),
          2).as("flesch"))
  }

  import TextAnalysis.normSql

  private val readabilitySql =
    s"""WITH s AS (SELECT doc_id, $normSql AS norm,
       |             string_split($normSql, ' ') AS w
       |           FROM documents),
       |m AS (SELECT doc_id,
       |        CAST(len(w) AS BIGINT) AS n_words,
       |        greatest(1, CAST(len(regexp_extract_all(norm, '[.!?]+')) AS BIGINT)) AS n_sents,
       |        CAST(list_sum(list_transform(w, t ->
       |          greatest(1, len(regexp_extract_all(t, '[aeiouy]+'))))) AS BIGINT) AS n_syll
       |      FROM s)
       |SELECT doc_id, n_words, n_sents, n_syll,
       |  ${roundNSql(
              "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)" +
              " - 84.6 * (CAST(n_syll AS DOUBLE) / n_words)", 2)} AS flesch
       |FROM m""".stripMargin

  // --------------------------------------------------------------- DP counts

  /** Laplace noise scale b = sensitivity/epsilon = 1/1.0. */
  val DpEpsilon = 1.0

  /** Differentially-private per-(lang, source) release counts via the
    * Laplace mechanism. The noise draw u is derived from md5 of the GROUP
    * KEY so the release is rerun-stable and oracle-checkable (a production
    * release would mix in a per-release secret seed — one extra literal in
    * the digest; the MECHANISM is what the engine provides). Inverse-CDF:
    * noise = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|), with the ln
    * quantized to integer millionths (the engine's fixed-point pattern) so
    * both engines emit bit-identical noise. True counts are kept in an
    * audit column the release step drops. */
  def dpCounts(spark: SparkSession, dir: String): DataFrame =
    dpCountsOf(Tables.documents(spark, dir))

  /** Deterministic Laplace(b) noise derived from md5 of `seed`: 60-bit
    * uniform → inverse CDF, ln quantized to integer millionths so both
    * engines emit bit-identical noise. */
  private def laplaceNoise(seed: org.apache.spark.sql.Column, b: Double) = {
    val h = conv(substring(md5(seed), 1, 15), 16, 10).cast("long")
    val u = h.cast("double") / lit(1152921504606846976.0) // 2^60, exact
    val s = u - lit(0.5)
    val qln = floor(log(lit(1.0) - lit(2.0) * abs(s)) * 1e6 + 0.5) / 1e6
    signum(s) * -qln * lit(b)
  }

  /** The SQL twin of [[laplaceNoise]]. */
  private def laplaceNoiseSql(seedExpr: String, b: String) =
    s"""sign((('0x' || substr(md5($seedExpr), 1, 15))::BIGINT
       |  / 1152921504606846976.0) - 0.5)
       | * -(floor(ln(1.0 - 2.0 * abs((('0x' || substr(md5($seedExpr), 1, 15))::BIGINT
       |  / 1152921504606846976.0) - 0.5)) * 1e6 + 0.5) / 1e6)
       | * $b""".stripMargin.replaceAll("\n", "")

  def dpCountsOf(docs: DataFrame): DataFrame = {
    val noise = laplaceNoise(concat_ws("|", col("lang"), col("source")),
      1.0 / DpEpsilon)
    docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_true"))
      .select(col("lang"), col("source"), col("n_true"),
        roundN(col("n_true") + noise, 4).as("n_released"))
      .orderBy(col("lang"), col("source"))
  }

  private val dpCountsSql =
    s"""WITH g AS (SELECT lang, source, count(*) AS n_true
       |           FROM documents GROUP BY 1, 2),
       |n AS (SELECT lang, source, n_true,
       |        ('0x' || substr(md5(lang || '|' || source), 1, 15))::BIGINT
       |          / 1152921504606846976.0 AS u
       |      FROM g),
       |z AS (SELECT lang, source, n_true, u - 0.5 AS s,
       |        floor(ln(1.0 - 2.0 * abs(u - 0.5)) * 1e6 + 0.5) / 1e6 AS qln
       |      FROM n)
       |SELECT lang, source, n_true,
       |  ${roundNSql(s"n_true + sign(s) * -qln / $DpEpsilon", 4)} AS n_released
       |FROM z ORDER BY lang, source""".stripMargin

  // -------------------------------------------------------------- keyphrases

  /** RAKE caps: phrases longer than this are noise, and capping bounds the
    * per-phrase work; top-k phrases kept per document. */
  val MaxPhraseLen = 4
  val TopPhrases = 3

  /** RAKE-style keyphrase extraction (Rose et al. 2010 — public
    * algorithm): candidate phrases are maximal stopword-free word runs
    * (gaps-and-islands on word positions), each word scores
    * degree/frequency over the candidate-phrase corpus, and a phrase
    * scores the sum of its member word scores. Scores are exact integer
    * micro-units — floor(1e6·degree/freq + 0.5) computed with pure
    * integer arithmetic ((2e6·deg + freq) div (2·freq)) — so the whole
    * pipeline is order-independent and engine-exact.
    *
    * Scale: the islands window and the top-k window are both partitioned
    * BY DOC (never corpus-sized); word stats are one vocab-partitioned
    * groupBy joined back on the word key (the TF-IDF shape). */
  def keyphrases(spark: SparkSession, dir: String): DataFrame =
    keyphrasesOf(Tables.documents(spark, dir))

  def keyphrasesOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = TextAnalysis.withWordsOf(docs)
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val content = words.filter(!col("word").isin(TextAnalysis.stopwords: _*))
    val runW = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // the token-level runs table feeds THREE consumers (phrase assembly,
    // word stats, phrase scoring) — persist the narrow (no phrase
    // strings) projection so the scan→normalize→tokenize→window chain
    // runs once, not per branch (round-6 verdict #4; the wide
    // members-with-phrase variant was A/B'd and lost to cache width)
    val runs = content.withColumn("run", col("pos") - row_number().over(runW))
      .select(col("doc_id"), col("run"), col("pos"), col("word"))
      .persist()
    val phrases = runs.groupBy(col("doc_id"), col("run"))
      .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("word")))),
            s => s.getField("word"))).as("phrase"),
        count(lit(1)).as("n_words"))
      .filter(col("n_words") <= MaxPhraseLen)
    val members = runs.join(phrases, Seq("doc_id", "run"))
    val wordScore = members.groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("degree"))
      .withColumn("score_micro",
        expr("(2000000 * degree + freq) div (2 * freq)"))
      .select(col("word"), col("score_micro"))
    val scored = members.join(wordScore, "word")
      .groupBy(col("doc_id"), col("run"), col("phrase"), col("n_words"))
      .agg(sum(col("score_micro")).as("score_micro"))
      .select(col("doc_id"), col("phrase"), col("n_words"), col("score_micro"))
      .dropDuplicates("doc_id", "phrase") // same phrase text = same score
    val topW = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("phrase"))
    scored.withColumn("rank", row_number().over(topW))
      .filter(col("rank") <= TopPhrases)
      .orderBy(col("doc_id"), col("rank"))
  }

  import TextAnalysis.stopSqlList

  private val keyphrasesSql =
    s"""WITH s AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
       |p0 AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS pos FROM s),
       |wd AS (SELECT doc_id, pos, w[pos] AS word FROM p0 WHERE w[pos] != ''),
       |ct AS (SELECT doc_id, pos, word FROM wd
       |       WHERE NOT list_contains($stopSqlList, word)),
       |r AS (SELECT doc_id, pos, word,
       |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
       |      FROM ct),
       |ph AS (SELECT doc_id, run, string_agg(word, ' ' ORDER BY pos) AS phrase,
       |         count(*) AS n_words
       |       FROM r GROUP BY 1, 2 HAVING count(*) <= $MaxPhraseLen),
       |mem AS (SELECT r.doc_id, r.run, r.word, ph.phrase, ph.n_words
       |        FROM r JOIN ph ON r.doc_id = ph.doc_id AND r.run = ph.run),
       |ws AS (SELECT word,
       |         CAST((2000000 * sum(n_words) + count(*)) // (2 * count(*))
       |           AS BIGINT) AS score_micro
       |       FROM mem GROUP BY 1),
       |psc AS (SELECT doc_id, run, phrase, n_words,
       |          CAST(sum(score_micro) AS BIGINT) AS score_micro
       |        FROM mem JOIN ws USING (word) GROUP BY 1, 2, 3, 4),
       |d AS (SELECT DISTINCT doc_id, phrase, n_words, score_micro FROM psc),
       |rk AS (SELECT doc_id, phrase, n_words, score_micro,
       |         CAST(row_number() OVER (PARTITION BY doc_id
       |           ORDER BY score_micro DESC, phrase) AS INT) AS rank
       |       FROM d)
       |SELECT doc_id, phrase, n_words, score_micro, rank
       |FROM rk WHERE rank <= $TopPhrases
       |ORDER BY doc_id, rank""".stripMargin

  /** Per-user contribution cap for user-level DP. */
  val DpUserCap = 5

  /** User-level DP event-type counts: the contribution-bounding pass a
    * correct user-level guarantee REQUIRES — each user's first
    * [[DpUserCap]] events (by (ts, event_id)) enter the aggregate, so one
    * user can move any released count by at most the cap, and the Laplace
    * scale is cap/ε rather than the unbounded per-user count. The cap is
    * a per-user window (user-bounded partition, never corpus-sized); the
    * counts are one map-side-combinable aggregate; noise is O(types). */
  def dpBoundedCounts(spark: SparkSession, dir: String): DataFrame =
    dpBoundedCountsOf(Tables.events(spark, dir))

  def dpBoundedCountsOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val noise = laplaceNoise(concat(lit("dpb|"), col("event_type")),
      DpUserCap / DpEpsilon)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= DpUserCap)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_capped"))
      .select(col("event_type"), col("n_capped"),
        roundN(col("n_capped") + noise, 4).as("n_released"))
      .orderBy(col("event_type"))
  }

  private val dpBoundedSql =
    s"""WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type
       |           FROM events),
       |c AS (SELECT event_type,
       |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |      FROM e),
       |g AS (SELECT event_type, count(*) AS n_capped
       |      FROM c WHERE rn <= $DpUserCap GROUP BY 1)
       |SELECT event_type, n_capped,
       |  ${roundNSql(
            "n_capped + " + laplaceNoiseSql("'dpb|' || event_type",
              s"${DpUserCap / DpEpsilon}"), 4)} AS n_released
       |FROM g ORDER BY event_type""".stripMargin

  /** Row-level changelog derivation — the INVERSE of `q_cdc_apply`: given
    * two keyed snapshots, emit the (key, op) stream that transforms v1
    * into v2 (insert / update / delete; unchanged rows emit nothing).
    * This is what a warehouse runs when the upstream can only give full
    * dumps but downstream consumers want a CDC feed.
    *
    * Scale shape: both sides project to (key, md5 digest) BEFORE the
    * full-outer join — the `q_dataset_diff` lesson — so only ~48-byte
    * rows shuffle regardless of payload width. */
  def cdcDerive(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    cdcDeriveOf(docs, snapshotOf(docs))
  }

  def cdcDeriveOf(a: DataFrame, b: DataFrame): DataFrame = {
    def sig(df: DataFrame) = df.select(col("doc_id"), md5(col("text")).as("sig"))
    val l = sig(a).alias("a")
    val r = sig(b).alias("b")
    l.join(r, col("a.doc_id") === col("b.doc_id"), "full_outer")
      .select(coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
        when(col("b.doc_id").isNull, "delete")
          .when(col("a.doc_id").isNull, "insert")
          .when(col("a.sig") =!= col("b.sig"), "update").as("op"))
      .filter(col("op").isNotNull)
      .orderBy(col("doc_id"))
  }

  private val cdcDeriveSql =
    """WITH a AS (SELECT doc_id, md5(text) AS sig FROM documents),
      |b AS (SELECT doc_id, md5(CASE WHEN doc_id % 13 = 5 THEN text || ' rev2'
      |                              ELSE text END) AS sig
      |      FROM documents WHERE doc_id % 17 != 3
      |      UNION ALL
      |      SELECT doc_id + 1000000, md5(text)
      |      FROM documents WHERE doc_id % 29 = 7),
      |j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |        CASE WHEN b.doc_id IS NULL THEN 'delete'
      |             WHEN a.doc_id IS NULL THEN 'insert'
      |             WHEN a.sig != b.sig THEN 'update' END AS op
      |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT doc_id, op FROM j WHERE op IS NOT NULL ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- dp-quantile

  /** DP median of per-user purchase spend via the EXPONENTIAL mechanism
    * (McSherry & Talwar 2007) — the right tool where Laplace noise on a
    * count doesn't apply because the output is a VALUE from the data
    * domain: candidates are the distinct per-user spend totals, utility
    * u(v) = −|rank(v) − ⌈n/2⌉| (sensitivity 1 per added/removed user),
    * and the draw from P(v) ∝ exp(ε·u/2) runs as the Gumbel-max trick
    * with md5-derived uniforms — pick argmax(ε·u/2 + g_v),
    * g_v = −ln(−ln u_v) — so the release is deterministic and
    * bit-identical cross-engine: both ln steps quantize to integer
    * millionths (the laplaceNoise recipe), u(v) is an exact integer, and
    * ε·u/2 with ε = 1 is an exact half-integer; ties (measure-zero under
    * md5) break to the smaller value through a max-score equi-join +
    * min, never an engine-specific arg_max.
    *
    * Scale shape: one keyed per-user aggregate; candidates live on the
    * DISTINCT spend-cents histogram (money-domain-bounded — the
    * q_events_gini window class, whitelisted); the argmax is a 1-row
    * grand aggregate broadcast back. */
  def dpQuantile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val spend = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(cents).as("v"))
    val hist = spend.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", sum(col("cnt")).over(Window.orderBy(col("v"))))
    val n1 = broadcast(spend.agg(count(lit(1)).as("n")))
    val h = conv(substring(md5(col("v").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val u = h.cast("double") / lit(1152921504606846976.0) // 2^60, exact
    val qln1 = floor(log(u) * 1e6 + 0.5) / 1e6
    val g = -(floor(log(-qln1) * 1e6 + 0.5) / 1e6)
    val t = expr("(n + 1) div 2")
    val util = -abs(col("rank") - col("t"))
    val scored = hist.crossJoin(n1)
      .withColumn("t", t)
      .withColumn("score", lit(DpEpsilon) * util / lit(2.0) + g)
    val best = broadcast(scored.agg(max(col("score")).as("ms")))
    val pick = scored.crossJoin(best).filter(col("score") === col("ms"))
      .agg(min(col("v")).as("dp_v"), max(col("t")).as("t"), max(col("n")).as("n"))
    val trueMed = broadcast(
      scored.filter(col("rank") >= col("t")).agg(min(col("v")).as("true_v")))
    pick.crossJoin(trueMed)
      .select(col("n"),
        (col("true_v") / 100.0).as("true_median"),
        (col("dp_v") / 100.0).as("dp_median"),
        lit(DpEpsilon).as("epsilon"))
  }

  private val dpQuantileSql =
    s"""WITH sp AS (SELECT user_id,
       |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |hist AS (SELECT v, count(*) AS cnt FROM sp GROUP BY 1),
       |hr AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS rank FROM hist),
       |nn AS (SELECT count(*) AS n FROM sp),
       |sc AS (SELECT v, rank, n, (n + 1) // 2 AS t,
       |         $DpEpsilon * -abs(rank - (n + 1) // 2) / 2.0
       |           + -(floor(ln(-(floor(ln(
       |               ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT
       |                 / 1152921504606846976.0) * 1e6 + 0.5) / 1e6)) * 1e6 + 0.5) / 1e6)
       |           AS score
       |       FROM hr CROSS JOIN nn),
       |best AS (SELECT max(score) AS ms FROM sc),
       |pick AS (SELECT min(v) AS dp_v, max(t) AS t, max(n) AS n
       |         FROM sc CROSS JOIN best WHERE score = ms),
       |tm AS (SELECT min(v) AS true_v FROM sc WHERE rank >= t)
       |SELECT n, true_v / 100.0 AS true_median, dp_v / 100.0 AS dp_median,
       |  CAST($DpEpsilon AS DOUBLE) AS epsilon
       |FROM pick CROSS JOIN tm""".stripMargin

  // ---------------------------------------------------- randomized response

  /** Keep-truth probability of the Warner coin (3/4: md5 byte mod 4 ≠ 0). */
  val RrKeepNum = 3
  val RrKeepDen = 4

  /** Warner randomized response (1965) — LOCAL differential privacy for a
    * sensitive binary attribute, completing the privacy ladder's local
    * side (the dp_* queries add noise centrally; here each USER's record
    * is already perturbed): each user reports their purchaser flag
    * truthfully with probability p = 3/4 and inverted otherwise
    * (ε-LDP with ε = ln(p/(1−p)) = ln 3), and the release debiases the
    * reported rate with π̂ = (r̄ + p − 1)/(2p − 1). The audit row carries
    * the true rate beside the estimate — the spec's accuracy bound is the
    * point of the mechanism.
    *
    * Exactness: the coin is the deterministic md5-byte draw (the arm /
    * dp-noise convention); flags, reports, and counts are exact integers;
    * rates and the debias are one fixed double tree each, quantized to
    * 1e-6. Scale shape: ONE keyed per-user aggregate, then single-row
    * algebra. */
  def randomizedResponse(spark: SparkSession, dir: String): DataFrame = {
    val coin = conv(substring(md5(concat(lit("rr|"),
      col("user_id").cast("string"))), 1, 2), 16, 10).cast("int") % RrKeepDen
    val u = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("f"))
      .select(col("f"),
        when(coin =!= 0, col("f")).otherwise(lit(1L) - col("f")).as("r"))
    val p = RrKeepNum.toDouble / RrKeepDen
    u.agg(count(lit(1)).as("n_users"), sum(col("f")).as("n_true"),
        sum(col("r")).as("n_reported"))
      .select(col("n_users"), col("n_true"), col("n_reported"),
        roundN(col("n_true").cast("double") / col("n_users"), 6).as("true_rate"),
        roundN((col("n_reported").cast("double") / col("n_users") + (p - 1.0))
          / (2.0 * p - 1.0), 6).as("est_rate"))
  }

  private val rrSql = {
    val p = RrKeepNum.toDouble / RrKeepDen
    s"""WITH e AS (SELECT user_id, event_type FROM events),
       |u AS (SELECT user_id,
       |        CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |          AS f
       |      FROM e GROUP BY 1),
       |r AS (SELECT f,
       |        CASE WHEN (('0x' || substr(md5('rr|' || CAST(user_id AS VARCHAR)), 1, 2))::INT
       |               % $RrKeepDen) != 0
       |             THEN f ELSE 1 - f END AS r
       |      FROM u),
       |ag AS (SELECT count(*) AS n_users, CAST(sum(f) AS BIGINT) AS n_true,
       |         CAST(sum(r) AS BIGINT) AS n_reported
       |       FROM r)
       |SELECT n_users, n_true, n_reported,
       |  ${roundNSql("CAST(n_true AS DOUBLE) / n_users", 6)} AS true_rate,
       |  ${roundNSql(
             s"(CAST(n_reported AS DOUBLE) / n_users + ($p - 1.0)) / (2.0 * $p - 1.0)",
             6)} AS est_rate
       |FROM ag""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("q_privacy_randomized_response", randomizedResponse, Some(rrSql)),
    Q("q_privacy_dp_quantile", dpQuantile, Some(dpQuantileSql)),
    Q("q_cdc_derive", cdcDerive, Some(cdcDeriveSql)),
    Q("q_dataset_diff", datasetDiff, Some(datasetDiffSql)),
    Q("q_text_readability", readability, Some(readabilitySql)),
    Q("q_privacy_dp_counts", dpCounts, Some(dpCountsSql)),
    Q("q_privacy_dp_bounded", dpBoundedCounts, Some(dpBoundedSql)),
    Q("q_text_keyphrase", keyphrases, Some(keyphrasesSql)))
}
