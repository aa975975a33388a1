package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable frequency/cardinality SKETCHES beyond KMV (Dedup.kmvBySource)
  * — the fixed-size summaries a 100 TB telemetry plane ships instead of
  * exact tables. Both operators here are DETERMINISTIC (md5-derived hash
  * slots, no RNG), so DuckDB can replay the identical sketch and the
  * driver hash-compares the full result — the same trick that made the
  * KMV and Misra-Gries (TextAnalysis.heavyHitters) entries
  * oracle-checkable.
  *
  * Reference scope: the reference pipeline profiles data with exact
  * groupBy counts only (transform.py's KPI aggregations); sketches are
  * part of the scale extension surface, not a port.
  */
object Sketches {

  // ---------------------------------------------------------------------
  // Count-Min Sketch word frequencies
  // ---------------------------------------------------------------------

  /** Depth (independent hash rows) and width (buckets per row). Sized to
    * the HARNESS vocabulary (31 distinct words at sf0.01) so collisions —
    * the thing the audit exists to measure — actually occur: 31 words
    * into 16 buckets collide by pigeonhole, and depth 4 lets the min
    * recover most exact counts. A production deployment scales W with
    * expected vocabulary (the sketch stays D×W cells regardless of
    * corpus size — that constant-size mergeability is the entire point
    * at 100 TB). */
  val CmsDepth = 4
  val CmsWidth = 16

  private[graft] def cmsBucket(d: Column, word: Column): Column =
    pmod(
      conv(substring(md5(concat(d.cast("string"), lit(":"), word)), 1, 15), 16, 10)
        .cast("long"),
      lit(CmsWidth.toLong))

  private def cmsBucketSql(d: String, word: String): String =
    s"(('0x' || substr(md5(concat(CAST($d AS VARCHAR), ':', $word)), 1, 15))::BIGINT % $CmsWidth)"

  /** Count-Min Sketch of corpus word frequencies + its error audit.
    *
    * Build: exact per-word counts first (one map-side-combinable
    * aggregate), then fan each DISTINCT word out to `CmsDepth` (d, bucket,
    * n) contributions and sum per cell — the fanout is vocabulary-sized,
    * not corpus-sized, and the sketch itself is D×W cells. Query: the
    * exact top-20 words re-estimated from the sketch (min over depth
    * rows), with the CMS one-sided overestimate `over = n_cms - n_exact
    * >= 0` reported per word.
    *
    * 100 TB: the sketch aggregation is a constant-size (2048-cell)
    * map-side-combined reduce over the vocabulary; the estimate join
    * broadcasts the 2048-row sketch. Nothing here scales with corpus
    * size except the initial word count, which every text operator
    * already pays. */
  /** The D×W sketch cells (d, bucket, cnt) for a documents frame —
    * word counts pre-aggregated so the ×D fanout is vocabulary-sized.
    * Shared with the streaming monitor (whose per-batch cells sum to
    * exactly these — CmsMonitorSpec). */
  private[graft] def cmsCellsOf(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(explode(split(TextAnalysis.normText(col("text")), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    wc.select(col("word"), col("n"),
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("d"))
      .select(col("d"), cmsBucket(col("d"), col("word")).as("bucket"), col("n"))
      .groupBy(col("d"), col("bucket")).agg(sum(col("n")).as("cnt"))
  }

  /** Point-estimate a set of words from a cells frame: min over the D
    * depth rows — sketch-sized work (the cells are broadcast). */
  private[graft] def cmsEstimateOf(cells: DataFrame, words: DataFrame): DataFrame =
    words
      .select(col("word"), explode(sequence(lit(0), lit(CmsDepth - 1))).as("d"))
      .withColumn("bucket", cmsBucket(col("d"), col("word")))
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy(col("word"))
      .agg(min(col("cnt")).as("n_cms"))

  def cmsWords(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val wc = docs
      .select(explode(split(TextAnalysis.normText(col("text")), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val top = wc.orderBy(col("n").desc, col("word")).limit(20)
    cmsEstimateOf(cmsCellsOf(docs), top.select(col("word")))
      .join(broadcast(top), "word")
      .select(col("word"), col("n").as("n_exact"), col("n_cms"),
        (col("n_cms") - col("n")).as("over"))
  }

  private val cmsWordsSql =
    s"""WITH w AS (SELECT unnest(string_split(${TextAnalysis.normSql}, ' ')) AS word FROM documents),
       |wc AS (SELECT word, count(*) AS n FROM w GROUP BY word),
       |f AS (SELECT word, n, unnest(range(0, $CmsDepth)) AS d FROM wc),
       |sk AS (SELECT d, ${cmsBucketSql("d", "word")} AS bucket, sum(n) AS cnt
       |       FROM f GROUP BY 1, 2),
       |top AS (SELECT word, n AS n_exact FROM wc ORDER BY n DESC, word LIMIT 20),
       |tf AS (SELECT word, n_exact, unnest(range(0, $CmsDepth)) AS d FROM top),
       |est AS (SELECT tf.word, tf.n_exact, min(sk.cnt) AS n_cms
       |        FROM tf JOIN sk ON sk.d = tf.d
       |          AND sk.bucket = ${cmsBucketSql("tf.d", "tf.word")}
       |        GROUP BY 1, 2)
       |SELECT word, n_exact, CAST(n_cms AS BIGINT) AS n_cms,
       |  CAST(n_cms - n_exact AS BIGINT) AS over FROM est""".stripMargin

  // ---------------------------------------------------------------------
  // KMV set operations across sources
  // ---------------------------------------------------------------------

  /** KMV set algebra over every source pair: union/intersection/Jaccard
    * estimates from the per-source K-minimum-values sketches ALONE — the
    * cross-source overlap profile a corpus registry answers without
    * rescanning either corpus (the sketches are 16 hashes each; the pair
    * join is C(#sources,2) rows of array arithmetic).
    *
    * Estimators (Beyer et al., SIGMOD'07): merge = bottom-K of the two
    * sketch unions (= the KMV sketch of A∪B, since each side's bottom-K
    * bounds the union's bottom-K); est_union = (K-1)/frac(kth);
    * jaccard = |merge ∩ A_kmv ∩ B_kmv| / |merge| (fraction of the union
    * sketch present in both sides); est_inter = jaccard * est_union.
    *
    * 100 TB: the corpus-sized work is the same per-source KMV aggregate
    * kmvBySource already runs; everything after is sketch-sized. */
  def kmvSetOps(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KmvSketch
    val K = KmvSketch.K
    val kmv = udaf(KmvSketch.aggregator)
    val sk = Tables.documents(spark, dir)
      .select(col("source"), md5(TextAnalysis.normText(col("text"))).as("h"))
      .groupBy(col("source")).agg(kmv(col("h")).as("kmv"))
    // Pair generation via a 1-row grand aggregate holding every sketch
    // (sketch table = #sources × K hashes — catalog-sized), then a
    // per-row explode + filter: the non-equi self-join this replaces
    // would plan a multi-row BroadcastNestedLoopJoin, which the
    // PlanTripwireSpec registry guard rejects; a single-row build side
    // is its documented O(n) exception.
    val all = sk.agg(collect_list(struct(col("source"), col("kmv"))).as("others"))
    val pairs = sk.crossJoin(broadcast(all))
      .select(col("source").as("src_a"), col("kmv").as("ka"),
        explode(col("others")).as("o"))
      .filter(col("src_a") < col("o.source"))
      .select(col("src_a"), col("o.source").as("src_b"),
        col("ka"), col("o.kmv").as("kb"))
    val merged = pairs.withColumn("mk",
      slice(array_sort(array_union(col("ka"), col("kb"))), 1, K))
    val frac = conv(substring(element_at(col("mk"), K), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    merged
      .withColumn("n_merge", size(col("mk")))
      .withColumn("est_union",
        when(col("n_merge") < K, col("n_merge").cast("double"))
          .otherwise(lit((K - 1).toDouble) / frac))
      .withColumn("jacc",
        size(array_intersect(array_intersect(col("mk"), col("ka")), col("kb")))
          .cast("double") / col("n_merge"))
      .select(col("src_a"), col("src_b"), col("n_merge").cast("long").as("n_merge"),
        roundN(col("est_union"), 2).as("est_union"),
        roundN(col("jacc"), 4).as("est_jaccard"),
        roundN(col("jacc") * col("est_union"), 2).as("est_intersection"))
  }

  private val kmvSetOpsSql = {
    val K = graft.functions.KmvSketch.K
    s"""WITH h AS (SELECT DISTINCT source, md5(${TextAnalysis.normSql}) AS hash FROM documents),
       |s AS (SELECT source, (list_sort(list(hash)))[1:$K] AS kmv FROM h GROUP BY source),
       |p AS (SELECT a.source AS src_a, b.source AS src_b, a.kmv AS ka, b.kmv AS kb
       |      FROM s a JOIN s b ON a.source < b.source),
       |m AS (SELECT src_a, src_b, ka, kb,
       |        (list_sort(list_distinct(list_concat(ka, kb))))[1:$K] AS mk
       |      FROM p),
       |e AS (SELECT src_a, src_b, len(mk) AS n_merge,
       |        CASE WHEN len(mk) < $K THEN len(mk)::DOUBLE
       |             ELSE ${K - 1}.0 / ((('0x' || substr(mk[$K], 1, 15))::BIGINT) / 1152921504606846976.0)
       |        END AS est_union,
       |        len(list_filter(mk, x -> list_contains(ka, x) AND list_contains(kb, x)))::DOUBLE
       |          / len(mk) AS jacc
       |      FROM m)
       |SELECT src_a, src_b, n_merge,
       |  ${roundNSql("est_union", 2)} AS est_union,
       |  ${roundNSql("jacc", 4)} AS est_jaccard,
       |  ${roundNSql("jacc * est_union", 2)} AS est_intersection
       |FROM e""".stripMargin
  }

  // ---------------------------------------------------------------------
  // KMV temporal rollup: daily partial sketches → weekly merged estimate
  // ---------------------------------------------------------------------

  /** The PARTIAL-SKETCH PERSISTENCE pattern: distinct-user sketches are
    * built once per (day, event_type) — the granularity a telemetry plane
    * materializes — and the weekly figure comes from MERGING the daily
    * sketches (explode + re-aggregate through the same KMV aggregator),
    * never from re-scanning the raw events. Mergeability is exact, not
    * approximate-on-approximate: the k smallest hashes of a union are a
    * subset of the concatenated per-day k-smallest sets, so
    * weekly-from-daily equals a direct weekly sketch bit-for-bit
    * (KmvSketchSpec pins this). The exact count rides along as the audit
    * column; at 100 TB only the sketch path runs, and the raw scan
    * happens once at daily granularity. */
  /** KMV distinct estimate from a sketch column — shared by the batch
    * rollup and the streaming monitor (KmvMonitor) so both publish the
    * identical number from identical state. */
  private[graft] def kmvEstimate(kmvCol: Column): Column = {
    val K = graft.functions.KmvSketch.K
    val frac = conv(substring(element_at(kmvCol, K), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 16^15 = 2^60, exact
    roundN(when(size(kmvCol) < K, size(kmvCol).cast("double"))
      .otherwise(lit((K - 1).toDouble) / frac), 2)
  }

  /** Portable week key over the normalized events `ts` column. */
  private[graft] def weekKey: Column =
    expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7")

  def kmvRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KmvSketch
    val kmv = udaf(KmvSketch.aggregator)
    val K = KmvSketch.K
    val base = Tables.events(spark, dir).select(
      weekKey.as("wk"),
      to_date(col("ts")).as("day"), col("event_type"), col("user_id"),
      md5(col("user_id").cast("string")).as("h"))
    val daily = base.groupBy(col("wk"), col("day"), col("event_type"))
      .agg(kmv(col("h")).as("kmv"))
    val weekly = daily
      .select(col("wk"), col("event_type"), explode(col("kmv")).as("h"))
      .groupBy(col("wk"), col("event_type")).agg(kmv(col("h")).as("kmv"))
    val est = weekly.select(col("wk"), col("event_type"),
      kmvEstimate(col("kmv")).as("est_users"))
    val exact = base.groupBy(col("wk"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, Seq("wk", "event_type")).orderBy(col("wk"), col("event_type"))
  }

  private val kmvRollupSql = {
    val K = graft.functions.KmvSketch.K
    s"""WITH e AS (SELECT date_diff('day', DATE '2024-01-01', ts::DATE) // 7 AS wk,
       |  ts::DATE AS day, event_type, user_id,
       |  md5(CAST(user_id AS VARCHAR)) AS h FROM events),
       |dh AS (SELECT DISTINCT wk, day, event_type, h FROM e),
       |d AS (SELECT wk, day, event_type, (list_sort(list(h)))[1:$K] AS kmv
       |      FROM dh GROUP BY 1, 2, 3),
       |u AS (SELECT wk, event_type, unnest(kmv) AS h FROM d),
       |w AS (SELECT wk, event_type, (list_sort(list(DISTINCT h)))[1:$K] AS kmv
       |      FROM u GROUP BY 1, 2),
       |x AS (SELECT wk, event_type, count(DISTINCT user_id) AS exact_users
       |      FROM e GROUP BY 1, 2)
       |SELECT w.wk, w.event_type,
       |  ${roundNSql(
           s"""CASE WHEN len(kmv) < $K THEN len(kmv)::DOUBLE
              |    ELSE ${K - 1}.0 / ((('0x' || substr(kmv[$K], 1, 15))::BIGINT) / 1152921504606846976.0)
              |  END""".stripMargin, 2)} AS est_users,
       |  exact_users
       |FROM w JOIN x ON w.wk = x.wk AND w.event_type = x.event_type
       |ORDER BY 1, 2""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_sketch_cms", cmsWords, Some(cmsWordsSql)),
    Q("q_sketch_kmv_setops", kmvSetOps, Some(kmvSetOpsSql)),
    Q("q_sketch_kmv_rollup", kmvRollup, Some(kmvRollupSql)),
  )
}
