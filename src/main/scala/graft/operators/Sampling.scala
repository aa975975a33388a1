package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment — the selection operators a
  * training-data pipeline runs before anything else.
  *
  * All selections key off `md5(doc_id)` rather than an RNG: reproducible
  * across engines (oracle-checkable), across reruns, and across cluster
  * sizes — `sample()`'s per-partition RNG gives a different corpus every
  * time the partitioning changes, which is poison for dataset lineage.
  * Narrow per-row maps: no shuffle, scales linearly with input splits.
  */
object Sampling {

  /** Hash of an id's md5 first byte as an integer 0..255. */
  private[operators] def hashByteOf(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 2), 16, 10).cast("int")
  private def hashByte = hashByteOf(col("doc_id"))
  private[operators] def hashByteSqlOf(expr: String) =
    s"('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 2))::INT"
  private[operators] val hashByteSql = hashByteSqlOf("doc_id")

  /** The split CASE expression over an id, shared with the contamination
    * and leakage-free-split oracles. */
  private[operators] def splitCaseSqlOf(expr: String) =
    s"""CASE WHEN ${hashByteSqlOf(expr)} < 205 THEN 'train'
       |     WHEN ${hashByteSqlOf(expr)} < 230 THEN 'val'
       |     ELSE 'test' END""".stripMargin
  private[operators] val splitCaseSql = splitCaseSqlOf("doc_id")

  /** The split CASE as a Column, keyed on an arbitrary id column. */
  private[operators] def splitCaseOf(c: org.apache.spark.sql.Column) = {
    val hb = hashByteOf(c)
    when(hb < 205, "train").when(hb < 230, "val").otherwise("test")
  }

  /** Deterministic ~1/16 sample: md5 first byte < 16. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("hb", hashByte)
      .filter(col("hb") < 16)
      .select(col("doc_id"), col("lang"), col("source"))

  /** Train/val/test ≈ 80/10/10 split, stable under resharding/reruns. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("hb", hashByte)
      .select(col("doc_id"),
        when(col("hb") < 205, "train")
          .when(col("hb") < 230, "val")
          .otherwise("test").as("split"))

  /** Stratified (per-source) sampling: each source gets its own keep-rate,
    * derived here from the source id's hash (16..128 of 256) — the corpus
    * rebalancing pass (downweight crawl, upweight books) as one narrow
    * filter; rates in a real run come from a config map, same plan. */
  private def sourceThreshold =
    (conv(substring(md5(col("source")), 1, 2), 16, 10).cast("int") % 113) + 16
  private val sourceThresholdSql =
    "(('0x' || substr(md5(source), 1, 2))::INT % 113) + 16"

  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("hb", hashByte)
      .filter(col("hb") < sourceThreshold)
      .select(col("doc_id"), col("source"))

  /** Temperature-2 language rebalancing — the multinomial
    * mixture-flattening step of multilingual corpus assembly (upweight
    * rare languages relative to the dominant one; same pattern keys on any
    * group column). Target distribution q_s ∝ w_s^(1/T); with T = 2
    * the downsample-only keep rate reduces to rate_s = sqrt(n_min / n_s)
    * (rarest source kept whole) — derived entirely from exact integer
    * counts through correctly-rounded sqrt/division, so both engines
    * compute bit-identical rates with NO order-dependent float sum at all.
    * Per-doc selection is the same md5-byte gate as every sampler here:
    * keep iff hash_byte < floor(rate·256 + 0.5).
    * Scale: one count aggregation + a broadcast of per-source rates + a
    * narrow filter — no corpus shuffle. */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
    val rates = counts.crossJoin(broadcast(counts.agg(min(col("n_s")).as("n_min"))))
      .select(col("lang"),
        floor(sqrt(col("n_min").cast("double") / col("n_s")) * 256 + 0.5)
          .cast("int").as("thresh"))
    Tables.documents(spark, dir)
      .join(broadcast(rates), "lang")
      .filter(hashByte < col("thresh"))
      .select(col("doc_id"), col("lang"))
  }

  private val sampleTemperatureSql =
    s"""WITH c AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
       |r AS (SELECT lang,
       |        CAST(floor(sqrt(CAST((SELECT min(n_s) FROM c) AS DOUBLE) / n_s) * 256 + 0.5) AS INT) AS thresh
       |      FROM c)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN r USING (lang)
       |WHERE $hashByteSql < r.thresh""".stripMargin

  /** Per-source token-budget capping — "take documents per source until
    * the budget is spent": deterministic doc order (id) per source, exact
    * integer running sum of n_chars, keep while the INCLUSIVE prefix sum
    * fits. One hash exchange on source + a linear window pass — the same
    * shape as the as-of join; no global sort. */
  val SourceCharBudget = 5000L

  def sampleTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        sum(col("n_chars")).over(w).as("cum_chars"))
      .filter(col("cum_chars") <= SourceCharBudget)
  }

  private val sampleTokenBudgetSql =
    s"""SELECT doc_id, source, n_chars,
       |  CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars
       |FROM documents
       |QUALIFY cum_chars <= $SourceCharBudget""".stripMargin

  /** Quality-weighted (importance) downsampling: keep each doc with
    * probability proportional to a quality weight — here length-derived,
    * `w = min(1, n_chars/400)` — by comparing a per-doc uniform
    * (16 hash bits → u ∈ [0,1), exact dyadic double) against w. The
    * training-data move for "keep more of the good stuff" without an RNG:
    * stable under resharding, reruns, and cluster-size changes, same as
    * every sampler here. Narrow per-row filter — scan-speed at any SF. */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("u",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("double") / 65536.0)
      .withColumn("w", least(lit(1.0), col("n_chars").cast("double") / 400.0))
      .filter(col("u") < col("w"))
      .select(col("doc_id"), col("source"), col("n_chars"))

  private val sampleWeightedSql =
    """SELECT doc_id, source, n_chars
      |FROM documents
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT AS DOUBLE) / 65536.0
      |      < least(1.0, CAST(n_chars AS DOUBLE) / 400.0)""".stripMargin

  /** Epoch-style mixture materialization — the "source weights > 1" half
    * of corpus mixing that [[sampleTemperature]]'s downsample-only gate
    * cannot express: a target rate of e.g. 3.25× means every doc appears
    * 3 times plus a 25% chance of a 4th, the way LLM data recipes
    * up-weight small high-quality sources (books ×N) against a large
    * crawl. Rates here derive deterministically from the source id's hash
    * (quarter-unit steps in [0.75, 3.5]; a real run reads them from a
    * config map — same plan), and the fractional copy uses the same
    * md5-byte gate as every sampler in this file. The repeat itself is
    * `explode(sequence(1, copies))` — a narrow per-row generator, no
    * shuffle, output ∝ Σ rates · rows, so the plan is scan-shaped at any
    * corpus size; the `epoch` ordinal lets downstream shuffles (packing,
    * splits) treat copies as distinct rows deterministically. */
  def sampleEpochs(spark: SparkSession, dir: String): DataFrame = {
    val q = (hashByteOf(col("source")) % 12) + 3 // quarter-units: 0.75x .. 3.5x
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), q.as("q"), hashByte.as("hb"))
      .select(col("doc_id"), col("source"),
        (expr("q div 4").cast("int") +
          when(col("hb") < (col("q") % 4) * 64, 1).otherwise(0)).as("copies"))
      .filter(col("copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("copies"))).as("ep"))
      .select(col("doc_id"), col("source"), col("ep").cast("long").as("epoch"))
  }

  private val sampleEpochsSql =
    s"""WITH d AS (SELECT doc_id, source,
       |    ((${hashByteSqlOf("source")} % 12) + 3) AS q,
       |    $hashByteSql AS hb FROM documents),
       |c AS (SELECT doc_id, source,
       |        (q // 4) + CASE WHEN hb < (q % 4) * 64 THEN 1 ELSE 0 END AS copies
       |      FROM d)
       |SELECT doc_id, source, unnest(range(1, copies + 1)) AS epoch FROM c""".stripMargin

  /** Exactly-k-per-source uniform sample (deterministic reservoir): rank
    * docs inside each source by a 32-bit md5 prefix of the doc id — a
    * uniform permutation, so "rank ≤ k" IS a uniform k-without-replacement
    * draw — and keep min(k, n). Unlike the rate-based samplers above this
    * guarantees the sample SIZE (eval panels, human-review batches).
    * Catalyst rewrites the rank filter to WindowGroupLimit, so each
    * partition keeps a bounded k-heap per source — one shuffle on source,
    * no global sort, skewed sources cost O(rows) scan + O(k) state. */
  val ReservoirK = 5

  def sampleReservoir(spark: SparkSession, dir: String): DataFrame = {
    val rankKey = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(rankKey.asc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), row_number().over(w).as("draw"))
      .filter(col("draw") <= ReservoirK)
  }

  private val sampleReservoirSql =
    s"""SELECT doc_id, source,
       |  CAST(row_number() OVER (PARTITION BY source
       |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id)
       |    AS INT) AS draw
       |FROM documents
       |QUALIFY draw <= $ReservoirK""".stripMargin

  /** Global training-order shuffle + sharding: the LAST step of a data
    * pipeline — fix the order examples are consumed in, deterministically,
    * and split it into N equal shards for the data loader. shard =
    * hash(doc_id) mod N; position within shard = rank of a SECOND,
    * longer hash (md5 prefix disjoint from the shard bits — reusing the
    * shard hash would sort each shard by its own bucket residue, which is
    * constant, i.e. no shuffle at all).
    *
    * Scale: one exchange on (shard) then a per-shard sort of corpus/N
    * rows — the minimum possible work for a MATERIALIZED total order.
    * The order key is a uniform hash, so shards are balanced by
    * construction (no skew salting needed) and the per-shard sort
    * spills gracefully. Rerun-stable: no rand(), no
    * monotonically_increasing_id — the order is a pure function of
    * doc_ids, so a rerun, a reshard upstream, or a different partition
    * count reproduces byte-identical shards (the lineage property the
    * scaladoc at the top of this file exists for). */
  val ShuffleShards = 8

  def shardShuffle(spark: SparkSession, dir: String): DataFrame = {
    val shard = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("int"), lit(ShuffleShards))
    val orderKey = conv(substring(md5(col("doc_id").cast("string")), 7, 8), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("ok").asc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("doc_id"), shard.as("shard"), orderKey.as("ok"))
      .select(col("doc_id"), col("shard"), row_number().over(w).as("pos"))
  }

  private val shardShuffleSql =
    s"""SELECT doc_id,
       |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::INT % $ShuffleShards AS shard,
       |  CAST(row_number() OVER (
       |    PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::INT % $ShuffleShards
       |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 7, 8))::BIGINT, doc_id)
       |    AS INT) AS pos
       |FROM documents""".stripMargin

  /** Sqrt-weighted source MIXTURE — the canonical LLM data-mixing move
    * (The Pile / LLaMA recipes, public papers): rebalance sources toward
    * uniform by sampling each at rate ∝ sqrt(1/n_s), i.e. target tokens
    * ∝ sqrt(n_s). Unlike `sampleEpochs` (whose per-source rates are
    * arbitrary hash-derived constants) the rates here are DERIVED FROM
    * CORPUS STATISTICS, which is what a real mixture pass does.
    *
    * Determinism contract: rate_s = sqrt(n_max / n_s) — a ratio of two
    * counts, largest source pinned to 1.0. Deliberately NOT the
    * normalized-weights form (rate ∝ sqrt(n_s)/Σ sqrt(n_s)): a float SUM
    * over sources would make the result depend on aggregation order and
    * break the cross-engine hash check; sqrt and division are
    * correctly-rounded IEEE in both engines, so this form is exact.
    * Small sources get floor(rate) full epochs plus a hash-gated
    * fractional epoch (the `sampleEpochs` repeat machinery).
    *
    * Scale: a source-count aggregate, a 1-row max, a broadcast rate join,
    * and a bounded per-row fanout (≤ ceil(max rate)) — scan-speed; no
    * corpus-sized shuffle at any size. */
  def mixSqrt(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
    val rates = counts.crossJoin(broadcast(counts.agg(max(col("n_s")).as("n_max"))))
      .select(col("lang"),
        sqrt(col("n_max").cast("double") / col("n_s").cast("double")).as("rate"))
    Tables.documents(spark, dir)
      .join(broadcast(rates), "lang")
      .select(col("doc_id"), col("lang"),
        (floor(col("rate")).cast("int") +
          when(hashByte <
            floor((col("rate") - floor(col("rate"))) * 256 + 0.5).cast("int"), 1)
            .otherwise(0)).as("copies"))
      .filter(col("copies") > 0)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1), col("copies"))).as("ep"))
      .select(col("doc_id"), col("lang"), col("ep").cast("long").as("epoch"))
  }

  private val mixSqrtSql =
    s"""WITH c AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
       |r AS (SELECT lang,
       |        sqrt(CAST((SELECT max(n_s) FROM c) AS DOUBLE) / CAST(n_s AS DOUBLE)) AS rate
       |      FROM c),
       |d AS (SELECT doc_id, documents.lang,
       |        CAST(floor(rate) AS INT)
       |          + CASE WHEN $hashByteSql
       |                   < CAST(floor((rate - floor(rate)) * 256 + 0.5) AS INT)
       |                 THEN 1 ELSE 0 END AS copies
       |      FROM documents JOIN r USING (lang))
       |SELECT doc_id, lang, unnest(range(1, copies + 1)) AS epoch
       |FROM d WHERE copies > 0""".stripMargin

  /** Total sample budget for the Neyman allocation report. */
  val NeymanBudget = 10000L

  /** Neyman (optimal stratified) sample allocation across sources:
    * allocate the budget ∝ N_h·σ_h so high-variance strata get more
    * samples. With population variance σ² = (n·Σx² − (Σx)²)/n², the
    * weight N_h·σ_h collapses to EXACTLY sqrt(SS_h) where
    * SS_h = n·Σx² − (Σx)² — pure integer sums of n_chars per stratum, so
    * the only float ops are one correctly-rounded sqrt per stratum and the
    * final budget share. The stratum weights are quantized to integer
    * micro BEFORE the normalizing sum (the mix_sqrt lesson: a float sum
    * over strata would be aggregation-order-dependent), so both engines
    * share one exact integer denominator.
    *
    * Overflow budget: n·Σx² stays under 2^63 to ~1e8 docs × 10k chars per
    * stratum; past that, lift the sums to DECIMAL(38,0) on both sides. */
  def sampleNeyman(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      .withColumn("ss", col("n_docs") * col("sxx") - col("sx") * col("sx"))
      .withColumn("w_micro",
        floor(sqrt(col("ss").cast("double")) * 1e6 + 0.5).cast("long"))
    val total = broadcast(perSource.agg(sum(col("w_micro")).as("w_total")))
    perSource.crossJoin(total)
      .select(col("source"), col("n_docs"), col("ss"), col("w_micro"),
        floor(lit(NeymanBudget) * col("w_micro").cast("double")
          / col("w_total") + 0.5).cast("long").as("alloc"))
      .orderBy(col("source"))
  }

  private val sampleNeymanSql =
    s"""WITH s AS (SELECT source, count(*) AS n_docs,
       |             CAST(sum(n_chars) AS BIGINT) AS sx,
       |             CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
       |           FROM documents GROUP BY 1),
       |w AS (SELECT source, n_docs, n_docs * sxx - sx * sx AS ss,
       |        CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)) * 1e6 + 0.5)
       |          AS BIGINT) AS w_micro
       |      FROM s),
       |t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS w_total FROM w)
       |SELECT source, n_docs, ss, w_micro,
       |  CAST(floor($NeymanBudget * CAST(w_micro AS DOUBLE) / w_total + 0.5)
       |    AS BIGINT) AS alloc
       |FROM w CROSS JOIN t ORDER BY source""".stripMargin

  /** Difficulty-ordered curriculum stages: each document's difficulty is
    * its mean word length in exact integer micro-units, and stage 1..5 is
    * its difficulty quintile — computed with the SAME broadcast-cutpoint
    * exact-ntile machinery as RFM ([[Events.ntileByCutpoints]]): histogram
    * + cumulative over DISTINCT difficulty values (domain-bounded), never
    * an unpartitioned corpus sort. Stage manifests then feed training in
    * easy→hard order. */
  def sampleCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id").as("user_id"), // ntileByCutpoints ties on user_id
        expr("""(2000000 * length(replace(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ', ''))
               | + array_size(split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')))
               | div (2 * array_size(split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')))"""
          .stripMargin.replaceAll("\n", "")).as("difficulty_micro"))
      .localCheckpoint()
    val n = perDoc.count()
    Events.ntileByCutpoints(perDoc, col("difficulty_micro"), n, "stage")
      .select(col("user_id").as("doc_id"), col("difficulty_micro"), col("stage"))
      .orderBy(col("doc_id"))
  }

  private val sampleCurriculumSql =
    s"""WITH d AS (SELECT doc_id,
       |  (2000000 * length(replace(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ', ''))
       |     + len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')))
       |   // (2 * len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')))
       |   AS difficulty_micro
       |  FROM documents)
       |SELECT doc_id, CAST(difficulty_micro AS BIGINT) AS difficulty_micro,
       |  CAST(ntile(5) OVER (ORDER BY difficulty_micro, doc_id) AS INT) AS stage
       |FROM d ORDER BY doc_id""".stripMargin

  /** Class-balanced downsampling — equalize the language mix for
    * classifier training: every class keeps ~min-class-count docs via a
    * per-class md5 16-bit gate with an INTEGER threshold
    * floor(m·65536/n_class) (no float rate, so the gate is bit-identical
    * in both engines and rerun-stable). The class-threshold table is a
    * groups-sized broadcast; selection is a narrow per-row compare.
    * Output is the per-class audit (kept counts converge to the min
    * class as n grows; the hash gate makes small-class kept ≈ m, not
    * exactly m — documented estimator behavior, same rows both engines). */
  def sampleBalanced(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val minC = counts.agg(min(col("n_total")).as("m"))
    val thr = counts.crossJoin(broadcast(minC))
      .select(col("lang"), col("n_total"),
        floor(col("m") * 65536 / col("n_total")).cast("long").as("thr"))
    val h16 = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long")
    docs.select(col("lang"), h16.as("h"))
      .join(broadcast(thr), "lang")
      .groupBy(col("lang"))
      .agg(max(col("n_total")).as("n_total"),
        sum(when(col("h") < col("thr"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  private val sampleBalancedSql =
    """WITH c AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
      |m AS (SELECT min(n_total) AS m FROM c),
      |t AS (SELECT lang, n_total,
      |        CAST(floor(m * 65536 / n_total) AS BIGINT) AS thr
      |      FROM c CROSS JOIN m),
      |d AS (SELECT lang,
      |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS h
      |      FROM documents)
      |SELECT lang, max(n_total) AS n_total,
      |  CAST(sum(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM d JOIN t USING (lang)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Exactly-k weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis '06, public): each doc draws the deterministic uniform
    * u ∈ (0,1) from its md5 16-bit hash and is ranked by the A-ES key
    * u^(1/w) — the global top-k under that key is a weight-proportional
    * fixed-budget subset, the piece [[sampleWeighted]]'s per-row
    * Bernoulli gate (random-size output) cannot give.
    *
    * Scale: the key is a narrow per-row expression and the top-k is
    * ORDER BY + LIMIT, which Spark plans as TakeOrderedAndProject —
    * per-partition bounded heaps + a k-row driver merge, never a global
    * sort. Exactness: ordering by u^(1/w) ≡ ordering by ln(u)/w
    * (monotone); the key quantizes to floor(ln(u)/w · 1e12) so the
    * cross-engine libm-ulp hazard on ln is confined to a ±1 integer
    * flip, which changes the selected SET only if another key lands in
    * the same 1e-12 cell (tie-broken by doc_id; ~k·1e-12 probability). */
  val AesK = 100

  def sampleAes(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("double") + 1.0) / 65537.0
    val keyMu = floor(log(u) / col("n_chars").cast("double") * 1e12).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"), keyMu.as("key_mu"))
      .orderBy(col("key_mu").desc, col("doc_id"))
      .limit(AesK)
  }

  private val sampleAesSql =
    s"""SELECT doc_id, source, n_chars,
       |  CAST(floor(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT AS DOUBLE) + 1.0) / 65537.0)
       |    / CAST(n_chars AS DOUBLE) * 1e12) AS BIGINT) AS key_mu
       |FROM documents
       |ORDER BY key_mu DESC, doc_id
       |LIMIT $AesK""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_sample_aes", sampleAes, Some(sampleAesSql)),
    Q("q_sample_balanced", sampleBalanced, Some(sampleBalancedSql)),
    Q("q_sample_neyman", sampleNeyman, Some(sampleNeymanSql)),
    Q("q_sample_curriculum", sampleCurriculum, Some(sampleCurriculumSql)),
    Q("q_mix_sqrt", mixSqrt, Some(mixSqrtSql)),
    Q("q_shard_shuffle", shardShuffle, Some(shardShuffleSql)),
    Q("q_sample_reservoir", sampleReservoir, Some(sampleReservoirSql)),
    Q("q_sample_epochs", sampleEpochs, Some(sampleEpochsSql)),
    Q("q_sample_weighted", sampleWeighted, Some(sampleWeightedSql)),
    Q("q_sample_temperature", sampleTemperature, Some(sampleTemperatureSql)),
    Q("q_sample_token_budget", sampleTokenBudget, Some(sampleTokenBudgetSql)),
    Q("q_sample_stratified", sampleStratified, Some(
      s"""SELECT doc_id, source FROM documents
         |WHERE $hashByteSql < $sourceThresholdSql""".stripMargin)),
    Q("q_sample_hash", sampleHash, Some(
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE $hashByteSql < 16""".stripMargin)),
    Q("q_split_assign", splitAssign, Some(
      s"""SELECT doc_id, $splitCaseSql AS split
         |FROM documents""".stripMargin)),
  )
}
