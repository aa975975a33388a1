package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mining passes that COMPOSE the engine's existing blocks
  * into the shapes an embedding-model / LLM training pipeline actually
  * ships: contrastive pair mining (hard negatives), cross-split semantic
  * leakage audit, length-bucketed batch assembly, and per-group feature
  * standardization. The reference pipeline has no counterpart — these
  * extend its validate/transform surface to the curation jobs that
  * precede model training (SURVEY.md §2 extension inventory).
  *
  * Scale notes (100 TB):
  *  - Both embedding passes ride the SAME sign-LSH blocking as the ANN
  *    family (Similarity.bucket): candidate pairs only form inside a
  *    bucket, so pair volume is corpus · O(bucket population), never
  *    all-pairs; `planesFor` keeps bucket population constant as the
  *    corpus grows. The per-anchor champion is a bucket-partitioned
  *    window (the TopKPerGroup rewrite turns it into a bounded heap).
  *  - Batch assembly shards each length bucket by a hash byte before the
  *    window, so no single task ever sorts a whole length bucket — the
  *    padding cost of a batch is decided by its bucket ceiling, so
  *    sharding changes batch MEMBERSHIP, not padding efficiency.
  *  - Standardization is one 5-row aggregate broadcast back over the
  *    scan: integer-cents sums (order-independent, exact) feed identical
  *    double math in both engines.
  */
object Mining {

  import Similarity.{NearDupCos, QueryStride}

  /** Contrastive pair mining: for each anchor (every QueryStride-th
    * vector), the best POSITIVE (highest cosine ≥ τ — a near-duplicate,
    * usable as an augmentation positive) and the best HARD NEGATIVE
    * (highest cosine < τ — maximally confusable non-duplicate, the pair
    * that actually teaches a contrastive model). One bucketed candidate
    * join, one role tag, one champion per (anchor, role). */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Similarity.vectors(spark, dir)
      .withColumn("bkt", Similarity.bucket(col("v"))).persist()
    val q = vecs.filter(col("vec_id") % QueryStride === 0).alias("q")
    val c = vecs.alias("c")
    val cand = q.join(c, col("q.bkt") === col("c.bkt") &&
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("anchor_id"), col("c.vec_id").as("cand_id"),
        Similarity.cosine.as("sim"))
      .withColumn("role",
        when(col("sim") >= NearDupCos, "positive").otherwise("hard_negative"))
    val w = Window.partitionBy(col("anchor_id"), col("role"))
      .orderBy(col("sim").desc, col("cand_id"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("role"), col("cand_id"), col("sim"))
      .orderBy(col("anchor_id"), col("role"))
  }

  private val hardNegativesSql =
    s"""WITH v0 AS (${Similarity.vectorsSql}),
       |vecs AS (SELECT vec_id, v, nrm, ${Similarity.bucketSql} AS bkt FROM v0),
       |cand AS (
       |  SELECT q.vec_id AS anchor_id, c.vec_id AS cand_id,
       |    ${Similarity.cosineSql} AS sim
       |  FROM vecs q JOIN vecs c ON q.bkt = c.bkt AND q.vec_id != c.vec_id
       |  WHERE q.vec_id % $QueryStride = 0),
       |t AS (SELECT anchor_id,
       |  CASE WHEN sim >= $NearDupCos THEN 'positive' ELSE 'hard_negative' END AS role,
       |  cand_id, sim FROM cand)
       |SELECT anchor_id, role, cand_id, sim FROM t
       |QUALIFY row_number() OVER (PARTITION BY anchor_id, role
       |  ORDER BY sim DESC, cand_id) = 1
       |ORDER BY anchor_id, role""".stripMargin

  /** Cross-split semantic leakage: eval ("test"-split) vectors whose
    * nearest TRAIN-split neighbor clears the near-dup cosine — the
    * embedding-level sequel to `q_split_leakage_free` (which guards
    * lexical near-dups). Splits use the engine's standard md5-byte gate
    * on the id so both engines assign identically; one row per leaked
    * eval vector with its worst offender. */
  def semanticLeakage(spark: SparkSession, dir: String): DataFrame = {
    val hb = Sampling.hashByteOf(col("vec_id"))
    val vecs = Similarity.vectors(spark, dir)
      .withColumn("bkt", Similarity.bucket(col("v")))
      .withColumn("hb", hb).persist()
    val test = vecs.filter(col("hb") >= 230).alias("q")
    val train = vecs.filter(col("hb") < 205).alias("c")
    val cand = test.join(train, col("q.bkt") === col("c.bkt"))
      .select(col("q.vec_id").as("test_id"), col("c.vec_id").as("train_id"),
        Similarity.cosine.as("sim"))
      .filter(col("sim") >= NearDupCos)
    val w = Window.partitionBy(col("test_id"))
      .orderBy(col("sim").desc, col("train_id"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("test_id"), col("train_id"), col("sim"))
      .orderBy(col("test_id"))
  }

  private val semanticLeakageSql = {
    val hb = Sampling.hashByteSqlOf("vec_id")
    s"""WITH v0 AS (${Similarity.vectorsSql}),
       |vecs AS (SELECT vec_id, v, nrm, ${Similarity.bucketSql} AS bkt,
       |  $hb AS hb FROM v0),
       |cand AS (
       |  SELECT q.vec_id AS test_id, c.vec_id AS train_id,
       |    ${Similarity.cosineSql} AS sim
       |  FROM vecs q JOIN vecs c ON q.bkt = c.bkt
       |  WHERE q.hb >= 230 AND c.hb < 205)
       |SELECT test_id, train_id, sim FROM cand
       |WHERE sim >= $NearDupCos
       |QUALIFY row_number() OVER (PARTITION BY test_id
       |  ORDER BY sim DESC, train_id) = 1
       |ORDER BY test_id""".stripMargin
  }

  /** Length-bucket width and token capacity of one padded training batch. */
  val BucketWidth = 64
  val BatchTokens = 2048
  /** Hash-byte shards per length bucket — bounds every window partition to
    * ~1/NumShards of its bucket so no task sorts a whole bucket. */
  val NumShards = 8

  /** Length-bucketed padded-batch assembly: docs are padded to their
    * bucket ceiling (ceil(n_tokens / 64) · 64), batches take
    * floor(2048 / ceiling) docs each, and the report prices the padding
    * waste per batch. Bucketing is what makes padding cheap: batch
    * members share a ceiling, so waste is (ceiling − n_tokens) summed —
    * vs padding everything to the global max in unbucketed batching. */
  def batchBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = TextAnalysis.withWordsOf(Tables.documents(spark, dir))
      .select(col("doc_id"), size(col("w")).as("n_tokens"))
      .withColumn("bucket_ub",
        (ceil(col("n_tokens").cast("double") / BucketWidth) * BucketWidth).cast("long"))
      .withColumn("shard", Sampling.hashByteOf(col("doc_id")) % NumShards)
    val rowsPerBatch = greatest(lit(1L), floor(lit(BatchTokens) / col("bucket_ub")))
    val w = Window.partitionBy(col("bucket_ub"), col("shard"))
      .orderBy(col("n_tokens"), col("doc_id"))
    docs
      .withColumn("batch_id",
        col("shard") * lit(1000000L) + floor((row_number().over(w) - 1) / rowsPerBatch))
      .groupBy(col("bucket_ub"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .select(col("bucket_ub"), col("batch_id"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket_ub")).as("padded_tokens"),
        (col("n_docs") * col("bucket_ub") - col("sum_tokens")).as("waste_tokens"))
      .orderBy(col("bucket_ub"), col("batch_id"))
  }

  private val batchBucketsSql = {
    val w = "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
    val shard = s"${Sampling.hashByteSqlOf("doc_id")} % $NumShards"
    s"""WITH d AS (SELECT doc_id, len($w) AS n_tokens,
       |  CAST(ceil(CAST(len($w) AS DOUBLE) / $BucketWidth) * $BucketWidth AS BIGINT) AS bucket_ub,
       |  $shard AS shard
       |  FROM documents),
       |a AS (SELECT doc_id, n_tokens, bucket_ub, shard,
       |  shard * 1000000 + CAST(floor(CAST(row_number() OVER (
       |      PARTITION BY bucket_ub, shard ORDER BY n_tokens, doc_id) - 1 AS BIGINT)
       |    / greatest(1, CAST(floor($BatchTokens / bucket_ub) AS BIGINT))) AS BIGINT) AS batch_id
       |  FROM d)
       |SELECT bucket_ub, batch_id, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  count(*) * bucket_ub AS padded_tokens,
       |  CAST(count(*) * bucket_ub - sum(n_tokens) AS BIGINT) AS waste_tokens
       |FROM a GROUP BY 1, 2
       |ORDER BY bucket_ub, batch_id""".stripMargin
  }

  /** Per-segment z-score standardization of customer balances — the
    * feature-scaling pass of a tabular training pipeline as ONE 5-row
    * aggregate broadcast back over the scan. Balances go to integer
    * cents first (floor(x·100 + 0.5)): sums and sums-of-squares are then
    * order-independent BIGINT arithmetic, and both engines run identical
    * double math on identical exact inputs. BIGINT budget: cents² ≈
    * 10¹²/row → safe to ~9·10⁶ rows per segment; beyond that, promote
    * the squared sum to DECIMAL(38,0) on both sides. */
  def zscore(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("c_acctbal") * 100 + 0.5).cast("long")
    val c = Tables.customer(spark, dir).select(
      col("c_custkey"), col("c_mktsegment"), cents.as("cents"))
    val stats = c.groupBy(col("c_mktsegment").as("seg")).agg(
      count(lit(1)).as("n"),
      sum(col("cents")).as("s1"),
      sum(col("cents") * col("cents")).as("s2"))
    val mean = col("s1").cast("double") / col("n")
    val variance = col("s2").cast("double") / col("n") - mean * mean
    val withSd = broadcast(stats.select(col("seg"), mean.as("mu"),
      sqrt(variance).as("sd")))
    c.join(withSd, col("c_mktsegment") === col("seg"))
      .select(col("c_custkey"), col("c_mktsegment"),
        when(col("sd") > 0, roundN((col("cents") - col("mu")) / col("sd"), 6))
          .otherwise(lit(0.0)).as("z"))
  }

  private val zscoreSql =
    s"""WITH c AS (SELECT c_custkey, c_mktsegment,
       |  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents FROM customer),
       |s AS (SELECT c_mktsegment AS seg, count(*) AS n,
       |  sum(cents) AS s1, sum(cents * cents) AS s2 FROM c GROUP BY 1),
       |m AS (SELECT seg,
       |  CAST(s1 AS DOUBLE) / n AS mu,
       |  sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sd
       |  FROM s)
       |SELECT c_custkey, c_mktsegment,
       |  CASE WHEN sd > 0 THEN ${roundNSql("(cents - mu) / sd", 6)}
       |       ELSE 0.0 END AS z
       |FROM c JOIN m ON c_mktsegment = seg""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_embed_hard_negatives", hardNegatives, Some(hardNegativesSql)),
    Q("q_split_semantic_leakage", semanticLeakage, Some(semanticLeakageSql)),
    Q("q_text_batch_buckets", batchBuckets, Some(batchBucketsSql)),
    Q("q_feat_zscore", zscore, Some(zscoreSql)),
  )
}
