package graft.operators

import graft.Q
import graft.functions.Rounding.{roundN, roundNSql}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan-family operators (SURVEY.md §2.1 S1/S2) and the describe-style
  * summary statistics (A9, reference notebook cell 9).
  *
  * The reference reads CSV with explicit schemas — one single-file table
  * and two folder-of-parts tables (validate.py:78-84). The harness testdata
  * is parquet, so the CSV scans are exercised against deterministic CSV
  * fixtures derived once from the parquet tables (exact-roundtrip columns
  * only: integers, strings, dates) and compared to the parquet via the
  * oracle — proving the CSV path reads the same relation.
  *
  * Scale notes: explicit schema means zero inference scans; the multifile
  * read is one FileScan over a glob (Spark packs small files into splits by
  * maxPartitionBytes). Summary stats avoid two engine-specific reducers
  * (avg/stddev accumulate in implementation-defined order): they are
  * derived from EXACT integer sums (count/sum/sumsq/min/max — one
  * map-side-combined pass) with the float division done identically in both
  * engines, so results are bit-reproducible — the same trick a 100 TB
  * profiler uses to make partial aggregation order-insensitive.
  */
object Scans {

  private val partCsvSchema = StructType(Seq(
    StructField("p_partkey", LongType), StructField("p_name", StringType),
    StructField("p_brand", StringType), StructField("p_type", StringType),
    StructField("p_size", IntegerType)))

  private val ordersCsvSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_orderpriority", StringType),
    StructField("order_date", DateType)))

  /** Derive the CSV fixtures for one sf dir (idempotent, marker-guarded). */
  private def ensureFixtures(spark: SparkSession, dir: String): String = synchronized {
    val fd = s"/root/repo/target/fixtures/${new java.io.File(dir).getName}"
    val marker = new java.io.File(s"$fd/_READY")
    if (!marker.exists()) {
      Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(s"$fd/part_csv")
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), to_date(col("o_orderdate")).as("order_date"))
        .repartition(6) // six part files, like the reference's orders/ folder
        .write.mode("overwrite").option("header", "true").csv(s"$fd/orders_csv")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    fd
  }

  /** Hive-partitioned parquet fixture: documents laid out by `source`
    * (idempotent, marker-guarded — same contract as the CSV fixtures). */
  private def ensurePartitionedDocs(spark: SparkSession, dir: String): String =
    synchronized {
      val fd = s"/root/repo/target/fixtures/${new java.io.File(dir).getName}/docs_by_source"
      val marker = new java.io.File(s"$fd/_READY")
      if (!marker.exists()) {
        Tables.documents(spark, dir)
          .write.mode("overwrite").partitionBy("source").parquet(fd)
        new java.io.File(s"$fd/_READY").createNewFile()
      }
      fd
    }

  /** JSON-lines + ORC fixtures of the supplier table (idempotent,
    * marker-guarded): the remaining cells of the source-format matrix
    * (CSV, parquet, hive-partitioned parquet, DataSource V2 are covered
    * elsewhere). Doubles round-trip JSON exactly (Spark writes shortest
    * decimal, reads it back to the identical double), and the oracle
    * reads the ORIGINAL parquet — so the check proves the format
    * round-trip, not just the scan. */
  private def ensureFormatFixtures(spark: SparkSession, dir: String): String =
    synchronized {
      val fd = s"/root/repo/target/fixtures/${new java.io.File(dir).getName}/formats"
      val marker = new java.io.File(s"$fd/_READY")
      if (!marker.exists()) {
        Tables.supplier(spark, dir).write.mode("overwrite").json(s"$fd/supplier_json")
        Tables.supplier(spark, dir).write.mode("overwrite").orc(s"$fd/supplier_orc")
        new java.io.File(fd, "_READY").createNewFile()
      }
      fd
    }

  private val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType), StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))

  def scanJson(spark: SparkSession, dir: String): DataFrame = {
    val fd = ensureFormatFixtures(spark, dir)
    spark.read.schema(supplierSchema).json(s"$fd/supplier_json")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
  }

  def scanOrc(spark: SparkSession, dir: String): DataFrame = {
    val fd = ensureFormatFixtures(spark, dir)
    spark.read.orc(s"$fd/supplier_orc")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
  }

  private val supplierSql =
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"

  /** Partition-pruned scan over a hive layout: the `source = 'src7'`
    * predicate resolves against DIRECTORY NAMES, so the scan plans
    * PartitionFilters (not PushedFilters) and never opens the other 19
    * sources' files — the layout move that turns a 100 TB corpus scan
    * into a 5 TB one. PartitionPruningSpec asserts the plan reads exactly
    * one directory; the oracle recomputes from the unpartitioned table. */
  def scanPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val fd = ensurePartitionedDocs(spark, dir)
    spark.read.parquet(fd)
      .filter(col("source") === "src7")
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  private val scanPartitionedSql =
    "SELECT doc_id, lang, n_chars FROM documents WHERE source = 'src7'"

  /** S1: single-file CSV scan, explicit schema, header (validate.py:78). */
  def scanSchema(spark: SparkSession, dir: String): DataFrame = {
    val fd = ensureFixtures(spark, dir)
    spark.read.schema(partCsvSchema).option("header", "true").csv(s"$fd/part_csv")
  }

  /** S2: folder-of-part-files CSV scan as one table (validate.py:81,84). */
  def scanMultifile(spark: SparkSession, dir: String): DataFrame = {
    val fd = ensureFixtures(spark, dir)
    spark.read.schema(ordersCsvSchema).option("header", "true").csv(s"$fd/orders_csv")
  }

  /** A9: describe()-style per-group summary stats from exact integer sums. */
  def summaryStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"), sum(col("q")).as("sum_qty"),
        min(col("q")).as("min_qty"), max(col("q")).as("max_qty"),
        sum(col("q") * col("q")).as("sumsq"))
      .select(
        col("l_returnflag"), col("n_rows"), col("sum_qty"), col("min_qty"), col("max_qty"),
        (col("sum_qty").cast("double") / col("n_rows")).as("avg_qty"),
        sqrt((col("sumsq") - col("sum_qty").cast("double") * col("sum_qty") / col("n_rows"))
          / (col("n_rows") - 1)).as("std_qty"))

  /** EXACT quantiles per group without a per-group sort — the scale path
    * for discrete-valued measures: build the (group, value) HISTOGRAM (one
    * map-side-combinable aggregate; the shuffle carries distinct values,
    * not rows), running-sum it per group (window input is histogram-sized),
    * and pick each quantile as the smallest value whose cumulative count
    * reaches ceil(q·n) — a conditional-min aggregate. Memory is
    * O(distinct values per group) instead of `percentile`'s O(rows per
    * group); for 2-decimal money the domain is bounded by construction.
    * The oracle recomputes the same type-1 ceil(q·n) convention through
    * an explicit DuckDB cumulative-histogram formulation (pinned, not
    * fixture-dependent — see quantilesHistSql). Registered as the
    * UNQUALIFIED q_stats_quantiles: the scale-safe form is the default;
    * the per-group-sort interpolated form is the _sorted variant. */
  def quantilesHist(spark: SparkSession, dir: String): DataFrame =
    type1CentsQuantiles(
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"),
          roundN(col("l_extendedprice") * 100, 0).cast("long").as("cents")))

  /** The histogram-cumulative type-1 pick, factored out so the convention
    * is unit-testable on constructed small groups (where type-1's
    * ceil(q·n) and other discrete conventions pick different elements —
    * e.g. n=2, q=0.75). Input: (l_returnflag, cents). */
  /** Brown–Forsythe (median-centered Levene) test of variance
    * homogeneity across the event types — the "may I pool variances"
    * gate in front of the t-test family. z_ij = |cents − median_type|
    * with the medians from the group-partitioned DISTINCT-cents
    * histogram (the q_stats_mad machinery); W from the per-group
    * (n, Σz, Σz²) sufficient statistics —
    * W = ((N−k)/(k−1)) · SSB/SSW. Σz² rides DECIMAL(38,0) on the
    * engine side (HUGEINT in the oracle) so the sum is exact far past
    * the BIGINT budget; per-group Σz casts to DOUBLE before squaring
    * (the q_stats_welch rule). Degenerate (SSW = 0 or k < 2) → NULL. */
  def levene(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val vals = Tables.events(spark, dir)
      .select(col("event_type"), cents.as("c")).persist()
    val byT = Window.partitionBy(col("event_type"))
    val med = vals.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byT.orderBy(col("c"))))
      .withColumn("n", sum(col("cnt")).over(byT))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("c"))).as("med"))
    val z = vals.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("c") - col("med")).as("z"))
    val g = z.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("z")).as("sz"),
      sum(col("z").cast("decimal(38,0)") * col("z").cast("decimal(38,0)")).as("sz2"))
    val a = g.agg(
      count(lit(1)).as("k"), sum(col("n")).as("nt"), sum(col("sz")).as("szt"),
      sum(col("sz2").cast("double")).as("ssq"),
      sum(col("sz").cast("double") * col("sz").cast("double") / col("n")).as("sbn"),
      sum(col("sz2").cast("double") -
        col("sz").cast("double") * col("sz").cast("double") / col("n")).as("ssw"))
    val ssb = col("sbn") - col("szt").cast("double") * col("szt").cast("double") / col("nt")
    a.select(col("k"), col("nt").as("n_total"),
      when(col("k") < 2L || col("ssw") <= 0.0, lit(null).cast("double"))
        .otherwise(roundN(
          ((col("nt") - col("k")).cast("double") / (col("k") - lit(1L)).cast("double")) *
            (ssb / col("ssw")), 6)).as("w"))
  }

  private val leveneSql =
    s"""WITH e AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |           FROM events),
       |h AS (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2),
       |cu AS (SELECT event_type, c,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
       |         sum(cnt) OVER (PARTITION BY event_type) AS n
       |       FROM h),
       |med AS (SELECT event_type,
       |          min(CASE WHEN cum >= ceil(0.5 * n) THEN c END) AS med
       |        FROM cu GROUP BY 1),
       |z AS (SELECT e.event_type, abs(e.c - med.med) AS z
       |      FROM e JOIN med USING (event_type)),
       |g AS (SELECT event_type, count(*) AS n, CAST(sum(z) AS BIGINT) AS sz,
       |        sum(z * z) AS sz2
       |      FROM z GROUP BY 1),
       |a AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nt,
       |        CAST(sum(sz) AS BIGINT) AS szt,
       |        sum(CAST(sz2 AS DOUBLE)) AS ssq,
       |        sum(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n) AS sbn,
       |        sum(CAST(sz2 AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n) AS ssw
       |      FROM g)
       |SELECT k, nt AS n_total,
       |  CASE WHEN k < 2 OR ssw <= 0.0 THEN NULL
       |       ELSE ${roundNSql(
        "(CAST(nt - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)) * " +
          "((sbn - CAST(szt AS DOUBLE) * CAST(szt AS DOUBLE) / nt) / ssw)", 6)}
       |  END AS w
       |FROM a""".stripMargin

  /** One-way ANOVA F across event types on event-value cents — the
    * omnibus mean-difference test beside [[levene]]'s variance gate
    * (run Levene first; if variances pool, this F is the k-group
    * generalization of the t-test). Identical machinery: per-group
    * (n, Σc, DECIMAL(38,0) Σc²), F = (SSB/(k−1)) / (SSW/(N−k)); the
    * only float-term aggregate is over the k ≤ |types| group rows. */
  def anova(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val g = Tables.events(spark, dir)
      .select(col("event_type"), cents.as("c"))
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c").cast("decimal(38,0)") * col("c").cast("decimal(38,0)")).as("s2"))
    val a = g.agg(
      count(lit(1)).as("k"), sum(col("n")).as("nt"), sum(col("s")).as("st"),
      sum(col("s").cast("double") * col("s").cast("double") / col("n")).as("sbn"),
      sum(col("s2").cast("double") -
        col("s").cast("double") * col("s").cast("double") / col("n")).as("ssw"))
    val ssb = col("sbn") - col("st").cast("double") * col("st").cast("double") / col("nt")
    a.select(col("k"), col("nt").as("n_total"),
      when(col("k") < 2L || col("ssw") <= 0.0 || col("nt") <= col("k"),
        lit(null).cast("double"))
        .otherwise(roundN(
          (ssb / (col("k") - lit(1L)).cast("double")) /
            (col("ssw") / (col("nt") - col("k")).cast("double")), 6)).as("f"))
  }

  private val anovaSql =
    s"""WITH e AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |           FROM events),
       |g AS (SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
       |        sum(c * c) AS s2
       |      FROM e GROUP BY 1),
       |a AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nt,
       |        CAST(sum(s) AS BIGINT) AS st,
       |        sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sbn,
       |        sum(CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS ssw
       |      FROM g)
       |SELECT k, nt AS n_total,
       |  CASE WHEN k < 2 OR ssw <= 0.0 OR nt <= k THEN NULL
       |       ELSE ${roundNSql(
        "((sbn - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt) / CAST(k - 1 AS DOUBLE)) / " +
          "(ssw / CAST(nt - k AS DOUBLE))", 6)}
       |  END AS f
       |FROM a""".stripMargin

  /** 95% z for the median CI ranks, quantized once. */
  private val MedianCiZ = 1.959964

  /** Distribution-free 95% CI for the per-type median of event value via
    * binomial order statistics: the interval between the values at ranks
    * L = max(1, floor((n − z√n)/2)) and U = min(n, ceil((n + z√n)/2) + 1)
    * covers the true median with ≥95% probability for any distribution —
    * the robust uncertainty statement next to `q_stats_quantiles`' point
    * estimate. Ranks resolve on the per-type DISTINCT-cents histogram
    * (group-partitioned cumulative, the scale-safe quantile class); the
    * only float ops are z·√n (identical IEEE in both engines) and the
    * final /100 displays. */
  def medianCi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val vals = Tables.events(spark, dir).select(col("event_type"), cents.as("c"))
    val byT = Window.partitionBy(col("event_type"))
    val cum = vals.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byT.orderBy(col("c"))))
      .withColumn("n", sum(col("cnt")).over(byT))
    val zrtn = lit(MedianCiZ) * sqrt(col("n").cast("double"))
    val lRank = greatest(lit(1L), floor((col("n").cast("double") - zrtn) / 2.0).cast("long"))
    val uRank = least(col("n"), (ceil((col("n").cast("double") + zrtn) / 2.0) + 1).cast("long"))
    cum.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        (min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("c")))
          .cast("double") / 100.0).as("median"),
        (min(when(col("cum") >= lRank, col("c"))).cast("double") / 100.0).as("ci_lo"),
        (min(when(col("cum") >= uRank, col("c"))).cast("double") / 100.0).as("ci_hi"))
      .orderBy(col("event_type"))
  }

  private val medianCiSql =
    s"""WITH e AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |           FROM events),
       |h AS (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2),
       |cu AS (SELECT event_type, c,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
       |         sum(cnt) OVER (PARTITION BY event_type) AS n
       |       FROM h),
       |r AS (SELECT *,
       |        greatest(1, CAST(floor((CAST(n AS DOUBLE) - $MedianCiZ * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)) AS l_rank,
       |        least(n, CAST(ceil((CAST(n AS DOUBLE) + $MedianCiZ * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT) + 1) AS u_rank
       |      FROM cu)
       |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       |  CAST(min(CASE WHEN cum >= ceil(0.5 * n) THEN c END) AS DOUBLE) / 100.0 AS median,
       |  CAST(min(CASE WHEN cum >= l_rank THEN c END) AS DOUBLE) / 100.0 AS ci_lo,
       |  CAST(min(CASE WHEN cum >= u_rank THEN c END) AS DOUBLE) / 100.0 AS ci_hi
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  private[graft] def type1CentsQuantiles(vals: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = vals
      .groupBy(col("l_returnflag"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(byFlag.orderBy(col("cents"))))
      .withColumn("n", sum(col("cnt")).over(byFlag))
    def pick(q: Double) =
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("cents")))
    cum.groupBy(col("l_returnflag"))
      .agg((pick(0.25).cast("double") / 100.0).as("q25"),
        (pick(0.5).cast("double") / 100.0).as("q50"),
        (pick(0.75).cast("double") / 100.0).as("q75"))
      .orderBy(col("l_returnflag"))
  }

  /** Oracle pins the SAME type-1 convention the Spark side computes —
    * smallest value whose cumulative count reaches ceil(q·n) — via an
    * explicit cumulative-histogram formulation, rather than leaning on
    * DuckDB quantile_disc's internal index convention (which can pick an
    * adjacent element for some (n, q) and made the old equality
    * fixture-dependent). */
  private val quantilesHistSql = {
    val cents = s"CAST(${roundNSql("l_extendedprice * 100", 0)} AS BIGINT)"
    def pick(q: Double) =
      s"CAST(min(CASE WHEN cum >= ceil($q * n) THEN cents END) AS DOUBLE) / 100.0"
    s"""WITH hist AS (
       |  SELECT l_returnflag, $cents AS cents, count(*) AS cnt
       |  FROM lineitem GROUP BY 1, 2),
       |cum AS (
       |  SELECT l_returnflag, cents,
       |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cum,
       |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
       |  FROM hist)
       |SELECT l_returnflag, ${pick(0.25)} AS q25, ${pick(0.5)} AS q50,
       |  ${pick(0.75)} AS q75
       |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Exact percentiles per group: Spark `percentile` (sort + linear
    * interpolation) matches DuckDB `quantile_cont` bit-for-bit on the same
    * doubles (verified incl. trailing float digits). Exact percentile is a
    * per-group sort — fine for bounded groups; the unbounded-scale paths
    * are approx_percentile (rows-only, like the HLL variant) and the
    * histogram method above (exact AND oracle-checked). */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"), lit(0.25)).as("q25"),
        percentile(col("l_extendedprice"), lit(0.5)).as("q50"),
        percentile(col("l_extendedprice"), lit(0.75)).as("q75"))

  /** Approximate percentiles per group — the 100 TB path for `quantiles`.
    * `approx_percentile` (Greenwald-Khanna, bounded rank error 1/Accuracy)
    * aggregates in one pass with fixed-size mergeable state — no per-group
    * sort, no O(group) memory, immune to group skew. Sketch outputs are
    * implementation-specific (like the HLL KPI variant) so there is no
    * DuckDB oracle; ApproxQuantilesSpec bounds |approx − exact| instead. */
  val QuantileAccuracy = 1000

  def quantilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_percentile(col("l_extendedprice"), lit(0.25), lit(QuantileAccuracy)).as("q25"),
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(QuantileAccuracy)).as("q50"),
        approx_percentile(col("l_extendedprice"), lit(0.75), lit(QuantileAccuracy)).as("q75"))

  /** summary()-parity profiler over ALL numeric lineitem measures in ONE
    * pass: melt (column, value) via explode, then a single
    * map-side-combinable aggregate — one scan + one shuffle regardless of
    * how many columns are profiled (describe() would re-scan per metric
    * family at 100 TB).
    *
    * Bit-reproducibility: values are quantized to DECIMAL(18,4) (the data
    * is 2-decimal, so never near a rounding tie) and summed exactly —
    * sum and sum-of-squares are integers-in-disguise, immune to
    * accumulation order; the only float math (avg/std) runs on identical
    * exact inputs in both engines. */
  /** Join-key SKEW profiler — the "do I need salting / AQE skew-join?"
    * advisor a 100 TB migration runs BEFORE picking a join strategy: for
    * each candidate fact join key, the key cardinality, the hottest key's
    * row count, its ratio to the mean key (the skew factor a shuffle
    * partition inherits), and the share the top-10 keys hold. One hash
    * aggregate + a bounded top-k + two 1-row reductions per key column —
    * metadata-scale output at any SF. Reading this table against
    * `q_join_salted_skew`'s plan is the salting decision. */
  private val SkewKeys = Seq("l_partkey", "l_suppkey", "l_orderkey")

  def keySkew(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.roundN
    def forKey(k: String): DataFrame = {
      val counts = Tables.lineitem(spark, dir)
        .groupBy(col(k).as("key")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_keys"), max(col("n")).as("max_key_rows"))
      val top = counts.orderBy(col("n").desc, col("key")).limit(10)
        .agg(coalesce(sum(col("n")), lit(0L)).as("top10_rows"))
      tot.crossJoin(top).select(
        lit(k).as("key_col"), col("n_rows"), col("n_keys"), col("max_key_rows"),
        roundN(col("max_key_rows") / (col("n_rows") / col("n_keys").cast("double")), 4)
          .as("skew_ratio"),
        roundN(col("top10_rows") / col("n_rows").cast("double"), 6).as("top10_share"))
    }
    SkewKeys.map(forKey).reduce(_.unionByName(_))
  }

  private val keySkewSql = {
    import graft.functions.Rounding.roundNSql
    def forKey(k: String) =
      s"""SELECT '$k' AS key_col, CAST(t.n_rows AS BIGINT) AS n_rows,
         |  t.n_keys, t.max_key_rows,
         |  ${roundNSql("t.max_key_rows / (CAST(t.n_rows AS DOUBLE) / CAST(t.n_keys AS DOUBLE))", 4)} AS skew_ratio,
         |  ${roundNSql("CAST(tp.top10_rows AS DOUBLE) / t.n_rows", 6)} AS top10_share
         |FROM (SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
         |        max(n) AS max_key_rows
         |      FROM (SELECT $k, count(*) AS n FROM lineitem GROUP BY 1)) t,
         |     (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS top10_rows
         |      FROM (SELECT $k AS key, count(*) AS n FROM lineitem GROUP BY 1
         |            ORDER BY n DESC, key LIMIT 10)) tp""".stripMargin
    SkewKeys.map(forKey).mkString("\nUNION ALL\n")
  }

  private val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def profileNumeric(spark: SparkSession, dir: String): DataFrame = {
    val entries = array(ProfileCols.map(c =>
      struct(lit(c).as("c"), col(c).cast("double").as("v"))): _*)
    // integer "cents": data is 2-decimal, so h is exact; h and h·h sum as
    // decimals (no 64-bit overflow at any SF), and the only float math
    // (divisions, sqrt) runs on identical exact inputs in both engines
    Tables.lineitem(spark, dir)
      .select(explode(entries).as("e"))
      .select(col("e.c").as("col_name"), col("e.v").as("v"),
        round(col("e.v") * 100).cast("long").as("h"))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("h").cast("decimal(20,0)")).as("sum_h"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        sum((col("h") * col("h")).cast("decimal(28,0)")).as("sumsq_h"))
      // avg/std are ROUNDED (6/4 dp): past 2^53 the exact integer sums no
      // longer convert to double identically in both engines (DuckDB's
      // int128→double cast is not correctly-rounded — observed 1-ulp drift
      // in std at sf0.1), and rounding absorbs that
      .select(col("col_name"), col("n_rows"),
        (col("sum_h").cast("double") / 100).as("sum_v"),
        col("min_v"), col("max_v"),
        graft.functions.Rounding.roundN(
          col("sum_h").cast("double") / 100 / col("n_rows"), 6).as("avg_v"),
        graft.functions.Rounding.roundN(
          sqrt((col("sumsq_h").cast("double") / 10000
              - (col("sum_h").cast("double") / 100) * (col("sum_h").cast("double") / 100)
                / col("n_rows"))
            / (col("n_rows") - 1)), 4).as("std_v"))
  }

  private val profileSql = {
    val melted = ProfileCols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS v FROM lineitem")
      .mkString("\nUNION ALL ")
    s"""WITH m AS ($melted),
       |s AS (SELECT col_name, count(*) AS n_rows,
       |        sum(CAST(round(v*100) AS BIGINT)) AS sum_h, min(v) AS min_v, max(v) AS max_v,
       |        sum(CAST(round(v*100) AS BIGINT) * CAST(round(v*100) AS BIGINT)) AS sumsq_h
       |      FROM m GROUP BY col_name)
       |SELECT col_name, n_rows, CAST(sum_h AS DOUBLE) / 100 AS sum_v, min_v, max_v,
       |  ${graft.functions.Rounding.roundNSql("CAST(sum_h AS DOUBLE) / 100 / n_rows", 6)} AS avg_v,
       |  ${graft.functions.Rounding.roundNSql(
          """sqrt((CAST(sumsq_h AS DOUBLE) / 10000
            |      - (CAST(sum_h AS DOUBLE) / 100) * (CAST(sum_h AS DOUBLE) / 100) / n_rows)
            |    / (n_rows - 1))""".stripMargin, 4)} AS std_v
       |FROM s""".stripMargin
  }

  /** Pearson correlation + covariance (quantity vs price) per group from
    * EXACT integer sums. Spark's built-in `corr`/`covar_samp` accumulate
    * co-moments in partition order (nondeterministic low bits, and a
    * different recurrence from DuckDB's) — this form instead sums
    * n/Σx/Σy/Σxy/Σx²/Σy² exactly (quantity is integral, price is 2-decimal
    * cents; products sum as DECIMAL so partial-agg order cannot perturb
    * them) and then runs the identical float ops on identical inputs in
    * both engines. Same one-pass, map-side-combinable shape as the built-in
    * — order-insensitivity costs nothing. */
  def corrStats(spark: SparkSession, dir: String): DataFrame = {
    val d = col("n_rows").cast("double")
    val sq = col("s_q").cast("double")
    val sh = col("s_h").cast("double")
    val cov = (col("s_qh").cast("double") - sq * sh / d) / (d - 1)
    val varQ = (col("s_qq").cast("double") - sq * sq / d) / (d - 1)
    val varH = (col("s_hh").cast("double") - sh * sh / d) / (d - 1)
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("h"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("q")).as("s_q"),
        sum(col("h").cast("decimal(20,0)")).as("s_h"),
        sum((col("q") * col("h")).cast("decimal(28,0)")).as("s_qh"),
        sum(col("q") * col("q")).as("s_qq"),
        sum((col("h") * col("h")).cast("decimal(28,0)")).as("s_hh"))
      .select(col("l_returnflag"), col("n_rows"),
        graft.functions.Rounding.roundN(cov / 100, 4).as("cov_qty_price"),
        graft.functions.Rounding.roundN(cov / sqrt(varQ * varH), 6).as("corr_qty_price"))
  }

  private val corrSql = {
    val cov = "(CAST(s_qh AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_h AS DOUBLE) / CAST(n_rows AS DOUBLE)) / (CAST(n_rows AS DOUBLE) - 1)"
    val varQ = "(CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE) / CAST(n_rows AS DOUBLE)) / (CAST(n_rows AS DOUBLE) - 1)"
    val varH = "(CAST(s_hh AS DOUBLE) - CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE) / CAST(n_rows AS DOUBLE)) / (CAST(n_rows AS DOUBLE) - 1)"
    s"""WITH b AS (
       |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
       |         CAST(round(l_extendedprice * 100) AS BIGINT) AS h
       |  FROM lineitem),
       |s AS (
       |  SELECT l_returnflag, count(*) AS n_rows,
       |         CAST(sum(q) AS BIGINT) AS s_q, sum(h) AS s_h, sum(q * h) AS s_qh,
       |         CAST(sum(q * q) AS BIGINT) AS s_qq, sum(h * h) AS s_hh
       |  FROM b GROUP BY 1)
       |SELECT l_returnflag, n_rows,
       |  ${graft.functions.Rounding.roundNSql(s"($cov) / 100", 4)} AS cov_qty_price,
       |  ${graft.functions.Rounding.roundNSql(s"($cov) / sqrt(($varQ) * ($varH))", 6)} AS corr_qty_price
       |FROM s""".stripMargin
  }

  /** Fixed-width histogram of l_extendedprice (10 bins over the observed
    * [min,max]): one metadata-sized min/max agg broadcast-cross-joined into
    * a narrow bin projection, then a 10-key aggregate — two passes, both
    * scan-speed, no sort. Bin edges are double ops in one fixed order. */
  val HistBins = 10

  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val mm = Tables.lineitem(spark, dir)
      .agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
    val bin = least(lit(HistBins - 1),
      floor((col("l_extendedprice") - col("lo")) / (col("hi") - col("lo")) * HistBins))
      .cast("int")
    Tables.lineitem(spark, dir)
      .crossJoin(broadcast(mm))
      .select(bin.as("bin"), col("lo"), col("hi"))
      .groupBy(col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("bin"),
        graft.functions.Rounding.roundN(
          col("lo") + (col("hi") - col("lo")) / HistBins * col("bin"), 4).as("bin_lo"),
        col("n_rows"))
  }

  private val histogramSql =
    s"""WITH mm AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem),
       |b AS (SELECT CAST(least($HistBins - 1,
       |               floor((l_extendedprice - lo) / (hi - lo) * $HistBins)) AS INT) AS bin,
       |             lo, hi
       |      FROM lineitem CROSS JOIN mm)
       |SELECT bin,
       |  ${graft.functions.Rounding.roundNSql(s"lo + (hi - lo) / $HistBins * bin", 4)} AS bin_lo,
       |  count(*) AS n_rows
       |FROM b GROUP BY bin, lo, hi""".stripMargin

  /** Exact mode (most frequent quantity) per group, smallest-value
    * tie-break: count per (group, value) then top-1 under WindowGroupLimit
    * — never a driver-side histogram. */
  def modeQty(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("q"))
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("l_returnflag"), col("q"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("q").as("mode_qty"), col("n").as("mode_n"))
  }

  private val modeSql =
    """WITH c AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q, count(*) AS n
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, q AS mode_qty, n AS mode_n
      |FROM c
      |QUALIFY row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC, q) = 1""".stripMargin

  /** Chi-squared drift scan: does the current period's category mix differ
    * from the baseline period's? The data-quality monitor every scheduled
    * pipeline wants between runs (the reference re-validates from scratch
    * per run — validate.py:104-175 — but has no cross-run comparison).
    *
    * One pass, one tiny aggregate: both periods' per-category counts come
    * from conditional counts in a single scan (map-side combinable over
    * the small category domain); the 1-row totals broadcast back.
    * Exactness: counts are integers, and expected/χ² contributions use
    * one fixed expression shape (cast→multiply→divide), so both engines
    * produce bit-identical doubles before the final rounding. */
  def chi2Drift(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01")
    val counts = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        to_date(col("l_shipdate")).as("d"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(col("d") < cut, 1)).as("n_base"),
        count(when(col("d") >= cut, 1)).as("n_cur"))
    val totals = counts.agg(sum(col("n_base")).as("t_base"),
      sum(col("n_cur")).as("t_cur"))
    val e = col("n_base").cast("double") * col("t_cur") / col("t_base")
    counts.crossJoin(broadcast(totals))
      .select(col("l_returnflag"), col("n_base"), col("n_cur"),
        roundN(e, 4).as("expected"),
        roundN((col("n_cur") - e) * (col("n_cur") - e) / e, 6).as("chi2_contrib"))
      .orderBy(col("l_returnflag"))
  }

  private val chi2Sql =
    s"""WITH c AS (
       |  SELECT l_returnflag,
       |    count(CASE WHEN CAST(l_shipdate AS DATE) < DATE '1998-01-01' THEN 1 END) AS n_base,
       |    count(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1998-01-01' THEN 1 END) AS n_cur
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT CAST(sum(n_base) AS BIGINT) AS t_base,
       |             CAST(sum(n_cur) AS BIGINT) AS t_cur FROM c)
       |SELECT l_returnflag, n_base, n_cur,
       |  ${roundNSql("CAST(n_base AS DOUBLE) * t_cur / t_base", 4)} AS expected,
       |  ${roundNSql(
              "(n_cur - CAST(n_base AS DOUBLE) * t_cur / t_base) * (n_cur - CAST(n_base AS DOUBLE) * t_cur / t_base) / (CAST(n_base AS DOUBLE) * t_cur / t_base)",
              6)} AS chi2_contrib
       |FROM c, t
       |ORDER BY 1""".stripMargin

  /** Population stability index — the other standard drift metric (χ²'s
    * finance sibling): PSI = Σ_buckets (p_cur − p_base)·ln(p_cur/p_base).
    * Same one-scan conditional-count shape as the χ² query; the log ride
    * the repo's quantized-ln discipline (floor(ln·10⁶+0.5)/10⁶ — one libm
    * call on identical doubles, quantized before the multiply, so a 1-ulp
    * libm divergence cannot reach the output; proven by q_text_lm_score). */
  /** The baseline/current window boundary shared by the batch query and
    * the streaming drift monitor ([[graft.streaming.DriftMonitor]]). */
  val PsiCut = "1998-01-01"

  /** PSI from a per-group count table (l_returnflag, n_base, n_cur) —
    * factored out so the streaming monitor computes the IDENTICAL metric
    * (same quantized ln, same rounding) from its accumulated state. */
  private[graft] def psiOf(counts: DataFrame): DataFrame = {
    val totals = counts.agg(sum(col("n_base")).as("t_base"),
      sum(col("n_cur")).as("t_cur"))
    val pBase = col("n_base").cast("double") / col("t_base")
    val pCur = col("n_cur").cast("double") / col("t_cur")
    val lnQ = floor(log(pCur / pBase) * 1e6 + 0.5) / 1e6
    counts.crossJoin(broadcast(totals))
      .select(col("l_returnflag"), col("n_base"), col("n_cur"),
        roundN((pCur - pBase) * lnQ, 8).as("psi_contrib"))
      .orderBy(col("l_returnflag"))
  }

  /** Per-group counts of the baseline window (shipdate < PsiCut) — the
    * PINNED reference distribution the streaming monitor joins against. */
  private[graft] def psiBaseline(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), to_date(col("l_shipdate")).as("d"))
      .filter(col("d") < lit(PsiCut))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_base"))

  /** Exact two-sample Kolmogorov–Smirnov distance between the purchase and
    * click value distributions — the nonparametric member of the drift
    * family (PSI and χ² are binned; KS sees the whole CDF). Every
    * comparison runs on integer cross-multiplied cumulative counts
    * (max |cum₁·n₂ − cum₂·n₁|), so the argmax is exact in both engines and
    * the single integer→double division at the end is one IEEE op on
    * identical inputs. Scale: the shuffle carries DISTINCT cent-values with
    * per-side counts (money-bounded, the q_stats_quantiles histogram
    * argument), and the global cumulative window runs over that histogram,
    * never the event log. Longs hold the cross-products up to ~3·10⁹ rows
    * per side; beyond that the same plan runs on DECIMAL(38,0). */
  def ksDrift(spark: SparkSession, dir: String): DataFrame =
    ksOf(Tables.events(spark, dir), "purchase", "click")

  /** [[ksDrift]] between any two `event_type` populations of an
    * events-shaped frame — the library-API form. */
  def ksOf(ev: DataFrame, sideA: String, sideB: String): DataFrame =
    ksOfHistogram(ksHistogram(ev, sideA, sideB))

  /** The per-cent-value two-side histogram the KS statistic reduces —
    * also the accumulated STATE of the streaming monitor
    * ([[graft.streaming.DriftMonitor.ksMonitor]]). */
  private[graft] def ksHistogram(ev: DataFrame, sideA: String,
      sideB: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    ev.filter(col("event_type").isin(sideA, sideB))
      .select(col("event_type"), cents.as("v"))
      .groupBy(col("v"))
      .agg(count(when(col("event_type") === sideA, 1)).as("c1"),
        count(when(col("event_type") === sideB, 1)).as("c2"))
  }

  /** KS from a (v, c1, c2) histogram — factored out so the streaming
    * monitor computes the IDENTICAL statistic from its upserted state. */
  private[graft] def ksOfHistogram(h: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = h.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
      .crossJoin(broadcast(totals))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("d_num"))
      .select(col("n1"), col("n2"),
        roundN(col("d_num").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")), 8).as("ks"))
  }

  private val ksSql = {
    s"""WITH h AS (
       |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
       |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS c1,
       |    count(CASE WHEN event_type = 'click' THEN 1 END) AS c2
       |  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1),
       |c AS (SELECT v,
       |        CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
       |        CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS cum2 FROM h),
       |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
       |             CAST(sum(c2) AS BIGINT) AS n2 FROM h)
       |SELECT n1, n2,
       |  ${roundNSql(
          "CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))",
          8)} AS ks
       |FROM c, t GROUP BY n1, n2""".stripMargin
  }

  /** Exact Mann–Whitney U between the same two populations as
    * [[ksDrift]] — the rank-based drift test (location shifts that KS's
    * sup-norm can under-weight). Midrank tie handling stays integer by
    * carrying DOUBLED rank sums: at value v with c₁+c₂ = c ties and
    * `before` items below, each tied item's midrank is before + (c+1)/2,
    * so 2·R₁ = Σ_v c₁(v)·(2·before(v) + c(v) + 1) — exact BIGINT; then
    * 2·U₁ = 2·R₁ − n₁(n₁+1). One double halving at the end. Same
    * distinct-cent-value histogram + global window shape as ksDrift
    * (money-bounded, never the event log). */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame =
    mannWhitneyOf(Tables.events(spark, dir), "purchase", "click")

  /** [[mannWhitney]] between any two `event_type` populations — the
    * library-API form. */
  def mannWhitneyOf(ev: DataFrame, sideA: String, sideB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val h = ev
      .filter(col("event_type").isin(sideA, sideB))
      .select(col("event_type"), cents.as("v"))
      .groupBy(col("v"))
      .agg(count(when(col("event_type") === sideA, 1)).as("c1"),
        count(when(col("event_type") === sideB, 1)).as("c2"))
    val totals = h.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = col("c1") + col("c2")
    h.withColumn("before", sum(c).over(w) - c)
      .select((col("c1") * (lit(2) * col("before") + c + 1)).as("r2"))
      .agg(sum(col("r2")).as("r1x2"))
      .crossJoin(broadcast(totals))
      .select(col("n1"), col("n2"),
        (col("r1x2") - col("n1") * (col("n1") + 1)).as("u1x2"),
        roundN((col("r1x2") - col("n1") * (col("n1") + 1)).cast("double") / 2.0, 1)
          .as("u1"))
  }

  private val mannWhitneySql =
    s"""WITH h AS (
       |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
       |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS c1,
       |    count(CASE WHEN event_type = 'click' THEN 1 END) AS c2
       |  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1),
       |b AS (SELECT v, c1, c2,
       |        CAST(sum(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS BIGINT) AS before
       |      FROM h),
       |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
       |             CAST(sum(c2) AS BIGINT) AS n2 FROM h),
       |r AS (SELECT CAST(sum(c1 * (2 * before + c1 + c2 + 1)) AS BIGINT) AS r1x2 FROM b)
       |SELECT n1, n2,
       |  CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1x2,
       |  ${roundNSql("CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0", 1)} AS u1
       |FROM r, t""".stripMargin

  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit(PsiCut)
    val counts = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), to_date(col("l_shipdate")).as("d"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(col("d") < cut, 1)).as("n_base"),
        count(when(col("d") >= cut, 1)).as("n_cur"))
    psiOf(counts)
  }

  private val psiSql = {
    val pBase = "CAST(n_base AS DOUBLE) / t_base"
    val pCur = "CAST(n_cur AS DOUBLE) / t_cur"
    s"""WITH c AS (
       |  SELECT l_returnflag,
       |    count(CASE WHEN CAST(l_shipdate AS DATE) < DATE '1998-01-01' THEN 1 END) AS n_base,
       |    count(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1998-01-01' THEN 1 END) AS n_cur
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT CAST(sum(n_base) AS BIGINT) AS t_base,
       |             CAST(sum(n_cur) AS BIGINT) AS t_cur FROM c)
       |SELECT l_returnflag, n_base, n_cur,
       |  ${roundNSql(s"(($pCur) - ($pBase)) * (floor(ln(($pCur) / ($pBase)) * 1e6 + 0.5) / 1e6)", 8)} AS psi_contrib
       |FROM c, t
       |ORDER BY 1""".stripMargin
  }

  /** Robust outlier audit per event type: median and MAD (median absolute
    * deviation) from the exact integer-cents histograms, then the count of
    * events beyond MadK·MAD — the z-score scan's (`q_events_anomaly`)
    * robust sibling, immune to the outliers it hunts. Both medians ride
    * the type-1 histogram-cumulative pick over DISTINCT cent values
    * (money-bounded), every window partitioned by event_type; the outlier
    * comparison is pure integers (|c−med| > MadK·mad), so both engines
    * agree exactly even when MAD = 0 (any deviation flags). */
  val MadK = 5L

  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    // persisted: read by the median histogram, the deviation histogram,
    // and the outlier count — three passes over one projection
    val vals = Tables.events(spark, dir)
      .select(col("event_type"), cents.as("c"))
      .persist()
    def medOf(df: DataFrame, valCol: String): DataFrame = {
      val byT = Window.partitionBy(col("event_type"))
      df.groupBy(col("event_type"), col(valCol))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(byT.orderBy(col(valCol))))
        .withColumn("n", sum(col("cnt")).over(byT))
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") >= ceil(lit(0.5) * col("n")), col(valCol))).as("m"),
          max(col("n")).as("n"))
    }
    val med = medOf(vals, "c").select(col("event_type"), col("m").as("med"), col("n"))
    val dev = vals.join(med, "event_type")
      .select(col("event_type"), abs(col("c") - col("med")).as("d"))
    val mad = medOf(dev, "d").select(col("event_type"), col("m").as("mad"))
    val outliers = vals.join(med, "event_type").join(mad, "event_type")
      .filter(abs(col("c") - col("med")) > lit(MadK) * col("mad"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_out"))
    med.join(mad, "event_type")
      .join(outliers, Seq("event_type"), "left_outer")
      .select(col("event_type"), col("n"),
        (col("med").cast("double") / 100.0).as("median"),
        (col("mad").cast("double") / 100.0).as("mad"),
        coalesce(col("n_out"), lit(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  private val madOutliersSql =
    s"""WITH e AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |           FROM events),
       |h1 AS (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2),
       |c1 AS (SELECT event_type, c,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
       |         sum(cnt) OVER (PARTITION BY event_type) AS n
       |       FROM h1),
       |med AS (SELECT event_type,
       |          min(CASE WHEN cum >= ceil(0.5 * n) THEN c END) AS med,
       |          CAST(max(n) AS BIGINT) AS n
       |        FROM c1 GROUP BY 1),
       |d AS (SELECT e.event_type, abs(e.c - med.med) AS dv
       |      FROM e JOIN med USING (event_type)),
       |h2 AS (SELECT event_type, dv, count(*) AS cnt FROM d GROUP BY 1, 2),
       |c2 AS (SELECT event_type, dv,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY dv) AS cum,
       |         sum(cnt) OVER (PARTITION BY event_type) AS n
       |       FROM h2),
       |mad AS (SELECT event_type,
       |          min(CASE WHEN cum >= ceil(0.5 * n) THEN dv END) AS mad
       |        FROM c2 GROUP BY 1),
       |o AS (SELECT e.event_type, count(*) AS n_out
       |      FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
       |      WHERE abs(e.c - med.med) > $MadK * mad.mad
       |      GROUP BY 1)
       |SELECT med.event_type, med.n,
       |  CAST(med.med AS DOUBLE) / 100.0 AS median,
       |  CAST(mad.mad AS DOUBLE) / 100.0 AS mad,
       |  coalesce(o.n_out, 0) AS n_outliers
       |FROM med JOIN mad USING (event_type)
       |LEFT JOIN o USING (event_type)
       |ORDER BY 1""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_stats_mad", madOutliers, Some(madOutliersSql)),
    Q("q_stats_psi", psiDrift, Some(psiSql)),
    Q("q_stats_ks", ksDrift, Some(ksSql)),
    Q("q_stats_mannwhitney", mannWhitney, Some(mannWhitneySql)),
    Q("q_scan_partitioned", scanPartitioned, Some(scanPartitionedSql)),
    Q("q_scan_json", scanJson, Some(supplierSql)),
    Q("q_scan_orc", scanOrc, Some(supplierSql)),
    // the UNQUALIFIED quantile name is the scale-safe histogram form (no
    // per-group sort, memory O(distinct values)); the per-group-sort
    // interpolated form is explicitly suffixed _sorted and stays the
    // bounded-groups convenience (round-3 "weak while unqualified" fix)
    Q("q_stats_quantiles", quantilesHist, Some(quantilesHistSql)),
    Q("q_stats_median_ci", medianCi, Some(medianCiSql)),
    Q("q_stats_levene", levene, Some(leveneSql)),
    Q("q_stats_anova", anova, Some(anovaSql)),
    Q("q_stats_chi2", chi2Drift, Some(chi2Sql)),
    Q("q_stats_corr", corrStats, Some(corrSql)),
    Q("q_stats_histogram", histogram, Some(histogramSql)),
    Q("q_stats_mode", modeQty, Some(modeSql)),
    Q("q_profile_numeric", profileNumeric, Some(profileSql)),
    Q("q_profile_skew", keySkew, Some(keySkewSql)),
    Q("q_stats_quantiles_approx", quantilesApprox, None),
    Q("q_stats_quantiles_sorted", quantiles, Some(
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS q25,
        |  quantile_cont(l_extendedprice, 0.5) AS q50,
        |  quantile_cont(l_extendedprice, 0.75) AS q75
        |FROM lineitem GROUP BY 1""".stripMargin)),
    Q("q_scan_schema", scanSchema, Some(
      "SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part")),
    Q("q_scan_multifile", scanMultifile, Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
        |CAST(o_orderdate AS DATE) AS order_date FROM orders""".stripMargin)),
    Q("q_summary_stats", summaryStats, Some(
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n_rows, CAST(sum(q) AS BIGINT) AS sum_qty,
        |         min(q) AS min_qty, max(q) AS max_qty, CAST(sum(q*q) AS BIGINT) AS sumsq
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
        |  GROUP BY 1)
        |SELECT l_returnflag, n_rows, sum_qty, min_qty, max_qty,
        |  CAST(sum_qty AS DOUBLE) / n_rows AS avg_qty,
        |  sqrt((sumsq - CAST(sum_qty AS DOUBLE) * sum_qty / n_rows) / (n_rows - 1)) AS std_qty
        |FROM s""".stripMargin)),
  )
}
