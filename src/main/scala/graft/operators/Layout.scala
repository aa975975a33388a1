package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data LAYOUT for scan pruning — the write-side half of 100 TB
  * performance. Sorting a table on one column gives min/max row-group
  * stats that prune one predicate dimension; Z-ORDER interleaving the bits
  * of two columns gives a single sort key whose range chunks are tight in
  * BOTH dimensions, so parquet footer stats prune 2-D predicate boxes
  * (the Delta/Iceberg OPTIMIZE ZORDER trick, public literature: Morton
  * 1966 curves).
  *
  * The registered query computes the full layout audit: per z-range
  * bucket, the row count and the min/max envelope of both source columns,
  * plus whether a fixed 2-D probe box could skip the bucket on those
  * stats alone. The WRITER half lives in `sources/ZOrder.scala`
  * (`ZOrder.write`: magic-constant bit-spread → repartitionByRange →
  * sorted parquet, file-skipping spec'd in ZOrderSpec); this audit uses
  * plain shift-and-mask interleaving instead of the spread constants
  * because every step must also be expressible in the DuckDB oracle —
  * same curve, checkable arithmetic.
  *
  * Reference scope: the reference writes unpartitioned parquet
  * (transform.py's plain write); layout optimization is scale-extension
  * surface. All arithmetic is exact integer bit math, identical in
  * DuckDB, so the oracle hash-checks the full bucket table. */
object Layout {

  /** Bits per dimension (8 → 16-bit z) and z-range bucket width (2^10 →
    * 64 buckets standing in for row groups). */
  val ZBits = 8
  val BucketShift = 10

  /** Morton-interleave two `ZBits`-bit normalized coordinates: x takes the
    * odd bit positions, y the even. */
  private def zInterleave(nx: Column, ny: Column): Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(nx, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(ny, i).bitwiseAND(lit(1L)), 2 * i)
    }

  private def zInterleaveSql(nx: String, ny: String): String =
    (0 until ZBits).map { i =>
      s"((($nx >> $i) & 1) << ${2 * i + 1}) + ((($ny >> $i) & 1) << ${2 * i})"
    }.mkString("(", " + ", ")")

  /** Fixed 2-D probe box for the skip audit: a narrow customer slice in a
    * half-year date window — the shape of a typical "this cohort, this
    * quarter" scan. */
  val ProbeCustLo = 100L
  val ProbeCustHi = 200L
  val ProbeDayLo = 9131L // 1995-01-01
  val ProbeDayHi = 9312L // 1995-06-30

  /** Z-order layout audit over orders on (o_custkey, order day).
    *
    * Both dims are min/max-normalized to [0, 2^ZBits) with exact integer
    * math, bit-interleaved into a 16-bit Morton key, and chunked into 64
    * z-range buckets. Output: per-bucket row count, the min/max envelope
    * of each ORIGINAL dimension (what parquet footers would store), and
    * `probe_hit` — whether the fixed probe box intersects the envelope
    * (false = a reader skips the bucket without touching a page).
    *
    * 100 TB: one broadcast 1-row min/max aggregate + one map-side
    * projected groupBy on the bucket key — scan-speed; the audit table is
    * bucket-count-sized. The same z expression feeds
    * `repartitionByRange` at write time. */
  def zorderAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("x"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("y"))
    val bounds = o.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"))
    val normed = o.crossJoin(broadcast(bounds))
      .withColumn("nx", expr(s"((x - xmin) * ${1L << ZBits}) div (xmax - xmin + 1)"))
      .withColumn("ny", expr(s"((y - ymin) * ${1L << ZBits}) div (ymax - ymin + 1)"))
      .withColumn("z", zInterleave(col("nx"), col("ny")))
    normed
      .groupBy(shiftright(col("z"), BucketShift).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("cust_min"), max(col("x")).as("cust_max"),
        min(col("y")).as("day_min"), max(col("y")).as("day_max"))
      .withColumn("probe_hit",
        (!(col("cust_max") < ProbeCustLo || col("cust_min") > ProbeCustHi ||
          col("day_max") < ProbeDayLo || col("day_min") > ProbeDayHi)).cast("int"))
  }

  private val zorderAuditSql = {
    val scale = 1L << ZBits
    s"""WITH o AS (SELECT o_custkey AS x,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))::BIGINT AS y
       |  FROM orders),
       |b AS (SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax FROM o),
       |n AS (SELECT x, y,
       |    ((x - xmin) * $scale) // (xmax - xmin + 1) AS nx,
       |    ((y - ymin) * $scale) // (ymax - ymin + 1) AS ny
       |  FROM o, b),
       |z AS (SELECT x, y, ${zInterleaveSql("nx", "ny")} AS z FROM n)
       |SELECT z >> $BucketShift AS zbucket, count(*) AS n,
       |  min(x) AS cust_min, max(x) AS cust_max,
       |  min(y) AS day_min, max(y) AS day_max,
       |  CASE WHEN max(x) < $ProbeCustLo OR min(x) > $ProbeCustHi
       |         OR max(y) < $ProbeDayLo OR min(y) > $ProbeDayHi
       |       THEN 0 ELSE 1 END AS probe_hit
       |FROM z GROUP BY 1""".stripMargin
  }

  /** Hilbert-curve layout audit — the same (o_custkey, order day) audit as
    * [[zorderAudit]] but clustered along the Hilbert curve
    * ([[graft.sources.Hilbert.hilbertIndex]]): every curve step is
    * grid-adjacent, so equal-size index ranges have tighter 2-D envelopes
    * than Morton ranges (no Z "seams") — the Delta/Iceberg post-Z-order
    * upgrade, here with the full bucket table oracle-checked. Plan shape
    * identical to the z audit: 1-row broadcast bounds, narrow index
    * projection (one HOF loop per row, expression size level-independent),
    * one map-side-combinable groupBy. */
  def hilbertAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Hilbert
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("x"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("y"))
    val bounds = o.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"))
    val normed = o.crossJoin(broadcast(bounds))
      .withColumn("nx", expr(s"((x - xmin) * ${Hilbert.GridN}) div (xmax - xmin + 1)"))
      .withColumn("ny", expr(s"((y - ymin) * ${Hilbert.GridN}) div (ymax - ymin + 1)"))
      .withColumn("h", Hilbert.hilbertIndex(col("nx"), col("ny")))
    normed
      .groupBy(shiftright(col("h"), BucketShift).as("hbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("cust_min"), max(col("x")).as("cust_max"),
        min(col("y")).as("day_min"), max(col("y")).as("day_max"))
      .withColumn("probe_hit",
        (!(col("cust_max") < ProbeCustLo || col("cust_min") > ProbeCustHi ||
          col("day_max") < ProbeDayLo || col("day_min") > ProbeDayHi)).cast("int"))
  }

  /** DuckDB twin of the Hilbert index as an unrolled CTE ladder — one
    * step per bit level, same rotate-and-accumulate arithmetic as the
    * engine's HOF. (list_reduce would be the natural form, but DuckDB
    * 1.0 mis-evaluates CASE branches inside struct-returning lambdas —
    * the ladder is branch-per-column, which it handles correctly.) */
  private val hilbertAuditSql = {
    val n = graft.sources.Hilbert.GridN
    val steps = (1 to graft.sources.Hilbert.OrderBits).map { i =>
      val s = n >> i
      val prev = if (i == 1) "h0" else s"h${i - 1}"
      s"""h$i AS (SELECT x, y,
         |  CASE WHEN ((hy // $s) % 2) = 0
         |       THEN CASE WHEN ((hx // $s) % 2) = 1 THEN ${n - 1} - hy ELSE hy END
         |       ELSE hx END AS hx,
         |  CASE WHEN ((hy // $s) % 2) = 0
         |       THEN CASE WHEN ((hx // $s) % 2) = 1 THEN ${n - 1} - hx ELSE hx END
         |       ELSE hy END AS hy,
         |  hd + $s * $s * xor(3 * ((hx // $s) % 2), (hy // $s) % 2) AS hd
         |FROM $prev)""".stripMargin
    }.mkString(",\n")
    val last = s"h${graft.sources.Hilbert.OrderBits}"
    s"""WITH o AS (SELECT o_custkey AS x,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))::BIGINT AS y
       |  FROM orders),
       |b AS (SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax FROM o),
       |h0 AS (SELECT x, y,
       |    ((x - xmin) * $n) // (xmax - xmin + 1) AS hx,
       |    ((y - ymin) * $n) // (ymax - ymin + 1) AS hy,
       |    0::BIGINT AS hd
       |  FROM o, b),
       |$steps
       |SELECT hd >> $BucketShift AS hbucket, count(*) AS n,
       |  min(x) AS cust_min, max(x) AS cust_max,
       |  min(y) AS day_min, max(y) AS day_max,
       |  CASE WHEN max(x) < $ProbeCustLo OR min(x) > $ProbeCustHi
       |         OR max(y) < $ProbeDayLo OR min(y) > $ProbeDayHi
       |       THEN 0 ELSE 1 END AS probe_hit
       |FROM $last GROUP BY 1""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_layout_zorder", zorderAudit, Some(zorderAuditSql)),
    Q("q_layout_hilbert", hilbertAudit, Some(hilbertAuditSql)),
  )
}
