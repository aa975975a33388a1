package graft.sources

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layout schema concerns a long-lived 100 TB table accumulates:
  * files written under DIFFERENT schema versions (columns added over
  * time) and NESTED payloads whose readers touch one subfield.
  *
  *  - Schema evolution: `mergeSchema` unions the per-file schemas at
  *    read time; rows from files that predate a column surface it as
  *    NULL. The oracle replays the same union semantics from the base
  *    table, so the merged read is hash-checked, not just spec'd.
  *  - Nested pruning: reading `meta.o_custkey` must push a ONE-SUBFIELD
  *    ReadSchema into the parquet scan (Spark's nested schema pruning) —
  *    at scale the difference between reading one column chunk and
  *    deserializing every struct. EvolutionSpec asserts the pruned
  *    ReadSchema; the oracle checks the values.
  */
object Evolution {

  private def tag(dir: String) =
    new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")

  /** Two generations of the same table: v1 files lack o_orderstatus. */
  def evolvedDirs(spark: SparkSession, dir: String): (String, String) = {
    val base = new java.io.File(sys.props("java.io.tmpdir"), s"graft_evo_${tag(dir)}")
    val (v1, v2) = (new java.io.File(base, "v1"), new java.io.File(base, "v2"))
    if (!new java.io.File(v1, "_SUCCESS").exists()) {
      val o = Tables.orders(spark, dir)
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .write.mode("overwrite").parquet(v1.getAbsolutePath)
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(v2.getAbsolutePath)
    }
    (v1.getAbsolutePath, v2.getAbsolutePath)
  }

  /** Merged-schema read across both generations: pre-evolution rows
    * carry NULL in the added column. */
  def evolvedScan(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = evolvedDirs(spark, dir)
    spark.read.option("mergeSchema", "true").parquet(v1, v2)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
  }

  private val evolvedScanSql =
    """SELECT o_orderkey, o_custkey, CAST(NULL AS VARCHAR) AS o_orderstatus
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus
      |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin

  /** Nested copy: order attributes packed into one struct payload. */
  def nestedDir(spark: SparkSession, dir: String): String = {
    val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_nested_${tag(dir)}")
    if (!new java.io.File(out, "_SUCCESS").exists())
      Tables.orders(spark, dir)
        .select(col("o_orderkey"),
          struct(col("o_custkey"), col("o_orderstatus"), col("o_totalprice")).as("meta"))
        .write.mode("overwrite").parquet(out.getAbsolutePath)
    out.getAbsolutePath
  }

  /** One-subfield projection out of the nested payload — the scan's
    * ReadSchema must contain only meta.o_custkey (EvolutionSpec). */
  def nestedScan(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(nestedDir(spark, dir))
      .select(col("o_orderkey"), col("meta.o_custkey").as("custkey"))

  private val nestedScanSql =
    "SELECT o_orderkey, o_custkey AS custkey FROM orders"

  val queries: Seq[Q] = Seq(
    Q("q_scan_evolution", evolvedScan, Some(evolvedScanSql)),
    Q("q_scan_nested", nestedScan, Some(nestedScanSql)),
  )
}
