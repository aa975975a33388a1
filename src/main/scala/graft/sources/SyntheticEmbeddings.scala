package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic embeddings decade for the ANN-family scale evidence — the
  * harness `embeddings` table stops at 2k vectors (sf0.1), far too small
  * to separate a bucketed candidate generator from an all-pairs one.
  * Matches the harness table's measured statistics (unit-norm vectors,
  * i.i.d. components ~ N(0, 1/√Dim)-like with NO label-cluster structure
  * — verified intra-label mean cosine ≈ inter-label ≈ 0, σ ≈ 1/8), so
  * per-bucket populations and threshold-tail pair counts scale the way
  * the harness corpus would.
  *
  * Fully deterministic: every component is xxhash64(vec_id, dim) mapped
  * to [-1, 1] then L2-normalized — rerunning a point yields byte-identical
  * parquet, and no RNG state rides the driver. */
object SyntheticEmbeddings {

  val Dim = 64

  def corpus(spark: SparkSession, n: Long): DataFrame = {
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("r", transform(sequence(lit(0), lit(Dim - 1)),
        d => xxhash64(col("vec_id"), d).cast("double") / lit(9.223372036854776e18)))
      .withColumn("nrm", sqrt(aggregate(col("r"), lit(0.0), (acc, x) => acc + x * x)))
      .select(col("vec_id"),
        transform(col("r"), x => (x / col("nrm")).cast("float")).as("embedding"),
        pmod(xxhash64(col("vec_id"), lit(999)), lit(10)).cast("int").as("label"))
  }

  /** Idempotent materialization of one decade point as a harness-shaped
    * sf directory (embeddings.parquet only — the ANN family reads nothing
    * else). */
  def writePoint(spark: SparkSession, dir: String, n: Long): Unit = {
    val f = new java.io.File(s"$dir/embeddings.parquet/_SUCCESS")
    if (!f.exists())
      corpus(spark, n).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
