package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL-facing surface: register every testdata table of one scale-factor
  * dir as a temp view so users drive the engine with `spark.sql(...)` —
  * the same relations the DataFrame operators bind to. */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir) // ns→us conversion
               else Tables.load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
}
