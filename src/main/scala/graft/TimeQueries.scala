package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: best-of-2 wall time per registered query (the Bench harness's
  * timing discipline, pointed at an arbitrary query list) — feeds the
  * PLANS.md engine-vs-DuckDB tables. Usage:
  *   runMain graft.TimeQueries <sfDir> q1,q2,...
  * Prints one `name\tseconds` line per query. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val q = Registry.byName(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val best = math.min(once(), once())
      println(f"$n\t$best%.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
