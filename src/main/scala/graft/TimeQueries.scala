package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc query timer for the PLANS.md engine-vs-DuckDB tables: times the
  * named registered queries (best-of-N, cache cleared between runs) on one
  * SF dir and prints `name<TAB>seconds` lines. Usage:
  * `runMain graft.TimeQueries <sfDir> <q1,q2,...> [runs]`. The per-round
  * BENCH numbers come from [[Bench]]; this exists so one-off measurement
  * sweeps (docs tables, regression checks) don't need a registry edit. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
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
    val qs = names.map(n => Registry.all.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"unknown query $n")))
    // one warmup pass (classloading + parquet footers)
    qs.foreach { q =>
      try q.run(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    qs.foreach { q =>
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"${q.name}%s\t$t%.3f")
    }
    spark.stop()
  }
}
