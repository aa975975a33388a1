package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (like PlanDump): best-of-N wall times for an arbitrary
  * comma-separated registry query list — the source of the PLANS.md
  * engine-vs-DuckDB tables. Usage:
  *   runMain graft.TimeQueries <sfDir> <q1,q2,...> [runs=2]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val unknown = names.filterNot(Registry.byName.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val qs = names.map(Registry.byName)
    qs.foreach { q => // warmup: classload + the TARGET dir's parquet footers
      try q.run(spark, sfDir).count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    qs.foreach { q =>
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"TIME ${q.name}%-34s $t%7.3f")
    }
    spark.stop()
  }
}
