package graft

import org.apache.spark.sql.SparkSession

/** Wide-tier benchmark: times EVERY registered query (all of Registry.all,
  * not just the 19 bench=true headliners) at SPARK_GRAFT_SF_DIR and writes
  * BENCH_WIDE.json — the coverage tier whose absence let two pathologies
  * (the 93 s near-unique-key TopK regression, the fixed-plane embed
  * candidate blow-up) hide until a verdict task forced a measurement.
  *
  * One timed run per query by default (SPARK_GRAFT_BENCH_RUNS to raise):
  * the tier exists to CATCH outliers, not to publish steady-state numbers
  * — a query that times 10× its family's band gets re-measured by hand.
  * Queries are warmed once at sf0.001 so the wide numbers measure plans,
  * not classloading. Output: one JSON object with per-query seconds
  * (descending), the total, and the calibration spin for cross-run
  * normalization; failures time as -1 and are listed under "errors".
  */
object BenchWide {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-wide")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = Registry.all
    // classloading/footer warmup at the smallest SF
    all.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()

    var errors = List.empty[String]
    val timed = all.map { q =>
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { q.run(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            errors ::= s"""{"query":"${q.name}","error":${jsonStr(e.toString.take(200))}}"""
            false
          }
        spark.catalog.clearCache()
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }.min
      q.name -> t
    }.sortBy(-_._2)

    val calib = {
      def spin(): Double = {
        val t0 = System.nanoTime()
        var x = 88172645463325252L
        var i = 0
        while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        if (x == 0) println("")
        (System.nanoTime() - t0) / 1e9
      }
      spin(); (1 to 3).map(_ => spin()).min
    }
    val qs = timed.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = timed.collect { case (_, v) if v > 0 => v }.sum
    val line =
      s"""{"metric":"wide","n_queries":${all.size},"runs":$runs,"total_sec":$total,""" +
      s""""calib_spin_sec":$calib,"sf":"$sfDir","errors":[${errors.distinct.mkString(",")}],""" +
      s""""queries_desc":$qs}"""
    println(line)
    try {
      val out = new java.io.PrintWriter("BENCH_WIDE.json", "UTF-8")
      try out.println(line) finally out.close()
    } catch { case e: Exception =>
      System.err.println(s"[bench-wide] BENCH_WIDE.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
}
