package graft

import graft.operators.{Layout, Sketches}
import org.apache.spark.sql.functions._

/** CMS / KMV-set-ops / z-order / sqrt-mixture invariants at sf0.001.
  * Cross-engine exactness is the driver's DuckDB sweep; these specs pin
  * the algebraic guarantees the operators advertise. */
class SketchesSpec extends SparkSuite {
  private val dir = SparkSpec.sf0001

  test("CMS estimates are one-sided: n_cms >= n_exact for every word") {
    val r = Sketches.cmsWords(spark, dir).collect()
    assert(r.length == 20)
    r.foreach { row =>
      assert(row.getAs[Long]("n_cms") >= row.getAs[Long]("n_exact"),
        s"CMS must never underestimate: $row")
      assert(row.getAs[Long]("over") ==
        row.getAs[Long]("n_cms") - row.getAs[Long]("n_exact"))
    }
  }

  test("CMS width 16 actually collides on the 31-word harness vocab") {
    // at least one of the top-20 words must show a nonzero overestimate,
    // otherwise the audit is vacuous (see CmsWidth scaladoc)
    val overs = Sketches.cmsWords(spark, dir).agg(sum(col("over"))).first().getLong(0)
    assert(overs > 0, "expected collisions with W=16 on a 31-word vocabulary")
  }

  test("KMV set ops: jaccard in [0,1], union >= each side's sketch floor") {
    val r = Sketches.kmvSetOps(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val j = row.getAs[Double]("est_jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(row.getAs[Double]("est_union") >= row.getAs[Long]("n_merge").toDouble - 1e-9)
      assert(row.getAs[Double]("est_intersection") <=
        row.getAs[Double]("est_union") + 1e-9)
    }
  }

  test("z-order buckets partition the table and the probe box skips most") {
    val orders = sources.Tables.orders(spark, dir)
    val total = orders.count()
    val audit = Layout.zorderAudit(spark, dir).collect()
    assert(audit.map(_.getAs[Long]("n")).sum == total)
    val hits = audit.count(_.getAs[Int]("probe_hit") == 1)
    // the whole point of z-order: a narrow 2-D box touches few buckets
    assert(hits < audit.length / 4,
      s"probe box hit $hits of ${audit.length} buckets — layout not selective")
    // every hit bucket's envelope genuinely intersects the box
    audit.filter(_.getAs[Int]("probe_hit") == 1).foreach { b =>
      assert(b.getAs[Long]("cust_max") >= Layout.ProbeCustLo &&
        b.getAs[Long]("cust_min") <= Layout.ProbeCustHi)
      assert(b.getAs[Long]("day_max") >= Layout.ProbeDayLo &&
        b.getAs[Long]("day_min") <= Layout.ProbeDayHi)
    }
  }

  test("sqrt mixture: dominant lang stays at 1 epoch, rare langs upsample") {
    val docs = sources.Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxLang = counts.maxBy(_._2)._1
    val mix = operators.Sampling.mixSqrt(spark, dir)
    val perLang = mix.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // dominant language: rate exactly 1.0 → output rows == input rows
    assert(perLang(maxLang) == counts(maxLang))
    // every rarer language is upsampled strictly above its input count
    // (rate > 1 means floor>=1 plus a fractional epoch on some docs)
    counts.filterNot(_._1 == maxLang).foreach { case (lang, n) =>
      assert(perLang(lang) > n, s"$lang: ${perLang(lang)} !> $n")
    }
    // deterministic: rerun is row-identical
    assert(mix.exceptAll(operators.Sampling.mixSqrt(spark, dir)).isEmpty)
  }
}
