package graft

import graft.operators.Mining
import org.apache.spark.sql.Row

/** Pins the TextRank per-node edge cap (round-7 verdict task #1):
  * cap-off ≡ the registered uncapped query bit-for-bit, a generous cap is
  * a no-op on sparse graphs, and a tight cap keeps exactly the top-w
  * out-edges by (weight desc, dst asc). */
class TextrankCapSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq

  test("edgeCap = MaxValue is bit-identical to the registered uncapped textrank at sf0.001") {
    val dir = SparkSpec.sf0001
    assert(rows(Mining.textrankWith(spark, dir, Some(Int.MaxValue))) ===
      rows(Mining.textrank(spark, dir)))
  }

  test("capped variant on a sparse planted corpus (out-degree <= cap) equals uncapped") {
    // every word co-occurs with at most 2 distinct neighbors — far below
    // TrEdgeCap, so the top-w window keeps everything
    val dir = fixtureDir("documents" -> Seq(
      (0L, "alpha beta gamma beta alpha"),
      (1L, "delta epsilon delta zeta"),
      (2L, "one two one two one")).toDF("doc_id", "text"))
    assert(rows(Mining.textrankCapped(spark, dir)) === rows(Mining.textrank(spark, dir)))
  }

  test("tight cap keeps the strongest neighbor: hub rank reflects only surviving edges") {
    // star graph: hub co-occurs with spokes s1..s5, but edge (hub, s1) is
    // repeated 6x while the rest appear once — a cap of 1 must keep exactly
    // hub->s1 (weight desc) and each spoke's single out-edge back to hub
    val text = (("hub s1 " * 6) + "hub s2 hub s3 hub s4 hub s5").trim
    val dir = fixtureDir("documents" -> Seq((0L, text)).toDF("doc_id", "text"))
    val capped = Mining.textrankWith(spark, dir, Some(1))
      .select("word").as[String].collect().toSet
    // with only (hub <-> s1) plus spoke->hub edges surviving, the ranked
    // keyword set is dominated by hub and s1; s2..s5 keep an out-edge to hub
    // but receive no mass beyond damping, so the top-3 excludes them
    assert(capped.contains("hub") && capped.contains("s1"))
    assert(!capped.exists(Set("s3", "s4", "s5")))
  }

  test("capped oracle SQL references the cap and the registered pair differ only in the edge CTE") {
    val uncapped = Registry.byName("q_text_textrank").oracle.get
    val capped = Registry.byName("q_text_textrank_capped").oracle.get
    assert(!uncapped.contains("erk"))
    assert(capped.contains(s"erk <= ${Mining.TrEdgeCap}"))
  }
}
