package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** The one-pass corpus gate must agree bit-for-bit with the standalone
  * operators it fuses — the composition is only trustworthy if fusing
  * changed nothing. */
class CorpusGateSpec extends SparkSuite {
  private val dir = SparkSpec.sf0001

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("quality bits (1|2|4) reproduce q_text_filter_quality exactly") {
    val gate = TextAnalysis.corpusGate(spark, dir)
    val gateQualityPass = ids(gate.filter(col("gate_mask").bitwiseAND(lit(7)) === 0))
    val standalone = ids(TextAnalysis.filterQuality(spark, dir))
    assert(gateQualityPass === standalone)
  }

  test("pii bit (8) reproduces piiScan's has_pii flag") {
    val gate = TextAnalysis.corpusGate(spark, dir)
    val gatePii = ids(gate.filter(col("gate_mask").bitwiseAND(lit(8)) =!= 0))
    val standalone = ids(TextAnalysis.piiScan(spark, dir).filter(col("has_pii")))
    assert(gatePii === standalone)
  }

  test("dup bit (32) complement reproduces the normalized-dedup keepers") {
    val gate = TextAnalysis.corpusGate(spark, dir)
    val gateKeepers = ids(gate.filter(col("gate_mask").bitwiseAND(lit(32)) === 0))
    val standalone = Dedup.exactNormalized(spark, dir)
      .select(col("keeper_id").as("doc_id"))
    assert(gateKeepers === ids(standalone))
  }

  test("gate report accounts for every doc and overlapping flags") {
    val n = sources.Tables.documents(spark, dir).count()
    val rep = TextAnalysis.corpusGateReport(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_flagged")).toMap
    val gate = TextAnalysis.corpusGate(spark, dir)
    assert(rep("kept") === gate.filter(col("keep")).count())
    // flags overlap, so their sum must be >= total drops
    val drops = n - rep("kept")
    assert(TextAnalysis.GateNames.map(g => rep(g._2)).sum >= drops)
  }
}
