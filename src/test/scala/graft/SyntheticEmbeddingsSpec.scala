package graft

import graft.operators.Similarity
import graft.sources.SyntheticEmbeddings
import org.apache.spark.sql.functions._

/** The embeddings decade generator must match the harness table's shape
  * (unit norms, 10 labels, float components) and be rerun-deterministic;
  * the adaptive plane count must actually shrink candidate volume. */
class SyntheticEmbeddingsSpec extends SparkSuite {

  test("vectors are unit-norm floats with labels 0..9, deterministically") {
    val a = SyntheticEmbeddings.corpus(spark, 300).collect()
    val b = SyntheticEmbeddings.corpus(spark, 300).collect()
    assert(a.length == 300)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length == SyntheticEmbeddings.Dim)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
      val l = r.getInt(2)
      assert(l >= 0 && l <= 9)
    }
  }

  test("adaptive planes cut bucketed candidate pairs vs the fixed count at 16k vectors") {
    val dir = "/tmp/graft_synth_embed_test_16000"
    SyntheticEmbeddings.writePoint(spark, dir, 16000L)
    val fixed = Similarity.embedCandidateCount(spark, dir, adaptive = false)
    val adaptive = Similarity.embedCandidateCount(spark, dir, adaptive = true)
    // fixed 64 buckets hold ~250 vectors each at 16k; adaptive targets
    // TargetBucketRows, so candidate volume must drop by a wide margin
    assert(adaptive * 2 < fixed, s"adaptive=$adaptive fixed=$fixed")
  }
}
