package graft

import graft.operators.Multimodal

/** Multimodal plumbing: the typed mapPartitions decode path and its
  * agreement with the declarative metadata query. */
class MultimodalSpec extends SparkSuite {

  test("decodeFeatures runs partition-parallel and is deterministic") {
    val a = Multimodal.decodeFeatures(spark, SparkSpec.sf0001).collect()
      .sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(spark, SparkSpec.sf0001).collect()
      .sortBy(_.doc_id)
    assert(a.length === 500)
    assert(a.toSeq === b.toSeq)
  }

  test("stub decoder output matches the declarative metadata query") {
    val typed = Multimodal.decodeFeatures(spark, SparkSpec.sf0001).collect()
      .map(f => f.doc_id -> f).toMap
    val meta = Multimodal.mediaMeta(spark, SparkSpec.sf0001).collect()
    meta.foreach { r =>
      val f = typed(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bytes") === f.n_bytes.toLong)
      assert(r.getAs[Int]("width") === f.width)
      assert(r.getAs[Long]("height") === f.height.toLong)
      assert(r.getAs[Int]("n_frames") === f.n_frames)
    }
  }

  test("mean_byte is the payload byte average (decoder arithmetic)") {
    val f = Multimodal.StubDecoder.decode(Multimodal.MediaRow(1L, "ab".getBytes("UTF-8")))
    assert(f.n_bytes === 2)
    assert(f.mean_byte === ('a'.toInt + 'b'.toInt) / 2.0)
    val empty = Multimodal.StubDecoder.decode(Multimodal.MediaRow(2L, Array.emptyByteArray))
    assert(empty.mean_byte === 0.0 && empty.n_frames === 1)
  }
}
