package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRow, WavCodec}

/** Real RIFF/WAVE PCM16 decode (operators/Multimodal.WavCodec): header
  * round-trip, closed-form sine features, malformed-payload handling, and
  * the distributed decode path. */
class AudioSpec extends SparkSuite {
  import spark.implicits._

  test("synthesize -> parse round-trips header fields and sample count") {
    val bytes = WavCodec.synthesize(freqHz = 440.0, nSamples = 8000, rate = 8000)
    val Some((channels, rate, bits, samples)) = WavCodec.parse(bytes)
    assert(channels === 1 && rate === 8000 && bits === 16)
    assert(samples.length === 8000)
  }

  test("sine features match closed form: duration, RMS ~ amp/sqrt(2), crossings ~ 2f*t") {
    val f = WavCodec.features(7L, WavCodec.synthesize(440.0, 8000, 8000, amp = 0.6))
    assert(f.ok)
    assert(f.duration_s === 1.0)
    assert(math.abs(f.rms - 0.6 / math.sqrt(2)) < 0.01, s"rms=${f.rms}")
    // a 440 Hz sine crosses zero ~880 times per second
    assert(math.abs(f.n_zero_cross - 880) <= 2, s"crossings=${f.n_zero_cross}")
    assert(f.peak >= (0.59 * 32767).toInt && f.peak <= (0.6 * 32767).toInt + 1)
  }

  test("unknown chunks are skipped; malformed payloads yield ok=false") {
    // inject a LIST chunk between fmt and data
    val good = WavCodec.synthesize(200.0, 100, 8000)
    val buf = java.nio.ByteBuffer.allocate(good.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(good, 0, 36) // RIFF..WAVE + fmt chunk
    buf.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
    buf.put(good, 36, good.length - 36)
    val Some((_, _, _, samples)) = WavCodec.parse(buf.array())
    assert(samples.length === 100)

    assert(!WavCodec.features(1L, Array[Byte](1, 2, 3)).ok)
    assert(!WavCodec.features(2L, "RIFFxxxxJUNK".getBytes ++ new Array[Byte](40)).ok)
    val truncated = good.take(50) // data chunk size exceeds remaining bytes
    assert(!WavCodec.features(3L, truncated).ok)
  }

  test("distributed decode: payloads decoded per partition, features typed") {
    val rows = spark.createDataset(Seq(
      MediaRow(1L, WavCodec.synthesize(100.0, 4000)),
      MediaRow(2L, WavCodec.synthesize(300.0, 2000)),
      MediaRow(3L, Array[Byte](0, 0, 0)))).repartition(3)
    val out = Multimodal.decodeAudio(rows).collect().sortBy(_.doc_id)
    assert(out.length === 3)
    assert(out(0).ok && out(0).duration_s === 0.5)
    assert(out(1).ok && out(1).duration_s === 0.25)
    assert(!out(2).ok)
    // crossings scale with frequency x duration
    assert(math.abs(out(0).n_zero_cross - 100) <= 2)
    assert(math.abs(out(1).n_zero_cross - 150) <= 2)
  }

  test("registered q_mm_audio decodes one clip per document") {
    val out = Multimodal.audioFeatures(spark, SparkSpec.sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("ok")))
    assert(rows.forall(_.getAs[Double]("duration_s") >= 0.5))
  }
}
