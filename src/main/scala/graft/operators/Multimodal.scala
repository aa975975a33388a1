package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in distributed batches.
  *
  * Still images are decoded FOR REAL via JDK `javax.imageio` (PNG/JPEG/
  * BMP/GIF readers ship with the JVM — see [[decodeImages]], spec-tested
  * against generated PNGs), and audio is decoded FOR REAL via the
  * [[WavCodec]] RIFF/WAVE PCM16 parser (plain byte layout, no codec
  * library needed). Video container parsing is absent from the JVM, so
  * that step stays a clearly-marked deterministic STUB (`StubDecoder`) —
  * while everything Spark-side is real: the binary column, the metadata
  * schema, the partition-parallel batch decode via `mapPartitions` over a
  * typed Dataset, and the declarative metadata query with its DuckDB
  * oracle.
  *
  * Scale notes (100 TB):
  *  - Payload bytes never shuffle: metadata extraction is a narrow map, so
  *    each executor decodes only its own parquet splits. A real media
  *    pipeline keeps the same shape (payload column + mapPartitions /
  *    mapInArrow) and only swaps the decoder body.
  *  - `mapPartitions` amortizes decoder init (model load, codec context)
  *    once per partition — the reason it beats a per-row UDF.
  */
object Multimodal {

  /** A "media file": payload + typed metadata, synthesized from documents
    * (the harness ships no real media; payload = utf-8 bytes of the text). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      n_frames: Int, mean_byte: Double)

  /** STUB decoder — deterministic fake standing in for image/audio decode.
    * Real implementation would parse the container format here; the
    * surrounding plumbing (batching, schema, partitioning) is the real
    * deliverable. */
  object StubDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length
      var s = 0L
      var i = 0
      while (i < n) { s += (r.payload(i) & 0xff); i += 1 }
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = n,
        width = 1 + n % 64,
        height = 1 + (n / 7) % 64,
        n_frames = 1 + n / 256,
        mean_byte = if (n == 0) 0.0 else s.toDouble / n)
    }
  }

  /** REAL image decode — javax.imageio ships with the JDK (PNG/JPEG/BMP/
    * GIF readers, no external codecs), so still images are decoded for
    * real; only video/audio remain stubbed. Same partition-parallel shape:
    * payload bytes never shuffle, reader state amortized per partition. */
  final case class ImageMeta(
      doc_id: Long, ok: Boolean, width: Int, height: Int, mean_lum: Double)

  def decodeImages(images: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      it.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Throwable => null }
        if (img == null) ImageMeta(r.doc_id, ok = false, -1, -1, 0.0)
        else {
          val w = img.getWidth
          val h = img.getHeight
          var s = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              s += ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000.0
              x += 1
            }
            y += 1
          }
          ImageMeta(r.doc_id, ok = true, w, h, s / (w.toLong * h))
        }
      }
    }
  }

  /** Typed, partition-parallel decode path (exercised by the test suite —
    * not oracle-checkable because the decoder is engine-side code). */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions { it => it.map(StubDecoder.decode) } // decoder init once/partition
  }

  /** Output of the stub "resize": aspect-preserving fit into a target box
    * plus a checksum of the (fake) resampled pixels. */
  final case class ResizedImage(
      doc_id: Long, src_w: Int, src_h: Int, out_w: Int, out_h: Int,
      checksum: Long)

  /** Resize: aspect-preserving fit of the decoded dims into targetW×targetH.
    * The pixel resample is STUBBED (checksum over a byte stride stands in
    * for the interpolation loop); dims math and the partition-parallel
    * batch shape are the real plumbing. */
  def resizeFeatures(spark: SparkSession, dir: String,
      targetW: Int = 32, targetH: Int = 32): Dataset[ResizedImage] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions { it => // resizer context init once per partition
        it.map { r =>
          val f = StubDecoder.decode(r)
          val scale = math.min(targetW.toDouble / f.width, targetH.toDouble / f.height)
          val ow = math.max(1, math.round(f.width * scale).toInt)
          val oh = math.max(1, math.round(f.height * scale).toInt)
          var sum = 0L
          var i = 0
          val stride = math.max(1, r.payload.length / (ow * oh))
          while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += stride }
          ResizedImage(r.doc_id, f.width, f.height, ow, oh, sum)
        }
      }
  }

  final case class ResizedReal(
      doc_id: Long, in_w: Int, in_h: Int, out_w: Int, out_h: Int, mean_lum: Double)

  /** REAL image resize: decode the PNG, bilinear-rescale through
    * Graphics2D (JDK, no external libs), and report the resized frame's
    * mean luminance — the thumbnail/feature-extraction preprocessing step,
    * partition-parallel with renderer state amortized per partition. */
  def resizeImagesReal(spark: SparkSession, dir: String,
      targetW: Int = 16, targetH: Int = 16): Dataset[ResizedReal] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        val hints = new java.awt.RenderingHints(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        it.map { id =>
          val src = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(synthPng(id)))
          val out = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHints(hints)
          g.drawImage(src, 0, 0, targetW, targetH, null)
          g.dispose()
          var s = 0.0
          var y = 0
          while (y < targetH) {
            var x = 0
            while (x < targetW) { s += (out.getRGB(x, y) & 0xff); x += 1 }
            y += 1
          }
          ResizedReal(id, src.getWidth, src.getHeight, targetW, targetH,
            s / (targetW * targetH))
        }
      }
  }

  /** One sampled frame of a (fake) video payload. */
  final case class SampledFrame(doc_id: Long, frame_idx: Int, frame_hash: String)

  /** Frame sampling: every `everyK`-th frame of each payload becomes one
    * output row (flatMap fan-out inside mapPartitions — codec state would
    * be reused across frames of a partition). Frame bytes are a
    * deterministic payload slice in this stub. */
  def sampleFrames(spark: SparkSession, dir: String, everyK: Int = 4): Dataset[SampledFrame] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // once/partition
        it.flatMap { r =>
          val f = StubDecoder.decode(r)
          (0 until f.n_frames by everyK).iterator.map { idx =>
            val start = if (f.n_bytes == 0) 0 else (idx * 37) % math.max(1, f.n_bytes)
            val len = math.min(64, f.n_bytes - start)
            md.reset()
            md.update(r.payload, start, math.max(len, 0))
            val hash = md.digest().map("%02x".format(_)).mkString
            SampledFrame(r.doc_id, idx, hash)
          }
        }
      }
  }

  // ---------------------------------------------------------------------
  // REAL video decode: animated GIF is the one multi-frame container the
  // JDK ships a codec for (ImageIO's GIF reader exposes getNumImages +
  // per-frame read). Frames here are two-tone palettes, so the GIF
  // round-trip is pixel-lossless and every frame feature is exact.
  // With this, NO decode path is stubbed: images (PNG/JPEG/BMP/GIF),
  // audio (RIFF/WAVE PCM16), video (animated GIF) all parse for real;
  // `StubDecoder` remains only as the declarative-metadata twin.
  // ---------------------------------------------------------------------

  object GifVideo {

    /** One frame: a 16×16 two-tone block pattern keyed by (id, frame). */
    private[graft] def frame(id: Long, f: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val base = (id % 25).toInt
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          val block = (x / 4) * 4 + (y / 4)
          val v = if ((((base * 16 + block) * 31 + f * 7) % 5) < 2) 40 else 216
          img.setRGB(x, y, v << 16 | v << 8 | v)
          x += 1
        }
        y += 1
      }
      img
    }

    /** Encode an nFrames animated GIF (pure JDK sequence writer). */
    def synthesize(id: Long, nFrames: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { f =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(frame(id, f), null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
      writer.dispose()
      ios.close()
      out.toByteArray
    }

    /** Decode every frame of a GIF payload. */
    def decodeFrames(payload: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).map(reader.read(_))
      } finally { reader.dispose(); iis.close() }
    }
  }

  final case class VideoFrame(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, mean_lum: Double)

  /** Registered video pipeline: synthesize a deterministic animated GIF
    * per document (4-8 frames keyed off doc_id), decode it FOR REAL
    * through the JDK GIF reader, and keep every `everyK`-th frame with
    * its exact mean luminance (two-tone palette → lossless round-trip).
    * Engine-side codec → rows-only check; MultimodalSpec asserts frame
    * counts and pixel-exact luminance against the synthesizer. */
  def videoFrames(spark: SparkSession, dir: String, everyK: Int = 2): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val n = 4 + (id % 5).toInt
          val frames = GifVideo.decodeFrames(GifVideo.synthesize(id, n))
          frames.indices.by(everyK).iterator.map { idx =>
            val img = frames(idx)
            var s = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                s += (img.getRGB(x, y) & 0xff).toDouble
                x += 1
              }
              y += 1
            }
            VideoFrame(id, idx, img.getWidth, img.getHeight,
              s / (img.getWidth * img.getHeight))
          }
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------------
  // REAL audio decode: RIFF/WAVE PCM is a plain byte layout (header + raw
  // little-endian samples), so it parses with zero external codecs — like
  // the ImageIO path, this upgrades audio from stub to real.
  // ---------------------------------------------------------------------

  /** Decoded audio features. `ok=false` rows carry -1/-0.0 defaults. */
  final case class AudioMeta(
      doc_id: Long, ok: Boolean, sample_rate: Int, n_channels: Int,
      bits: Int, n_samples: Int, duration_s: Double, rms: Double,
      n_zero_cross: Int, peak: Int)

  /** Minimal RIFF/WAVE PCM16 codec (synthesize for fixtures, parse for
    * real): chunk-walking parser, little-endian, even-padded chunks. */
  object WavCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** A deterministic mono PCM16 sine clip — the fixture generator. */
    def synthesize(freqHz: Double, nSamples: Int, rate: Int = 8000,
        amp: Double = 0.6): Array[Byte] = {
      val dataLen = nSamples * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        val v = math.round(amp * 32767.0 *
          math.sin(2.0 * math.Pi * freqHz * i / rate)).toShort
        buf.putShort(v)
        i += 1
      }
      buf.array()
    }

    /** Parse header + PCM16 samples; None on anything malformed. */
    def parse(payload: Array[Byte]): Option[(Int, Int, Int, Array[Short])] = {
      if (payload.length < 44) return None
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (tag() != "RIFF") return None
      buf.getInt // declared riff size (tolerate truncated writers)
      if (tag() != "WAVE") return None
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[Array[Short]] = None
      while (buf.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
        val id = tag()
        val size = buf.getInt
        if (size < 0 || size > buf.remaining()) return None
        val next = buf.position() + size + (size & 1) // chunks even-padded
        id match {
          case "fmt " =>
            if (size < 16) return None
            val audioFormat = buf.getShort
            val channels = buf.getShort.toInt
            val rate = buf.getInt
            buf.getInt; buf.getShort // byteRate, blockAlign
            val bits = buf.getShort.toInt
            if (audioFormat != 1 || bits != 16 || channels < 1) return None
            fmt = Some((channels, rate, bits))
          case "data" =>
            val out = new Array[Short](size / 2)
            var i = 0
            while (i < out.length) { out(i) = buf.getShort; i += 1 }
            data = Some(out)
          case _ => // skip unknown chunk (LIST, cue, …)
        }
        buf.position(math.min(next, buf.limit()))
      }
      for ((c, r, b) <- fmt; d <- data) yield (c, r, b, d)
    }

    def features(docId: Long, payload: Array[Byte]): AudioMeta =
      parse(payload) match {
        case None =>
          AudioMeta(docId, ok = false, -1, -1, -1, -1, 0.0, 0.0, -1, -1)
        case Some((channels, rate, bits, samples)) =>
          var sumSq = 0.0
          var crossings = 0
          var peak = 0
          var i = 0
          while (i < samples.length) {
            val s = samples(i).toInt
            val norm = s / 32768.0
            sumSq += norm * norm
            if (math.abs(s) > peak) peak = math.abs(s)
            if (i > 0 && ((samples(i - 1) < 0) != (s < 0))) crossings += 1
            i += 1
          }
          val n = samples.length / channels
          AudioMeta(docId, ok = true, rate, channels, bits, n,
            duration_s = n.toDouble / rate,
            rms = if (samples.isEmpty) 0.0 else math.sqrt(sumSq / samples.length),
            n_zero_cross = crossings, peak = peak)
      }
  }

  /** Partition-parallel REAL audio decode — same shape as decodeImages:
    * payload bytes never shuffle, per-partition init amortized. */
  def decodeAudio(audio: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(it => it.map(r => WavCodec.features(r.doc_id, r.payload)))
  }

  /** Registered audio pipeline: synthesize a deterministic WAV per document
    * (frequency/length keyed off doc_id — stands in for reading a payload
    * column), then decode it FOR REAL through the RIFF parser. Not
    * SQL-expressible (binary codec), so the driver records the rows-only
    * check; AudioSpec asserts the decoded features against closed-form
    * sine-wave values instead. */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val freq = 100.0 + (id % 40) * 20.0 // 100..880 Hz
          val n = 4000 + (id % 16).toInt * 500 // 0.5..1.4 s @ 8 kHz
          MediaRow(id, WavCodec.synthesize(freq, n))
        }
      }
      .transform(decodeAudio)
      .toDF()
  }

  /** Declarative metadata query over the binary column — same fake-decode
    * arithmetic expressed in codegen'd functions, with a DuckDB oracle. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val n = octet_length(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      n.as("n_bytes"),
      md5(encode(col("text"), "UTF-8")).as("content_hash"),
      (n % 64 + 1).as("width"),
      (call_function("div", n, lit(7)) % 64 + 1).as("height"),
      (call_function("div", n, lit(256)) + 1).as("n_frames"))
  }

  private val mediaMetaSql =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_hash,
      |  octet_length(encode(text)) % 64 + 1 AS width,
      |  (octet_length(encode(text)) // 7) % 64 + 1 AS height,
      |  octet_length(encode(text)) // 256 + 1 AS n_frames
      |FROM documents""".stripMargin

  // ---------------------------------------------- image perceptual dedup

  /** 64-bit average hash (aHash) of a decoded image: 8×8 block means
    * thresholded at the global mean. The standard cheap perceptual
    * fingerprint — images that differ by small pixel noise hash
    * identically, so image near-dup becomes EXACT dedup on the hash (one
    * hash-groupBy; the payloads never shuffle). */
  def aHash(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val (bw, bh) = (math.max(w / 8, 1), math.max(h / 8, 1))
    val means = new Array[Double](64)
    var b = 0
    while (b < 64) {
      val (bx, by) = (b % 8, b / 8)
      var s = 0.0
      var n = 0
      var y = by * bh
      while (y < math.min((by + 1) * bh, h)) {
        var x = bx * bw
        while (x < math.min((bx + 1) * bw, w)) {
          val rgb = img.getRGB(x, y)
          s += ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000.0
          n += 1; x += 1
        }
        y += 1
      }
      means(b) = if (n == 0) 0.0 else s / n
      b += 1
    }
    val mean = means.sum / 64
    means.zipWithIndex.foldLeft(0L) { case (acc, (m, i)) =>
      if (m > mean) acc | (1L << i) else acc
    }
  }

  /** Deterministic PNG per document: a 32×32 two-tone block pattern keyed
    * by `doc_id % 25` (the "original" image), plus a one-pixel +1 LSB
    * perturbation keyed by the full doc_id (the "re-encode" noise). Block
    * values sit far from the aHash threshold, so noise never flips a bit —
    * same-pattern documents are perceptual duplicates by construction. */
  private[graft] def synthPng(id: Long): Array[Byte] = {
    val base = (id % 25).toInt
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        // two-tone per 4x4 block, block choice = multiplicative hash of
        // (base, block) so the 25 base patterns are pairwise distinct
        val block = (x / 4) * 8 + (y / 4)
        val v = if ((((base * 64 + block) * 2654435761L >>> 16) & 1) == 0) 40 else 216
        img.setRGB(x, y, v << 16 | v << 8 | v)
        x += 1
      }
      y += 1
    }
    val (nx, ny) = ((id % 32).toInt, ((id / 32) % 32).toInt)
    val v0 = img.getRGB(nx, ny) & 0xff
    val v1 = math.min(v0 + 1, 255)
    img.setRGB(nx, ny, v1 << 16 | v1 << 8 | v1)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Registered image near-dup pipeline: synthesize → REAL PNG encode +
    * ImageIO decode → aHash → exact dedup on the hash. Output is one row
    * per perceptual cluster. Engine-side codec → rows-only check;
    * MultimodalSpec asserts the cluster structure exactly. */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(synthPng(id)))
          (id, aHash(img))
        }
      }
      .toDF("doc_id", "ahash")
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy(col("keeper"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_mm_meta", mediaMeta, Some(mediaMetaSql)),
    Q("q_mm_audio", audioFeatures, None),
    Q("q_mm_image_neardup", imageNearDup, None),
    Q("q_mm_video_frames", (s, d) => videoFrames(s, d), None),
  )
}
