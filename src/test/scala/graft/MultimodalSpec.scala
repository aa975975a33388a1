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

  test("real PNG decode via JDK ImageIO recovers dims and luminance") {
    import spark.implicits._
    // generate solid-color PNGs of known size/color in-process
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, png(8, 4, 0xffffff)),  // white
      Multimodal.MediaRow(2L, png(3, 5, 0x000000)),  // black
      Multimodal.MediaRow(3L, png(2, 2, 0xff0000)),  // red
      Multimodal.MediaRow(4L, "not an image".getBytes("UTF-8")))
    val out = Multimodal.decodeImages(spark.createDataset(rows).repartition(2))
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).ok && out(1L).width == 8 && out(1L).height == 4
      && math.abs(out(1L).mean_lum - 255.0) < 1e-9)
    assert(out(2L).ok && out(2L).width == 3 && out(2L).height == 5
      && out(2L).mean_lum == 0.0)
    assert(out(3L).ok && math.abs(out(3L).mean_lum - 255 * 0.299) < 0.5)
    assert(!out(4L).ok && out(4L).width == -1)
  }

  test("mean_byte is the payload byte average (decoder arithmetic)") {
    val f = Multimodal.StubDecoder.decode(Multimodal.MediaRow(1L, "ab".getBytes("UTF-8")))
    assert(f.n_bytes === 2)
    assert(f.mean_byte === ('a'.toInt + 'b'.toInt) / 2.0)
    val empty = Multimodal.StubDecoder.decode(Multimodal.MediaRow(2L, Array.emptyByteArray))
    assert(empty.mean_byte === 0.0 && empty.n_frames === 1)
  }

  test("aHash is noise-invariant: same base pattern hashes equal, bases differ") {
    def hashOf(id: Long) = Multimodal.aHash(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.synthPng(id))))
    // ids 3 and 28 share base 3 but have different noise pixels
    assert(hashOf(3L) === hashOf(28L))
    assert(hashOf(3L) === hashOf(53L))
    // the 25 base patterns produce 25 distinct hashes
    val hashes = (0L until 25L).map(hashOf)
    assert(hashes.distinct.length === 25)
  }

  test("animated GIF round-trip is lossless: frame count and pixels exact") {
    val payload = Multimodal.GifVideo.synthesize(7L, 6)
    val frames = Multimodal.GifVideo.decodeFrames(payload)
    assert(frames.length === 6)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.getWidth === 16 && img.getHeight === 16)
      val want = Multimodal.GifVideo.frame(7L, f)
      for (y <- 0 until 16; x <- 0 until 16)
        assert((img.getRGB(x, y) & 0xffffff) === (want.getRGB(x, y) & 0xffffff),
          s"frame $f pixel ($x,$y)")
    }
  }

  test("video frame sampling decodes real GIF frames with exact luminance") {
    val spark0 = spark
    import spark0.implicits._
    val out = Multimodal.videoFrames(spark, SparkSpec.sf0001)
      .as[(Long, Int, Int, Int, Double)].collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      val n = 4 + (id % 5).toInt
      assert(rows.length === (n + 1) / 2) // every 2nd frame of n
      rows.foreach { case (_, idx, w, h, lum) =>
        assert(idx % 2 === 0 && w === 16 && h === 16)
        // recompute from the synthesizer: two-tone 40/216 means
        val img = Multimodal.GifVideo.frame(id, idx)
        var s = 0.0
        for (y <- 0 until 16; x <- 0 until 16) s += (img.getRGB(x, y) & 0xff)
        assert(lum === s / 256)
      }
    }
  }

  test("real bilinear resize halves dims and preserves mean luminance") {
    val spark0 = spark
    import spark0.implicits._
    val out = Multimodal.resizeImagesReal(spark, SparkSpec.sf0001)
      .as[(Long, Int, Int, Int, Int, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, iw, ih, ow, oh, lum) =>
      assert(iw === 32 && ih === 32 && ow === 16 && oh === 16)
      // source is two-tone (40/216) constant 4x4 blocks: a half-scale
      // bilinear result keeps the overall mean close to the original
      val src = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.synthPng(id)))
      var s = 0.0
      for (y <- 0 until 32; x <- 0 until 32) s += (src.getRGB(x, y) & 0xff)
      val srcMean = s / 1024
      assert(math.abs(lum - srcMean) < 12.0, s"doc $id: $lum vs $srcMean")
    }
    // determinism
    val again = Multimodal.resizeImagesReal(spark, SparkSpec.sf0001)
      .as[(Long, Int, Int, Int, Int, Double)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("image near-dup clusters group exactly by doc_id % 25") {
    val spark0 = spark
    import spark0.implicits._
    val out = Multimodal.imageNearDup(spark, SparkSpec.sf0001)
      .as[(Long, Long, Long)].collect()
    assert(out.length === 25)
    val docs = sources.Tables.documents(spark, SparkSpec.sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id")).as[Long].collect()
    val wantSizes = docs.groupBy(_ % 25).view.mapValues(_.length.toLong).toMap
    val wantKeepers = docs.groupBy(_ % 25).view.mapValues(_.min).toMap
    out.foreach { case (_, n, keeper) =>
      assert(wantSizes(keeper % 25) === n)
      assert(wantKeepers(keeper % 25) === keeper)
    }
  }
}
