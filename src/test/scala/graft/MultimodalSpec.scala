package graft

import org.apache.spark.sql.DataFrame

import graft.ext.Multimodal

/** Binary-column plumbing + the REAL image codec path: PNG encode /
  * ImageIO decode / AffineTransformOp resize / histogram features.
  */
class MultimodalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def images(ids: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(id => (id, Multimodal.makePng(id))).toDF("doc_id", "content")
  }

  /** Formula channel sum of the full image for doc `id`. */
  private def fullSum(id: Long): Long = {
    val n = Multimodal.imgW(id) * Multimodal.imgH(id) * 3
    (0 until n).map(i => Multimodal.px(id, i).toLong).sum
  }

  test("payload metadata: byte length and checksum") {
    val out = Multimodal.metaQuery(docs((1L, "abcd"))).head()
    assert(out.getString(1) == "application/octet-stream")
    assert(out.getInt(2) == 4)
    assert(out.getString(3) == "e2fc714c4727ee9395f324cd2e7f331f") // md5("abcd")
  }

  test("frame sampling: every 16th byte") {
    val text = ('a' to 'z').mkString * 2 // 52 chars
    val out = Multimodal.frameSample(docs((1L, text)), 16).head()
    assert(out.getInt(1) == 4) // positions 1,17,33,49
    val expected = Seq(1, 17, 33, 49).map(p => text.charAt(p - 1).toInt).sum
    assert(out.getLong(2) == expected.toLong)
  }

  test("a known image decodes to known pixels through the codec path") {
    // Hand-built 2x2: red, green, blue, white — byte-exact through PNG.
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val s = spark
    import s.implicits._
    val out = Multimodal.decodeFrom(
      Seq((9L, bos.toByteArray)).toDF("doc_id", "content")).head()
    assert(out.getInt(1) == 2 && out.getInt(2) == 2)
    assert(out.getLong(3) == 255L * 6) // 3 primaries + white = 6 saturated channels
  }

  test("png generator roundtrips: decoded raster equals the pixel formula") {
    for (id <- 0L to 5L) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.makePng(id)))
      assert(img.getWidth == Multimodal.imgW(id) && img.getHeight == Multimodal.imgH(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = (y * img.getWidth + x) * 3
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == Multimodal.px(id, p))
        assert(((rgb >> 8) & 0xff) == Multimodal.px(id, p + 1))
        assert((rgb & 0xff) == Multimodal.px(id, p + 2))
      }
    }
  }

  test("decode reports exact dimensions and channel sums") {
    val rows = Multimodal.decodeFrom(images(0L to 9L: _*))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L to 9L) {
      val r = rows(id)
      assert(r.getInt(1) == Multimodal.imgW(id))
      assert(r.getInt(2) == Multimodal.imgH(id))
      assert(r.getLong(3) == fullSum(id))
    }
  }

  test("resize: nearest-neighbor 0.5x samples src = 2*dst + 1") {
    val rows = Multimodal.resizeFrom(images(0L to 9L: _*))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L to 9L) {
      val (w, h) = (Multimodal.imgW(id), Multimodal.imgH(id))
      val (ow, oh) = (w / 2, h / 2)
      val expected = (for {
        y <- 0 until oh; x <- 0 until ow; c <- 0 until 3
      } yield Multimodal.px(id, ((2 * y + 1) * w + 2 * x + 1) * 3 + c).toLong).sum
      val r = rows(id)
      assert(r.getInt(1) == ow && r.getInt(2) == oh)
      assert(r.getLong(3) == expected, s"doc $id")
    }
  }

  test("features: per-channel histogram fractions match the raster") {
    val rows = Multimodal.featuresFrom(images(0L to 9L: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (id <- 0L to 9L) {
      val (w, h) = (Multimodal.imgW(id), Multimodal.imgH(id))
      val f = rows(id)
      assert(f.length == 12)
      // each channel's 4 bins sum to ~1
      for (c <- 0 until 3)
        assert(math.abs(f.slice(c * 4, c * 4 + 4).sum - 1.0) < 1e-4, s"doc $id ch $c")
      val counts = new Array[Long](12)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        counts(c * 4 + (Multimodal.px(id, ((y * w) + x) * 3 + c) >> 6)) += 1
      for (b <- 0 until 12)
        assert(math.abs(f(b) - counts(b).toDouble / (w * h)) < 1e-5, s"doc $id bin $b")
    }
  }

  test("wav generator roundtrips: decoded PCM equals the sample formula") {
    for (id <- 0L to 5L) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.makeWav(id)))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate == 8000f && fmt.getSampleSizeInBits == 16 &&
        fmt.getChannels == 1)
      val pcm = ais.readAllBytes()
      assert(pcm.length / 2 == Multimodal.wavFrames(id))
      for (i <- 0 until (pcm.length / 2)) {
        val s = if (fmt.isBigEndian) (pcm(2 * i).toInt << 8) | (pcm(2 * i + 1) & 0xff)
                else (pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)
        assert(s == Multimodal.wavSample(id, i), s"clip $id frame $i")
      }
    }
  }

  test("a known clip decodes to known signal stats through the codec path") {
    val s = spark
    import s.implicits._
    // hand-built 4-frame clip: +1000, -1000, +1000, 0 → 2 zero crossings
    // by the (s >= 0) sign convention, exact sum/energy
    val samples = Seq(1000, -1000, 1000, 0)
    val pcm = samples.flatMap(v =>
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = Multimodal.decodeAudioFrom(
      Seq((3L, bos.toByteArray)).toDF("doc_id", "content")).head()
    assert(out.getAs[Long]("n_frames") == 4L)
    assert(out.getAs[Long]("sum_amp") == 1000L)
    assert(out.getAs[Long]("sum_sq") == 3L * 1000 * 1000)
    assert(out.getAs[Long]("zero_cross") == 2L)
    assert(out.getAs[Long]("duration_ms") == 0L) // 4 frames @ 8 kHz: 0.5 ms floors to 0
    assert(math.abs(out.getAs[Double]("rms") - math.sqrt(3e6 / 4)) < 1e-6)
  }

  test("audio features: amplitude histogram fractions match the sample formula") {
    val s = spark
    import s.implicits._
    val clips = (0L to 5L).map(id => (id, Multimodal.makeWav(id)))
      .toDF("doc_id", "content")
    val rows = Multimodal.audioFeaturesFrom(clips)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (id <- 0L to 5L) {
      val f = rows(id)
      assert(f.length == 8)
      assert(math.abs(f.sum - 1.0) < 1e-4, s"clip $id bins must sum to ~1")
      val n = Multimodal.wavFrames(id)
      val counts = new Array[Long](8)
      (0 until n).foreach(i => counts((Multimodal.wavSample(id, i) + 32768) >> 13) += 1)
      for (b <- 0 until 8)
        assert(math.abs(f(b) - counts(b).toDouble / n) < 1e-5, s"clip $id bin $b")
    }
  }

  test("gif generator roundtrips: every decoded frame equals the palette formula") {
    for (id <- 0L to 5L) {
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(Multimodal.makeGif(id))))
      assert(reader.getNumImages(true) == Multimodal.gifFrames(id))
      for (f <- 0 until Multimodal.gifFrames(id)) {
        val img = reader.read(f)
        assert(img.getWidth == 8 && img.getHeight == 6)
        for (y <- 0 until 6; x <- 0 until 8) {
          val p = Multimodal.gifPalIdx(id, f, y * 8 + x)
          val expected = ((p & 1) * 255) << 16 | (((p >> 1) & 1) * 255) << 8 |
            ((p >> 2) & 1) * 255
          assert((img.getRGB(x, y) & 0xffffff) == expected,
            s"clip $id frame $f pixel ($x,$y)")
        }
      }
      reader.dispose()
    }
  }

  test("multi-frame decode emits one exact row per frame") {
    val s = spark
    import s.implicits._
    val rows = Multimodal.decodeVideoFrom(
      Seq((4L, Multimodal.makeGif(4L))).toDF("doc_id", "content")).collect()
    assert(rows.length == Multimodal.gifFrames(4L))
    rows.foreach { r =>
      val f = r.getAs[Int]("frame")
      val expected = (0 until 48).map { i =>
        val p = Multimodal.gifPalIdx(4L, f, i)
        255L * Integer.bitCount(p)
      }.sum
      assert(r.getAs[Long]("sum_px") == expected, s"frame $f")
      assert(r.getAs[Int]("n_frames") == Multimodal.gifFrames(4L))
    }
  }
}
