package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.web.SyntheticWeb

/**
 * Real JDK codec path: ImageIO (PNG) and AudioSystem (WAV) decode actual
 * bytes. Goldens are HAND-BUILT per the PNG/RIFF specs (not produced by the
 * same encoder that decodes them), so the decode path is checked against an
 * independent construction.
 */
class MultimodalSpec extends SparkSpec {

  /** Hand-built PNG (spec: signature + IHDR + IDAT[deflate of filtered
    * scanlines] + IEND, CRC32 per chunk): 2x1 RGB, pixels red then blue. */
  private def goldenPng: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(body.length).array()
      bos.write(len)
      val tb = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      bos.write(tb); bos.write(body)
      bos.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    // IHDR: width=2, height=1, bitDepth=8, colorType=2 (RGB), no interlace
    chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(1).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    // one scanline: filter 0, then RGB red + RGB blue
    val scan = Array[Byte](0, 255.toByte, 0, 0, 0, 0, 255.toByte)
    val d = new java.util.zip.Deflater()
    d.setInput(scan); d.finish()
    val comp = new Array[Byte](64)
    val n = d.deflate(comp); d.end()
    chunk("IDAT", java.util.Arrays.copyOf(comp, n))
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Hand-built RIFF/WAVE: 16-bit mono 8000 Hz PCM, 4 known samples. */
  private def goldenWav(samples: Seq[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(8000 * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => b.putShort(s))
    b.array()
  }

  test("golden PNG byte literal decodes: dims, channel means, histogram mass") {
    val f = Multimodal.JdkCodec.imageFeatures(goldenPng, dim = 16)
    assert(f != null, "hand-built PNG must decode")
    assert(f(0) === 2.0f && f(1) === 1.0f) // decoded dims
    assert(f(2) === 127.5f && f(3) === 0.0f && f(4) === 127.5f) // mean R/G/B
    // histogram: red -> luma 76, blue -> luma 29; 11 bins over 256
    val bins = f.drop(5)
    assert(math.abs(bins.sum - 1.0f) < 1e-6f)
    assert(bins((76 * 11) / 256) === 0.5f && bins((29 * 11) / 256) === 0.5f)
  }

  test("golden WAV byte literal decodes: rate, duration, hand-computed RMS") {
    val samples = Seq[Short](16384, -16384, 32767, 0)
    val f = Multimodal.JdkCodec.audioFeatures(goldenWav(samples), dim = 8)
    assert(f != null, "hand-built WAV must decode")
    assert(f(0) === 8000.0f && f(1) === 1.0f)
    assert(f(2) === (4 * 1000.0 / 8000).toFloat) // 0.5 ms
    val expectRms = math.sqrt(samples.map(s => math.pow(s / 32768.0, 2)).sum / 4).toFloat
    assert(math.abs(f(3) - expectRms) < 1e-4f)
  }

  test("JPEG decodes through the same ImageIO path (lossy: dims exact, means close)") {
    // encode a JPEG INDEPENDENTLY of the decode-under-test feature extractor
    val img = new java.awt.image.BufferedImage(16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, 0x808080) // uniform gray
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JDK must ship a JPEG writer")
    val f = Multimodal.JdkCodec.imageFeatures(bos.toByteArray, dim = 16)
    assert(f != null, "JPEG bytes must decode")
    assert(f(0) === 16.0f && f(1) === 8.0f)
    // JPEG is lossy: channel means stay within a few units of the source
    Seq(f(2), f(3), f(4)).foreach(m => assert(math.abs(m - 128.0f) < 6.0f, f.mkString(",")))
  }

  test("undecodable bytes surface as null/ok=false, never exceptions") {
    assert(Multimodal.JdkCodec.imageFeatures("not a png".getBytes, 16) == null)
    assert(Multimodal.JdkCodec.audioFeatures("not a wav".getBytes, 8) == null)
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRow("m0", "image", "junk".getBytes, "image/png", 4, 4, 0L))
      .toDF()
    val r = Multimodal.extractFeatures(spark, junk, dim = 16).collect()
    assert(r.length === 1 && !r(0).ok && r(0).features.isEmpty)
    // an UNKNOWN kind must never fabricate features — real WARC payloads
    // will carry arbitrary kinds
    val odd = Seq(Multimodal.MediaRow("m1", "text", "bytes".getBytes, "text/plain", 0, 0, 0L))
      .toDF()
    val r2 = Multimodal.extractFeatures(spark, odd, dim = 16).collect()
    assert(r2.length === 1 && !r2(0).ok && r2(0).features.isEmpty)
  }

  test("synthetic media table carries REAL decodable bytes; features from pixels") {
    val media = Multimodal.mediaTable(SyntheticWeb.pages(spark, 300)).cache()
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))

    val feats = Multimodal.extractFeatures(spark, media, dim = 16).cache()
    assert(feats.filter(!col("ok")).count() === 0, "every synthetic payload decodes")
    // image dims in the output come from the DECODED pixels and must agree
    // with the generator's metadata
    val imgs = feats.filter(col("kind") === "image").toDF()
      .join(media.select(col("media_id"), col("width").as("mw"), col("height").as("mh")), "media_id")
    assert(imgs.filter(col("width") =!= col("mw") || col("height") =!= col("mh")).count() === 0)
    // audio durations recovered from decoded PCM match the generator (8 kHz)
    val aud = Multimodal.extractFeatures(spark, media.filter(col("kind") === "audio"), dim = 16)
      .toDF().select(col("media_id"), element_at(col("features"), 3).as("dur"))
      .join(media.select(col("media_id"), col("duration_ms")), "media_id")
    assert(aud.filter(abs(col("dur") - col("duration_ms")) > 1.0).count() === 0)
    // determinism: regenerating produces byte-identical payloads
    val again = Multimodal.mediaTable(SyntheticWeb.pages(spark, 300))
      .select(col("media_id"), md5(col("bytes")).as("h2"))
    val cmp = media.select(col("media_id"), md5(col("bytes")).as("h1")).join(again, "media_id")
    assert(cmp.filter(col("h1") =!= col("h2")).count() === 0)
    feats.unpersist(); media.unpersist()
  }

  test("resizeImages re-encodes oversized images to the planned dims (real pixels)") {
    import spark.implicits._
    val big = Seq(Multimodal.MediaRow("big", "image",
      Multimodal.SyntheticMedia.pngBytes(42L, 40, 20), "image/png", 40, 20, 0L),
      Multimodal.MediaRow("small", "image",
        Multimodal.SyntheticMedia.pngBytes(7L, 8, 8), "image/png", 8, 8, 0L)).toDF()
    val out = Multimodal.resizeImages(spark, big, maxDim = 10).collect()
      .map(r => r.media_id -> r).toMap
    assert(out("big").width === 10 && out("big").height === 5)
    val dims = Multimodal.JdkCodec.imageDims(out("big").bytes)
    assert(dims(0) === 10 && dims(1) === 5, "re-encoded bytes decode to target dims")
    assert(out("small").width === 8)
    assert(out("small").bytes.sameElements(Multimodal.SyntheticMedia.pngBytes(7L, 8, 8)))
  }

  test("mjpeg splitter: hand-built 2-frame stream, frames decode to their own pixels") {
    // two INDEPENDENTLY ImageIO-encoded JPEGs (distinct solid colors so the
    // decoded means are unambiguous), concatenated by hand — the golden for
    // the marker-aware splitter, not produced by mjpegBytes itself
    def solidJpeg(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val red = solidJpeg(0xff0000, 6, 4)
    val blue = solidJpeg(0x0000ff, 6, 4)
    val stream = red ++ blue
    val frames = Multimodal.JdkCodec.mjpegFrames(stream)
    assert(frames.length === 2)
    assert(frames(0).sameElements(red) && frames(1).sameElements(blue))
    // each split frame really decodes: red frame has high meanR/low meanB,
    // blue frame the reverse (JPEG is lossy -> threshold, not equality)
    val f0 = Multimodal.JdkCodec.imageFeatures(frames(0), 8)
    val f1 = Multimodal.JdkCodec.imageFeatures(frames(1), 8)
    assert(f0(0) === 6f && f0(1) === 4f)
    assert(f0(2) > 200f && f0(4) < 80f, s"red frame means: ${f0.toSeq}")
    assert(f1(4) > 200f && f1(2) < 80f, s"blue frame means: ${f1.toSeq}")
    // a truncated tail frame yields only the complete frames before it
    assert(Multimodal.JdkCodec.mjpegFrames(stream.dropRight(4)).length === 1)
    assert(Multimodal.JdkCodec.mjpegFrames("garbage".getBytes).isEmpty)
    // RESYNC: a corrupt first frame must not discard the decodable second —
    // clobber a header byte (breaks segment structure) and assert the
    // splitter recovers frame 2 at the next SOI
    val corrupted = stream.clone()
    corrupted(2) = 0x00.toByte // frame 1's APP0 marker FF -> structure broken
    val recovered = Multimodal.JdkCodec.mjpegFrames(corrupted)
    assert(recovered.length === 1 && recovered(0).sameElements(blue),
      s"expected resync to recover the blue frame, got ${recovered.length}")
  }

  test("avi walker: DIB frames decode LOSSLESSLY to the generator's exact pixels") {
    val (w, h, n) = (11, 6, 4) // odd width exercises row padding + chunk pad byte
    val avi = Multimodal.SyntheticMedia.aviBytes(9L, w, h, n)
    val frames = Multimodal.JdkCodec.videoFrames(avi)
    assert(frames.length === n)
    frames.zipWithIndex.foreach { case (bmp, f) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
      assert(img != null && img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = (Multimodal.mix64(9L, (f.toLong * h + y) * w + x) & 0xffffff).toInt
        assert((img.getRGB(x, y) & 0xffffff) === expect,
          s"frame $f pixel ($x,$y)") // BMP is lossless: exact equality
      }
    }
    // stream-index corner: a leading non-video stream shifts frames to 01db
    val shifted = Multimodal.SyntheticMedia.aviBytes(9L, w, h, n, audioFirst = true)
    val sFrames = Multimodal.JdkCodec.videoFrames(shifted)
    assert(sFrames.length === n)
    assert(sFrames(0).sameElements(frames(0)), "01db frames must match 00db content")
    // truncation honesty: cutting mid-frame keeps every complete frame before
    assert(Multimodal.JdkCodec.videoFrames(avi.dropRight(20)).length === n - 1)
    // headers-only AVI (no movi reached) and garbage produce zero frames
    assert(Multimodal.JdkCodec.videoFrames(avi.take(150)).isEmpty)
    assert(Multimodal.JdkCodec.aviFrames("RIFFxxxxAVI not really".getBytes).isEmpty)
  }

  test("avi walker: MJPEG-in-AVI frames pass through to the JPEG decoder") {
    // hand-build the container (independent of aviBytes): MJPG fourcc in
    // strf.biCompression, each 00dc chunk one ImageIO-encoded JPEG
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, d: Array[Byte]) =
      cc(id) ++ le32(d.length) ++ d ++ (if (d.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(t: String, m: Array[Byte]) = chunk("LIST", cc(t) ++ m)
    val jpegs = Multimodal.JdkCodec.mjpegFrames(
      Multimodal.SyntheticMedia.mjpegBytes(4L, 10, 6, 3))
    assert(jpegs.length === 3)
    val strf = le32(40) ++ le32(10) ++ le32(6) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ cc("MJPG") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", Array.fill(56)(0.toByte)) ++
      list("strl", chunk("strh", cc("vids") ++ cc("MJPG") ++ Array.fill(48)(0.toByte)) ++
        chunk("strf", strf)))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)))
    val body = cc("AVI ") ++ hdrl ++ movi
    val avi = cc("RIFF") ++ le32(body.length) ++ body
    val frames = Multimodal.JdkCodec.videoFrames(avi)
    assert(frames.length === 3)
    assert(frames.zip(jpegs).forall { case (a, b) => a.sameElements(b) },
      "00dc payloads must pass through byte-identical")
    assert(frames.forall(f => Multimodal.JdkCodec.imageFeatures(f, 8) != null))
  }

  test("avi end-to-end: extractFeatures/sampleFrames treat AVI like any video") {
    import spark.implicits._
    val v = Seq(Multimodal.MediaRow("avi0", "video",
      Multimodal.SyntheticMedia.aviBytes(3L, 8, 8, 4), "video/x-msvideo", 8, 8, 2000L)).toDF()
    val f = Multimodal.extractFeatures(spark, v, dim = 8).collect().head
    assert(f.ok && f.n_frames === 4 && f.width === 8 && f.height === 8)
    val samples = Multimodal.sampleFrames(spark, v, fps = 2, dim = 8).collect()
    assert(samples.length === 4) // 2000 ms * 2 fps
  }

  test("video features/frames: real per-frame decode through extractFeatures/sampleFrames") {
    import spark.implicits._
    val v = Seq(Multimodal.MediaRow("v0", "video",
      Multimodal.SyntheticMedia.mjpegBytes(1L, 12, 8, 5), "video/x-motion-jpeg", 12, 8, 2500L),
      Multimodal.MediaRow("bad", "video",
        "not an mjpeg stream at all".getBytes, "video/mp4", 0, 0, 1000L)).toDF()
    val feats = Multimodal.extractFeatures(spark, v, dim = 8).collect()
      .map(f => f.media_id -> f).toMap
    // n_frames = DECODED frame count; dims from the decoded pixels
    assert(feats("v0").ok && feats("v0").n_frames === 5)
    assert(feats("v0").width === 12 && feats("v0").height === 8)
    // mean feature vector equals the hand-computed mean of per-frame decodes
    val per = Multimodal.JdkCodec.mjpegFrames(Multimodal.SyntheticMedia.mjpegBytes(1L, 12, 8, 5))
      .map(f => Multimodal.JdkCodec.imageFeatures(f, 8))
    val mean = Array.tabulate(8)(i => per.map(_(i)).sum / per.length)
    assert(feats("v0").features.toSeq === mean.toSeq)
    // no JDK codec for compressed video -> honest failure, never fabricated
    assert(!feats("bad").ok && feats("bad").features.isEmpty)

    val frames = Multimodal.sampleFrames(spark, v, fps = 2, dim = 8).collect()
    assert(frames.forall(_.media_id == "v0"), "undecodable video contributes no samples")
    assert(frames.length === 5) // 2500 ms * 2 fps = 5
    assert(frames.map(_.ts_ms).sorted.toSeq === Seq(0L, 500L, 1000L, 1500L, 2000L))
    // sample features come from REAL decoded frames: ts 0 maps to frame 0
    val atZero = frames.find(_.ts_ms == 0L).get
    assert(atZero.features.toSeq === per(0).toSeq)
    assert(frames.forall(_.features.length === 8))
  }
}
