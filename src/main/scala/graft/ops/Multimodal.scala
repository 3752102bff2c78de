package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads are opaque
 * `binary` columns with typed metadata; decode / feature-extract /
 * frame-sample run as partition-batched functions over typed Datasets —
 * the Scala analog of `mapInPandas` (same batch boundary, same schema
 * contract; an Arrow-backed Pandas UDF would slot into the identical plan
 * position in PySpark).
 *
 * Decoders are REAL for the formats the JDK ships in `java.desktop`:
 * `javax.imageio.ImageIO` (PNG/JPEG/GIF/BMP) and
 * `javax.sound.sampled.AudioSystem` (WAV/PCM) — no external jars. Video is
 * REAL for MJPEG (`video/x-motion-jpeg`, concatenated JPEG frames — the
 * classic IP-camera/AVI-MJPG payload): a marker-aware splitter
 * ([[JdkCodec.mjpegFrames]]) walks the JPEG segment structure and each
 * frame decodes through the same proven ImageIO path. Compressed
 * inter-frame codecs (H.264/MP4) have no JDK decoder and are rejected as
 * undecodable (`ok = false`) rather than faked; a JNI/javacpp codec would
 * slot into the same per-frame kernel without changing any plan shape.
 * Decode failures surface as `ok = false` rows, never exceptions — at
 * 100 TB some payloads WILL be corrupt, and one bad blob must not fail a
 * 10k-row task.
 */
object Multimodal {

  /** The one splitmix-style mixer both the video stub and the synthetic
    * fixture derive pseudo-values from (kept single-sourced so they can
    * never silently diverge). */
  private[graft] def mix64(seed: Long, i: Long): Long = {
    var h = seed ^ (i * 0x9e3779b97f4a7c15L)
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  case class MediaRow(media_id: String, kind: String, bytes: Array[Byte],
                      mime: String, width: Int, height: Int, duration_ms: Long)
  case class MediaFeatures(media_id: String, kind: String, ok: Boolean,
                           width: Int, height: Int,
                           features: Array[Float], n_frames: Int)
  case class FrameSample(media_id: String, frame_idx: Int, ts_ms: Long,
                         features: Array[Float])

  // ---------------------------------------------------------------- decoding

  /** Real decoders over the JDK's own codecs. Instantiated per TASK (inside
    * mapPartitions) so codec setup cost amortizes across a partition. */
  object JdkCodec {

    /**
     * Decode an image (PNG/JPEG/GIF/BMP via ImageIO) to a fixed-dim feature
     * vector: [width, height, meanR, meanG, meanB, grayHist(dim-5 bins as
     * pixel fractions)]. Returns null when the bytes are not a decodable
     * image (ImageIO yields null / throws on corrupt input).
     */
    def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      require(dim >= 6, s"image feature dim must be >= 6, got $dim")
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) return null
      val w = img.getWidth; val h = img.getHeight
      val bins = dim - 5
      val hist = new Array[Long](bins)
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val gray = (r * 299 + g * 587 + b * 114) / 1000 // ITU-R BT.601 luma
          hist((gray * bins) / 256) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val out = new Array[Float](dim)
      out(0) = w.toFloat; out(1) = h.toFloat
      out(2) = sr.toFloat / n; out(3) = sg.toFloat / n; out(4) = sb.toFloat / n
      var i = 0
      while (i < bins) { out(5 + i) = hist(i).toFloat / n; i += 1 }
      out
    }

    /** Decoded (width, height) of an image, or null if undecodable. */
    def imageDims(bytes: Array[Byte]): Array[Int] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) null else Array(img.getWidth, img.getHeight)
    }

    /**
     * Decode audio (WAV/PCM via AudioSystem) to [sampleRate, channels,
     * durationMs, rms, segmentMeanAbs(dim-4 temporal segments)] over
     * channel-0 16-bit samples normalized to [-1, 1]. Returns null on
     * undecodable bytes.
     */
    def audioFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      require(dim >= 5, s"audio feature dim must be >= 5, got $dim")
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (ais == null) return null
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) return null // engine writes 16-bit PCM
        val raw = ais.readAllBytes()
        val channels = fmt.getChannels
        val frameBytes = 2 * channels
        val nFrames = raw.length / frameBytes
        if (nFrames == 0) return null
        val big = fmt.isBigEndian
        def sample(f: Int): Float = { // channel 0
          val o = f * frameBytes
          val s =
            if (big) ((raw(o) << 8) | (raw(o + 1) & 0xff)).toShort
            else ((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort
          s / 32768.0f
        }
        val segs = dim - 4
        val segSum = new Array[Double](segs)
        val segN = new Array[Long](segs)
        var sumSq = 0.0
        var f = 0
        while (f < nFrames) {
          val v = sample(f)
          sumSq += v.toDouble * v
          val s = ((f.toLong * segs) / nFrames).toInt
          segSum(s) += math.abs(v); segN(s) += 1
          f += 1
        }
        val out = new Array[Float](dim)
        out(0) = fmt.getSampleRate
        out(1) = channels.toFloat
        out(2) = (nFrames * 1000.0 / fmt.getSampleRate).toFloat
        out(3) = math.sqrt(sumSq / nFrames).toFloat
        var i = 0
        while (i < segs) {
          out(4 + i) = if (segN(i) == 0) 0f else (segSum(i) / segN(i)).toFloat
          i += 1
        }
        out
      } catch { case _: Exception => null } finally ais.close()
    }

    /**
     * Split an MJPEG stream (concatenated JPEG frames) into per-frame byte
     * slices by walking the REAL JPEG segment structure — not a naive
     * FFD8/FFD9 byte scan, which an APPn segment containing an embedded
     * thumbnail (itself a JPEG with its own EOI) would fool:
     *
     *  - SOI (FFD8) opens a frame
     *  - marker segments FFxx carry a 2-byte big-endian length (which covers
     *    the length field itself) and are skipped wholesale — embedded EOIs
     *    inside APPn/COM payloads are never seen
     *  - standalone markers (TEM FF01, RSTn FFD0-D7) have no length
     *  - after SOS (FFDA) the entropy-coded stream is scanned for the next
     *    real marker: FF 00 is a stuffed data byte and FF D0-D7 are restart
     *    markers, anything else ends the scan (EOI closes the frame)
     *
     * Trailing garbage / a truncated final frame yields the complete frames
     * before it. Returns an empty array when no complete frame exists.
     */
    def mjpegFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      val n = bytes.length
      def b(i: Int): Int = bytes(i) & 0xff
      var i = 0
      while (i + 1 < n) {
        if (b(i) == 0xff && b(i + 1) == 0xd8) { // SOI
          val start = i
          var p = i + 2
          var end = -1
          var inEntropy = false
          var broken = false
          while (end < 0 && !broken && p + 1 < n) {
            if (!inEntropy) {
              if (b(p) != 0xff) { broken = true }
              else b(p + 1) match {
                case 0xd9 => end = p + 2 // EOI with no SOS: header-only frame
                case 0x01 => p += 2 // TEM: standalone
                case m if m >= 0xd0 && m <= 0xd7 => p += 2 // RSTn: standalone
                case 0xff => p += 1 // FF fill byte before a marker (legal padding)
                case 0xda => // SOS: segment header, then entropy-coded data
                  if (p + 3 >= n) broken = true
                  else { p += 2 + ((b(p + 2) << 8) | b(p + 3)); inEntropy = true }
                case _ => // any other marker segment: skip by declared length
                  if (p + 3 >= n) broken = true
                  else p += 2 + ((b(p + 2) << 8) | b(p + 3))
              }
            } else {
              if (b(p) == 0xff && b(p + 1) != 0x00 &&
                !(b(p + 1) >= 0xd0 && b(p + 1) <= 0xd7)) {
                if (b(p + 1) == 0xd9) end = p + 2
                // a real marker mid-stream (progressive JPEG's next SOS/DHT):
                // hand back to the structured segment walker
                else inEntropy = false
              } else p += 1
            }
          }
          if (end > 0) { out += java.util.Arrays.copyOfRange(bytes, start, end); i = end }
          else if (broken) i = start + 2 // resync: scan for the next SOI — one
          // corrupt frame must not discard every decodable frame after it
          else i = n // ran off the end: truncated tail frame, keep what we have
        } else i += 1
      }
      out.toArray
    }

    /**
     * Container dispatch for video payloads: RIFF/AVI goes through the
     * chunk walker, anything else is treated as a raw MJPEG stream (the
     * round-5 path). Every returned element is a byte array ImageIO can
     * decode directly (BMP-wrapped DIB or a JPEG frame) — compressed
     * codecs with no JDK decoder (H.264/MP4) still yield zero frames and
     * surface as `ok = false` downstream, never fabricated.
     */
    def videoFrames(bytes: Array[Byte]): Array[Array[Byte]] =
      if (bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ')
        aviFrames(bytes)
      else mjpegFrames(bytes)

    /**
     * AVI (RIFF) frame extraction for the two JDK-decodable payload kinds:
     *  - uncompressed DIB video (`biCompression = 0`, '##db'/'##dc'
     *    chunks): each frame is wrapped into a standalone BMP by
     *    prepending a 14-byte BITMAPFILEHEADER to the stream's own `strf`
     *    BITMAPINFOHEADER(+palette) — ImageIO's BMP reader then handles
     *    bottom-up rows, padding, and bit depths exactly per spec;
     *  - MJPEG-in-AVI (`biCompression = 'MJPG'`): '##dc' chunk data is a
     *    JPEG frame, returned as-is for the proven ImageIO JPEG path.
     *
     * The walker follows the RIFF grammar (word-aligned chunks, LIST
     * recursion into 'hdrl'/'strl' for the FIRST 'vids' stream's format,
     * then the 'movi' list for that stream's data chunks) and mirrors the
     * MJPEG splitter's honesty on damage: a chunk whose declared size runs
     * past the buffer ends the walk, keeping every complete frame before
     * it; non-video payloads (no 'vids' stream, other compression) yield
     * zero frames.
     */
    def aviFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
      val n = bytes.length
      def u32(i: Int): Long =
        ((bytes(i) & 0xffL)) | ((bytes(i + 1) & 0xffL) << 8) |
          ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      def fourcc(i: Int): String =
        new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var strf: Array[Byte] = null   // first 'vids' stream's BITMAPINFOHEADER(+palette)
      var compression = -1L
      var vidsStream = -1            // its stream index ("00", "01", ... prefix)
      var streamIdx = 0
      // walk(limit-bounded chunk run); inStrl carries the pending strh type
      def walk(from: Int, limit: Int, ctx: String): Unit = {
        var p = from
        var vidsHere = false
        while (p + 8 <= limit) {
          val id = fourcc(p)
          val size = u32(p + 4)
          val dataStart = p + 8
          val dataEnd = dataStart + size
          // a LIST is only a container: when truncation cuts inside one
          // (the common chop point — 'movi' spans the whole tail), walk its
          // partial extent so complete frames BEFORE the cut survive. Leaf
          // chunks must be complete — a cut frame is dropped, not padded.
          if (id == "LIST" && size >= 4 && dataStart + 4 <= limit) {
            val listType = fourcc(dataStart)
            if (listType == "hdrl" || listType == "movi" ||
              (listType == "strl" && vidsStream < 0))
              walk(dataStart + 4, math.min(dataEnd, limit.toLong).toInt, listType)
          } else if (dataEnd > limit) return // truncated leaf: keep prior frames
          else id match {
            case "strh" if ctx == "strl" && size >= 4 =>
              if (fourcc(dataStart) == "vids") vidsHere = true
            case "strf" if ctx == "strl" =>
              if (vidsHere && strf == null) {
                strf = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd.toInt)
                compression = if (size >= 20) u32(dataStart + 16) else -1L
                vidsStream = streamIdx
              }
            case _ if ctx == "movi" && id.length == 4 &&
              id(0).isDigit && id(1).isDigit &&
              (id.substring(2) == "db" || id.substring(2) == "dc") =>
              val sn = (id(0) - '0') * 10 + (id(1) - '0')
              if (sn == vidsStream && size > 0) {
                val data = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd.toInt)
                if (compression == 0L && strf != null) out += wrapBmp(strf, data)
                else if (compression == MJPG) out += data
              }
            case _ => () // avih, idx1, JUNK, non-video strl members: skip
          }
          p = (dataEnd + (size & 1L)).toInt // chunks are word-aligned
        }
        if (ctx == "strl") streamIdx += 1 // stream order defines '##' prefixes
      }
      val riffEnd = math.min(n.toLong, 8L + u32(4)).toInt
      walk(12, riffEnd, "riff")
      out.toArray
    }

    private val MJPG = 0x47504A4DL // 'MJPG' little-endian fourcc

    /** Prepend a BITMAPFILEHEADER so ImageIO's BMP reader decodes one DIB
      * frame: pixel data begins right after the copied strf block. */
    private def wrapBmp(strf: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val offBits = 14 + strf.length
      val fileSize = offBits + data.length
      val out = new Array[Byte](fileSize)
      out(0) = 'B'; out(1) = 'M'
      out(2) = (fileSize & 0xff).toByte
      out(3) = ((fileSize >> 8) & 0xff).toByte
      out(4) = ((fileSize >> 16) & 0xff).toByte
      out(5) = ((fileSize >> 24) & 0xff).toByte
      out(10) = (offBits & 0xff).toByte
      out(11) = ((offBits >> 8) & 0xff).toByte
      System.arraycopy(strf, 0, out, 14, strf.length)
      System.arraycopy(data, 0, out, offBits, data.length)
      out
    }
  }

  // ------------------------------------------------------- synthetic fixture

  /**
   * Deterministic REAL media bytes for the synthetic web: a decodable PNG
   * (pseudo-random pixels from the seed) and a decodable 16-bit mono WAV
   * (pseudo-noise samples). In production these bytes come from WARC
   * payloads; this generator only exists so tests and benches exercise the
   * REAL ImageIO/AudioSystem decode path instead of a fake.
   */
  object SyntheticMedia {
    private def mix(seed: Long, i: Long): Long = Multimodal.mix64(seed, i)

    def pngBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (mix(seed, y.toLong * w + x) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream(w * h / 2 + 64)
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Little-endian 16-bit mono PCM WAV at `sampleRate` Hz. */
    def wavBytes(seed: Long, durationMs: Long, sampleRate: Int = 8000): Array[Byte] = {
      val n = math.max(1L, durationMs * sampleRate / 1000L).toInt
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = (mix(seed, i) % 32768L).toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
        true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream(pcm.length + 64)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** MJPEG video: `nFrames` deterministic JPEG frames (ImageIO-encoded,
      * pixels varying per frame) concatenated back to back — a REAL,
      * decodable video payload for the JDK-only container. */
    def mjpegBytes(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(nFrames * w * h / 2 + 1024)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (mix(seed, (f.toLong * h + y) * w + x) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        javax.imageio.ImageIO.write(img, "jpg", bos)
        f += 1
      }
      bos.toByteArray
    }

    /** A real uncompressed-DIB AVI (RIFF/hdrl/strl/movi, 24bpp BI_RGB,
      * bottom-up BGR rows padded to 4 bytes) with deterministic pixels —
      * exists so tests exercise the REAL RIFF walker + ImageIO BMP path.
      * Set `audioFirst` to prepend a dummy non-video stream (the stream-
      * index corner: frames then live in '01db', not '00db'). */
    def aviBytes(seed: Long, w: Int, h: Int, nFrames: Int,
                 audioFirst: Boolean = false): Array[Byte] = {
      def le32(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
      def chunk(id: String, data: Array[Byte]): Array[Byte] = {
        val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
        cc(id) ++ le32(data.length) ++ data ++ pad
      }
      def list(listType: String, members: Array[Byte]): Array[Byte] =
        chunk("LIST", cc(listType) ++ members)
      val rowBytes = (w * 3 + 3) & ~3
      def dibFrame(f: Int): Array[Byte] = {
        val d = new Array[Byte](rowBytes * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = (mix(seed, (f.toLong * h + y) * w + x) & 0xffffff).toInt
            val o = (h - 1 - y) * rowBytes + x * 3 // bottom-up BGR
            d(o) = (rgb & 0xff).toByte
            d(o + 1) = ((rgb >> 8) & 0xff).toByte
            d(o + 2) = ((rgb >> 16) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        d
      }
      // BITMAPINFOHEADER: 40 bytes, BI_RGB
      val strfVid = le32(40) ++ le32(w) ++ le32(h) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ le32(0) ++
        le32(rowBytes * h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val strhVid = cc("vids") ++ cc("DIB ") ++ Array.fill(48)(0.toByte)
      val strlVid = list("strl", chunk("strh", strhVid) ++ chunk("strf", strfVid))
      val strhAud = cc("auds") ++ cc("    ") ++ Array.fill(48)(0.toByte)
      val strlAud = list("strl", chunk("strh", strhAud) ++
        chunk("strf", Array.fill(16)(0.toByte)))
      val avih = Array.fill(56)(0.toByte)
      val hdrl = list("hdrl", chunk("avih", avih) ++
        (if (audioFirst) strlAud ++ strlVid else strlVid))
      val vidId = if (audioFirst) "01db" else "00db"
      val movi = list("movi",
        (0 until nFrames).toArray.flatMap(f => chunk(vidId, dibFrame(f))))
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32(body.length) ++ body
    }
  }

  case class MediaMeta(media_id: String, kind: String, mime: String,
                               width: Int, height: Int, duration_ms: Long, seed: Long)

  /** Build a media table from the synthetic pages' media spans: REAL binary
    * payloads (decodable PNG / WAV; pseudo-bytes for video) deterministic in
    * the media_ref hash, so any two runs generate identical bytes. */
  def mediaTable(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val meta = pages
      .select(explode(filter(col("spans"), s => s.getField("kind") === "media")).as("s"))
      .select(col("s.media_ref").as("media_id"))
      .dropDuplicates("media_id")
      .withColumn("kind", element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col("media_id")), lit(3)) + 1).cast("int")))
      .withColumn("mime", when(col("kind") === "image", "image/png")
        .when(col("kind") === "audio", "audio/wav")
        // half the videos ship as raw MJPEG streams, half inside a real
        // RIFF/AVI container (uncompressed DIB) — both decode paths stay hot
        .when(pmod(xxhash64(lit("c"), col("media_id")), lit(2)) === 0, "video/x-msvideo")
        .otherwise("video/x-motion-jpeg"))
      // image/frame dims small enough that a 500-page fixture renders in ms,
      // large enough that histograms are meaningful
      .withColumn("width",
        when(col("kind") === "image", (pmod(xxhash64(lit("w"), col("media_id")), lit(57)) + 8).cast("int"))
          .when(col("kind") === "video", (pmod(xxhash64(lit("w"), col("media_id")), lit(25)) + 8).cast("int"))
          .otherwise(lit(0)))
      .withColumn("height",
        when(col("kind") === "image", (pmod(xxhash64(lit("h"), col("media_id")), lit(41)) + 8).cast("int"))
          .when(col("kind") === "video", (pmod(xxhash64(lit("h"), col("media_id")), lit(17)) + 8).cast("int"))
          .otherwise(lit(0)))
      .withColumn("duration_ms",
        when(col("kind") === "audio", pmod(xxhash64(lit("d"), col("media_id")), lit(1800L)) + 200L)
          // bounded so the 2-fps nominal frame count stays 2..7 per fixture
          // video (the decode path is exercised, the fixture stays fast)
          .when(col("kind") === "video", pmod(xxhash64(lit("d"), col("media_id")), lit(2500L)) + 1000L)
          .otherwise(lit(0L)))
      .withColumn("seed", xxhash64(lit("bytes"), col("media_id")))
      .as[MediaMeta]
    meta.mapPartitions { rows =>
      rows.map { m =>
        val bytes = m.kind match {
          case "image" => SyntheticMedia.pngBytes(m.seed, m.width, m.height)
          case "audio" => SyntheticMedia.wavBytes(m.seed, m.duration_ms)
          case _ => // 2-fps nominal: duration 1000-3500 ms -> 2-7 frames
            val nFrames = math.max(2, (m.duration_ms * 2 / 1000L).toInt)
            if (m.mime == "video/x-msvideo")
              SyntheticMedia.aviBytes(m.seed, m.width, m.height, nFrames)
            else SyntheticMedia.mjpegBytes(m.seed, m.width, m.height, nFrames)
        }
        MediaRow(m.media_id, m.kind, bytes, m.mime, m.width, m.height, m.duration_ms)
      }
    }.toDF()
  }

  /**
   * Partition-batched feature extraction (the mapInPandas analog): rows are
   * processed per-partition so codec init amortizes once per task; output
   * schema is fixed and typed. Images/audio decode through the REAL JDK
   * codecs; undecodable bytes yield `ok = false` (with the metadata dims
   * passed through) instead of failing the task.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"), col("mime"),
      col("width"), col("height"), col("duration_ms"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          def bad = MediaFeatures(r.media_id, r.kind, ok = false, r.width, r.height,
            Array.empty, 0)
          if (r.bytes == null || r.bytes.isEmpty) bad
          else r.kind match {
            case "image" =>
              val f = JdkCodec.imageFeatures(r.bytes, dim)
              if (f == null) bad
              // width/height REPORTED FROM THE DECODED PIXELS, not metadata
              else MediaFeatures(r.media_id, r.kind, ok = true,
                f(0).toInt, f(1).toInt, f, n_frames = 1)
            case "audio" =>
              val f = JdkCodec.audioFeatures(r.bytes, dim)
              if (f == null) bad
              else MediaFeatures(r.media_id, r.kind, ok = true, 0, 0, f, n_frames = 1)
            case "video" =>
              // MJPEG stream or RIFF/AVI container (uncompressed DIB or
              // MJPEG-in-AVI): split to per-frame images, decode each
              // through the proven ImageIO path, report the MEAN per-frame
              // feature vector + dims from the decoded pixels. Compressed
              // codecs with no JDK decoder (H.264/MP4) split to zero
              // frames and land here as ok=false, never fabricated.
              val frames = JdkCodec.videoFrames(r.bytes)
              // partial-corruption policy MATCHES sampleFrames: frames the
              // splitter resynced past but ImageIO rejects are dropped, the
              // mean is over frames that DECODED, n_frames reports the
              // decoded count; ok=false only when zero frames decode
              val per = frames.map(f => JdkCodec.imageFeatures(f, dim)).filter(_ != null)
              if (per.isEmpty) bad
              else {
                val mean = Array.tabulate(dim)(i => per.map(_(i)).sum / per.length)
                MediaFeatures(r.media_id, r.kind, ok = true,
                  per.head(0).toInt, per.head(1).toInt, mean, per.length)
              }
            case _ => bad // unknown/null kind: never fabricate features
          }
        }
      }
  }

  /** Frame sampling for video: one sample per `1/fps` tick across the
    * clip's `duration_ms`, each featurized by REALLY decoding the nearest
    * MJPEG frame (the container carries no per-frame timing, so decoded
    * frames are taken as evenly spread over the metadata duration — the
    * MJPEG convention). Undecodable payloads contribute no samples. */
  def sampleFrames(spark: SparkSession, media: DataFrame, fps: Int = 2, dim: Int = 16): Dataset[FrameSample] = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("kind"), col("bytes"), col("mime"),
        col("width"), col("height"), col("duration_ms"))
      .as[MediaRow]
      .flatMap { r =>
        val frames = JdkCodec.videoFrames(r.bytes)
        if (frames.isEmpty) Iterator.empty
        else {
          // each DISTINCT frame decodes once, however many sample ticks map
          // to it (a long clip with few frames would otherwise re-decode the
          // same JPEG per tick)
          val decoded = new Array[Array[Float]](frames.length)
          val tried = new Array[Boolean](frames.length)
          def featuresOf(src: Int): Array[Float] = {
            if (!tried(src)) { tried(src) = true; decoded(src) = JdkCodec.imageFeatures(frames(src), dim) }
            decoded(src)
          }
          val nSamples = math.max(1, (r.duration_ms * fps / 1000L).toInt)
          (0 until nSamples).iterator.flatMap { i =>
            val tsMs = i.toLong * 1000L / fps
            // nearest decoded frame under the even-spread convention
            val src = math.min(frames.length - 1,
              (tsMs * frames.length / math.max(1L, r.duration_ms)).toInt)
            Option(featuresOf(src)).map(f => FrameSample(r.media_id, i, tsMs, f))
          }
        }
      }
  }

  /** Metadata-level resize: pure column math (no decode needed for planning). */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = when(greatest(col("width"), col("height")) <= maxDim, lit(1.0))
      .otherwise(lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    media.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }

  /** Decode-verified resize: re-encode images whose decoded dims exceed
    * `maxDim` to the planned target size (bilinear), pass others through.
    * Real pixels in, real pixels out — the shape a 100 TB image-normalization
    * stage takes (per-partition batched, codec init amortized per task). */
  def resizeImages(spark: SparkSession, media: DataFrame, maxDim: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"), col("mime"),
      col("width"), col("height"), col("duration_ms"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.kind != "image") r
          else {
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
              catch { case _: Exception => null }
            if (img == null || math.max(img.getWidth, img.getHeight) <= maxDim) r
            else {
              val s = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
              val tw = math.max(1, math.ceil(img.getWidth * s).toInt)
              val th = math.max(1, math.ceil(img.getHeight * s).toInt)
              val dst = new java.awt.image.BufferedImage(tw, th,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, tw, th, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream(r.bytes.length)
              javax.imageio.ImageIO.write(dst, "png", bos)
              // re-encode is PNG regardless of the source codec: the mime
              // column must follow the bytes or consumers dispatch wrongly
              r.copy(bytes = bos.toByteArray, width = tw, height = th, mime = "image/png")
            }
          }
        }
      }
  }
}
