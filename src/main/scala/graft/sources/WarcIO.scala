package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable

import com.github.luben.zstd.{ZstdCompressCtx, ZstdInputStreamNoFinalizer}
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
import org.apache.commons.compress.compressors.xz.XZCompressorInputStream

/**
 * WARC byte-level reader/writer, semantics per the reference implementation
 * (/root/reference/read.go:205-344, write.go:56-127) and ISO 28500 (WARC 1.1):
 *
 *  - record = version line + `Key: Value` CRLF headers + CRLF + content block
 *    + CRLF CRLF trailer (write.go:56-65,22-26)
 *  - with gzip, EACH RECORD IS ITS OWN GZIP MEMBER (read.go:236-254) — that
 *    per-member framing is what makes .warc.gz splittable at scale; the
 *    writer here reproduces it (one GZIPOutputStream finish() per record)
 *  - compression is sniffed from magic bytes (read.go:358-374): gzip, bzip2,
 *    xz, zstd, zstd+dictionary skippable frame, or plain
 *  - header keys are case-insensitive (header.go:12-38): parsed into a map
 *    keyed lowercase, original case preserved in serialization only
 */
object WarcIO {

  final case class ParsedRecord(
      version: String,
      headers: Map[String, String], // keys lowercased
      content: Array[Byte],
      ordinal: Long, // record ordinal within the scanned stream
      memberOffset: Long, // compressed gzip-member offset (read.go:319-341); -1 when not gzip
      memberSize: Long) // compressed gzip-member size; -1 when not gzip

  private val CRLF = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Sniff the compression magic and wrap — the reference's full dispatch
    * (read.go:358-440): gzip, bzip2, xz, zstd, and zstd with a leading
    * skippable dictionary frame (the warc-zstd convention, utils.go:42-73 /
    * read.go:488-535). GZIPInputStream reads concatenated members
    * transparently (the Multistream(false) reset loop in read.go:243-254
    * collapses to one continuous stream here); the zstd and bzip2/xz readers
    * likewise read concatenated frames/streams to EOF. */
  def open(in: InputStream): InputStream = {
    val buf = new BufferedInputStream(in, 1 << 16)
    buf.mark(6)
    val b = Array.fill(6)(buf.read())
    buf.reset()
    def is(magic: Int*): Boolean = magic.zipWithIndex.forall { case (m, i) => b(i) == m }
    if (is(0x1f, 0x8b)) new BufferedInputStream(new GZIPInputStream(buf, 1 << 16), 1 << 16)
    else if (is(0x28, 0xb5, 0x2f, 0xfd)) zstdStream(buf, None)
    else if ((b(0) & 0xf0) == 0x50 && b(1) == 0x2a && b(2) == 0x4d && b(3) == 0x18)
      // skippable frame (any 0x184D2A5x magic, read.go:428-429) carrying the
      // zstd-compressed custom dictionary; the records follow as normal frames
      zstdStream(buf, Some(readZstdDictionaryFrame(buf)))
    else if (is('B', 'Z', 'h'))
      new BufferedInputStream(new BZip2CompressorInputStream(buf, true), 1 << 16)
    else if (is(0xfd, '7', 'z', 'X', 'Z', 0x00))
      new BufferedInputStream(new XZCompressorInputStream(buf, true), 1 << 16)
    else buf
  }

  private def zstdStream(in: InputStream, dict: Option[Array[Byte]]): InputStream = {
    val z = new ZstdInputStreamNoFinalizer(in)
    dict.foreach(z.setDict)
    // NoFinalizer: the native DCtx frees on close() — the scan path closes
    // its decompressor per partition (WarcPartitionReader.close)
    new BufferedInputStream(z, 1 << 16)
  }

  /** Magic of the skippable frame carrying the dictionary (utils.go:55). */
  val ZstdDictionaryFrameMagic: Long = 0x184D2A5DL

  /** Parse the leading skippable dictionary frame (8-byte header: LE magic +
    * LE payload size; payload = zstd-compressed dictionary) and return the
    * DECOMPRESSED dictionary (read.go:488-535). Consumes exactly the frame. */
  def readZstdDictionaryFrame(in: InputStream): Array[Byte] = {
    val header = readFully(in, 8)
    def le32(off: Int): Long =
      ((header(off) & 0xffL)) | ((header(off + 1) & 0xffL) << 8) |
        ((header(off + 2) & 0xffL) << 16) | ((header(off + 3) & 0xffL) << 24)
    val magic = le32(0)
    require((magic & 0xfffffff0L) == 0x184D2A50L,
      f"not a zstd skippable frame: magic $magic%08x")
    val payload = readFully(in, le32(4))
    val z = new ZstdInputStreamNoFinalizer(new ByteArrayInputStream(payload))
    try z.readAllBytes() finally z.close()
  }

  /** Write the skippable dictionary frame (utils.go:42-73): LE magic
    * 0x184D2A5D + LE payload size + zstd-compressed dictionary. Returns the
    * frame's on-disk size. */
  def writeZstdDictionaryFrame(out: OutputStream, dict: Array[Byte],
                               level: Int = 19): Long = {
    val ctx = new ZstdCompressCtx().setLevel(level).setContentSize(true)
    val payload = try ctx.compress(dict) finally ctx.close()
    val header = new Array[Byte](8)
    def putLe32(off: Int, v: Long): Unit = {
      header(off) = (v & 0xff).toByte
      header(off + 1) = ((v >> 8) & 0xff).toByte
      header(off + 2) = ((v >> 16) & 0xff).toByte
      header(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(0, ZstdDictionaryFrameMagic)
    putLe32(4, payload.length.toLong)
    out.write(header)
    out.write(payload)
    8L + payload.length
  }

  /** Compression context for the per-record zstd frames: level + pledged
    * content size in every frame header (the sizedZstdWriter semantics,
    * zstd_writer.go:10-42) + optional raw-content dictionary. Reuse one per
    * task; close() frees the native CCtx. */
  def zstdCompressCtx(level: Int, dict: Array[Byte]): ZstdCompressCtx = {
    val ctx = new ZstdCompressCtx().setLevel(level).setContentSize(true)
    if (dict != null && dict.nonEmpty) ctx.loadDict(dict)
    ctx
  }

  /** K6: one SIZED zstd frame per record (write.go:143-153 + one-shot
    * compression pledges Frame_Content_Size in the frame header), the zstd
    * analog of the per-record gzip member — what keeps `.warc.zst`
    * splittable at record granularity via the sidecar index. */
  def writeZstdMember(out: OutputStream, ctx: ZstdCompressCtx)
                     (body: OutputStream => Unit): Unit = {
    val bos = new java.io.ByteArrayOutputStream(1 << 16)
    body(bos)
    out.write(ctx.compress(bos.toByteArray))
  }

  /** Read one CRLF-terminated line as ASCII/UTF-8 (readUntilDelim analog,
    * read.go:140-179). Returns null at clean EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val out = new java.io.ByteArrayOutputStream(128)
    var prev = -1
    var c = in.read()
    if (c == -1) return null
    while (c != -1) {
      if (prev == '\r' && c == '\n') {
        val bytes = out.toByteArray
        return new String(bytes, 0, bytes.length - 1, StandardCharsets.UTF_8)
      }
      out.write(c)
      prev = c
      c = in.read()
    }
    new String(out.toByteArray, StandardCharsets.UTF_8) // EOF mid-line: tolerate
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"content block too large for one row: $n")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n.toInt - off)
      if (r < 0) throw new EOFException(s"unexpected EOF in content block at $off/$n")
      off += r
    }
    buf
  }

  /**
   * Pull-based record iterator (the ReadRecord loop, read.go:205-344).
   * Tolerates leading blank lines between records; enforces the two-CRLF
   * trailer (read.go:309-317). For gzip input the records carry exact
   * compressed member (offset, size) — valid whenever the record starts and
   * ends on member boundaries (gowarc framing: one member per record); any
   * other framing degrades gracefully to (-1, -1). `baseOffset` shifts the
   * reported offsets when scanning a byte RANGE of a larger file (the
   * member-index split path in WarcScan).
   */
  def records(raw: InputStream): Iterator[ParsedRecord] = records(raw, 0L)

  /** NOTE: the returned iterator wraps a decompressor holding a native
    * Inflater; callers that scan many files should use [[openRecords]] and
    * close the returned resource (closing `raw` alone does not end it). */
  def records(raw: InputStream, baseOffset: Long): Iterator[ParsedRecord] =
    openRecords(raw, baseOffset)._1

  /** Record iterator plus the decompressor resource that owns its native
    * buffers — close it when done (the per-partition scan path does). */
  def openRecords(raw: InputStream, baseOffset: Long = 0L)
      : (Iterator[ParsedRecord], java.io.Closeable) = {
    val buf = new BufferedInputStream(raw, 1 << 16)
    buf.mark(2)
    val b0 = buf.read(); val b1 = buf.read()
    buf.reset()
    if (b0 == 0x1f && b1 == 0x8b) {
      val gz = new GzipMemberInputStream(buf)
      (recordIterator(gz, Some(gz), baseOffset), gz)
    } else {
      val in = open(buf)
      (recordIterator(in, None, baseOffset), new java.io.Closeable {
        override def close(): Unit = in.close()
      })
    }
  }

  /** Record iterator over an ALREADY-DECOMPRESSED stream (no sniffing, no
    * member coordinates) — the ranged `.warc.zst` scan path builds its own
    * dictionary-aware zstd stream and feeds it here. */
  def decompressedRecords(in: InputStream, baseOffset: Long): Iterator[ParsedRecord] =
    recordIterator(in, None, baseOffset)

  private def recordIterator(in: InputStream, gz: Option[GzipMemberInputStream],
                             baseOffset: Long): Iterator[ParsedRecord] =
    new Iterator[ParsedRecord] {
      private var nextRec: ParsedRecord = _
      private var ordinal = 0L
      private var done = false

      private def advance(): Unit = {
        if (done) return
        val startsAtBoundary = gz.exists(_.atMemberBoundary)
        val memberStart = gz.map(_.nextByteOffset).getOrElse(-1L)
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in) // skip inter-record padding
        if (line == null) { done = true; nextRec = null; return }
        if (!line.startsWith("WARC/")) throw new IllegalStateException(s"bad version line: '$line'")
        val version = line
        val headers = mutable.LinkedHashMap[String, String]()
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) headers(h.substring(0, i).toLowerCase) = h.substring(i + 1).trim // splitKeyValue, utils.go:18-24
          h = readLine(in)
        }
        val len = headers.getOrElse("content-length",
          throw new IllegalStateException("missing Content-Length")).toLong
        val content = readFully(in, len)
        // trailer: exactly \r\n\r\n (read.go:309-317)
        val t = new Array[Byte](4)
        var off = 0
        while (off < 4) {
          val r = in.read(t, off, 4 - off)
          if (r < 0) throw new EOFException("unexpected EOF in record trailer")
          off += r
        }
        if (!(t(0) == '\r' && t(1) == '\n' && t(2) == '\r' && t(3) == '\n'))
          throw new IllegalStateException("record missing \\r\\n\\r\\n trailer")
        val (mo, ms) = gz match {
          case Some(g) if startsAtBoundary && g.atMemberBoundary && g.lastMemberEndOffset > memberStart =>
            (baseOffset + memberStart, g.lastMemberEndOffset - memberStart)
          case _ => (-1L, -1L)
        }
        nextRec = ParsedRecord(version, headers.toMap, content, ordinal, mo, ms)
        ordinal += 1
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): ParsedRecord = {
        val r = nextRec; advance(); r
      }
    }

  /** Sidecar member index: one `offset size` line per gzip member, written
    * by WarcSink next to each rotated `.warc.gz` — what makes the archive
    * splittable at member granularity without a planning-time scan (the
    * reference validates exactly these coordinates against an external
    * member finder, read_test.go:345-401). */
  def writeMemberIndex(out: OutputStream, members: Seq[(Long, Long)]): Unit = {
    val sb = new StringBuilder
    members.foreach { case (o, s) => sb.append(o).append(' ').append(s).append('\n') }
    out.write(sb.toString.getBytes(StandardCharsets.US_ASCII))
  }

  def readMemberIndex(in: InputStream): Seq[(Long, Long)] =
    scala.io.Source.fromInputStream(in, "US-ASCII").getLines().filter(_.nonEmpty).map { l =>
      val sp = l.indexOf(' ')
      (l.substring(0, sp).toLong, l.substring(sp + 1).toLong)
    }.toVector

  /** Serialize one record; canonical header order per RecordSerializer.
    * Content-Length is ALWAYS set from the measured content (the reference
    * measures the spooled block at write time, write.go:84-90) — a caller-
    * provided value that disagrees would produce an unreadable record. */
  def writeRecord(out: OutputStream, version: String,
                  headersIn: Seq[(String, String)], content: Array[Byte]): Unit = {
    val withLen = headersIn.filterNot(_._1.equalsIgnoreCase("Content-Length")) :+
      ("Content-Length" -> content.length.toString)
    // block digest injected when missing (write.go:96-101); an existing
    // header is trusted (callers may carry the original-capture digest)
    val headers =
      if (withLen.exists(_._1.equalsIgnoreCase("WARC-Block-Digest"))) withLen
      else withLen :+ ("WARC-Block-Digest" ->
        ("sha1:" + graft.functions.DigestUtil.base32(
          java.security.MessageDigest.getInstance("SHA-1").digest(content))))
    val canon = graft.warc.RecordSerializer.CanonicalOrder
    val keys = headers.map(_._1)
    val ordered = canon.filter(keys.contains) ++ keys.filterNot(canon.contains).sorted
    val hmap = headers.toMap
    val sb = new StringBuilder(version).append("\r\n")
    ordered.foreach { k => sb.append(k).append(": ").append(hmap(k)).append("\r\n") }
    sb.append("\r\n")
    out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    out.write(content)
    out.write(CRLF); out.write(CRLF)
  }

  /**
   * Per-record gzip member framing (write.go per-record member; asserted in
   * the reference's reader, read.go:236-254): each record compresses through
   * its own GZIPOutputStream whose finish() closes the member but not the
   * underlying stream.
   */
  def writeGzipMember(out: OutputStream)(body: OutputStream => Unit): Unit = {
    // close() (not just finish()) so the Deflater's native zlib buffers are
    // end()'d — one GZIPOutputStream per record otherwise leaks one native
    // allocation per record until GC cleaners run. The shield keeps the
    // underlying file stream open across members.
    val shield = new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
      override def close(): Unit = out.flush()
    }
    val gz = new GZIPOutputStream(shield, 1 << 16)
    body(gz)
    gz.close() // finish member + Deflater.end(); shield.close() only flushes
  }
}
