package graft

import java.io.ByteArrayInputStream
import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, ZipException}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GzipMemberInputStream

/** RFC 1952 framing edge cases for the member-tracking decompressor: header
  * option fields, per-member CRC/ISIZE verification, truncation detection —
  * the failure modes gzip mend relies on to find the exact last-valid cut. */
class GzipMemberSpec extends AnyFunSuite {

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)

  /** Hand-built member with ALL optional header fields set. The FHCRC field
    * carries the real RFC 1952 CRC16 (lower 16 bits of the CRC32 over every
    * header byte preceding it), optionally corrupted. */
  private def memberWithOptionalFields(payload: Array[Byte],
                                       corruptFhcrc: Boolean = false): Array[Byte] = {
    val hdr = new ByteArrayOutputStream()
    // magic, CM=deflate, FLG = FHCRC|FEXTRA|FNAME|FCOMMENT, mtime, XFL, OS
    hdr.write(Array(0x1f, 0x8b, 0x08, 0x1e, 0, 0, 0, 0, 0, 0xff).map(_.toByte))
    hdr.write(Array(3, 0).map(_.toByte)) // FEXTRA: xlen=3 LE
    hdr.write(Array(1, 2, 3).map(_.toByte)) // FEXTRA payload
    hdr.write("file.warc.gz".getBytes); hdr.write(0) // FNAME, zero-terminated
    hdr.write("a comment".getBytes); hdr.write(0) // FCOMMENT
    val hcrc = new CRC32; hcrc.update(hdr.toByteArray)
    val crc16 = (hcrc.getValue & 0xffffL).toInt ^ (if (corruptFhcrc) 0x0101 else 0)
    val out = new ByteArrayOutputStream()
    out.write(hdr.toByteArray)
    out.write(Array(crc16 & 0xff, (crc16 >> 8) & 0xff).map(_.toByte)) // FHCRC LE
    out.write(deflateRaw(payload))
    val crc = new CRC32; crc.update(payload)
    out.write(le32(crc.getValue)); out.write(le32(payload.length.toLong))
    out.toByteArray
  }

  private def stdMember(payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    graft.sources.WarcIO.writeGzipMember(bos)(_.write(payload))
    bos.toByteArray
  }

  private def readAll(in: GzipMemberInputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](300) // small: exercises refill boundaries
    var n = in.read(buf, 0, buf.length)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf, 0, buf.length) }
    out.toByteArray
  }

  test("optional header fields (FEXTRA/FNAME/FCOMMENT/FHCRC) are skipped exactly") {
    val p1 = "payload-one ".getBytes ++ Array.fill(5000)('x'.toByte)
    val p2 = "payload-two".getBytes
    val m1 = memberWithOptionalFields(p1)
    val m2 = stdMember(p2)
    val gz = new GzipMemberInputStream(new ByteArrayInputStream(m1 ++ m2), 1 << 16, trackMembers = true)
    assert(readAll(gz) === p1 ++ p2)
    assert(gz.members === Seq(gz.Member(0, m1.length), gz.Member(m1.length, m2.length)))
    assert(gz.atMemberBoundary && gz.lastMemberEndOffset === m1.length + m2.length)
  }

  test("a corrupted FHCRC fails loudly at the member's offset") {
    val m1 = stdMember("good first member".getBytes)
    val bad = memberWithOptionalFields("never reached".getBytes, corruptFhcrc = true)
    val gz = new GzipMemberInputStream(new ByteArrayInputStream(m1 ++ bad), 1 << 16,
      trackMembers = true)
    val e = intercept[ZipException](readAll(gz))
    assert(e.getMessage.contains("FHCRC") && e.getMessage.contains(s"offset ${m1.length}"),
      e.getMessage)
    // the preceding member was fully verified: mend's cut point is intact
    assert(gz.lastMemberEndOffset === m1.length)
    assert(gz.members === Seq(gz.Member(0, m1.length)))
  }

  test("a flipped byte inside a member fails loudly with the member offset") {
    val m1 = stdMember(Array.fill(4000)('a'.toByte))
    val m2 = stdMember(Array.fill(4000)('b'.toByte))
    val bytes = m1 ++ m2
    bytes(m1.length + m2.length / 2) = (bytes(m1.length + m2.length / 2) ^ 0x55).toByte
    val gz = new GzipMemberInputStream(new ByteArrayInputStream(bytes), 1 << 16, trackMembers = true)
    val e = intercept[ZipException](readAll(gz))
    assert(e.getMessage.contains(s"offset ${m1.length}"), e.getMessage)
    // member 1 was fully verified before the failure: the mend cut point
    assert(gz.lastMemberEndOffset === m1.length)
    assert(gz.members === Seq(gz.Member(0, m1.length)))
  }

  test("a corrupted trailer CRC is detected even when the deflate data inflates") {
    val m = stdMember("clean payload".getBytes)
    m(m.length - 6) = (m(m.length - 6) ^ 0x01).toByte // flip a CRC32 byte
    val gz = new GzipMemberInputStream(new ByteArrayInputStream(m))
    val e = intercept[ZipException](readAll(gz))
    assert(e.getMessage.contains("CRC"), e.getMessage)
  }

  test("property: random member sizes round-trip with exact contiguous coordinates") {
    val rnd = new scala.util.Random(42) // seeded: reproducible failures
    val payloads = (0 until 25).map { i =>
      val n = rnd.nextInt(200 * 1024) // 0..200 KiB, crossing the 64 KiB buffers
      val b = new Array[Byte](n)
      if (i % 2 == 0) rnd.nextBytes(b) // incompressible
      else java.util.Arrays.fill(b, ('a' + i % 26).toByte) // highly compressible
      b
    }
    val bos = new ByteArrayOutputStream()
    payloads.foreach(p => graft.sources.WarcIO.writeGzipMember(bos)(_.write(p)))
    val bytes = bos.toByteArray
    val gz = new GzipMemberInputStream(new ByteArrayInputStream(bytes), 1 << 16, trackMembers = true)
    // read with randomized chunk sizes to exercise refill boundaries
    val got = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = 0
    while (n >= 0) {
      n = gz.read(buf, 0, 1 + rnd.nextInt(buf.length))
      if (n > 0) got.write(buf, 0, n)
    }
    assert(got.toByteArray === payloads.reduce(_ ++ _))
    val ms = gz.members
    assert(ms.length === payloads.length)
    assert(ms.head.offset === 0L)
    ms.sliding(2).foreach {
      case Seq(a, b) => assert(a.offset + a.size === b.offset)
      case _ =>
    }
    assert(ms.last.offset + ms.last.size === bytes.length)
  }

  test("truncation mid-member raises EOF; clean EOF at a boundary returns -1") {
    val m1 = stdMember("first".getBytes)
    val m2 = stdMember("second".getBytes)
    val chopped = (m1 ++ m2).take(m1.length + m2.length - 3) // lose trailer bytes
    val gz = new GzipMemberInputStream(new ByteArrayInputStream(chopped))
    intercept[java.io.EOFException](readAll(gz))
    assert(gz.lastMemberEndOffset === m1.length)

    val empty = new GzipMemberInputStream(new ByteArrayInputStream(Array.emptyByteArray))
    assert(empty.read() === -1)
    val clean = new GzipMemberInputStream(new ByteArrayInputStream(m1))
    assert(readAll(clean) === "first".getBytes)
    assert(clean.read() === -1 && clean.atMemberBoundary)
  }
}
