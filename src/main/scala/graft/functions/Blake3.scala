package graft.functions

/**
 * BLAKE3 (hash mode, 256-bit output) implemented from the public
 * specification ("BLAKE3: one function, fast everywhere", O'Connor,
 * Aumasson, Neves, Wilcox-O'Hearn — spec §2, reference pseudocode §5).
 * Closes the last digest-algorithm gap vs the reference's enum
 * (/root/reference/digest.go:15-23, which uses zeebo/blake3); goldens from
 * digest_test.go:115-128 and the empty-payload digest (dialer.go:84-89).
 *
 * Non-streaming: payload columns are materialized byte arrays, so the
 * whole-input recursive tree split (largest power-of-two left subtree) is
 * simpler and equivalent to the incremental chunk-stack construction.
 */
object Blake3 {

  private val IV = Array(
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)

  private val MSG_PERM = Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

  private val CHUNK_LEN = 1024
  private val BLOCK_LEN = 64
  private val CHUNK_START = 1
  private val CHUNK_END = 2
  private val PARENT = 4
  private val ROOT = 8

  @inline private def rotr(x: Int, n: Int): Int = Integer.rotateRight(x, n)

  private def g(v: Array[Int], a: Int, b: Int, c: Int, d: Int, x: Int, y: Int): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 12)
    v(a) = v(a) + v(b) + y
    v(d) = rotr(v(d) ^ v(a), 8)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 7)
  }

  /** One compression; returns the 8-word chaining value v[i] ^ v[i+8]. */
  private def compress(h: Array[Int], m0: Array[Int], counter: Long,
                       blockLen: Int, flags: Int): Array[Int] = {
    val v = new Array[Int](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 4)
    v(12) = counter.toInt
    v(13) = (counter >>> 32).toInt
    v(14) = blockLen
    v(15) = flags
    var m = m0
    var r = 0
    while (r < 7) {
      g(v, 0, 4, 8, 12, m(0), m(1)); g(v, 1, 5, 9, 13, m(2), m(3))
      g(v, 2, 6, 10, 14, m(4), m(5)); g(v, 3, 7, 11, 15, m(6), m(7))
      g(v, 0, 5, 10, 15, m(8), m(9)); g(v, 1, 6, 11, 12, m(10), m(11))
      g(v, 2, 7, 8, 13, m(12), m(13)); g(v, 3, 4, 9, 14, m(14), m(15))
      if (r < 6) {
        val p = new Array[Int](16)
        var i = 0
        while (i < 16) { p(i) = m(MSG_PERM(i)); i += 1 }
        m = p
      }
      r += 1
    }
    val out = new Array[Int](8)
    var i = 0
    while (i < 8) { out(i) = v(i) ^ v(i + 8); i += 1 }
    out
  }

  /** Little-endian u32 words of a <=64-byte block, zero-padded. */
  private def blockWords(data: Array[Byte], off: Int, len: Int): Array[Int] = {
    val m = new Array[Int](16)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (data(off + i) & 0xff) << ((i & 3) * 8)
      i += 1
    }
    m
  }

  /** Chaining value of one chunk (spec §2.2); ROOT set on the final block
    * only when the chunk IS the whole tree. */
  private def chunkCV(data: Array[Byte], off: Int, len: Int,
                      chunkIndex: Long, isRoot: Boolean): Array[Int] = {
    var cv = IV
    val nBlocks = math.max(1, (len + BLOCK_LEN - 1) / BLOCK_LEN)
    var b = 0
    while (b < nBlocks) {
      val bOff = b * BLOCK_LEN
      val bLen = math.min(BLOCK_LEN, len - bOff)
      var flags = 0
      if (b == 0) flags |= CHUNK_START
      if (b == nBlocks - 1) { flags |= CHUNK_END; if (isRoot) flags |= ROOT }
      cv = compress(cv, blockWords(data, off + bOff, bLen), chunkIndex, bLen, flags)
      b += 1
    }
    cv
  }

  private def parentCV(l: Array[Int], r: Array[Int], isRoot: Boolean): Array[Int] = {
    val m = new Array[Int](16)
    System.arraycopy(l, 0, m, 0, 8)
    System.arraycopy(r, 0, m, 8, 8)
    compress(IV, m, 0L, BLOCK_LEN, PARENT | (if (isRoot) ROOT else 0))
  }

  /** Largest power of two strictly less than n (left-subtree chunk count, spec §2.1). */
  private def leftLen(nChunks: Int): Int =
    Integer.highestOneBit(nChunks - 1)

  private def subtreeCV(data: Array[Byte], off: Int, len: Int,
                        firstChunk: Long, isRoot: Boolean): Array[Int] = {
    if (len <= CHUNK_LEN) chunkCV(data, off, len, firstChunk, isRoot)
    else {
      val nChunks = (len + CHUNK_LEN - 1) / CHUNK_LEN
      val lChunks = leftLen(nChunks)
      val lBytes = lChunks * CHUNK_LEN
      val l = subtreeCV(data, off, lBytes, firstChunk, isRoot = false)
      val r = subtreeCV(data, off + lBytes, len - lBytes, firstChunk + lChunks, isRoot = false)
      parentCV(l, r, isRoot)
    }
  }

  /** 32-byte BLAKE3 hash. */
  def hash(data: Array[Byte]): Array[Byte] = {
    val cv = subtreeCV(data, 0, data.length, 0L, isRoot = true)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 8) {
      out(4 * i) = cv(i).toByte
      out(4 * i + 1) = (cv(i) >>> 8).toByte
      out(4 * i + 2) = (cv(i) >>> 16).toByte
      out(4 * i + 3) = (cv(i) >>> 24).toByte
      i += 1
    }
    out
  }
}
