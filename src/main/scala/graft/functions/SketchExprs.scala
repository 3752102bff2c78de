package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Tight-loop sketch kernels as codegen'd static calls — the custom
 * `Expression` tier of SURVEY §2.9. The higher-order-function forms in
 * DedupOps (aggregate + zip_with folds) allocate one lambda-result array
 * PER ELEMENT PER STEP: the minhash fold alone churned ~300 x 32-slot
 * arrays per document and re-hashed each shingle string 32 times — measured
 * 6.3 s of q23's runtime at sf0.1. These kernels hash each string ONCE
 * (then mix the per-slot index over the 64-bit state) and write one output
 * array per row.
 *
 * Bit-compatibility: both kernels replicate Spark's own xxhash64 chain
 * (seed 42, child-order fold) exactly, so signatures — and therefore LSH
 * band keys and candidate sets — are identical to the HOF forms (asserted
 * in DedupOpsSpec).
 */
object SketchUtil {

  /** sig[i] = min over shingles s of xxhash64(s, i) — the Spark chain is
    * seed 42 -> hashUTF8(s) -> hashInt(i), so the string hashes once per
    * shingle. Empty input yields Long.MaxValue slots (the fold's init). */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    val n = shingles.numElements()
    while (j < n) {
      val s = shingles.getUTF8String(j)
      val hs = XxHash64Function.hash(s, StringType, 42L)
      var i = 0
      while (i < numHashes) {
        // i is 0..numHashes-1: the Integer autobox hits the JVM cache
        val h = XxHash64Function.hash(i, IntegerType, hs)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /**
   * SORTED-DISTINCT portable hashes of all `k`-character shingles of a
   * string, in one pass: per shingle, the signed-64 big-endian view of the
   * first 8 md5 bytes of its UTF-8 encoding — bit-identical to
   * `array_sort(array_distinct(transform(shingles, PipelineOps
   * .portableHash64)))` over `substring` windows (md5 hex prefix 16 = first
   * 8 digest bytes; Spark's md5() hashes the UTF-8 cast). Texts shorter
   * than `k` characters contribute one whole-text shingle. The HOF form
   * allocated one UTF8String per window plus a digest instance per md5 call
   * (~5M of each per sf0.1 q57 run — its single heaviest measured stage);
   * this kernel reuses one thread-local digest and, on ASCII input, windows
   * the byte array in place. Non-ASCII falls back to codepoint-correct
   * `UTF8String.substring` windows (asserted equal in DedupOpsSpec).
   */
  def portableShingleHashes(text: UTF8String, k: Int): ArrayData = {
    val md = Md5.get()
    val out16 = new Array[Byte](16)
    def hashRange(bytes: Array[Byte], off: Int, len: Int): Long = {
      md.reset()
      md.update(bytes, off, len)
      md.digest(out16, 0, 16)
      ((out16(0) & 0xffL) << 56) | ((out16(1) & 0xffL) << 48) |
        ((out16(2) & 0xffL) << 40) | ((out16(3) & 0xffL) << 32) |
        ((out16(4) & 0xffL) << 24) | ((out16(5) & 0xffL) << 16) |
        ((out16(6) & 0xffL) << 8) | (out16(7) & 0xffL)
    }
    val nChars = text.numChars()
    val bytes = text.getBytes
    val hs: Array[Long] =
      if (nChars < k) Array(hashRange(bytes, 0, bytes.length))
      else if (bytes.length == nChars) { // ASCII: byte windows ARE char windows
        val n = nChars - k + 1
        val a = new Array[Long](n)
        var i = 0
        while (i < n) { a(i) = hashRange(bytes, i, k); i += 1 }
        a
      } else { // multi-byte codepoints: codepoint-correct substring windows
        val n = nChars - k + 1
        val a = new Array[Long](n)
        var i = 0
        while (i < n) {
          val b = text.substring(i, i + k).getBytes
          a(i) = hashRange(b, 0, b.length)
          i += 1
        }
        a
      }
    sortedDistinct(hs)
  }

  /**
   * SORTED-DISTINCT xxhash64 (Spark's seed 42) of all `k`-character
   * shingles, in one pass — the fast-path twin of
   * [[portableShingleHashes]]: bit-identical to
   * `array_sort(array_distinct(transform(shingles, s => xxhash64(s))))`
   * over `substr` windows (texts shorter than `k` contribute one
   * whole-text shingle), asserted in DedupOpsSpec. The HOF form allocated
   * one UTF8String per window; on ASCII input this kernel hashes byte
   * windows of the backing array IN PLACE (`XXH64.hashUnsafeBytes` over
   * `bytes[i, i+k)` — exactly what Spark's xxhash64 computes for the
   * equivalent substring). Non-ASCII falls back to codepoint-correct
   * `UTF8String.substring` windows.
   */
  def xxShingleHashes(text: UTF8String, k: Int): ArrayData = {
    val nChars = text.numChars()
    val bytes = text.getBytes
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val hs: Array[Long] =
      if (nChars < k) Array(XXH64.hashUnsafeBytes(bytes, off, bytes.length, 42L))
      else if (bytes.length == nChars) { // ASCII: byte windows ARE char windows
        val n = nChars - k + 1
        val a = new Array[Long](n)
        var i = 0
        while (i < n) { a(i) = XXH64.hashUnsafeBytes(bytes, off + i, k, 42L); i += 1 }
        a
      } else { // multi-byte codepoints: codepoint-correct substring windows
        val n = nChars - k + 1
        val a = new Array[Long](n)
        var i = 0
        while (i < n) {
          val b = text.substring(i, i + k).getBytes
          a(i) = XXH64.hashUnsafeBytes(b, off, b.length, 42L)
          i += 1
        }
        a
      }
    sortedDistinct(hs)
  }

  /** Per-element portable md5-prefix hash of a string array (see
    * [[PortableHash64Tokens]]). */
  def portableHash64Tokens(toks: ArrayData): ArrayData = {
    val md = Md5.get()
    val out16 = new Array[Byte](16)
    val n = toks.numElements()
    val out = new Array[Long](n)
    var j = 0
    while (j < n) {
      val b = toks.getUTF8String(j).getBytes
      md.reset()
      md.update(b, 0, b.length)
      md.digest(out16, 0, 16)
      out(j) = ((out16(0) & 0xffL) << 56) | ((out16(1) & 0xffL) << 48) |
        ((out16(2) & 0xffL) << 40) | ((out16(3) & 0xffL) << 32) |
        ((out16(4) & 0xffL) << 24) | ((out16(5) & 0xffL) << 16) |
        ((out16(6) & 0xffL) << 8) | (out16(7) & 0xffL)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass XOR-min signature over pre-hashed shingles (see [[XorMinSig]]). */
  def xorMinSig(hashes: ArrayData, salts: Array[Long]): ArrayData = {
    val m = salts.length
    val sig = new Array[Long](m)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    val n = hashes.numElements()
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < m) {
        val v = h ^ salts(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** sig[i] = min over PRE-HASHED shingles hs of xxhash64(i, seed=hs) —
    * bit-identical to [[minhashSig]] over the shingle strings, because the
    * Spark chain is seed 42 -> hashUTF8(s) -> hashInt(i) and a min over a
    * DISTINCT hash set equals the min over the multiset. Lets the
    * signature and the exact-verification branch share ONE staged
    * array<long> instead of re-deriving shingle strings per branch. */
  /** See [[RollingTokenHashes]]: O(n) k-token-window rolling hashes. */
  def rollingTokenHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val B = 0x100000001b3L // FNV prime as the polynomial base (odd -> unit mod 2^64)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      // FNV-1a over the token's UTF-8 bytes
      val t = toks.getUTF8String(i)
      var acc = 0xcbf29ce484222325L
      var b = 0
      val nb = t.numBytes()
      while (b < nb) { acc = (acc ^ (t.getByte(b) & 0xffL)) * B; b += 1 }
      h(i) = acc
      i += 1
    }
    var bk1 = 1L
    var j = 0
    while (j < k - 1) { bk1 *= B; j += 1 } // B^(k-1), wrapping
    val out = new Array[Long](n - k + 1)
    var r = 0L
    j = 0
    while (j < k) { r = r * B + h(j); j += 1 }
    out(0) = r
    var p = 1
    while (p <= n - k) {
      r = (r - h(p - 1) * bk1) * B + h(p + k - 1)
      out(p) = r
      p += 1
    }
    new GenericArrayData(out)
  }

  def minhashSigFromHashes(hashes: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    val n = hashes.numElements()
    while (j < n) {
      val hs = hashes.getLong(j)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, hs)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  private def sortedDistinct(hs: Array[Long]): ArrayData = {
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** SimHash-64 from PRE-HASHED tokens: votes[i] = Σ ±1 by bit i of each
    * hash; output bit i set iff votes[i] > 0 — bit-identical to
    * simhashFromVotes(simhashVotes(hashes)). */
  def simhash64(tokenHashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    var j = 0
    val n = tokenHashes.numElements()
    while (j < n) {
      val h = tokenHashes.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** `minhash_sig(shingles, n)`: n-slot MinHash signature of a string array. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.minhashSig(a.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.minhashSig($a, $numHashes);")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** `simhash64_from_hashes(hashes)`: 64-bit SimHash of an array<long>. */
case class SimHash64FromHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.simhash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.simhash64($a);")
  override protected def withNewChildInternal(c: Expression): SimHash64FromHashes = copy(child = c)
  override def prettyName: String = "simhash64_from_hashes"
}

/** `portable_shingle_hashes(text, k)`: sorted-distinct signed-64 md5-prefix
  * hashes of all k-char shingles (see [[SketchUtil.portableShingleHashes]]). */
case class PortableShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.portableShingleHashes(a.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.portableShingleHashes($a, $k);")
  override protected def withNewChildInternal(c: Expression): PortableShingleHashes = copy(child = c)
  override def prettyName: String = "portable_shingle_hashes"
}

/** `xx_shingle_hashes(text, k)`: sorted-distinct xxhash64 (seed 42) of all
  * k-char shingles (see [[SketchUtil.xxShingleHashes]]). */
case class XxShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.xxShingleHashes(a.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.xxShingleHashes($a, $k);")
  override protected def withNewChildInternal(c: Expression): XxShingleHashes = copy(child = c)
  override def prettyName: String = "xx_shingle_hashes"
}

/** `rolling_token_hashes(tokens, k)`: 64-bit rolling polynomial hashes of
  * every k-TOKEN window of a token array, O(n) total — vs O(n·k) for a
  * per-window digest. Per-token FNV-1a base hashes combine as
  * Σ h[p+j]·B^(k−1−j) with natural 2⁶⁴ wrap; the window slides as
  * r' = (r − h[p]·B^(k−1))·B + h[p+k]. The FAST shingle key for
  * exactSubstringDedup's scale path (the q23-vs-q57 fast/portable split);
  * equal windows always hash equal, unequal windows collide at ~2⁻⁶⁴.
  * Arrays shorter than k yield an empty array. */
case class RollingTokenHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "window size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.rollingTokenHashes(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.rollingTokenHashes($a, $k);")
  override protected def withNewChildInternal(c: Expression): RollingTokenHashes = copy(child = c)
  override def prettyName: String = "rolling_token_hashes"
}

/** `minhash_sig_from_hashes(hashes, n)`: n-slot MinHash signature from
  * pre-hashed shingles (see [[SketchUtil.minhashSigFromHashes]]). */
case class MinHashSigFromHashes(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.minhashSigFromHashes(a.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.minhashSigFromHashes($a, $numHashes);")
  override protected def withNewChildInternal(c: Expression): MinHashSigFromHashes = copy(child = c)
  override def prettyName: String = "minhash_sig_from_hashes"
}

/** `portable_hash64_tokens(tokens)`: per-element portable 64-bit md5-prefix
  * hash of a string array — bit-identical to
  * `transform(tokens, t => PipelineOps.portableHash64(t))` (first 8 md5
  * bytes of the UTF-8 encoding, signed big-endian), but one thread-local
  * digest and no hex-string/conv detour (the HOF form built a 32-char hex
  * string and parsed it twice per token). */
case class PortableHash64Tokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.portableHash64Tokens(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.portableHash64Tokens($a);")
  override protected def withNewChildInternal(c: Expression): PortableHash64Tokens = copy(child = c)
  override def prettyName: String = "portable_hash64_tokens"
}

/** `xor_min_sig(hashes, salts)`: slot i = min over h of (h XOR salts(i)) —
  * bit-identical to `array((0 until n).map(i => array_min(transform(hs,
  * h => h.bitwiseXOR(salt_i)))))` (the portable MinHash signature), but one
  * pass over the hash set with no per-slot array allocations. Empty input
  * yields Long.MaxValue slots (unreachable from the shingle kernels, which
  * emit at least the whole-text shingle). */
case class XorMinSig(child: Expression, salts: Seq[Long]) extends UnaryExpression {
  require(salts.nonEmpty, "at least one salt slot required")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val saltArr = salts.toArray
  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.xorMinSig(a.asInstanceOf[ArrayData], saltArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("xorMinSalts", saltArr, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.xorMinSig($a, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): XorMinSig = copy(child = c)
  override def prettyName: String = "xor_min_sig"
}

object SketchExprs {
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), numHashes))
  def portable_hash64_tokens(tokens: Column): Column =
    Bridge.column(PortableHash64Tokens(Bridge.expression(tokens)))
  def xor_min_sig(hashes: Column, salts: Seq[Long]): Column =
    Bridge.column(XorMinSig(Bridge.expression(hashes), salts))
  def simhash64_from_hashes(hashes: Column): Column =
    Bridge.column(SimHash64FromHashes(Bridge.expression(hashes)))
  def portable_shingle_hashes(text: Column, k: Int): Column =
    Bridge.column(PortableShingleHashes(Bridge.expression(text), k))
  def xx_shingle_hashes(text: Column, k: Int): Column =
    Bridge.column(XxShingleHashes(Bridge.expression(text), k))
  def rolling_token_hashes(tokens: Column, k: Int): Column =
    Bridge.column(RollingTokenHashes(Bridge.expression(tokens), k))
  def minhash_sig_from_hashes(hashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigFromHashes(Bridge.expression(hashes), numHashes))
}
