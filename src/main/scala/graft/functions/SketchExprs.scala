package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

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

object SketchExprs {
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), numHashes))
  def simhash64_from_hashes(hashes: Column): Column =
    Bridge.column(SimHash64FromHashes(Bridge.expression(hashes)))
}
