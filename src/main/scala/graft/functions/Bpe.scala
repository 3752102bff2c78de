package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-pair-encoding tokenizer: real merge-table token IDS, not the
 * pretokenizer-count proxy of `TextOps.bpeTokenCount` (q49). The reference
 * has no tokenizer (gowarc stops at WARC bytes); this is part of the
 * training-data-pipeline tier — `packSequences`' budgets and
 * `contaminationFlags`' n-grams ultimately want model-tokenizer units, and
 * the round-5 verdict ranked "true BPE token ids" the top remaining gap.
 *
 * The model is deliberately classic (Sennrich et al. 2016, "Neural Machine
 * Translation of Rare Words with Subword Units"): pretokenize with the
 * RE2-portable [[graft.ops.TextOps.BpePattern]] (the same pattern q49
 * proved bit-compatible between Spark's Java regex and DuckDB's RE2), then
 * greedily apply learned (left, right) merges per pretoken, lowest
 * learned-rank first, leftmost occurrence first. One merge at a time is
 * provably identical to the batch "merge every non-overlapping occurrence
 * of the best pair" form: any pair involving a freshly merged token XY can
 * only be a merge learned AFTER the (X, Y) merge (XY had to exist during
 * training first), so the best pair stays best until its occurrences are
 * exhausted — which is exactly what makes the q63 oracle expressible as a
 * one-merge-per-iteration DuckDB recursive CTE.
 *
 * Token ids are deterministic: sorted alphabet first, then each merge's
 * output token in learned order (first-wins if a later merge reproduces an
 * existing token's string). Characters outside the alphabet encode as
 * single-character tokens with id -1 — never dropped, so
 * `tokens.mkString == pretoken` always holds (lossless, asserted in
 * BpeSpec).
 */
case class BpeModel(alphabet: Seq[String], merges: Seq[(String, String)])
    extends Serializable {
  /** merge pair -> learned rank (lower merges first). */
  @transient lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
  /** token string -> id: alphabet (sorted) then merge outputs, first-wins. */
  @transient lazy val ids: Map[String, Int] = {
    val m = scala.collection.mutable.LinkedHashMap[String, Int]()
    alphabet.sorted.foreach(t => if (!m.contains(t)) m(t) = m.size)
    merges.foreach { case (a, b) =>
      val t = a + b
      if (!m.contains(t)) m(t) = m.size
    }
    m.toMap
  }
  /** id -> token string (for decode / vocab dumps). */
  @transient lazy val vocab: Seq[String] =
    ids.toSeq.sortBy(_._2).map(_._1)
}

object Bpe {

  /**
   * Learn `numMerges` merges from a word-count dictionary (the HF-trainer
   * decomposition: the CORPUS pass is the distributed part — one
   * map-side-combinable groupBy in [[graft.ops.BpeOps.trainBpe]] — while
   * merge learning runs over the word-TYPE dictionary, Heaps'-law-bounded
   * and driver-sized by construction). Deterministic: best pair = highest
   * weighted adjacent-occurrence count, ties broken lexicographically;
   * training stops early when the best count falls below `minCount`.
   */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int,
            minCount: Long = 2L): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    var words: Vector[(Array[String], Long)] = wordCounts.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (splitChars(w), c) }.toVector
    val alphabet = words.iterator.flatMap(_._1).toSet.toSeq.sorted
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var done = numMerges == 0
    while (!done) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (best, bestCount) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (bestCount < minCount) done = true
        else {
          merges += best
          words = words.map { case (syms, c) => (mergePair(syms, best), c) }
          step += 1
          if (step >= numMerges) done = true
        }
      }
    }
    BpeModel(alphabet, merges.result())
  }

  /** Replace every non-overlapping (leftmost-first) adjacent occurrence of
    * `pair` in `syms` with the concatenated token. */
  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Codepoint-correct single-character split (surrogate-pair safe). */
  private def splitChars(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var j = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out(j) = new String(Character.toChars(cp))
      i += Character.charCount(cp)
      j += 1
    }
    out
  }

  /** Encode ONE pretoken: repeatedly merge the lowest-rank adjacent pair
    * (all leftmost-non-overlap occurrences per scan) until none is ranked.
    * Pretokens are short (a word, a digit, a punctuation run), so the
    * simple rescan loop beats a heap in practice — and the per-word cache
    * in [[encodeText]] makes repeated words free anyway. */
  def encodeWord(word: String, model: BpeModel): Array[String] = {
    var syms = splitChars(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = model.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        syms = mergePair(syms, model.merges(bestRank))
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Per-thread pretoken->tokens cache. Zipf makes the hot working set tiny
    * relative to the corpus; the bound caps memory on adversarial inputs
    * (the classic GPT-2 encoder cache, sized generously for a JVM). */
  private val CacheMax = 65536
  private val cache =
    ThreadLocal.withInitial[java.util.HashMap[String, Array[String]]](() =>
      new java.util.HashMap[String, Array[String]]())

  private val pretokenizer = new ThreadLocal[java.util.regex.Matcher]()

  /**
   * Encode a text: pretokenize with [[graft.ops.TextOps.BpePattern]], BPE
   * each pretoken (cached), emit `struct<tokens array<string>,
   * ids array<int>>` in document order. Unknown tokens carry id -1.
   * NOTE the model is identified by REFERENCE for cache purposes: one
   * executor uses one broadcast/reference-object model per query, so the
   * per-thread cache is keyed only by the word (flushed when the model
   * instance changes).
   */
  def encodeText(text: UTF8String, model: BpeModel): InternalRow = {
    var m = pretokenizer.get()
    if (m == null) {
      m = java.util.regex.Pattern.compile(graft.ops.TextOps.BpePattern)
        .matcher("")
      pretokenizer.set(m)
    }
    val c = cache.get()
    // cache entries from a previous model would be silently wrong
    if (modelOf.get() ne model) { c.clear(); modelOf.set(model) }
    val toks = scala.collection.mutable.ArrayBuffer[UTF8String]()
    val idBuf = scala.collection.mutable.ArrayBuffer[Int]()
    m.reset(text.toString)
    while (m.find()) {
      val w = m.group()
      var enc = c.get(w)
      if (enc == null) {
        enc = encodeWord(w, model)
        if (c.size >= CacheMax) c.clear()
        c.put(w, enc)
      }
      var i = 0
      while (i < enc.length) {
        toks += UTF8String.fromString(enc(i))
        idBuf += model.ids.getOrElse(enc(i), -1)
        i += 1
      }
    }
    InternalRow(new GenericArrayData(toks.toArray[Any]),
      new GenericArrayData(idBuf.toArray))
  }

  private val modelOf = new ThreadLocal[BpeModel]()
}

/**
 * `bpe_encode(text)`: tokens + ids under a fixed [[BpeModel]]. The model
 * rides as a codegen reference object (the `RegExpReplace`-compiled-pattern
 * pattern), so the expression stays inside whole-stage codegen and each
 * executor materializes the ranks/ids maps once.
 */
case class BpeEncode(child: Expression, model: BpeModel)
    extends UnaryExpression {
  override def dataType: DataType = BpeEncode.schema
  override protected def nullSafeEval(t: Any): Any =
    Bpe.encodeText(t.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Bpe.encodeText($t, $modelRef);")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  val schema: StructType = StructType(Seq(
    StructField("tokens", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ids", ArrayType(IntegerType, containsNull = false), nullable = false)))
}
