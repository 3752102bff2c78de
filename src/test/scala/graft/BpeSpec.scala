package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeFixture, BpeModel}
import graft.ops.BpeOps

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainer golden: hand-computed merges on a tiny weighted corpus") {
    // counts: "low" x5, "lower" x2, "newest" x6, "widest" x3 — the
    // Sennrich-paper-shaped example. Pair counts, round 1:
    //   (l,o)=7 (o,w)=7 (w,e)=2 (e,r)=2 (n,e)=6 (e,w)=6 (w,es)... chars:
    //   newest: n-e,e-w,w-e,e-s,s-t ; widest: w-i,i-d,d-e,e-s,s-t
    //   (e,s)=9 (s,t)=9 ties -> lex: (e,s) < (s,t) so (e,s) first
    val corpus = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m = Bpe.train(corpus, numMerges = 4)
    assert(m.merges.take(4) === Seq(
      ("e", "s"),   // 9
      ("es", "t"),  // 9 (after e+s merges, s-t occurrences became es-t)
      ("l", "o"),   // 7
      ("lo", "w"))) // 7
    assert(m.alphabet === Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w"))
    // ids: alphabet 0..9 sorted, then merge outputs in learned order
    assert(m.ids("d") === 0 && m.ids("w") === 9)
    assert(m.ids("es") === 10 && m.ids("est") === 11 &&
      m.ids("lo") === 12 && m.ids("low") === 13)
    assert(Bpe.encodeWord("lowest", m).toSeq === Seq("low", "est"))
    assert(Bpe.encodeWord("newest", m).toSeq === Seq("n", "e", "w", "est"))
  }

  test("encoder equals an independent reference on random words") {
    // reference: recompute from scratch each step with max-by over pairs
    // (different code path: lists + indexOfSlice-free functional style)
    def reference(word: String, m: BpeModel): List[String] = {
      def step(syms: List[String]): Option[List[String]] = {
        val ranked = syms.zip(syms.tail).flatMap(p => m.ranks.get(p).map(p -> _))
        if (ranked.isEmpty) None
        else {
          val (pair, _) = ranked.minBy(_._2)
          // merge every leftmost-non-overlapping occurrence of pair
          def go(rest: List[String]): List[String] = rest match {
            case a :: b :: tl if (a, b) == pair => (a + b) :: go(tl)
            case a :: tl => a :: go(tl)
            case Nil => Nil
          }
          Some(go(syms))
        }
      }
      var cur = word.map(_.toString).toList
      var next = step(cur)
      while (next.isDefined) { cur = next.get; next = step(cur) }
      cur
    }
    val m = BpeFixture.model
    val rnd = new scala.util.Random(63)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    (1 to 500).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(14))).map(_ => alpha(rnd.nextInt(26))).mkString
      assert(Bpe.encodeWord(w, m).toSeq === reference(w, m),
        s"encode mismatch on '$w'")
    }
    // plus stress: repeated-char words (the overlap semantics corner)
    Seq("aaaa", "ssss", "tttttt", "erer", "stst").foreach { w =>
      assert(Bpe.encodeWord(w, m).toSeq === reference(w, m), s"overlap '$w'")
    }
  }

  test("lossless: tokens concatenate back to the pretoken stream; unknown chars get id -1") {
    val m = BpeFixture.model
    val texts = Seq(
      "the quick brown fox! 42 jumps... über-naïve 'tis",
      "", "   ", "Σπ spark Σ", "ab")
    val df = texts.toDF("text")
      .select(col("text"), BpeOps.bpeEncode(col("text"), m).as("e"))
      .select(col("text"), col("e.tokens").as("toks"), col("e.ids").as("ids"))
    df.collect().foreach { r =>
      val text = r.getString(0)
      val toks = r.getSeq[String](1)
      val ids = r.getSeq[Int](2)
      val pretokens = graft.ops.TextOps.BpePattern.r.findAllIn(text).mkString
      assert(toks.mkString === pretokens, s"lossy on '$text'")
      assert(toks.length === ids.length)
      toks.zip(ids).foreach { case (t, i) =>
        if (i == -1) assert(!m.ids.contains(t))
        else assert(m.ids(t) === i && m.vocab(i) === t)
      }
    }
    // the fixture alphabet really does produce -1 for exotic chars
    val exotic = df.filter(col("text") === "Σπ spark Σ")
      .select(col("ids")).as[Seq[Int]].head()
    assert(exotic.count(_ == -1) === 3) // Σ, π, Σ
  }

  test("distributed trainer reproduces the pure-Scala fixture model (freeze is falsifiable)") {
    // expand the weighted corpus into rows, one word per document times its
    // weight — pretokenization over these is the identity, so the Spark
    // word count must equal BpeFixture.corpus exactly
    val rows = BpeFixture.corpus.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w)
    }
    val trained = BpeOps.trainBpe(rows.toDF("text"), "text", BpeFixture.NumMerges)
    assert(trained.alphabet === BpeFixture.model.alphabet)
    assert(trained.merges === BpeFixture.model.merges)
    assert(trained.ids === BpeFixture.model.ids)
  }

  test("trainer: minCount stops merge learning before singleton pairs") {
    val m = Bpe.train(Seq("ab" -> 1L, "cd" -> 1L), numMerges = 10)
    assert(m.merges.isEmpty) // every pair count is 1 < minCount=2
    val m2 = Bpe.train(Seq("ab" -> 1L, "cd" -> 1L), numMerges = 10, minCount = 1)
    assert(m2.merges.toSet === Set(("a", "b"), ("c", "d")))
  }

  test("trainer cap: a tail of globally-hapax PAIRS cannot change learned merges") {
    val hot = Seq("merge" -> 50L, "merged" -> 30L)
    // every tail word is a distinct 2-char pair seen exactly once: each
    // pair count is 1 < minCount, so dropping these word types (what the
    // maxVocabWords cap does) provably cannot alter any learned merge.
    // (A tail of hapax WORDS sharing a pair is different — 200 x "zxNN"
    // all contribute to (z,x) — which is why the cap is documented as a
    // bounded-memory approximation to size generously, not an exact cut.)
    val alpha = "abcfhijklnopqstuvwxyz" // disjoint from hot's {m,e,r,g,d}
    val tail = (for (a <- alpha; b <- alpha if a != b) yield s"$a$b")
      .take(200).map(_ -> 1L)
    val full = Bpe.train(hot ++ tail, 8)
    val capped = Bpe.train(hot, 8)
    assert(full.merges === capped.merges)
  }

  test("encode over documents: budget column feeds packSequences with REAL token counts") {
    val docs = Seq(
      (1L, "the merge sort the merge sort"),
      (2L, "window stream batch"),
      (3L, "")).toDF("doc_id", "text")
    val enc = docs.select(col("doc_id"),
        BpeOps.bpeEncode(col("text"), BpeFixture.model).as("e"))
      .select(col("doc_id"), size(col("e.ids")).cast("long").as("n_tokens"))
    val packed = graft.ops.PipelineOps.packSequences(
      enc, "doc_id", "doc_id", col("n_tokens"), budget = 8)
    val got = packed.select("doc_id", "n_tokens", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // doc1: "the merge sort the merge sort" -> 6 single-token words = 6
    assert(got(0) === ((1L, 6L, 0L)))
    assert(got.map(_._1) === Array(1L, 2L, 3L))
  }
}
