package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{PipelineOps, TextOps}

/** Corpus-assembly operators: mixing, packing, decontamination. */
class PipelineOpsSpec extends SparkSpec {

  test("bpeTokenCount: GPT-2-shaped pretokenizer counts (hand-checked)") {
    import spark.implicits._
    val r = Seq(
      "Hello's  world, 42 cats!", // Hello + 's + world + , + 4 + 2 + cats + ! = 8
      "",                         // 0
      "a-b")                      // a + - + b = 3
      .toDF("t").select(TextOps.bpeTokenCount(col("t"))).collect().map(_.getInt(0))
    assert(r.toSeq === Seq(8, 0, 3))
  }

  test("portableHash64 matches independently-computed md5-derived goldens") {
    import spark.implicits._
    // python: int(md5(s)[:16],16), signed-64 wrapped
    val got = Seq("hello", "b").toDF("s")
      .select(PipelineOps.portableHash64(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(6719722671305337462L, -7860083176248561684L))
    // simhash over portable hashes runs through the unchanged kernel;
    // simhash is order-invariant, so a token permutation MUST collide at
    // Hamming 0 (a fixed near-dup pair would be flaky at few-token sizes)
    val ws = (0 until 40).map(i => s"tok$i")
    val docs = Seq((1L, ws.mkString(" ")),
      (2L, ws.reverse.mkString(" ")),
      (3L, (100 until 140).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = graft.ops.DedupOps.simhashPairs(docs, "doc_id", "text",
      maxHamming = 3, tokenHash = PipelineOps.portableHash64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(pairs.forall(p => !(p._1 == 1L && p._2 == 3L) && !(p._1 == 2L && p._2 == 3L)))
  }

  test("stratifiedSample is deterministic, rate-faithful, and a pure filter") {
    import spark.implicits._
    val df = spark.range(10000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val rates = Map("en" -> 0.5, "de" -> 0.1)
    val s1 = PipelineOps.stratifiedSample(df, "lang", "doc_id", rates)
    val s2 = PipelineOps.stratifiedSample(df.repartition(13), "lang", "doc_id", rates)
    // identical keep set regardless of partitioning (no RNG state)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      s2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    val byLang = s1.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5-uniform: binomial(5000, rate) stays well within 5 sigma
    assert(math.abs(byLang("en") - 2500.0) < 200, byLang.toString)
    assert(math.abs(byLang("de") - 500.0) < 120, byLang.toString)
    // unlisted strata use the default rate (0.0 -> dropped entirely)
    val none = PipelineOps.stratifiedSample(df, "lang", "doc_id", Map("fr" -> 1.0))
    assert(none.count() === 0)
  }

  test("mixWeighted oversamples: floor(w) guaranteed copies + hash-decided fraction") {
    import spark.implicits._
    val df = spark.range(6000).select(col("id").as("doc_id"),
      when(col("id") % 3 === 0, "wiki").when(col("id") % 3 === 1, "web").otherwise("zero").as("src"))
    val mixed = PipelineOps.mixWeighted(df, "src", "doc_id",
      Map("wiki" -> 2.5, "web" -> 0.3, "zero" -> 0.0))
    val byCopy = mixed.groupBy("src", "copy").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // wiki (2000 rows, w=2.5): copies 0 and 1 complete, copy 2 ~ half
    assert(byCopy(("wiki", 0L)) === 2000 && byCopy(("wiki", 1L)) === 2000)
    assert(math.abs(byCopy(("wiki", 2L)) - 1000.0) < 150, byCopy.toString)
    // web (w=0.3): single hash-gated copy
    assert(math.abs(byCopy(("web", 0L)) - 600.0) < 120, byCopy.toString)
    assert(!byCopy.contains(("web", 1L)))
    // zero weight drops the stratum entirely (no descending-sequence leak)
    assert(!byCopy.keySet.exists(_._1 == "zero"))
    // deterministic under repartitioning
    val again = PipelineOps.mixWeighted(df.repartition(17), "src", "doc_id",
      Map("wiki" -> 2.5, "web" -> 0.3, "zero" -> 0.0))
    assert(again.select("doc_id", "copy").collect().map(_.toString).sorted.toSeq ===
      mixed.select("doc_id", "copy").collect().map(_.toString).sorted.toSeq)
  }

  test("packSequences equals the one-window reference and respects the budget math") {
    import spark.implicits._
    val docs = spark.range(500).select(col("id").as("doc_id"),
      (pmod(col("id") * 37, lit(90)) + 10).as("toks")) // 10..99 tokens each
    val packed = PipelineOps.packSequences(docs, "doc_id", "doc_id",
      col("toks"), budget = 256, numParts = 7)
      .orderBy("doc_id").collect()
    // reference: single global window (fine at test scale)
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val ref = docs.withColumn("start_offset", coalesce(sum(col("toks")).over(w), lit(0L)))
      .select(col("doc_id"), col("toks").cast("long").as("n_tokens"), col("start_offset"),
        (col("start_offset") / 256).cast("long").as("seq_id"),
        (col("start_offset") % 256).as("seq_offset"))
      .orderBy("doc_id").collect()
    assert(packed.map(_.toString).toSeq === ref.map(_.toString).toSeq)
    // tape invariants: offsets strictly increase by n_tokens; seq ids monotone
    val rows = packed.map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("start_offset"),
      r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))
    rows.sliding(2).foreach { case Array((n1, o1, _, _), (_, o2, _, _)) =>
      assert(o2 === o1 + n1)
    }
    rows.foreach { case (_, o, sid, soff) =>
      assert(sid === o / 256 && soff === o % 256)
    }
    // more partitions than rows still works (empty partitions contribute 0)
    val tiny = PipelineOps.packSequences(docs.limit(3), "doc_id", "doc_id",
      col("toks"), budget = 64, numParts = 16).orderBy("doc_id").collect()
    assert(tiny.length === 3 && tiny.head.getAs[Long]("start_offset") === 0L)
  }

  test("materializeSequences: exact-budget sequences reproducing the token tape") {
    import spark.implicits._
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(lit(0), pmod(col("id") * 13, lit(40)) + 3), // 4..43 tokens
        i => concat(lit("t"), col("id"), lit("_"), i))).as("text"))
    val budget = 64
    val seqs = PipelineOps.materializeSequences(docs, "doc_id", "doc_id", "text", budget)
      .orderBy("seq_id").collect()
    // every sequence except the last holds EXACTLY `budget` tokens
    seqs.dropRight(1).foreach(r => assert(r.getAs[Long]("n_tokens") === budget.toLong,
      s"seq ${r.getAs[Long]("seq_id")}"))
    assert(seqs.last.getAs[Long]("n_tokens") <= budget.toLong)
    // seq ids are dense from 0
    assert(seqs.map(_.getAs[Long]("seq_id")).toSeq === seqs.indices.map(_.toLong))
    // the concatenated stream is EXACTLY the doc-ordered token tape
    val tape = docs.orderBy("doc_id").collect()
      .flatMap(_.getString(1).split("\\s+")).mkString(" ")
    assert(seqs.map(_.getAs[String]("text")).mkString(" ") === tape)
  }

  test("gopher signals: hand-computed repetition and shape fractions") {
    import spark.implicits._
    // lines: 4, one duplicated (0.25), one ellipsis-terminated (0.25)
    // tokens: 11 incl "..." (alpha 10/11); 2-grams: 10, two repeats (0.2)
    val text = "aa bb aa bb\nxx yy\nxx yy\nfoo bar ..."
    val d = Seq(text).toDF("text")
      .select(TextOps.tokens(col("text")).as("toks"), TextOps.docLines(col("text")).as("lines"))
    val r = d.select(
      TextOps.dupLineFraction(col("lines")),
      TextOps.dupNgramFraction(col("toks"), 2),
      TextOps.ellipsisLineFraction(col("lines")),
      TextOps.alphaWordFraction(col("toks")),
      TextOps.meanWordLength(col("toks")),
      TextOps.gopherPass(col("toks"), col("lines"))).head()
    assert(r.getDouble(0) === 0.25)
    assert(r.getDouble(1) === 0.2)
    assert(r.getDouble(2) === 0.25)
    assert(math.abs(r.getDouble(3) - 10.0 / 11) < 1e-9)
    assert(math.abs(r.getDouble(4) - 25.0 / 11) < 1e-9)
    assert(!r.getBoolean(5)) // 11 words < the 50-word Gopher floor
    // a clean 60-word document passes the published gate
    val clean = (0 until 60).map(i => s"word$i").mkString(" ")
    val ok = Seq(clean).toDF("text")
      .select(TextOps.tokens(col("text")).as("toks"), TextOps.docLines(col("text")).as("lines"))
      .select(TextOps.gopherPass(col("toks"), col("lines"))).head().getBoolean(0)
    assert(ok)
    // empty doc: every signal 0, gate false, no division blowups
    val empty = Seq("").toDF("text")
      .select(TextOps.tokens(col("text")).as("toks"), TextOps.docLines(col("text")).as("lines"))
      .select(TextOps.dupLineFraction(col("lines")), TextOps.meanWordLength(col("toks")),
        TextOps.gopherPass(col("toks"), col("lines"))).head()
    assert(empty.getDouble(0) === 0.0 && empty.getDouble(1) === 0.0 && !empty.getBoolean(2))
    // CRLF documents: the \r must not defeat line identity or the ellipsis
    // suffix rule (crawled text is routinely CRLF)
    val crlf = Seq("dup line\r\ndup line\r\nends with ...\r\nplain\r\n").toDF("text")
      .select(TextOps.docLines(col("text")).as("lines")).select(
        TextOps.dupLineFraction(col("lines")), TextOps.ellipsisLineFraction(col("lines"))).head()
    assert(crlf.getDouble(0) === 0.25 && crlf.getDouble(1) === 0.25)
    // Gopher's top-n-gram CHARACTER fraction: "a b a b c" -> top bigram
    // "a b" occurs twice, 3 chars each = 6 of 9 text chars
    val top = Seq("a b a b c").toDF("text")
      .select(length(col("text")).cast("long").as("tl"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("grams", TextOps.wordNgramsFromTokens(col("toks"), 2))
      .select(TextOps.topNgramCharFraction(col("grams"), col("tl"))).head().getDouble(0)
    assert(math.abs(top - 6.0 / 9) < 1e-9)
  }

  test("contaminationFlags: shared 8-gram with the eval set flags the doc") {
    import spark.implicits._
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"prefix words $shared suffix words"),      // contains the eval 8-gram
      (2L, "totally different text with many words here indeed"),
      (3L, shared),                                    // exactly the gram
      (4L, "one two three four five six seven"))       // 7 tokens: short-doc path, no match
      .toDF("doc_id", "text")
    val eval = Seq(s"an eval doc containing $shared inside it").toDF("eval_text")
    val flags = PipelineOps.contaminationFlags(docs, "doc_id", "text", eval, "eval_text", n = 8)
      .select("doc_id", "contaminated").orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    // short-doc policy (documented on contaminationFlags): a sub-n doc is
    // flagged iff an eval line is the IDENTICAL token sequence — a 3-token
    // doc vs its 3-token eval twin flags; the same 3 tokens embedded in a
    // LONGER eval line do not (that line only contributes n-grams)
    val evalShort = Seq("tiny doc", "eval question three").toDF("eval_text")
    val flags2 = PipelineOps.contaminationFlags(
      Seq((1L, "tiny doc"), (2L, "tiny dog"),
        (3L, "eval question three"),
        (4L, "an eval question three embedded in longer words here")).toDF("doc_id", "text"),
      "doc_id", "text", evalShort, "eval_text", n = 8)
      .select("doc_id", "contaminated").orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags2 === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    // a caller id column literally named "id" must survive (the internal
    // join alias must not collide and drop it)
    val withId = PipelineOps.contaminationFlags(
      Seq((7L, "tiny doc")).toDF("id", "text"), "id", "text", evalShort, "eval_text", n = 8)
    assert(withId.columns.contains("id"))
    assert(withId.select("id", "contaminated").head().getLong(0) === 7L)
  }

  test("epochShuffle: seeded permutation with contiguous rank, partition-invariant") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val r1 = PipelineOps.epochShuffle(docs, "doc_id", seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contiguous rank: a permutation of 0..n-1
    assert(r1.values.toSeq.sorted === (0L until 300L))
    // matches the brute-force seeded order
    val expect = (0L until 300L).sortBy { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
      (md.digest(s"7:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString, id)
    }.zipWithIndex.map { case (id, r) => id -> r.toLong }.toMap
    assert(r1 === expect)
    // partition-count invariant (the rank must not depend on the plan)
    val r2 = PipelineOps.epochShuffle(docs.repartition(7), "doc_id", seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === r1)
    // another seed is a different permutation
    val r3 = PipelineOps.epochShuffle(docs, "doc_id", seed = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 !== r1)
  }

  test("assignSplits: stable under corpus growth, deterministic, sane fractions") {
    import spark.implicits._
    val small = (0L until 400L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val grown = (0L until 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def labels(df: org.apache.spark.sql.DataFrame) =
      PipelineOps.assignSplits(df, "doc_id", splits, seed = 3L)
        .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = labels(small); val b = labels(grown)
    // membership-by-own-hash: growing the corpus never relabels a document
    a.foreach { case (id, l) => assert(b(id) === l, s"doc $id relabeled on growth") }
    // all three splits materialize with roughly the asked-for mass
    val frac = b.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("val") > 0.05 && frac("val") < 0.15)
    assert(frac("test") > 0.05 && frac("test") < 0.15)
  }

  test("htmlToText/htmlTitle: strip order, entity decode, block newlines, goldens") {
    import spark.implicits._
    val cases = Seq(
      // script/style content must never surface, even with '<' inside
      ("<p>a</p><script>if(x<2){y}</script><style>b{c:d}</style><p>z</p>", "a\nz"),
      // comments drop; block-closing tags become line breaks; inline tags a space
      ("<h2>t</h2><!-- no --><div>x <b>y</b></div>", "t\nx y"),
      // entity decode AFTER tag strip, &amp; LAST: &amp;lt; is the literal &lt;
      ("a &amp;lt; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f", "a &lt; b <c> \"d\" 'e' f"),
      // whitespace collapses, edges trim
      ("  <p> a\r\n  b </p>  ", "a b"),
      ("plain text, no markup", "plain text, no markup"))
      .toDF("html", "expect")
    cases.select(graft.ops.TextOps.htmlToText(col("html")).as("got"), col("expect"))
      .collect().foreach(r => assert(r.getString(0) === r.getString(1), r.toString))

    val titles = Seq(
      ("<html><head><title>Hi &amp; bye</title></head></html>", "Hi &amp; bye"),
      ("<TITLE class=x>Up</TITLE>", "Up"),
      ("no title here", ""))
      .toDF("html", "expect")
    titles.select(graft.ops.TextOps.htmlTitle(col("html")).as("got"), col("expect"))
      .collect().foreach(r => assert(r.getString(0) === r.getString(1), r.toString))
  }

  test("piiScrub: typed placeholders, ordered application, counts agree") {
    import spark.implicits._
    val rows = Seq(
      ("mail me at alice.smith+spam@sub.example.co.uk today", "mail me at [EMAIL] today"),
      ("call +44-207-946-0958 or +1-55-0100", "call [PHONE] or +1-55-0100"), // 2nd: 2-digit middle, no match
      ("server at 192.168.0.1 and 10.255.254.3", "server at [IP] and [IP]"),
      // email containing a dotted quad in its domain scrubs as ONE email,
      // never leaking an [IP] inside the placeholder
      ("bot@10.0.0.5.example.com pinged", "[EMAIL] pinged"),
      // national formats: parenthesized and bare dashed 3-3-4
      ("ring (555) 123-4567 or 555-123-4567 now", "ring [PHONE] or [PHONE] now"),
      // ORDERING: the international rule must consume a +-prefixed number
      // whole, before the national rule could eat its 3-3-4 tail
      ("dial +1-555-123-4567 ok", "dial [PHONE] ok"),
      // IPv6: compressed, full-length tail, and leading-:: loopback;
      // hh:mm:ss timestamps must NOT match (neither 7 colons nor a ::)
      ("node fe80::1 and 2001:db8:85a3::8a2e:370:7334 up", "node [IPV6] and [IPV6] up"),
      ("::1 localhost and meeting at 12:30:45 today", "[IPV6] localhost and meeting at 12:30:45 today"),
      ("no pii here at all", "no pii here at all"))
      .toDF("raw", "expect")
    val got = rows.select(graft.ops.TextOps.piiScrub(col("raw")).as("clean"), col("expect"))
      .collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
    val cs = graft.ops.TextOps.piiCounts(col("raw"))
    val counts = rows.select(cs.zipWithIndex.map { case (c, i) => c.as(s"c$i") }: _*)
      .collect().map(r => (0 until 5).map(r.getInt).toList).toSeq
    assert(counts === Seq(
      List(1, 0, 0, 0, 0), List(0, 1, 0, 0, 0), List(0, 0, 0, 0, 2),
      List(1, 0, 0, 0, 0), List(0, 0, 2, 0, 0), List(0, 1, 0, 0, 0),
      List(0, 0, 0, 2, 0), List(0, 0, 0, 1, 0), List(0, 0, 0, 0, 0)))

    // the staged frame API is value-identical to the composed columns —
    // and each intermediate stays a real attribute (one regex pass per
    // stage per row instead of O(chain^2))
    val report = graft.ops.TextOps.piiReport(rows.select(col("raw")), "raw")
    val viaReport = report
      .select(col("clean"), col("n_email"), col("n_phone"), col("n_phone_nat"),
        col("n_ipv6"), col("n_ip")).collect().map(_.toSeq).toSeq
    val viaComposed = rows.select(
      (graft.ops.TextOps.piiScrub(col("raw")).as("clean") +:
        cs.map(_.cast("long"))): _*).collect().map(_.toSeq).toSeq
    assert(viaReport === viaComposed)
    // staged attributes survive optimization: no regexp_replace is nested
    // under a regexp_count in the optimized plan
    val opt = report.queryExecution.optimizedPlan.toString
    assert(!opt.matches("(?s).*regexp_count\\([^)]*regexp_replace.*"),
      "piiReport regressed to nested (quadratic) regex stages:\n" + opt.take(1500))
    // the fused kernel runs ONCE per row: CollapseProject must not inline
    // the non-cheap struct under its 6 GetStructField consumers. (Gate on
    // a range-backed frame — a LocalRelation input would be constant-folded
    // by ConvertToLocalRelation and show no kernel at all.)
    val ranged = graft.ops.TextOps.piiReport(
      spark.range(3).select(concat(lit("u"), col("id").cast("string"),
        lit("@ex.io")).as("raw")), "raw")
    val opt2 = ranged.queryExecution.optimizedPlan.toString
    val kernelRefs = "regex_scrub_count".r.findAllIn(opt2).size
    assert(kernelRefs === 1,
      s"regex_scrub_count evaluated $kernelRefs times in the optimized plan:\n" +
        opt2.take(1500))

    // kernel edge cases straight through the expression: empty string,
    // replacement-metacharacter text ($/\ must stay literal), adjacent
    // matches, and null propagation
    val edge = Seq[(Integer, String)]((1, ""), (2, "cost $1 and \\2 from a@b.io c@d.io"),
      (3, null))
      .toDF("i", "raw")
    val er = graft.ops.TextOps.piiReport(edge, "raw").orderBy("i")
      .select("clean", "n_email").collect()
    assert(er(0).getString(0) === "" && er(0).getLong(1) === 0L)
    assert(er(1).getString(0) === "cost $1 and \\2 from [EMAIL] [EMAIL]" &&
      er(1).getLong(1) === 2L)
    assert(er(2).isNullAt(0) && er(2).isNullAt(1))
    // reserved-name guard matches the other pipeline ops
    val clash = intercept[IllegalArgumentException] {
      graft.ops.TextOps.piiReport(rows.select(col("raw"), lit(1).as("clean")), "raw")
    }
    assert(clash.getMessage.contains("clean"))
  }

  test("langIdReport: value-identical to the column API, single staged tokenize") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox and the lazy dog of it",   // en
      "der hund und die katze ist das nicht",         // de
      "le chat et le chien est une de la",            // fr
      "el perro y la gata es un de no",               // es
      "一二三四五六七八九十", // zh by cjk ratio
      "zzz qqq xxx",                                  // unknown
      "").toDF("text")
    val viaColumn = docs.select(graft.ops.TextOps.langId(col("text"))).collect().map(_.getString(0))
    val viaReport = graft.ops.TextOps.langIdReport(docs, "text")
      .select("lang").collect().map(_.getString(0))
    assert(viaReport.toSeq === viaColumn.toSeq)
    assert(viaColumn.toSeq === Seq("en", "de", "fr", "es", "zh", "unknown", "unknown"))
    // staging survives optimization: exactly ONE tokenize (split) runs per
    // row (repartition blocks ConvertToLocalRelation from pre-evaluating)
    val opt = graft.ops.TextOps.langIdReport(docs.repartition(2), "text")
      .select("lang").queryExecution.optimizedPlan.toString
    assert("split\\(".r.findAllIn(opt).size === 1,
      "tokenize must be staged once, found:\n" + opt.take(1500))
    val guard = intercept[IllegalArgumentException] {
      graft.ops.TextOps.langIdReport(docs.withColumn("lang", lit("x")), "text")
    }
    assert(guard.getMessage.contains("lang"))
  }

  test("dropBoilerplateLines: threshold drop, order preserved, empty-doc row kept") {
    import spark.implicits._
    val banner = "subscribe now"
    val docs = Seq(
      (1L, s"alpha\r\n$banner\nbeta"),     // CRLF split + banner sandwiched
      (2L, s"$banner\ngamma"),
      (3L, s"delta\n   \n$banner"),        // whitespace-only line discarded
      (4L, banner),                        // loses ALL lines -> row kept, clean=""
      (5L, "rare line\nrare line"))        // dup WITHIN one doc: 1 distinct doc, kept
    val r = graft.ops.TextOps.dropBoilerplateLines(docs.toDF("doc_id", "text"),
      "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq(
      (1L, "alpha\nbeta", 2L, 1L),
      (2L, "gamma", 1L, 1L),
      (3L, "delta", 1L, 1L),
      (4L, "", 0L, 1L),
      (5L, "rare line\nrare line", 2L, 0L)))

    // boundary: a line in exactly minDocs-1 distinct docs survives everywhere
    val under = Seq((1L, "x\ny"), (2L, "x\nz"), (3L, "w")).toDF("doc_id", "text")
    val kept = graft.ops.TextOps.dropBoilerplateLines(under, "doc_id", "text", minDocs = 3)
      .agg(sum("n_dropped")).head().getLong(0)
    assert(kept === 0L)

    val guard = intercept[IllegalArgumentException] {
      graft.ops.TextOps.dropBoilerplateLines(
        docs.toDF("doc_id", "__bl_id"), "doc_id", "__bl_id", minDocs = 2)
    }
    assert(guard.getMessage.contains("__bl_id"))

    // scale shape: no Window, and the hot-line drop is the explicit
    // broadcast anti-join (hot boilerplate must never key a window or a
    // shuffled join probe side)
    val plan = graft.ops.TextOps.dropBoilerplateLines(docs.toDF("doc_id", "text"),
      "doc_id", "text", minDocs = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1000))
    assert(plan.contains("LeftAnti"), plan.take(1000))
  }

  test("ngramLmPerplexity: hand-computed bigram LM goldens incl. <unk> target") {
    import spark.implicits._
    // tokens: a:3 b:3 c:1 x:1; minCount=2 -> vocab {a,b}, V=3
    // ctx: a:3 b:3 <unk>:2; model: (a,b):3 (b,a):1 (b,<unk>):1
    // p(a,b)=4/6, p(b,a)=2/6, p(b,<unk>)=2/6; quantized micro-nat sums by hand
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
    val r = graft.ops.TextOps.ngramLmPerplexity(docs, "doc_id", "text", minCount = 2)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    // doc 3 has one token -> no bigrams -> absent
    assert(r.toSeq === Seq((1L, 3L, -0.637, 1.89), (2L, 2L, -0.752, 2.12)))
  }

  test("ngramLmPerplexity: <unk> as bigram CONTEXT scores through its ctx count") {
    import spark.implicits._
    // z is OOV and document-initial: the pair is (<unk>, a) — exercises the
    // u1 side of the mapping (q65 injects both shapes via the md5 coin)
    val docs = Seq((1L, "z a"), (2L, "a a a")).toDF("doc_id", "text")
    // tokens a:4 z:1 -> vocab {a}, V=2; ctx a:4 <unk>:1
    // model: (<unk>,a):1, (a,a):2; p(a|<unk>)=(1+1)/(1+2)=2/3
    val r = graft.ops.TextOps.ngramLmPerplexity(docs, "doc_id", "text", minCount = 2)
      .orderBy("doc_id").collect()
    val d1 = r(0)
    assert(d1.getLong(1) === 1L)
    assert(d1.getDouble(2) === BigDecimal(math.log(2.0 / 3.0))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ngramLmPerplexity: result is independent of input partitioning") {
    import spark.implicits._
    val docs = (0 until 60).map(i =>
      (i.toLong, if (i % 7 == 0) s"odd$i the cat sat" else "the cat sat on the mat"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TextOps.ngramLmPerplexity(d, "doc_id", "text", minCount = 3)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // quantized-long per-pair scores make the per-doc sum order-free: any
    // partitioning (hence any shuffle arrival order) yields identical bits
    assert(run(docs.repartition(1)) === run(docs.repartition(7, col("text"))))
  }

  test("ngramLmPerplexity: OOV-injected docs score WORSE (non-vacuous direction)") {
    import spark.implicits._
    val docs = (0 until 80).map(i => (i.toLong,
      if (i % 4 == 0) s"the cat sat on the mat zq$i" // one rare word, never adjacent to another
      else "the cat sat on the mat")).toDF("doc_id", "text")
    val r = graft.ops.TextOps.ngramLmPerplexity(docs, "doc_id", "text", minCount = 5)
      .withColumn("injected", col("doc_id") % 4 === 0)
      .groupBy("injected").agg(avg("ppl").as("p")).collect()
      .map(x => x.getBoolean(0) -> x.getDouble(1)).toMap
    assert(r(true) > r(false),
      s"injected docs must have higher perplexity: ${r(true)} vs ${r(false)}")
  }

  test("ngramLmPerplexity: foreign-corpus scoring backs off unseen pairs to 1/(c1+V)") {
    import spark.implicits._
    val train = Seq((1L, "a b a b a")).toDF("doc_id", "text") // vocab {a,b}, V=3
    val score = Seq((9L, "a q b")).toDF("doc_id", "text")     // q unseen anywhere
    val r = graft.ops.TextOps.ngramLmPerplexity(score, "doc_id", "text",
      minCount = 2, train = Some(train)).collect()(0)
    // (a,<unk>): pair unseen but context a occurred 3x -> p = 1/(3+3);
    // (<unk>,b): <unk> never a training context -> p = 1/(0+3).
    // avg = (ln(1/6) + ln(1/3))/2 = -1.445 (micro-nat-quantized), ppl 4.24
    assert(r.getLong(1) === 2L && r.getDouble(2) === -1.445 && r.getDouble(3) === 4.24)
  }

  test("dsirSelect: up-weights target-style docs, down-weights off-style, deterministic") {
    // the q69 construction: class A (coin 0) shares the target's injected
    // style, class B (coin 1) carries a disjoint style the target never saw
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = md5(col("doc_id").cast("string"))
    val coin = conv(substring(m, 1, 8), 16, 10).cast("long") % 8
    val styled = docs.withColumn("text",
      when(coin === 0, concat(col("text"), lit(" alpha beta alpha")))
        .when(coin === 1, concat(col("text"), lit(" gamma delta gamma")))
        .otherwise(col("text")))
    val tcoin = conv(substring(md5(concat(lit("t:"), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("long") % 4
    val target = docs.filter(tcoin === 0)
      .withColumn("text", concat(col("text"), lit(" alpha beta alpha")))

    val sel = graft.ops.TextOps.dsirSelect(styled, "doc_id", "text", target, k = 100)
    val rows = sel.collect()
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 100))

    val byClass = sel.join(docs.select(col("doc_id"), (coin).as("cls")), Seq("doc_id"))
      .groupBy("cls").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = byClass.getOrElse(0L, 0L); val b = byClass.getOrElse(1L, 0L)
    // ~62 docs per class; uniform sampling would pick ~12-13 of each
    assert(a >= 2 * math.max(b, 1L), s"target-style not enriched: A=$a B=$b")
    assert(b <= 5, s"off-style class must be strongly down-weighted, got $b")
    // class-A docs carry higher importance weights than class-B docs
    val meanW = sel.join(docs.select(col("doc_id"), coin.as("cls")), Seq("doc_id"))
      .groupBy("cls").agg(avg("log_w").as("w")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    if (meanW.contains(0L) && meanW.contains(1L)) assert(meanW(0L) > meanW(1L))

    // deterministic: identical output on a second run
    val again = graft.ops.TextOps.dsirSelect(styled, "doc_id", "text", target, k = 100)
      .collect()
    assert(again.map(_.toString).toSeq === rows.map(_.toString).toSeq)

    // k beyond the weighted population returns every doc with >= 2 tokens
    val all = graft.ops.TextOps.dsirSelect(styled, "doc_id", "text", target, k = 100000)
      .collect()
    assert(all.length === docs.count())
  }

  test("ngramLmPerplexity: reserved-column guard") {
    import spark.implicits._
    val bad = Seq((1L, "a b", "x")).toDF("doc_id", "text", "__lm_id")
    val e = intercept[IllegalArgumentException] {
      graft.ops.TextOps.ngramLmPerplexity(bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("__lm_id"))
  }

  test("capPerKey: exact cap, window-reference equality, partition independence") {
    import spark.implicits._
    // skewed keys: key 0 holds 60 of 100 rows, key 1 holds 30, others tiny
    val rows = (0L until 100L).map { i =>
      val k = if (i < 60) 0L else if (i < 90) 1L else i % 5 + 2
      (i, k)
    }
    val df = rows.toDF("id", "domain")
    val capped = PipelineOps.capPerKey(df, "domain", "id", 7, seed = "s1")
    val byKey = capped.groupBy("domain").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey(0L) === 7L && byKey(1L) === 7L)        // over-cap: exactly k
    assert((2L to 6L).forall(k => byKey(k) === rows.count(_._2 == k).toLong)) // under-cap: all

    // equality with the windowed reference on the same coin
    val coin = md5(concat_ws("|", lit("s1"), col("id").cast("string")))
    val ref = df.withColumn("__c", coin)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("__c"), col("id"))))
      .filter(col("rn") <= 7).select("id").as[Long].collect().toSet
    assert(capped.select("id").as[Long].collect().toSet === ref)

    // merge path: many input partitions -> same answer (partial states merge)
    val capped16 = PipelineOps.capPerKey(df.repartition(16), "domain", "id", 7, seed = "s1")
    assert(capped16.select("id").as[Long].collect().toSet === ref)
  }

  test("extractSitemapUrls: loc extraction, entity decode order, index detection") {
    import spark.implicits._
    val urlset = "<urlset>\n<url>\n  <loc>\r\n  http://a.example/?x=1&amp;y=2 \n</loc>\n</url>" +
      "<url><loc>http://b.example/lit&amp;lt;tag</loc></url>" +
      "<url><lastmod>2024-01-01</lastmod></url></urlset>"
    val idx = "<sitemapindex><sitemap><loc>http://a.example/s1.xml</loc></sitemap></sitemapindex>"
    val rows = Seq(urlset, idx, "no locs here", "").toDF("x")
      .select(TextOps.extractSitemapUrls(col("x")).as("u"),
        TextOps.isSitemapIndex(col("x")).as("i"))
      .collect()
    assert(rows(0).getSeq[String](0) === Seq(
      "http://a.example/?x=1&y=2",   // entities decoded, whitespace trimmed
      "http://b.example/lit&lt;tag")) // &amp;lt; -> &lt; (amp decoded LAST)
    assert(!rows(0).getBoolean(1))
    assert(rows(1).getSeq[String](0) === Seq("http://a.example/s1.xml"))
    assert(rows(1).getBoolean(1), "sitemapindex must be detected")
    assert(rows(2).getSeq[String](0).isEmpty && rows(3).getSeq[String](0).isEmpty)
  }

  test("bm25ScoreMicro matches an independent in-test reference") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian"),
      (4L, "")).toDF("id", "text")
    val query = Seq("apple", "cherry")
    val got = TextOps.bm25ScoreMicro(docs, "id", "text", query).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference (same formula, plain scala doubles)
    val toks = Map(1L -> Seq("apple", "banana", "apple"), 2L -> Seq("banana", "cherry"),
      3L -> Seq("cherry", "cherry", "cherry", "durian"), 4L -> Seq.empty[String])
    val n = 4.0; val avgdl = 9.0 / 4
    def dfOf(t: String) = toks.values.count(_.contains(t)).toDouble
    def micro(f: Double, dl: Double, df: Double): Long = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val part = f * 2.2 / (f + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      math.round(idf * part * 1e6)
    }
    val want = toks.map { case (id, ts) =>
      id -> query.map { t =>
        val f = ts.count(_ == t).toDouble
        if (f == 0) 0L else micro(f, ts.size.toDouble, dfOf(t))
      }.sum
    }
    assert(got === want)
    assert(got(1L) > 0 && got(3L) > got(2L) && got(4L) === 0L)
  }

  test("normalizeText: NFC composition, zero-width and control removal, idempotent") {
    import spark.implicits._
    val rows = Seq(
      "Cafe\u0301 composed",                    // NFD -> NFC
      "a\u200Bb\u200C\u200Dc\uFEFF",         // zero-width out
      "bell\u0007 and\u009F del\u007F",       // control out
      "keep\ttabs\nand\r\nnewlines",         // kept whitespace
      "plain").toDF("t")
    val got = rows.select(TextOps.normalizeText(col("t")).as("n")).as[String].collect()
    assert(got(0) === "Caf\u00e9 composed")
    assert(got(1) === "abc")
    assert(got(2) === "bell and del")
    assert(got(3) === "keep\ttabs\nand\r\nnewlines")
    assert(got(4) === "plain")
    val twice = rows.select(
      TextOps.normalizeText(TextOps.normalizeText(col("t"))).as("n")).as[String].collect()
    assert(twice.toSeq === got.toSeq)
    // the order-of-operations case: a zero-width char BETWEEN base and
    // combining mark blocks NFC; strip-first still composes in one pass
    val tricky = Seq("e\u200C\u0301").toDF("t")
      .select(TextOps.normalizeText(col("t")).as("n")).as[String].head()
    assert(tricky === "\u00e9")
  }

  test("capPerKey: null keys form a group and are capped, not dropped") {
    import spark.implicits._
    val rows = (0L until 30L).map(i => (i, if (i < 20) None else Some(i % 2)))
    val df = rows.toDF("id", "domain")
    val capped = PipelineOps.capPerKey(df, "domain", "id", 4)
    val nullKept = capped.filter(col("domain").isNull).count()
    assert(nullKept === 4L, s"null-key group must cap at k, got $nullKept")
    assert(capped.filter(col("domain").isNotNull).count() === 8L) // 2 keys x 5 rows, capped at 4
  }

  test("capPerKey equals the windowed reference on random keyed data (3 seeds)") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 200L).map(i => (i, rnd.nextInt(8).toLong))
      val df = rows.toDF("id", "key")
      val cap = 1 + rnd.nextInt(6)
      val got = PipelineOps.capPerKey(df, "key", "id", cap, seed = s"s$seed")
        .select("id").as[Long].collect().toSet
      val coin = md5(concat_ws("|", lit(s"s$seed"), col("id").cast("string")))
      val want = df.withColumn("__c", coin)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("key")).orderBy(col("__c"), col("id"))))
        .filter(col("rn") <= cap).select("id").as[Long].collect().toSet
      assert(got === want, s"seed $seed cap $cap")
    }
  }

  test("capPerKey: reserved-column guard and k=1") {
    import spark.implicits._
    val bad = Seq((1L, 2L, "x")).toDF("id", "domain", "__cap_coin")
    val e = intercept[IllegalArgumentException] {
      PipelineOps.capPerKey(bad, "domain", "id", 3)
    }
    assert(e.getMessage.contains("__cap_coin"))
    val one = PipelineOps.capPerKey(
      (0L until 20L).map(i => (i, i % 3)).toDF("id", "domain"), "domain", "id", 1)
    assert(one.count() === 3)
  }
}
