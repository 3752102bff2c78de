package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text analysis for large-scale training-data pipelines: tokenization,
 * quality scoring, language-ID heuristic, document fingerprinting. All pure
 * `functions._` compositions (whole-stage codegen; no UDFs), so they run at
 * scan speed and push no state to the driver.
 */
object TextOps {

  /** Zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) — invisible, token-splitting
    * hazards; single-sourced into the q80 oracle. */
  val ZeroWidthPattern = "[\\u200B\\u200C\\u200D\\uFEFF]"

  /** C0 controls except \t\n\r, plus DEL and C1 — the mojibake/control
    * residue web text carries; RE2-portable byte-range classes. */
  val ControlPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"

  /** Web-text normalization (the C4/CCNet-style cleanup pass): zero-width
    * and control-character removal (tab/newline/CR kept) FIRST, then
    * Unicode NFC (codegen `NfcNormalize`, DuckDB `nfc_normalize` is the
    * exact oracle). Strip-before-compose is load-bearing for idempotence:
    * a zero-width char BETWEEN a base and its combining mark (e+ZWNJ+acute)
    * blocks composition, so stripping after NFC would emit a non-NFC
    * string that a second pass would change. Pure codegen chain — narrow,
    * no shuffle, idempotent (spec-asserted including that interleaving). */
  def normalizeText(text: Column): Column =
    graft.functions.NfcNormalize.nfc_normalize(
      regexp_replace(regexp_replace(text, ZeroWidthPattern, ""),
        ControlPattern, ""))

  /** Whitespace tokenization (empty-string-safe). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-piece regex splits on case/digit boundaries.
    * (Java-regex-only: the lookarounds don't exist in RE2, so this variant has
    * no DuckDB oracle — [[bpeTokenCount]] is the portable one.) */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^\\p{L}\\p{N}]+|(?<=[a-z])(?=[A-Z])|(?<=\\p{L})(?=\\p{N})"),
      t => length(t) > 0))

  /** GPT-2-shaped pretokenizer match count (contraction suffixes | letter
    * runs | single digits | punctuation runs) — the standard pre-BPE token
    * budget estimate. The pattern is deliberately RE2-compatible (no
    * lookaround) AND avoids `\s`, whose class differs between engines
    * (Java includes vertical tab \x0B, RE2 does not) — the whitespace set
    * is spelled out so DuckDB runs the IDENTICAL regex as the oracle. */
  val BpePattern: String = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\f\\r]+"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / length(text))

  val StopwordsEn = Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "he",
    "was", "for", "on", "are", "as", "with", "his", "they", "at", "be")
  val StopwordsDe = Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "sich",
    "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine", "als", "auch")
  val StopwordsFr = Seq("le", "la", "et", "les", "des", "en", "un", "du", "une", "que",
    "est", "pour", "qui", "dans", "a", "par", "plus", "pas", "au", "sur")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no",
    "haber", "por", "con", "su", "para", "como", "estar", "tener", "le", "lo")

  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isin(stopwords.map(lit): _*)))

  def stopwordRatio(text: Column, stopwords: Seq[String] = StopwordsEn): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(stopwordHits(text, stopwords).cast("double") / tokenCount(text))

  /** CJK codepoint ratio (zh/ja detection signal). */
  def cjkRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^\\x{4E00}-\\x{9FFF}]", "")).cast("double") / length(text))

  /**
   * n-gram/stopword language-ID heuristic: score each language by stopword
   * hit rate; CJK ratio short-circuits to zh. Deterministic tie-break by
   * fixed language order.
   */
  def langId(text: Column): Column = {
    val scores = Seq(
      "en" -> stopwordHits(text, StopwordsEn),
      "de" -> stopwordHits(text, StopwordsDe),
      "fr" -> stopwordHits(text, StopwordsFr),
      "es" -> stopwordHits(text, StopwordsEs))
    pickLang(scores, cjkRatio(text))
  }

  /** Argmax-by-score with the fixed-order tie-break; the when-fold copies
    * `acc` twice per level, so CALLERS MUST PASS CHEAP COLUMNS (attributes
    * or literals) — [[langIdReport]] is the staged form for frame pipelines. */
  private def pickLang(scores: Seq[(String, Column)], cjk: Column): Column = {
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (lang, score)) =>
        when(score > acc.getField("score"), struct(score.as("score"), lit(lang).as("lang")))
          .otherwise(acc)
    }
    when(cjk > 0.25, lit("zh"))
      .when(best.getField("score") === 0, lit("unknown"))
      .otherwise(best.getField("lang"))
  }

  /** Stopword hits over a PRE-STAGED token-array attribute. */
  def stopwordHitsFromTokens(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))

  /**
   * Frame-level language-ID that stages the tokenization ONCE and each
   * per-language score as a REAL attribute (the piiReport discipline),
   * then appends `lang`. The column-API [[langId]] re-tokenizes per
   * language and its argmax fold duplicates each branch subtree 2x per
   * level — higher-order functions are exempt from codegen subexpression
   * elimination, so every copy RUNS (measured 1.7 s -> 0.7 s warm on the
   * q32 bench). Value-identical to [[langId]]; spec-asserted.
   */
  def langIdReport(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val clash = df.columns.filter(c => c.startsWith("__li_") || c == "lang")
    require(clash.isEmpty,
      s"langIdReport: input has reserved column(s) ${clash.mkString(", ")}")
    val langs = Seq("en" -> StopwordsEn, "de" -> StopwordsDe,
      "fr" -> StopwordsFr, "es" -> StopwordsEs)
    val toksed = df.select(df.columns.map(col) :+
      tokens(lower(col(textCol))).as("__li_toks"): _*)
    val scored = toksed.select(toksed.columns.map(col) ++
      langs.map { case (l, words) =>
        stopwordHitsFromTokens(col("__li_toks"), words).as(s"__li_$l") } :+
      cjkRatio(col(textCol)).as("__li_cjk"): _*)
    scored
      .withColumn("lang",
        pickLang(langs.map { case (l, _) => l -> col(s"__li_$l") }, col("__li_cjk")))
      .drop("__li_toks" +: "__li_cjk" +: langs.map(l => s"__li_${l._1}"): _*)
  }

  // ---- Gopher/C4-style repetition + shape signals (Rae et al. 2021 §A1.1,
  // Raffel et al. 2020 §2.2) — each takes PRE-STAGED line/token attributes
  // (the Catalyst HOF rule: stage intermediates once, never inline an
  // expensive parent expression into several consumers) ----

  /** Non-blank lines of a document. Splits on `\r?\n` — crawled text is
    * routinely CRLF, and a trailing `\r` left on each line would defeat
    * suffix checks like the ellipsis rule (trim strips spaces only). */
  def docLines(text: Column): Column =
    filter(split(text, "\r?\n"), l => length(trim(l)) > 0)

  /** Fraction of elements of a STAGED array that repeat an earlier element.
    * The argument must be an attribute: an inline array expression here
    * would re-evaluate three times (size twice + distinct). */
  def dupFraction(arr: Column): Column =
    when(size(arr) === 0, lit(0.0)).otherwise(
      (size(arr) - size(array_distinct(arr))).cast("double") / size(arr))

  /** Fraction of lines that repeat an earlier line (duplicate-line rate). */
  def dupLineFraction(lines: Column): Column = dupFraction(lines)

  /** Fraction of word n-grams that are repeats WITHIN the document.
    * Convenience over a toks attribute; pipelines computing several signals
    * should stage `wordNgramHashesFromTokens(toks, n)` once and call
    * [[dupFraction]] on the attribute instead (this form expands the gram
    * array three times). */
  def dupNgramFraction(toks: Column, n: Int): Column =
    dupFraction(wordNgramHashesFromTokens(toks, n))

  /** Fraction of a STAGED array's elements satisfying `pred` (0 if empty). */
  def matchFraction(arr: Column, pred: Column => Column): Column =
    when(size(arr) === 0, lit(0.0)).otherwise(
      size(filter(arr, pred)).cast("double") / size(arr))

  /** Fraction of lines ending in an ellipsis (Gopher's "..." rule). */
  def ellipsisLineFraction(lines: Column): Column =
    matchFraction(lines, l => trim(l).endsWith("..."))

  /** Fraction of words containing at least one alphabetic character. */
  def alphaWordFraction(toks: Column): Column =
    matchFraction(toks, t => t.rlike("[A-Za-z]"))

  /** Mean word length (0 for empty docs). */
  def meanWordLength(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** Word n-grams as STRINGS from an already-staged token attribute
    * (mirrors [[wordNgramHashesFromTokens]]; string identity is needed when
    * gram LENGTH matters, as in [[topNgramCharFraction]]). */
  def wordNgramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /**
   * Gopher's ACTUAL top-n-gram metric (Rae et al. 2021 Table A1, threshold
   * 0.20 for n=2): the fraction of the document's characters covered by
   * occurrences of its MOST FREQUENT word n-gram —
   * max over distinct grams of count(g) * len(g), over the text length.
   * `grams` must be a staged STRING-gram attribute ([[wordNgramsFromTokens]]);
   * the count runs as a nested HOF (O(distinct * total) per document — fine
   * for web-document gram counts; for pathological million-gram documents
   * use an explode + groupBy(doc, gram) + max aggregation instead).
   */
  def topNgramCharFraction(grams: Column, textLen: Column): Column = {
    val best = array_max(transform(array_distinct(grams),
      g => size(filter(grams, x => x === g)).cast("long") * length(g)))
    when(size(grams) === 0 || textLen === 0, lit(0.0))
      .otherwise(coalesce(best.cast("double") / textLen, lit(0.0)))
  }

  /** [[topNgramCharFraction]] as a DataFrame aggregation — the form that
    * scales AND runs faster even at bench scale (measured ~3 s cheaper than
    * the nested-HOF expression over sf0.1): explode grams, map-side-combined
    * per-(doc, gram) counts, max(count * len) per doc. Input must carry a
    * staged string-gram array; output = (idCol, top_ngram_char_frac), one
    * row per input row (empty-gram docs still yield the [""] gram). */
  def topNgramCharFractionAgg(df: org.apache.spark.sql.DataFrame, idCol: String,
                              gramsCol: String, textLenCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), col(textLenCol).as("__tl"), explode(col(gramsCol)).as("__g"))
      .groupBy(col(idCol), col("__tl"), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol), col("__tl"))
      .agg(max(col("__c") * length(col("__g"))).as("__best"))
      .select(col(idCol),
        when(col("__tl") === 0, lit(0.0))
          .otherwise(col("__best").cast("double") / col("__tl"))
          .as("top_ngram_char_frac"))

  /** The Gopher-STYLE gate from ALREADY-COMPUTED signal columns — the form a
    * signals pipeline composes so each signal evaluates once. Threshold
    * provenance: word count 50-100k, mean word length 3-10, alpha-word
    * fraction >= 0.8 (keep AT the boundary — Gopher removes docs BELOW 80%),
    * and ellipsis-line < 0.3 follow Rae et al. 2021 Table A1; the
    * duplicate-line < 0.3 and duplicate-n-gram < 0.4 defaults are OURS —
    * count-based analogs of Gopher's duplicate-line/top-n-gram CHARACTER
    * fractions (a different metric), so tune them to your corpus rather than
    * citing them as published numbers. */
  def gopherPassFromSignals(nWords: Column, meanLen: Column, alphaFrac: Column,
                            ellipsisFrac: Column, dupLineFrac: Column,
                            dupNgramFrac: Column,
                            minWords: Int = 50, maxWords: Int = 100000,
                            minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                            minAlphaFrac: Double = 0.8, maxEllipsisFrac: Double = 0.3,
                            maxDupLineFrac: Double = 0.3, maxDupNgramFrac: Double = 0.4): Column =
    nWords.between(minWords, maxWords) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      alphaFrac >= minAlphaFrac &&
      ellipsisFrac < maxEllipsisFrac &&
      dupLineFrac < maxDupLineFrac &&
      dupNgramFrac < maxDupNgramFrac

  /** Convenience gate over staged toks/lines attributes (same thresholds and
    * provenance as [[gopherPassFromSignals]]). Each signal expression
    * inlines here, so prefer computing the signals as columns and calling
    * [[gopherPassFromSignals]] when you also OUTPUT the signals. */
  def gopherPass(toks: Column, lines: Column,
                 minWords: Int = 50, maxWords: Int = 100000,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 minAlphaFrac: Double = 0.8, maxEllipsisFrac: Double = 0.3,
                 maxDupLineFrac: Double = 0.3, maxDupNgramFrac: Double = 0.4,
                 dupNgramN: Int = 2): Column =
    size(toks).between(minWords, maxWords) &&
      meanWordLength(toks).between(minMeanLen, maxMeanLen) &&
      alphaWordFraction(toks) >= minAlphaFrac &&
      ellipsisLineFraction(lines) < maxEllipsisFrac &&
      dupLineFraction(lines) < maxDupLineFrac &&
      dupNgramFraction(toks, dupNgramN) < maxDupNgramFrac

  /**
   * Quality score in [0,1]: length band + punctuation sanity + stopword
   * presence + mean token length band — the standard cheap pre-filter
   * features (C4/Gopher-style rules) as one codegen'd expression.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val meanTokLen = when(nTok === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / nTok)
    val lengthOk = when(nTok.between(8, 100000), lit(0.25)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(0.25)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text) > 0.05, lit(0.25)).otherwise(lit(0.0))
    val tokLenOk = when(meanTokLen.between(2.0, 12.0), lit(0.25)).otherwise(lit(0.0))
    round(lengthOk + punctOk + stopOk + tokLenOk, 2)
  }

  /**
   * Document fingerprint: xxhash64 over the whitespace-normalized,
   * lowercased text — the content-defined identity used for exact dedup
   * (rolling-hash analog; shingle fingerprints live in DedupOps).
   */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Character k-shingles of the normalized text. */
  def charShingles(text: Column, k: Int): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    when(length(norm) < k, array(norm)).otherwise(
      transform(sequence(lit(0), length(norm) - k), i => norm.substr(i + 1, lit(k))))
  }

  /** Cross-document n-gram duplication report — the corpus-level health
    * metric next to the per-document Gopher signals: for each doc, how many
    * of its DISTINCT word n-grams occur in at least one OTHER document
    * (`n_shared` / `shared_frac`). High fractions flag boilerplate floods
    * and template farms before they reach training. Docs with fewer than n
    * tokens contribute their whole token sequence as one gram (the
    * contaminationFlags convention — a verbatim short doc still matches).
    *
    * Scale shape: tokens staged as an attribute (the wordNgrams trap —
    * inline they'd re-split O(grams) times), per-doc distinct grams explode
    * once; gram document-frequency is ONE map-side-combinable count; join
    * back + per-doc aggregate. No windows, no driver state — a boilerplate
    * gram shared by 10⁸ docs is one dfreq row, not a window partition. */
  def crossDocNgramReport(df: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // Round 7 (guide §2.3): grams travel as 64-bit hashes — the counts are
    // hash-independent output (the q52 argument: a collision could only
    // merge two grams' identities at ~1e-19 per pair), so no gram string is
    // built or shuffled. The explicit repartition on the gram hash is the
    // ngramJaccardPairs pattern: the doc-frequency aggregate and the
    // join-back consume hashpartitioning(g) from ONE exchange
    // (ReuseExchange) instead of exploding the corpus twice. Only the
    // df >= 2 SET joins back (a shared-or-not flag), not every gram's count.
    val grams = df.select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .select(col("id"),
        explode(array_distinct(wordNgramHashesFromTokens(col("__toks"), n))).as("g"))
      .repartition(col("g"))
    val hot = grams.groupBy("g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2).select(col("g"), lit(1L).as("__shared"))
    grams.join(hot, Seq("g"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__shared"), lit(0L))).as("n_shared"))
      .withColumn("shared_frac",
        round(col("n_shared").cast("double") / col("n_grams"), 6))
  }

  /**
   * BM25 corpus search (Robertson/Lucene smooth-idf variant): per-doc score
   * against a fixed term query —
   *
   *   score(D,Q) = Σ_{t∈Q} ln((N − df + ½)/(df + ½) + 1) ·
   *                f·(k1+1) / (f + k1·(1 − b + b·|D|/avgdl))
   *
   * the retrieval tool a training-data team points at a 100 TB corpus
   * ("find everything about X before the next selection round"). Scores are
   * returned in integer MICROS (`score_micro`) — each (doc, term)
   * contribution quantizes before the per-doc sum (the q65/q78 discipline),
   * so the whole computation replays exactly in SQL (q82): the only
   * cross-row aggregates are integer counts and the final integer sum.
   *
   * Scale shape: tokens explode once, filtered to the query's terms BEFORE
   * any shuffle (the explode output is |Q|-bounded per doc); term document
   * frequencies are one tiny aggregate broadcast back; docs without any
   * query term ride the left join at 0. Driver holds only the two corpus
   * scalars (N, total token count).
   */
  def bm25ScoreMicro(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, queryTerms: Seq[String],
                     k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "query must have at least one term")
    val toksed = df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    // the corpus scalars ride a broadcast ONE-ROW frame instead of a driver
    // action: the whole plan stays lazy (no side caches to mis-time, no NPE
    // on an empty corpus — zero input rows flow through to an empty output)
    val stats = broadcast(toksed
      .agg(count(lit(1)).cast("double").as("__n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("__avgdl"))
      .withColumn("__one", lit(1)))
    val tf = toksed
      .select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms.map(lit): _*))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("f"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("__df"))
    val idf = log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0)
    val part = col("f") * (k1 + 1.0) /
      (col("f") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("__avgdl")))
    val perTerm = tf.withColumn("__one", lit(1))
      .join(stats, Seq("__one")).join(broadcast(dfreq), Seq("term"))
      .select(col("id"), round(idf * part * 1e6, 0).cast("long").as("__m"))
    // the id spine prunes to the bare id column (tokenization is elided by
    // column pruning), so docs without query terms cost a scan, not a parse
    toksed.select("id")
      .join(perTerm.groupBy("id").agg(sum(col("__m")).as("score_micro")), Seq("id"), "left")
      .select(col("id"), coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  /** Word n-grams as strings.
    *
    * PERFORMANCE TRAP: `tokens(text)` appears in the sequence bound AND
    * inside the transform lambda's slice — Catalyst re-evaluates a
    * non-attribute subexpression at every reference, so the regex split can
    * run O(grams) times per document (measured 10 s for a pass that takes
    * ~1 s staged). Callers on a hot path should stage the token array as an
    * attribute and use [[wordNgramHashesFromTokens]]. */
  def wordNgrams(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array(concat_ws(" ", t))).otherwise(
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
  }

  /** 64-bit n-gram hashes from an ALREADY-STAGED token-array attribute:
    * `xxhash64` of each n-token slice — no gram string is ever built, and
    * because `toks` is an attribute the tokenization cost is paid once per
    * row, not once per gram. Gram identity matches the string form
    * (per-element hashing even avoids the "a b"+"c" vs "a"+"b c" join
    * ambiguity of concatenated grams). */
  def wordNgramHashesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(xxhash64(toks))).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => xxhash64(slice(toks, i + 1, lit(n)))))

  // ------------------------------------------------------ HTML text extract

  /** HTML → text as an ORDERED (pattern, replacement) chain, single-sourced
    * so the DuckDB oracle (q70) interpolates the IDENTICAL steps. All
    * patterns are RE2-compatible (inline `(?s)`/`(?i)` flags, lazy
    * quantifiers, `\A`/`\z` anchors — no lookaround). Order is the
    * contract: script/style/comment BLOCKS drop first (their content must
    * never surface as text), block-closing tags become newlines BEFORE the
    * generic tag strip erases them, entities decode AFTER tags are gone
    * (`&amp;` LAST so `&amp;lt;` decodes to the literal `&lt;`, not `<`),
    * then whitespace normalizes. Known regex-extractor limits, documented
    * not hidden: a literal `>` inside an attribute value truncates that
    * tag's strip, and CDATA is not special-cased. */
  val HtmlChain: Seq[(String, String)] = Seq(
    "(?is)<script\\b[^>]*>.*?</script>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    // SOURCE whitespace (incl. raw newlines) is just space in HTML — it
    // normalizes BEFORE block tags mint the semantic newlines
    "[ \\t\\r\\n]+" -> " ",
    "(?i)<(?:br|/p|/div|/li|/tr|/h[1-6]|/title)\\b[^>]*>" -> "\n",
    "<[^>]*>" -> " ",
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&",
    "[ \\t]+" -> " ",
    " ?\\n ?" -> "\n",
    "\\n+" -> "\n",
    "\\A[\\n ]+" -> "",
    "[\\n ]+\\z" -> "")

  /** Extracted text of an HTML document: the [[HtmlChain]] fold — pure
    * codegen `regexp_replace` chain, narrow, no shuffle (each step has ONE
    * consumer, so nesting is recompute-safe). */
  def htmlToText(html: Column): Column =
    HtmlChain.foldLeft(html) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }

  /** `<title>` contents (first match; "" when absent — regexp_extract's
    * no-match convention in BOTH engines). */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?is)<title\\b[^>]*>(.*?)</title>", 1)

  // --------------------------------------------------------- link extraction

  /** href/src attribute values in document order, single-sourced into the
    * q72 oracle. RE2-portable (inline flags, no lookaround). Documented
    * extractor limits, same family as [[HtmlChain]]'s: the value terminates
    * at EITHER quote character (an apostrophe inside a double-quoted URL
    * truncates it — apostrophes are rare-but-legal in URLs), and unquoted
    * attribute values are not extracted. */
  val LinkAttrPattern = "(?i)\\b(?:href|src)\\s*=\\s*[\"']([^\"']*)[\"']"

  /** Non-fetchable link schemes a crawler drops before resolution (the
    * frontier wants network-dereferenceable URIs only). Single-sourced into
    * the q72 oracle's filter. */
  val NonFetchableLinkPattern = "(?i)\\A(?:javascript|mailto|data|tel|about):"

  /** All raw href/src values of an HTML document, in document order
    * (array<string>; empty array when none). Pure codegen
    * `regexp_extract_all`, narrow, no shuffle. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit(LinkAttrPattern), lit(1))

  /** `<loc>` contents of a sitemaps.org XML document (urlset or
    * sitemapindex — both use `<loc>`), in document order. Single-sourced
    * into the q84 oracle. CDATA-wrapped locs are out of scope (documented:
    * rare in practice; plain-text locs are the sitemaps.org examples). */
  val SitemapLocPattern = "(?is)<loc>\\s*(.*?)\\s*</loc>"

  /** ORDERED literal pairs that UNDO the five XML entity escapes —
    * `&amp;` LAST, so a literal `&amp;lt;` decodes to `&lt;`, not `<`
    * (the inverse discipline of [[JsonEscapeChain]]). Single-sourced into
    * the q84 oracle. */
  val XmlUnescapeChain: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&amp;" -> "&")

  /** Sitemap URL extraction (the crawl's seed-discovery producer): `<loc>`
    * values, entity-decoded, as array<string>. Pure codegen regexp +
    * literal-replace chain — narrow, no shuffle. Works on both urlset
    * leaves and sitemapindex documents (use [[isSitemapIndex]] to route
    * index results back into fetching instead of the frontier). */
  def extractSitemapUrls(xml: Column): Column =
    transform(regexp_extract_all(xml, lit(SitemapLocPattern), lit(1)),
      u => XmlUnescapeChain.foldLeft(u) { case (acc, (s, r)) =>
        replace(acc, lit(s), lit(r)) })

  /** True when the document is a sitemap INDEX (its locs are more sitemaps,
    * not page URLs). */
  def isSitemapIndex(xml: Column): Column =
    xml.rlike("(?i)<\\s*sitemapindex[\\s>]")

  /** ORDERED literal (search, replacement) pairs that JSON-escape a string —
    * backslash FIRST (escaping an already-minted escape would corrupt it),
    * then quote, then the C0 whitespace controls. Literal `replace`, not
    * regex: both engines' regexp replacement-string escaping differs, plain
    * replace() doesn't. Other C0 controls are not escaped (documented
    * limit: they don't occur in header-derived fields; the WatSpec
    * parse-back via from_json is the guard). Single-sourced into the q73
    * oracle. */
  val JsonEscapeChain: Seq[(String, String)] = Seq(
    "\\" -> "\\\\",
    "\"" -> "\\\"",
    "\n" -> "\\n",
    "\r" -> "\\r",
    "\t" -> "\\t")

  /** JSON string-escape of a column: the [[JsonEscapeChain]] fold. */
  def jsonEscape(c: Column): Column =
    JsonEscapeChain.foldLeft(c) { case (acc, (s, r)) => replace(acc, lit(s), lit(r)) }

  // ---------------------------------------------------------- PII scrubbing

  /** PII patterns, deliberately RE2-compatible (no lookaround, no
    * backreferences, explicit character classes) so an external engine —
    * the DuckDB oracle (q60), or a downstream Go/Rust scrubber — runs the
    * IDENTICAL pattern with identical matches. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{1,4})?"

  /** National-format phone: `(555) 123-4567` (optional space) or the bare
    * `555-123-4567` dashed triple. The 3-3-4 digit-group shape is required,
    * so an already-scrubbed international's residue (`1-555-0004` is 1-3-4)
    * and ISO dates never match. */
  val NationalPhonePattern =
    "\\([0-9]{3}\\) ?[0-9]{3}-[0-9]{4}|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** IPv6 literal: full form (exactly 8 hex groups) or `::`-compressed
    * (mid-address, or leading-`::` loopback/unspecified forms). Both
    * alternatives are immune to `hh:mm:ss` timestamps — those have neither
    * seven colons nor a `::`. Trailing-`::` forms (`fe80::`) and
    * IPv4-mapped tails are out of scope by contract: the former is rare in
    * prose, the latter's dotted quad is caught by [[Ipv4Pattern]] one step
    * later. No lookaround — RE2-portable like every pattern here. */
  val Ipv6Pattern =
    "\\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\\b" +
      "|\\b(?:[0-9A-Fa-f]{1,4}:){1,6}(?::[0-9A-Fa-f]{1,4}){1,6}\\b" +
      "|::[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,6}\\b"

  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** The scrub chain, single-sourced: (pattern, placeholder) in APPLICATION
    * ORDER — the contract both [[piiScrub]] and any oracle interpolate. */
  val PiiChain: Seq[(String, String)] = Seq(
    EmailPattern -> "[EMAIL]",
    PhonePattern -> "[PHONE]",
    NationalPhonePattern -> "[PHONE]",
    Ipv6Pattern -> "[IPV6]",
    Ipv4Pattern -> "[IP]")

  /**
   * Scrub PII into typed placeholders: emails -> `[EMAIL]`, then
   * international phones -> `[PHONE]`, then national-format phones ->
   * `[PHONE]`, then IPv6 -> `[IPV6]`, then IPv4 -> `[IP]`. Order matters
   * and is part of the contract: emails are replaced first so their digit
   * runs can't be mistaken for phones; internationals before nationals so
   * a `+`-prefixed number is never half-eaten by the national rule; IPv6
   * before IPv4 so a mapped tail's dotted quad is still whole when the
   * IPv4 rule runs; IPv4 last so dotted quads inside an email's domain are
   * already gone. Pure codegen `regexp_replace` chain — narrow, no
   * shuffle, the 100 TB-friendly shape.
   */
  def piiScrub(text: Column): Column =
    PiiChain.foldLeft(text) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }

  /** Per-category PII hit counts (for the scrub report; same patterns, same
    * order-of-application semantics as [[piiScrub]]): each category counts
    * matches in the text AFTER all earlier categories were scrubbed.
    * Returns counts in [[PiiChain]] order: (email, intl phone, national
    * phone, ipv6, ipv4). */
  def piiCounts(text: Column): Seq[Column] = {
    val staged = PiiChain.scanLeft(text) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }
    PiiChain.zip(staged).map { case ((pat, _), before) =>
      regexp_count(before, lit(pat))
    }
  }

  /**
   * Fused scrub-and-count over a whole frame: adds `clean` plus one
   * `n_<category>` column per [[PiiChain]] entry. PREFER THIS over
   * composing [[piiScrub]] + [[piiCounts]] yourself: those build NESTED
   * column expressions, so stage i's replace re-runs inside every later
   * stage's count — O(chain²) regex passes per row (measured 1.9 s vs
   * 1.2 s on the q60 bench). Here the whole chain is ONE codegen'd kernel
   * ([[graft.functions.RegexScrubCount]]): per stage, a single matcher
   * traversal both counts and replaces (5 regex passes per row, not the
   * staged ladder's 10, and one UTF8→String materialization instead of
   * five), staged as one struct attribute through its own projection so
   * the kernel runs exactly once per row. Count semantics are unchanged:
   * each category counts matches in the text AFTER all earlier categories
   * were scrubbed. Narrow, no shuffle, whole-stage codegen —
   * `categories` must match [[PiiChain]] length.
   */
  def piiReport(df: org.apache.spark.sql.DataFrame, textCol: String,
                categories: Seq[String] =
                  Seq("email", "phone", "phone_nat", "ipv6", "ip")): org.apache.spark.sql.DataFrame = {
    require(categories.length == PiiChain.length,
      s"need ${PiiChain.length} category names, got ${categories.length}")
    val reserved = ("clean" +: categories.map(c => s"n_$c")).filter(df.columns.contains)
    require(reserved.isEmpty,
      s"piiReport: input already has reserved column(s) ${reserved.mkString(", ")}")
    require(!df.columns.contains("__pii"), "piiReport: input already has __pii")
    // the select() boundary stages the struct as a real attribute; the
    // kernel is not "cheap" and is referenced 6 times below, so
    // CollapseProject keeps the two projections separate (gated in PlanSpec)
    val staged = df.select(df.columns.map(col) :+
      graft.functions.RegexScrub.regex_scrub_count(col(textCol), PiiChain).as("__pii"): _*)
    staged
      .withColumn("clean", col("__pii").getField("clean"))
      .withColumns(categories.zipWithIndex.map { case (c, i) =>
        s"n_$c" -> col("__pii").getField(s"n$i")
      }.toMap)
      .drop("__pii")
  }

  /**
   * Cross-corpus boilerplate-line removal (the RefinedWeb/CCNet line-dedup
   * TRANSFORM, not just the signal): any line appearing in >= `minDocs`
   * distinct documents — cookie banners, nav bars, license footers — is
   * dropped from EVERY document; surviving lines are reassembled in their
   * original order. Output: (id, clean, n_kept, n_dropped), one row per
   * input row (a doc losing all its lines keeps its row with clean = "").
   * Lines follow [[docLines]] semantics: split on `\r?\n`, whitespace-only
   * lines discarded (reassembly joins with `\n`, normalizing CRLF away).
   *
   * Scale shape — the skew hazard here is the operator's own target (one
   * banner line in 10^9 docs), handled the chunkDedup way:
   *  - distinct-doc counting is TWO explicit aggregations: (line, id)
   *    distinct first (exchange keyed on BOTH columns — uniform even for a
   *    hot line), then a map-side-combinable count per line. A direct
   *    `countDistinct(id)` would funnel every (line,id) pair of a hot line
   *    through one reducer.
   *  - the boilerplate set is tiny (lines crossing the threshold), so the
   *    drop is a broadcast anti-join; the rebuild groups by doc id
   *    (bounded groups) and the final row-preserving join reuses the
   *    rebuild's partitioning. No windows, no driver funnels.
   */
  def dropBoilerplateLines(df: org.apache.spark.sql.DataFrame, idCol: String,
                           textCol: String, minDocs: Int)
      : org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2 (1 would drop every line)")
    val clash = df.columns.filter(_.startsWith("__bl_"))
    require(clash.isEmpty,
      s"dropBoilerplateLines: input has reserved __bl_* column(s) ${clash.mkString(", ")}")
    val staged = df.select(col(idCol).as("__bl_id"),
      docLines(col(textCol)).as("__bl_ls"))
    val lines = staged.select(col("__bl_id"),
      posexplode(col("__bl_ls")).as(Seq("__bl_pos", "__bl_line")))
    val hot = lines.select("__bl_line", "__bl_id").distinct()
      .groupBy("__bl_line").agg(count(lit(1)).as("__bl_docs"))
      .filter(col("__bl_docs") >= minDocs).select("__bl_line")
    val rebuilt = lines.join(broadcast(hot), Seq("__bl_line"), "left_anti")
      .groupBy("__bl_id").agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("__bl_pos"), col("__bl_line")))),
          x => x("__bl_line"))).as("clean"))
    staged.select(col("__bl_id"), size(col("__bl_ls")).cast("long").as("__bl_n"))
      .join(rebuilt, Seq("__bl_id"), "left")
      .select(col("__bl_id").as(idCol),
        coalesce(col("clean"), lit("")).as("clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__bl_n") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /**
   * CCNet-style n-gram language-model quality scoring (Wenzek et al. 2020
   * semantics, re-expressed relationally): train an add-one-smoothed bigram
   * LM on a corpus, score every document by mean log-probability and
   * perplexity. Low perplexity = fluent text; the standard LM filter a
   * 100 TB pipeline runs after dedup (CCNet buckets by perplexity terciles —
   * apply [[graft.ops.PipelineOps.assignSplits]]-style thresholds on `ppl`).
   *
   * Model (all counts over whitespace tokens of `lower(text)`):
   *  - vocab  = words with corpus count >= `minCount`; everything else maps
   *    to `<unk>`. V = |vocab| + 1.
   *  - p(u2|u1) = (c(u1,u2) + 1) / (c(u1) + V)   (add-one smoothing; c(u1)
   *    is u1's total occurrence count).
   *  - per doc: n_bigrams, avg_logp = mean ln p over its adjacent pairs
   *    (rounded to 3), ppl = exp(-avg) (rounded to 2). Docs with < 2 tokens
   *    have no bigrams and are absent from the output.
   *
   * Cross-engine exactness: each pair's ln p is quantized to a LONG of
   * micro-nats (round(x*1e6)) before the per-doc sum — integer sums are
   * partial-aggregable AND independent of row order/partitioning, so Spark
   * and the DuckDB oracle agree bit-for-bit (double sums would not: shuffle
   * order changes the fp rounding path).
   *
   * Scale shape: two corpus-wide aggregations (unigram counts, bigram
   * counts), both map-side combinable; the unigram table is VOCAB-bounded
   * (not corpus-bounded), so its eager localCheckpoint pins only O(V) rows;
   * the score join shuffles the pair stream once on (u1,u2) — hot pairs
   * ("the the") are JOIN keys, which AQE skew-splits, never window
   * partitions. V rides as a literal (one 1-row driver scalar, like the
   * prefix-sum totals in PipelineOps). No windows, no driver funnels.
   *
   * `train`: optional separate training corpus (same `idCol`/`textCol`
   * schema); defaults to scoring the training corpus itself. When scoring a
   * foreign corpus, unseen words map to `<unk>` and pairs absent from the
   * model back off to c2=0 (and c1=0 if the context never occurred) —
   * p = 1/(c1+V), the natural add-one extension.
   */
  def ngramLmPerplexity(df: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, minCount: Int = 5,
                        train: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame =
    lmLogProbQ(df, idCol, textCol, minCount, train)
      .select(col(idCol), col("n_bigrams"),
        round(col("__lm_sum") / 1e6 / col("n_bigrams"), 3).as("avg_logp"),
        round(exp(-(col("__lm_sum") / 1e6) / col("n_bigrams")), 2).as("ppl"))

  /**
   * A TRAINED add-one-smoothed bigram LM as vocab-bounded relational state:
   * `umap` (word → vocab-or-`<unk>`; ≤ vocab rows, broadcastable), `ctx`
   * (context unigram counts; ≤ vocab rows, broadcastable), `model` (bigram
   * counts; observed-bigram-bounded — potentially large, joins as a
   * shuffle), and `V = |vocab| + 1`. Train once with [[trainBigramLm]],
   * score any number of corpora/batches with [[lmLogProbQMulti]] — the
   * stream-static deployment shape (StreamingSpec holds one static model
   * across micro-batches) and the multi-model shape ([[dsirSelect]] scores
   * one pair stream under two models in a single pass).
   */
  case class BigramLm(umap: org.apache.spark.sql.DataFrame,
                      ctx: org.apache.spark.sql.DataFrame,
                      model: org.apache.spark.sql.DataFrame,
                      // V = |vocab| + 1 as a ONE-ROW frame (`__lm_v` BIGINT):
                      // riding as a broadcast join instead of a collected
                      // literal keeps training fully lazy (round 7 — the
                      // count() action was one driver round-trip per model)
                      vDf: org.apache.spark.sql.DataFrame)

  private def lmToks(d: org.apache.spark.sql.DataFrame, idCol: String, textCol: String) =
    d.select(col(idCol).as("__lm_id"), tokens(lower(col(textCol))).as("__lm_toks"))

  // adjacent-pair stream straight off the token ARRAY — one generator, no
  // per-doc window, no positional self-join
  private def lmPairs(t: org.apache.spark.sql.DataFrame) = t.select(col("__lm_id"),
      explode(arrays_zip(
        slice(col("__lm_toks"), lit(1), greatest(size(col("__lm_toks")) - 1, lit(0))).as("w1"),
        slice(col("__lm_toks"), lit(2), greatest(size(col("__lm_toks")) - 1, lit(0))).as("w2"))).as("__lm_p"))
    .select(col("__lm_id"), col("__lm_p.w1").as("__lm_w1"), col("__lm_p.w2").as("__lm_w2"))

  /** Train the bigram LM: two map-side-combinable aggregations (unigrams,
    * bigrams). The unigram table is vocab-bounded, so its eager
    * localCheckpoint pins only O(V) rows and feeds V + umap + ctx from one
    * compute; V rides as a driver scalar. */
  def trainBigramLm(train: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, minCount: Int = 5): BigramLm = {
    // one tokenize for BOTH the unigram and the bigram aggregation: the
    // (id, toks) frame stages behind a lazy localCheckpoint (round 7 —
    // the two counting passes each re-ran the tokenizer before); guarded
    // for streaming inputs, where checkpointing is illegal
    val toks = lmToks(train, idCol, textCol)
    trainBigramLmFromToks(
      if (train.isStreaming) toks else toks.localCheckpoint(false), minCount)
  }

  /** [[trainBigramLm]] over a PRE-TOKENIZED `(__lm_id, __lm_toks)` frame —
    * the reuse path when the same tokenization also feeds scoring
    * ([[dsirSelect]], [[lmLogProbQ]]): tokenize once, consume many times. */
  private[graft] def trainBigramLmFromToks(trainToks: org.apache.spark.sql.DataFrame,
                                           minCount: Int): BigramLm = {
    require(minCount >= 1, "minCount must be >= 1")
    val unk = lit("<unk>")
    val uni = trainToks.select(explode(col("__lm_toks")).as("__lm_w"))
      .groupBy("__lm_w").agg(count(lit(1)).as("__lm_cnt"))
      .localCheckpoint(false) // lazy: whichever consumer (V aggregate,
    // umap broadcast, ctx) runs first materializes the vocab table once
    // V as a lazy one-row aggregate (empty corpus: coalesce keeps V = 1,
    // matching the old `count() + 1`)
    val vDf = uni.agg((coalesce(sum(when(col("__lm_cnt") >= minCount, 1L)
      .otherwise(0L)), lit(0L)) + 1L).as("__lm_v"))
    val umap = uni.select(col("__lm_w"),
      when(col("__lm_cnt") >= minCount, col("__lm_w")).otherwise(unk).as("__lm_u"),
      col("__lm_cnt"))
    val ctx = umap.groupBy(col("__lm_u").as("u1")).agg(sum("__lm_cnt").as("c1"))
    val mapped = lmPairs(trainToks)
      .join(broadcast(umap.select(col("__lm_w").as("__lm_w1"), col("__lm_u").as("u1"))),
        Seq("__lm_w1"), "left")
      .join(broadcast(umap.select(col("__lm_w").as("__lm_w2"), col("__lm_u").as("u2"))),
        Seq("__lm_w2"), "left")
      .select(coalesce(col("u1"), unk).as("u1"), coalesce(col("u2"), unk).as("u2"))
    val model = mapped.groupBy("u1", "u2").agg(count(lit(1)).as("c2"))
    BigramLm(umap, ctx, model, vDf)
  }

  /**
   * Score one corpus under SEVERAL trained models in a single pass: the
   * corpus is tokenized and pair-exploded ONCE, each pair is vocab-mapped
   * through every model's broadcast umap, and per-model micro-nat LONG
   * sums come out of one per-doc aggregation — n models cost one corpus
   * scan + n model-join shuffles, not n full passes. Output:
   * `(idCol, n_bigrams, __lm_sum_<name> ...)`.
   *
   * Backoff contract per model: unseen word → `<unk>`; `ctx` joins
   * SEPARATELY from the pair model (both vocab-bounded broadcast sides —
   * hinted, not hoped for): a foreign pair absent from the model must
   * still see its context count — c1 routed through the model join would
   * null out on every unseen pair, silently flattening the documented
   * p = 1/(c1+V) backoff to 1/V.
   */
  def lmLogProbQMulti(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, lms: Seq[(String, BigramLm)])
      : org.apache.spark.sql.DataFrame = {
    require(lms.nonEmpty && lms.map(_._1).distinct.length == lms.length,
      "lms must be non-empty with distinct names")
    val clash = df.columns.filter(_.startsWith("__lm_"))
    require(clash.isEmpty,
      s"lmLogProbQMulti: input has reserved __lm_* column(s) ${clash.mkString(", ")}")
    lmLogProbQMultiFromToks(lmToks(df, idCol, textCol), idCol, lms)
  }

  /** [[lmLogProbQMulti]] over a PRE-TOKENIZED `(__lm_id, __lm_toks)` frame
    * (the tokenize-once reuse path; see [[trainBigramLmFromToks]]). */
  private[graft] def lmLogProbQMultiFromToks(toks: org.apache.spark.sql.DataFrame,
                                             idCol: String, lms: Seq[(String, BigramLm)])
      : org.apache.spark.sql.DataFrame = {
    require(lms.nonEmpty && lms.map(_._1).distinct.length == lms.length,
      "lms must be non-empty with distinct names")
    val unk = lit("<unk>")
    val pairs = lmPairs(toks)
    val mapped = lms.foldLeft(pairs) { case (acc, (nm, lm)) =>
      acc.join(broadcast(lm.umap.select(col("__lm_w").as("__lm_w1"),
          col("__lm_u").as(s"__lm_${nm}_u1raw"))), Seq("__lm_w1"), "left")
        .join(broadcast(lm.umap.select(col("__lm_w").as("__lm_w2"),
          col("__lm_u").as(s"__lm_${nm}_u2raw"))), Seq("__lm_w2"), "left")
    }.select(col("__lm_id") +: lms.flatMap { case (nm, _) => Seq(
      coalesce(col(s"__lm_${nm}_u1raw"), unk).as(s"__lm_${nm}_u1"),
      coalesce(col(s"__lm_${nm}_u2raw"), unk).as(s"__lm_${nm}_u2")) }: _*)
    val scored = lms.foldLeft(mapped.withColumn("__lm_one", lit(1))) {
      case (acc, (nm, lm)) =>
        acc.join(lm.model.select(col("u1").as(s"__lm_${nm}_u1"),
            col("u2").as(s"__lm_${nm}_u2"), col("c2").as(s"__lm_${nm}_c2")),
            Seq(s"__lm_${nm}_u1", s"__lm_${nm}_u2"), "left")
          .join(broadcast(lm.ctx.select(col("u1").as(s"__lm_${nm}_u1"),
            col("c1").as(s"__lm_${nm}_c1"))), Seq(s"__lm_${nm}_u1"), "left")
          // V rides a broadcast one-row join (bm25's stats pattern): same
          // long addition as the old collected literal, no driver action
          .join(broadcast(lm.vDf.select(col("__lm_v").as(s"__lm_${nm}_v"))
            .withColumn("__lm_one", lit(1))), Seq("__lm_one"))
    }
    val sums = lms.map { case (nm, _) =>
      val lnp = log(coalesce(col(s"__lm_${nm}_c2"), lit(0L)) + 1) -
        log(coalesce(col(s"__lm_${nm}_c1"), lit(0L)) + col(s"__lm_${nm}_v"))
      sum(round(lnp * 1e6, 0).cast("long")).as(s"__lm_sum_$nm")
    }
    scored.groupBy("__lm_id")
      .agg(count(lit(1)).as("n_bigrams"), sums: _*)
      .withColumnRenamed("__lm_id", idCol)
  }

  /** [[ngramLmPerplexity]]'s core, exposed for ops that COMBINE log-probs
    * across models (e.g. [[dsirSelect]]'s importance ratio): per doc,
    * `n_bigrams` and the EXACT micro-nat LONG sum `__lm_sum` of per-pair
    * ln p — integer sums subtract exactly, so a log-RATIO of two models is
    * itself order-free and cross-engine-exact, which a pre-rounded avg
    * would not be. */
  def lmLogProbQ(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, minCount: Int = 5,
                 train: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val clash = df.columns.filter(_.startsWith("__lm_"))
    require(clash.isEmpty,
      s"lmLogProbQ: input has reserved __lm_* column(s) ${clash.mkString(", ")}")
    // self-trained batch path tokenizes the corpus ONCE for training (both
    // counting passes) AND scoring — round 7; it tokenized three times
    // before. Streaming score frames keep the checkpoint-free path.
    val toks = lmToks(df, idCol, textCol)
    val staged = if (df.isStreaming) toks else toks.localCheckpoint(false)
    val lm = train.map(t => trainBigramLm(t, idCol, textCol, minCount))
      .getOrElse(trainBigramLmFromToks(staged, minCount))
    lmLogProbQMultiFromToks(staged, idCol, Seq("m" -> lm))
      .select(col(idCol), col("n_bigrams"), col("__lm_sum_m").as("__lm_sum"))
  }

  /**
   * DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling" — semantics source; the
   * relational formulation here is original): select the `k` corpus docs
   * whose token distribution looks most like a TARGET domain, by the
   * log-importance ratio of two bigram LMs,
   *
   *   log w(doc) = log p_target(doc) - log p_source(doc)
   *
   * with p_target trained on `target`, p_source on the corpus itself (both
   * via [[lmLogProbQ]] — the two micro-nat LONG sums subtract EXACTLY, so
   * the ratio is order-free and cross-engine-reproducible). Sampling is
   * Gumbel-top-k without replacement: rank by `log w + G_i` where
   * `G_i = -ln(-ln(u_i))` and `u_i` is the md5-uniform coin of (seed, id) —
   * deterministic, replayable, and portable to the DuckDB oracle (q69).
   * The Gumbel key is micro-quantized to a LONG like every other
   * cross-engine float in this family; ties break on id.
   *
   * Output: (idCol, log_w, rank) for the k selected docs, rank 1..k by
   * descending key. Docs with < 2 tokens have no bigrams, hence no weight,
   * and are never selected — the [[lmLogProbQ]] contract.
   *
   * Scale shape: two LM trainings (each two map-side-combinable aggs over
   * its own corpus), then ONE scoring pass — [[lmLogProbQMulti]] tokenizes
   * and pair-explodes the corpus once and maps it through both models'
   * broadcast vocabularies (both micro-nat sums come out of the same
   * per-doc aggregation, so no id join either) — and a global top-k:
   * `orderBy.limit(k)` is a TakeOrderedAndProject (per-partition heaps +
   * driver merge of k·P rows), never a full sort, and k is the only
   * driver-sized quantity. No windows below the k-limit, no all-pairs work.
   */
  def dsirSelect(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, target: org.apache.spark.sql.DataFrame,
                 k: Int, minCount: Int = 5, seed: String = "dsir")
      : org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k must be >= 1")
    // the corpus tokenizes ONCE (lazy checkpoint) for source-LM training
    // AND scoring; the target once for its training (round 7 — previously
    // 3 corpus + 2 target tokenize passes)
    val sToks = lmToks(corpus, idCol, textCol).localCheckpoint(false)
    val tLm = trainBigramLm(target, idCol, textCol, minCount)
    val sLm = trainBigramLmFromToks(sToks, minCount)
    val sums = lmLogProbQMultiFromToks(sToks, idCol, Seq("t" -> tLm, "s" -> sLm))
    // both sums ride the same row: the subtraction is exact integer
    // arithmetic (micro-nats), no join needed
    val logW = (col("__lm_sum_t") - col("__lm_sum_s")) / 1e6
    // strictly-interior uniform: (h32 + 0.5) / 2^32 can't hit 0 or 1, so
    // the nested logs never see 0/inf
    val u = (conv(substring(md5(concat(lit(s"$seed:"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
    val key = round((logW - log(-log(u))) * 1e6, 0).cast("long")
    sums
      .select(col(idCol), round(logW, 3).as("log_w"), key.as("__dsir_key"))
      .orderBy(col("__dsir_key").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("log_w"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__dsir_key").desc, col(idCol).asc)).as("rank"))
  }
}
