package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Training-corpus assembly operators — the stage AFTER dedup/quality where a
 * 100 TB pipeline turns a cleaned document pool into model-ready data:
 *
 *  - deterministic stratified sampling (data mixing by source/language quota)
 *  - sequence packing (concatenate-then-chunk into fixed token budgets)
 *  - benchmark decontamination (drop documents sharing n-grams with an
 *    evaluation set)
 *
 * All three are deterministic (hash-derived, no RNG), cross-engine
 * reproducible (DuckDB oracles in SparkEntry), and shuffle-lean: sampling is
 * a pure map, packing shuffles (id, tokens) pairs once, decontamination
 * ships 8-byte gram hashes only.
 */
object PipelineOps {

  /** Uniform [0,1) deterministic in `c`'s STRING value via the first 8 md5
    * hex digits — portable across engines (DuckDB: CAST('0x'||substr(md5,1,8)
    * AS UBIGINT)), unlike xxhash64 which only Spark has. */
  def hashUnit(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("double") / 4294967296.0

  /**
   * Deterministic stratified sampling (data mixing): keep each row with the
   * probability its stratum's quota prescribes, decided by a hash of the
   * row's own id — reproducible across runs, engines, and partitionings, and
   * a pure narrow map (no shuffle, no RNG state). The standard mixture knob
   * for multi-source corpora (e.g. {web: 0.3, code: 1.0, wiki: 3x-oversample
   * via >1.0 handled as keep-all here — rates are capped at 1.0}).
   */
  def stratifiedSample(df: DataFrame, keyCol: String, idCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(keyCol) === k, lit(math.min(r, 1.0))).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol)) < rate)
  }

  /** Signed-64-bit view of the first 16 md5 hex digits — a 64-bit token
    * hash BOTH engines can compute (DuckDB: CAST('0x'||substr(md5(x),1,16)
    * AS UBIGINT); the bit patterns are identical and bit extraction is
    * signedness-agnostic). Slower than xxhash64 — use it where cross-engine
    * verifiability matters more than raw hash throughput (e.g. the
    * oracle-checked simhash variant, q56). */
  /** Scala-side constant twin of [[hashUnit]]: the SAME md5-prefix chain
    * (first 8 hex digits as an unsigned 32-bit value / 2^32) over a literal
    * string, evaluated at plan-build time — for folding data-independent
    * hash coins (e.g. SRP hyperplane components) into literals. Exact:
    * integer-valued double < 2^32, then one IEEE division by a power of 2. */
  def hashUnitConst(s: String): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  def portableHash64(c: Column): Column = {
    // two 32-bit halves via conv (each < 2^32, so the long cast never
    // overflows) recomposed with shiftleft|or — bit-identical to the signed
    // reinterpretation of the full unsigned 16-hex-digit value, without the
    // decimal(20,0) arithmetic of the naive form (measured 2.9x faster over
    // 5M shingle hashes in q57; ANSI-safe: shiftleft wraps bits by spec)
    val hex = md5(c.cast("string"))
    val hi = conv(substring(hex, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(hex, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** Uniform [0,1) deterministic in (id, copyIndex) — the per-copy coin for
    * fractional oversampling (same portable formula as [[hashUnit]]). */
  private def hashUnitCopy(id: Column, k: Column): Column =
    hashUnit(concat(id.cast("string"), lit(":"), k.cast("string")))

  /**
   * Weighted corpus mixing WITH oversampling: weight w emits floor(w) full
   * copies of each row plus one more with probability frac(w), decided by a
   * hash of (id, copy index). The standard epoch-mixture tool (e.g.
   * {wiki: 3.0, books: 2.5, web: 0.3}) — deterministic, engine-portable,
   * and shuffle-free (a generate + filter, no RNG state). Output carries a
   * `copy` column (0-based) so downstream packing/shuffling can interleave
   * duplicates deterministically.
   */
  def mixWeighted(df: DataFrame, keyCol: String, idCol: String,
                  weights: Map[String, Double],
                  defaultWeight: Double = 0.0): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0, "weights must be >= 0")
    require(!df.columns.contains("copy") && !df.columns.contains("__w"),
      "mixWeighted reserves the 'copy' (output) and '__w' (internal) column names")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(keyCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("__w", w)
      // w = 0 must drop BEFORE the explode: Spark's sequence(0, -1) yields a
      // DESCENDING [0, -1], not an empty array
      .filter(col("__w") > 0)
      .withColumn("copy",
        explode(sequence(lit(0L), ceil(col("__w")).cast("long") - 1)))
      .filter(col("copy") < floor(col("__w")) ||
        hashUnitCopy(col(idCol), col("copy")) < col("__w") - floor(col("__w")))
      .drop("__w")
  }

  /**
   * Sequence packing, concatenate-then-chunk (the GPT-style pretraining
   * layout): documents in a fixed global order are laid end-to-end on a
   * token tape; each document reports the training sequence its first token
   * lands in (`seq_id = start_offset / budget`) and its offset inside that
   * sequence. Downstream, one `groupBy(seq_id)` materializes the sequences.
   *
   * Scale: a single global cumulative sum is NOT one window over one
   * partition (the classic scale-killer) — it is the two-phase parallel
   * prefix sum: range-partition by the order column, a per-partition running
   * sum, then per-partition TOTALS (one long per partition — the only
   * driver-side data) prefix-summed and broadcast back. 100 TB of documents
   * shuffle ONCE as (id, order, tokens) triples: the running sum is a
   * per-partition imperative scan (`mapPartitionsWithIndex` — the genuine
   * per-partition-sequential case), not a `Window.partitionBy(pid)`, which
   * would re-shuffle the whole frame a second time because Catalyst cannot
   * know rows are already grouped by physical partition (measured in the
   * plan: an extra Exchange hashpartitioning(pid) + re-sort). The narrow
   * cumsum frame is eagerly localCheckpoint'ed so the totals pass and the
   * output projection share ONE computation of the scan+tokenize.
   */
  def packSequences(df: DataFrame, idCol: String, orderCol: String,
                    tokenCount: Column, budget: Int,
                    numParts: Int = 0,
                    carryCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val reserved = Set(idCol, "n_tokens", "start_offset", "seq_id", "seq_offset")
    require(carryCols.forall(!reserved.contains(_)),
      s"carryCols may not collide with output columns $reserved")
    val spark = df.sparkSession
    val p = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // internal names never collide with caller columns (carry may be "toks")
    // null token counts (e.g. a NULL text row under ANSI size()) contribute
    // zero tokens instead of NPE-ing the per-partition scan; negatives would
    // silently corrupt every later offset, so they fail loudly
    val toksExpr = coalesce(tokenCount.cast("long"), lit(0L))
    val guarded = when(toksExpr < 0, raise_error(concat(
      lit("packSequences: negative token count for id "), col(idCol).cast("string"))))
      .otherwise(toksExpr)
    // secondary key id: ties in orderCol would otherwise land on
    // sampling-dependent sides of range boundaries, breaking run-to-run
    // determinism of the tape (ids are unique by contract)
    // lazy checkpoint BEFORE the range exchange (round 7): range
    // partitioning samples its child to pick boundaries, so the projection
    // (which may carry an expensive tokenCount and wide carry columns) was
    // evaluated TWICE — once for the sample pass, once for the real
    // shuffle. The checkpoint materializes it during the sampling job and
    // the shuffle reads the stored blocks. (A production run would persist
    // this frame to storage; the materialization is corpus-order narrow
    // rows — id, order, token count — plus any carry columns.)
    val parts = df.select(Seq(col(idCol).as("__pk_id"), col(orderCol).as("__pk_ord"),
        guarded.as("__pk_toks")) ++ carryCols.map(col): _*)
      .localCheckpoint(false)
      .repartitionByRange(p, col("__pk_ord"), col("__pk_id"))
      .sortWithinPartitions("__pk_ord", "__pk_id")
    val schema = org.apache.spark.sql.types.StructType(parts.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("__pk_pid", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__pk_cum", org.apache.spark.sql.types.LongType, nullable = false)))
    val toksIdx = parts.schema.fieldIndex("__pk_toks")
    val withCum = spark.createDataFrame(
      parts.rdd.mapPartitionsWithIndex { (pid, it) =>
        var cum = 0L
        it.map { r =>
          val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ cum)
          cum += r.getLong(toksIdx)
          out
        }
      }, schema)
      .localCheckpoint(true) // narrow frame; totals + output share ONE compute
    // per-partition totals: P longs — the prefix offsets of the tape
    val totals = withCum.groupBy("__pk_pid")
      .agg(max(col("__pk_cum") + col("__pk_toks")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L))
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until p).map(i => (i, offsets(i))), 1))
      .toDF("__pk_pid", "__pk_part_offset")
    withCum.join(broadcast(offsetsDf), Seq("__pk_pid"))
      .withColumn("start_offset", col("__pk_cum") + col("__pk_part_offset"))
      .select(Seq(col("__pk_id").as(idCol), col("__pk_toks").as("n_tokens"),
        col("start_offset"),
        expr(s"start_offset div $budget").as("seq_id"),
        (col("start_offset") % budget).as("seq_offset")) ++ carryCols.map(col): _*)
  }

  /**
   * Deterministic epoch shuffle: the pre-training "shuffle the corpus by
   * seed each epoch" primitive, as a seeded pseudo-random TOTAL order with
   * a contiguous global rank. The order key is md5(seed:id) — portable, so
   * an epoch's order is reproducible across runs and engines (resume
   * mid-epoch = filter epoch_rank >= checkpoint), with the id as tiebreak.
   * The global rank is [[packSequences]] with unit token counts (same
   * two-phase prefix sum: range-sort, P partition counts to the driver,
   * broadcast offsets — explicitly NOT a one-partition window), so rank i
   * is exactly the i-th row of the seeded order. `carryCols` ride through
   * the one range exchange.
   */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
                   numParts: Int = 0, carryCols: Seq[String] = Nil): DataFrame = {
    // same reserved-name contract as mixWeighted/packSequences: refuse to
    // silently overwrite a caller column that collides with the internal
    // key or the output rank
    val epReserved = Seq("__ep_key", "epoch_rank").filter(df.columns.contains)
    require(epReserved.isEmpty,
      s"epochShuffle: input already has reserved column(s) ${epReserved.mkString(", ")}")
    val keyed = df.withColumn("__ep_key",
      md5(concat(lit(s"$seed:"), col(idCol).cast("string"))))
    packSequences(keyed, idCol, "__ep_key", lit(1L), budget = 1,
      numParts = numParts, carryCols = carryCols)
      .select(Seq(col(idCol), col("start_offset").as("epoch_rank")) ++
        carryCols.map(col): _*)
  }

  /**
   * Deterministic train/val/test split assignment: each row's label is the
   * first split whose cumulative weight fraction exceeds the row's
   * md5-uniform coin (seed:id). Properties the ad-hoc `rand()` split does
   * NOT have: stable under corpus growth (a document's split never changes
   * when other documents arrive — the membership-by-own-hash property that
   * prevents silent eval contamination on re-splits), reproducible across
   * engines (q62's DuckDB oracle runs the identical arithmetic), and
   * shuffle-free (a narrow map). Cumulative bounds are computed ONCE here
   * and interpolated into any oracle, so float-sum drift can't diverge the
   * two engines.
   */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)], seed: Long = 0L): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0) && splits.map(_._2).sum > 0,
      "split weights must be non-negative with a positive sum")
    val spReserved = Seq("__split_u", "split").filter(df.columns.contains)
    require(spReserved.isEmpty,
      s"assignSplits: input already has reserved column(s) ${spReserved.mkString(", ")}")
    val bounds = splitBounds(splits)
    val u = hashUnit(concat(lit(s"$seed:"), col(idCol).cast("string")))
    // the coin is staged as an attribute: the CASE references it once per
    // branch and md5 must be computed once per row, not once per branch
    val label = splits.init.zip(bounds.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), c), acc) => when(col("__split_u") < c, lit(name)).otherwise(acc)
    }
    df.withColumn("__split_u", u).withColumn("split", label).drop("__split_u")
  }

  /** Cumulative upper bounds of each split's interval in [0,1] — exposed so
    * oracles interpolate the EXACT doubles [[assignSplits]] compares with. */
  def splitBounds(splits: Seq[(String, Double)]): Seq[Double] = {
    val total = splits.map(_._2).sum
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
  }

  /**
   * Materialize the packed training sequences: split each document's token
   * run at the sequence boundaries it straddles and reassemble exact
   * `budget`-token sequences (the final text every sequence except the tape
   * tail has EXACTLY `budget` tokens of, in document order). Downstream of
   * [[packSequences]]: the explode emits one part per (doc, sequence)
   * overlap — a document adds at most ceil(n/budget)+1 parts — and the
   * reassembly shuffles by seq_id where every group is bounded by `budget`
   * tokens, so no group can blow up a task regardless of corpus size.
   */
  def materializeSequences(df: DataFrame, idCol: String, orderCol: String,
                           textCol: String, budget: Int,
                           numParts: Int = 0): DataFrame = {
    // the token arrays ride THROUGH the pack shuffle as a carry column: one
    // scan + one range exchange, instead of tokenizing twice and joining the
    // arrays back by id (which would shuffle them anyway)
    val toksDf = df.select(col(idCol).as("id"), col(orderCol).as("ord"),
      TextOps.tokens(col(textCol)).as("toks"))
    val packed = packSequences(toksDf, "id", "ord", size(col("toks")), budget,
      numParts, carryCols = Seq("toks"))
    val b = lit(budget.toLong)
    val parts = packed
      .filter(col("n_tokens") > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"start_offset div $budget"),
        expr(s"(start_offset + n_tokens - 1) div $budget"))))
      .withColumn("p0", greatest(col("seq_id") * b - col("start_offset"), lit(0L)))
      .withColumn("p1", least(col("n_tokens"), (col("seq_id") + 1) * b - col("start_offset")))
      .select(col("seq_id"), col("start_offset").as("off"),
        slice(col("toks"), (col("p0") + 1).cast("int"), (col("p1") - col("p0")).cast("int")).as("part"))
    parts.groupBy("seq_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("off"), col("part")))),
        s => s.getField("part"))).as("toks_seq"))
      .select(col("seq_id"),
        size(col("toks_seq")).cast("long").as("n_tokens"),
        concat_ws(" ", col("toks_seq")).as("text"))
  }

  /**
   * Benchmark decontamination: flag every document sharing at least one
   * word n-gram with the evaluation corpus (the n-gram-overlap rule used for
   * pretraining-set hygiene). Grams travel as 64-bit hashes — the flags are
   * hash-independent output (a collision could only ADD a flag, at ~1e-19
   * per gram pair), so the DuckDB string-gram oracle checks them exactly.
   *
   * Short-input policy (documents OR eval lines with fewer than n tokens):
   * the side emits ONE gram — the hash of its full token sequence — so a
   * short document is flagged iff some eval line is the IDENTICAL token
   * sequence (exact-match-in-eval, not substring: a 3-token doc embedded
   * inside a longer eval line does NOT flag, because the long line only
   * contributes n-grams). Empty texts emit the empty-sequence gram and
   * therefore match only other empty texts. This is deliberate: at n=8 a
   * sub-n doc sharing a few words with eval is far likelier to be benign
   * overlap than leakage, while a verbatim eval line of ANY length is
   * always leakage.
   * The eval side is tiny in practice -> Catalyst broadcasts the semi-join;
   * a corpus-sized eval set degrades gracefully to a shuffled semi-join on
   * 8-byte keys.
   */
  def contaminationFlags(docs: DataFrame, idCol: String, textCol: String,
                         eval: DataFrame, evalTextCol: String,
                         n: Int = 8): DataFrame = {
    // internal alias must not collide with a caller column: drop("id") would
    // remove EVERY column named "id", including the document's own when
    // idCol == "id"
    val joinId = "__contam_id"
    val docGrams = docs
      .select(col(idCol).as(joinId), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(joinId),
        explode(array_distinct(TextOps.wordNgramHashesFromTokens(col("toks"), n))).as("g"))
    val evalGrams = eval
      .select(TextOps.tokens(col(evalTextCol)).as("toks"))
      .select(explode(array_distinct(TextOps.wordNgramHashesFromTokens(col("toks"), n))).as("g"))
      .distinct()
    // the flag rides under an internal name until the final withColumn so a
    // pre-existing `contaminated` column (this op's own output re-piped
    // against a second eval set) is REPLACED instead of becoming ambiguous
    val contaminated = docGrams.join(evalGrams, Seq("g"), "left_semi")
      .select(joinId).distinct().withColumn("__contam_flag", lit(true))
    docs.join(contaminated, docs(idCol) === contaminated(joinId), "left")
      .withColumn("contaminated", coalesce(col("__contam_flag"), lit(false)))
      .drop(joinId, "__contam_flag")
  }

  /**
   * Per-key frequency cap (the RefinedWeb-style "keep at most N pages per
   * domain" rule): keeps at most `maxPerKey` rows per key, chosen
   * deterministically by the md5-uniform coin over `seed|id` — reproducible
   * across runs and engines, and independent of input order.
   *
   * Exactness without the skew hazard: `row_number() OVER (PARTITION BY
   * key)` would serialize a hot domain's rows into one window partition
   * (the chunkDedup lesson); instead the per-key keep-threshold is computed
   * by the bounded kth-smallest aggregate ([[graft.functions.KthSmallestAgg]]
   * — partial state ≤ k coins per task regardless of key heat), and rows
   * keep iff `coin <= threshold`. Coins are unique (md5 over unique ids),
   * so over-cap keys keep exactly `maxPerKey` rows; under-cap keys keep all
   * (their threshold is the group max).
   */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, maxPerKey: Int,
                seed: String = "graft"): DataFrame = {
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    val reserved = Seq("__cap_coin", "__cap_thr", "__cap_key").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"capPerKey: input already has reserved column(s) ${reserved.mkString(", ")}")
    // loud null guard (round-7 ADVICE): concat_ws SKIPS null args, so every
    // null-id row would get the identical md5(seed) coin — a key holding
    // several null-id rows could then keep more than maxPerKey rows (the
    // coin-uniqueness contract breaks). Fail loudly instead.
    val coined = df.withColumn("__cap_coin",
      md5(concat_ws("|", lit(seed),
        when(col(idCol).isNull, raise_error(lit(
          "capPerKey: null id (coins must be unique per row)")))
          .otherwise(col(idCol)).cast("string"))))
    val thresholds = coined.groupBy(col(keyCol).as("__cap_key"))
      .agg(graft.functions.KthSmallestAgg
        .kth_smallest_agg(col("__cap_coin"), maxPerKey).as("__cap_thr"))
    // null-SAFE join: a null key is a group like any other (the row_number
    // reference semantics partition nulls together) — a plain equi-join
    // would silently drop every null-key row instead of capping them
    coined.join(thresholds, col(keyCol) <=> col("__cap_key"))
      .filter(col("__cap_coin") <= col("__cap_thr"))
      .drop("__cap_coin", "__cap_thr", "__cap_key")
  }
}
