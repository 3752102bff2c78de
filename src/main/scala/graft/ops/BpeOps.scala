package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.functions.{Bpe, BpeEncode, BpeModel}

/**
 * BPE tokenizer over DataFrames: the distributed half of training plus the
 * codegen encode surface. See [[graft.functions.Bpe]] for the algorithm and
 * determinism contract.
 */
object BpeOps {

  /**
   * Train a BPE model on a corpus column. Split of labor (the HF-trainer
   * decomposition): the CORPUS-sized work — pretokenize + word counting —
   * is one map-side-combinable `groupBy(word).count` over
   * `explode(regexp_extract_all)`, the only shuffle; merge learning then
   * runs on the driver over the word-TYPE dictionary, which grows
   * sublinearly (Heaps' law) and is explicitly bounded by `maxVocabWords`
   * (top-K by count via TakeOrderedAndProject — K rows reach the driver,
   * never the corpus). At 100 TB the corpus pass scales like any
   * word-count; `maxVocabWords` bounds driver memory by dropping the
   * lowest-count word types. The cap is an APPROXIMATION, not an exact
   * cut: a word type whose every pair is globally hapax provably cannot
   * influence training (BpeSpec), but many rare word types SHARING a pair
   * do contribute jointly, so size K generously (default 1M word types ~
   * tens of MB on the driver) — the standard tokenizer-training trade.
   */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
               minCount: Long = 2L, maxVocabWords: Int = 1 << 20): BpeModel = {
    val counts = df
      .select(explode(regexp_extract_all(col(textCol), lit(TextOps.BpePattern),
        lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    Bpe.train(counts, numMerges, minCount)
  }

  /** `struct<tokens array<string>, ids array<int>>` of `text` under
    * `model`. Stage the struct as an attribute (one select), THEN read its
    * fields — referencing this column twice re-runs the encoder twice. */
  def bpeEncode(text: Column, model: BpeModel): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), model))

  /** DuckDB oracle SQL for BPE-encoding `documents.text` under `model`:
    * one merge per recursive-CTE iteration (provably the greedy batch
    * semantics — see [[graft.functions.Bpe]]), merge ranks and vocab ids
    * interpolated as generated CASE arms so the oracle executes the SAME
    * frozen model as the Spark side. Emits per doc: n_tokens, tokens
    * joined by '|', ids joined by ',' (unknown = -1) — join-safe because
    * token strings never contain '|' or ',' unless the TRAINING alphabet
    * does (enforced here). */
  /** The shared recursive core: CTEs `pre` -> `bpe` -> `fin`, where `fin`
    * holds each pretoken's FINAL symbol list (doc_id, pidx, toks). */
  private def coreCtes(model: BpeModel): String = {
    val sep = "chr(1)"
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val rankCase = "CASE toks[i] || " + sep + " || toks[i+1] " +
      model.merges.zipWithIndex.map { case ((a, b), r) =>
        s"WHEN ${lit(a)} || $sep || ${lit(b)} THEN $r"
      }.mkString(" ") + " ELSE 2147483647 END"
    val pat = TextOps.BpePattern.replace("'", "''")
    s"""pre AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(ws)+1),
       |           i -> {'pidx': i,
       |                 'toks': list_transform(range(1, len(ws[i])+1), j -> ws[i][j])})) AS s
       |  FROM (SELECT doc_id, regexp_extract_all(text, '$pat') AS ws FROM documents)),
       |bpe(doc_id, pidx, it, toks) AS (
       |  SELECT doc_id, s.pidx, 0, s.toks FROM pre
       |  UNION ALL
       |  SELECT doc_id, pidx, it+1,
       |         toks[1:bi-1] || [toks[bi] || toks[bi+1]] || toks[bi+2:len(toks)]
       |  FROM (
       |    SELECT doc_id, pidx, it, toks,
       |           list_position(ranks, list_min(ranks)) AS bi, list_min(ranks) AS mr
       |    FROM (SELECT doc_id, pidx, it, toks,
       |                 list_transform(range(1, len(toks)), i -> $rankCase) AS ranks
       |          FROM bpe))
       |  WHERE mr IS NOT NULL AND mr < 2147483647),
       |fin AS (
       |  SELECT doc_id, pidx, toks FROM bpe
       |  QUALIFY row_number() OVER (PARTITION BY doc_id, pidx ORDER BY it DESC) = 1)""".stripMargin
  }

  def bpeOracleSql(model: BpeModel): String = {
    require(model.alphabet.forall(t => !t.contains("|") && !t.contains(",")),
      "oracle join delimiters collide with the model alphabet")
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val idCase = "CASE t " + model.ids.toSeq.sortBy(_._2).map { case (t, i) =>
      s"WHEN ${lit(t)} THEN $i"
    }.mkString(" ") + " ELSE -1 END"
    s"""WITH RECURSIVE
       |${coreCtes(model)},
       |agg AS (
       |  SELECT doc_id,
       |         CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
       |         string_agg(array_to_string(toks, '|'), '|' ORDER BY pidx) AS tok_str,
       |         string_agg(array_to_string(list_transform(toks,
       |             t -> CAST($idCase AS VARCHAR)), ','), ',' ORDER BY pidx) AS id_str
       |  FROM fin GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
       |       coalesce(tok_str, '') AS tok_str, coalesce(id_str, '') AS id_str
       |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** Oracle for packing on REAL token counts (q64): the recursive core
    * computes per-doc BPE token totals, then the q51-style running-sum
    * window reproduces `packSequences`' two-phase prefix sum exactly. */
  def bpePackOracleSql(model: BpeModel, budget: Int): String =
    s"""WITH RECURSIVE
       |${coreCtes(model)},
       |counts AS (
       |  SELECT d.doc_id, CAST(coalesce(t.n, 0) AS BIGINT) AS n_tokens
       |  FROM documents d LEFT JOIN
       |    (SELECT doc_id, sum(len(toks)) AS n FROM fin GROUP BY doc_id) t
       |    USING (doc_id)),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
       |  FROM counts)
       |SELECT doc_id, n_tokens, start_offset,
       |       start_offset // $budget AS seq_id,
       |       start_offset % $budget AS seq_offset
       |FROM c ORDER BY doc_id""".stripMargin
}
