package graft.functions

/**
 * The frozen-by-construction BPE model behind q63 and `graft_bpe_encode`:
 * trained at class-load time by the PURE-SCALA [[Bpe.train]] over a fixed
 * in-source corpus — no Spark, no I/O, no randomness — so the oracle-SQL
 * generator (which interpolates this model's merges and vocab into a
 * DuckDB recursive CTE) and the Spark-side encoder can never drift: both
 * read the same object. BpeSpec asserts the DISTRIBUTED trainer
 * (`BpeOps.trainBpe`) reproduces exactly this model from the same corpus,
 * which is what makes the freeze falsifiable rather than a copied constant.
 *
 * The corpus deliberately reuses the synthetic `documents.parquet`
 * vocabulary (plus morphology-sharing extras like `sorted`/`merged`/
 * `windowed`), so encoding the real test tables exercises real merges —
 * multi-character tokens, shared stems — rather than degenerating to
 * single characters.
 */
object BpeFixture {

  /** (word, weight) corpus — weights mimic a Zipf-ish skew. */
  val corpus: Seq[(String, Long)] = Seq(
    "the" -> 60L, "scan" -> 50L, "sort" -> 46L, "data" -> 44L,
    "join" -> 40L, "merge" -> 38L, "order" -> 36L, "line" -> 34L,
    "part" -> 32L, "window" -> 30L, "stream" -> 28L, "table" -> 26L,
    "batch" -> 26L, "filter" -> 24L, "group" -> 24L, "query" -> 22L,
    "value" -> 22L, "column" -> 20L, "hash" -> 20L, "key" -> 18L,
    "spark" -> 18L, "small" -> 16L, "slow" -> 16L, "fast" -> 14L,
    "row" -> 14L, "agg" -> 12L, "big" -> 12L, "customer" -> 10L,
    "vector" -> 10L, "dup" -> 8L, "a" -> 8L,
    // morphology extras: shared stems force stem/suffix merges
    "sorted" -> 6L, "merged" -> 6L, "joined" -> 6L, "windowed" -> 4L,
    "scanned" -> 4L, "streaming" -> 6L, "sorting" -> 4L, "merging" -> 4L,
    "grouping" -> 4L, "tables" -> 4L, "rows" -> 6L, "keys" -> 4L,
    "values" -> 4L, "queries" -> 4L)
  // no digit words: BpePattern pretokenizes digits one at a time, so a
  // digit-pair merge could be learned but never applied — dead vocab

  val NumMerges = 48

  /** The model: deterministic function of (corpus, NumMerges, minCount=2). */
  lazy val model: BpeModel = Bpe.train(corpus, NumMerges)
}
