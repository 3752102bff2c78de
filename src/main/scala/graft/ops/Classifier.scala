package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * fastText-style quality classifier: logistic regression over hashed
 * bag-of-token buckets, trained by full-batch gradient descent expressed as
 * pure DataFrame algebra — the standard web-corpus quality gate ("train a
 * small classifier on known-good vs known-bad pages, keep what scores
 * high") next to the heuristic gates (Gopher/C4, q55) and the LM
 * perplexity filter (q65).
 *
 * Scale shape: features are (doc, bucket, x) rows — explode + ONE hash
 * aggregation, persisted once and reused by every epoch; the model is at
 * most `dim`+1 rows, so every epoch is feats ⋈ broadcast(model) → per-doc
 * sigmoid → feats ⋈ residuals → per-bucket gradient. No windows, no
 * driver-side math except the scalar doc count; epochs localCheckpoint the
 * (tiny) model to keep the plan flat.
 *
 * Parity discipline (the q65 pattern): weights LIVE in integer micros
 * (BIGINT), every cross-row float aggregate is quantized to micros
 * immediately (residuals per doc, gradients per bucket), and `lr` times an
 * integer gradient rounds half-away-from-zero in both engines — so the
 * whole training loop is replayable in ANSI SQL to the exact same integers
 * regardless of float summation order (q78).
 */
object Classifier {

  /** L1-normalized hashed-bucket features plus the bias pseudo-bucket
    * (bucket −1, x = 1). `dim` must be a power of two: the signed
    * `pmod(hash, dim)` then equals the unsigned `hash % dim` (low bits), so
    * the DuckDB UBIGINT twin buckets identically. Token-less docs drop out
    * (no features → excluded from training and scoring). */
  def features(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two for portable bucketing, got $dim")
    val toksed = df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks"))).filter(col("n") > 0)
    toksed
      .select(col("id"), col("n"), explode(col("toks")).as("tok"))
      .groupBy(col("id"), col("n"),
        pmod(PipelineOps.portableHash64(col("tok")), lit(dim.toLong)).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .select(col("id"), col("bucket"), (col("c").cast("double") / col("n")).as("x"))
      .unionByName(toksed.select(col("id"), lit(-1L).as("bucket"), lit(1.0).as("x")))
  }

  /** Σ w·x per doc, in real units: (id, s). */
  private def dot(feats: DataFrame, model: DataFrame): DataFrame =
    feats.join(broadcast(model), Seq("bucket"), "left")
      .groupBy("id")
      .agg((sum(col("x") * coalesce(col("wm"), lit(0L))) / 1e6).as("s"))

  /** Train on labeled docs (`labelCol` ∈ {0,1}); returns the model as
    * `(bucket, wm)` with weights in micros, bucket −1 the bias. */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
            dim: Int = 256, epochs: Int = 3, lr: Double = 0.5): DataFrame = {
    val feats = features(df, idCol, textCol, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainOnFeatures(feats,
      df.select(col(idCol).as("id"), col(labelCol).cast("int").as("y")),
      epochs, lr)
    finally feats.unpersist()
  }

  /** Train on a pre-built (and ideally persisted) [[features]] frame — the
    * reuse path when the same features feed training AND scoring (q78's
    * shape: one feature build instead of two). `labels` is (id, y). */
  def trainOnFeatures(feats: DataFrame, labelsIn: DataFrame,
                      epochs: Int = 3, lr: Double = 0.5): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val spark = feats.sparkSession
    // left_semi instead of join-on-distinct-ids: same rows (membership
    // test), no distinct aggregate/exchange over the feature frame
    val labels = labelsIn.select(col("id"), col("y").cast("int").as("y"))
      .join(feats.select("id"), Seq("id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The count() is LOAD-BEARING beyond its scalar: it materializes the
    // labels cache, so InMemoryRelation's stats become the ACTUAL bytes.
    // A round-7 attempt to replace it with a lazy one-row broadcast left
    // the cache un-materialized — every epoch's model checkpoint then
    // rewrote stats from unbounded size ESTIMATES, and the per-epoch model
    // joins square them: the sizeInBytes BigInteger grows super-
    // exponentially in epochs and the checkpoint's stats visitor spins in
    // BigInteger.multiply (observed: ClassifierSpec wedged for 20+ min in
    // SizeInBytesOnlyStatsPlanVisitor). Keep the action.
    val n = labels.count() // scalar: sizes the gradient mean
    var model = spark.range(0).select(col("id").as("bucket"), col("id").as("wm"))
    for (_ <- 1 to epochs) {
      val resid = dot(feats, model).join(labels, Seq("id"))
        .select(col("id"), round(
          (lit(1.0) / (lit(1.0) + exp(-col("s"))) - col("y")) * 1e6, 0)
          .cast("long").as("r"))
      val grad = feats.join(resid, Seq("id"))
        .groupBy("bucket")
        .agg(round(sum(col("x") * col("r")) / n, 0).cast("long").as("gm"))
      // USING-join: the full-outer bucket column arrives pre-coalesced.
      // Eager checkpoint kept: a lazy intermediate-epoch checkpoint was
      // measured SLOWER (the next epoch's model broadcast then executes the
      // previous epoch's whole compute inside its broadcast build).
      model = model.join(grad, Seq("bucket"), "full")
        .select(col("bucket"),
          (coalesce(col("wm"), lit(0L)) -
            round(lit(lr) * coalesce(col("gm"), lit(0L)), 0).cast("long")).as("wm"))
        .localCheckpoint(true)
    }
    labels.unpersist()
    model
  }

  /** Score docs against a trained model: (id, score), score = σ(w·x). */
  def score(df: DataFrame, idCol: String, textCol: String, model: DataFrame,
            dim: Int = 256): DataFrame =
    scoreFeatures(features(df, idCol, textCol, dim), model)

  /** Score a pre-built [[features]] frame (the reuse path). */
  def scoreFeatures(feats: DataFrame, model: DataFrame): DataFrame =
    dot(feats, model)
      .select(col("id"), (lit(1.0) / (lit(1.0) + exp(-col("s")))).as("score"))

  /** Streaming-safe scoring: mathematically the same σ(Σ w·x) but with ONE
    * aggregation — per-token rows join the broadcast model directly (no
    * intermediate per-bucket count aggregate), so it runs as a streaming
    * query (stream-static broadcast join + one groupBy), the same shape as
    * the streaming LM scorer. Float summation order differs from [[score]]
    * (per-token instead of per-bucket terms), so results agree to ~1e-12,
    * not bitwise. */
  def scoreStream(df: DataFrame, idCol: String, textCol: String, model: DataFrame,
                  dim: Int = 256): DataFrame = {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two for portable bucketing, got $dim")
    val toksed = df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks"))).filter(col("n") > 0)
    val tokenRows = toksed
      .select(col("id"), explode(col("toks")).as("tok"),
        (lit(1.0) / col("n")).as("x"))
      .select(col("id"),
        pmod(PipelineOps.portableHash64(col("tok")), lit(dim.toLong)).as("bucket"),
        col("x"))
      .unionByName(toksed.select(col("id"), lit(-1L).as("bucket"), lit(1.0).as("x")))
    tokenRows.join(broadcast(model), Seq("bucket"), "left")
      .groupBy("id")
      .agg((sum(col("x") * coalesce(col("wm"), lit(0L))) / 1e6).as("s"))
      .select(col("id"), (lit(1.0) / (lit(1.0) + exp(-col("s")))).as("score"))
  }
}
