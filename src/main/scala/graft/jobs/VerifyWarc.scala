package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.WarcDigest.warc_sha1_b32

/**
 * The `warc verify` job (A3 in SURVEY §2; reference:
 * /root/reference/cmd/warc/verify/verify.go): validate WARC files through
 * the DataSourceV2 scan and aggregate a per-file ValidationResult
 * {record_count, errors, valid} — the verify.go:31-36 shape as a grouped
 * aggregate instead of a per-file loop.
 *
 * Checks (verify.go:101-117,189-241):
 *  - version ∈ {WARC/1.0, WARC/1.1}
 *  - mandatory headers present: WARC-Record-ID, WARC-Type, WARC-Date,
 *    Content-Length (parse-enforced)
 *  - WARC-Block-Digest, when present and sha1, matches the recomputed
 *    digest of the content block
 */
object VerifyWarc {

  def recordChecks(records: DataFrame): DataFrame =
    records
      .withColumn("err_version", !col("version").isin("WARC/1.0", "WARC/1.1"))
      .withColumn("err_headers",
        col("record_id").isNull || col("warc_type").isNull || col("warc_date").isNull)
      .withColumn("err_block_digest",
        col("block_digest").isNotNull && col("block_digest").startsWith("sha1:") &&
          col("block_digest") =!= warc_sha1_b32(col("content")))
      .withColumn("record_valid",
        !col("err_version") && !col("err_headers") && !col("err_block_digest"))

  /** Per-file ValidationResult (verify.go:31-36). */
  def run(spark: SparkSession, path: String): DataFrame = {
    val records = spark.read.format("graft.sources.WarcDataSource").load(path)
    recordChecks(records)
      .groupBy(col("source_file"))
      .agg(
        count(lit(1)).as("record_count"),
        sum(when(col("err_version"), 1).otherwise(0)).as("version_errors"),
        sum(when(col("err_headers"), 1).otherwise(0)).as("header_errors"),
        sum(when(col("err_block_digest"), 1).otherwise(0)).as("digest_errors"),
        // sink invariant (write.go:156-186): a leading warcinfo record per
        // file. Informational, not part of `valid` — foreign files without
        // one are still spec-valid WARCs.
        max(when(col("warc_type") === "warcinfo" && col("record_ordinal") === 0, 1)
          .otherwise(0)).cast("boolean").as("has_warcinfo"),
        min(col("record_valid").cast("int")).cast("boolean").as("valid"))
  }
}
