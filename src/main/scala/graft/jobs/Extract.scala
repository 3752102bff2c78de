package graft.jobs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The `warc extract` job (K8/X8/X10/F3/A2 in SURVEY §2; reference:
 * /root/reference/cmd/warc/extract/extract.go) over the WARC source:
 * filter response records by content type, write payloads to per-host
 * directories with sanitized collision-safe names, and report a
 * content-type histogram.
 */
object Extract {

  /** F3: substring match against a content-type list (extract.go:103-107). */
  def contentTypeFilter(contentType: Column, wanted: Seq[String]): Column =
    wanted.map(ct => contentType.contains(ct)).reduce(_ || _)

  /**
   * X8: filename sanitize — strip path separators, cap length keeping the
   * extension (extract.go:121-146 semantics with a deterministic cap).
   * Kept SQL-expressible for the cross-engine oracle (q44).
   */
  def sanitizeFilename(name: Column, maxLen: Int = 64): Column = {
    val clean = regexp_replace(name, "[/\\\\]", "_")
    val ext = regexp_extract(clean, "(\\.[A-Za-z0-9]{1,8})$", 1)
    val stemBudget = greatest(lit(1), lit(maxLen) - length(ext))
    when(length(clean) <= maxLen, clean)
      .otherwise(concat(substring(clean, 1, maxLen).substr(lit(1), stemBudget), ext))
  }

  /**
   * X8: Content-Disposition filename override (extract.go:121-146): when the
   * response carries `filename="..."` (or a bare token) in its
   * Content-Disposition header, that name wins over the URL-derived fallback.
   */
  def dispositionFilename(contentDisposition: Column, fallback: Column): Column = {
    val cd = coalesce(contentDisposition, lit(""))
    val quoted = regexp_extract(cd, "(?i)filename\\s*=\\s*\"([^\"]+)\"", 1)
    val bare = regexp_extract(cd, "(?i)filename\\s*=\\s*([^;\\s\"]+)", 1)
    when(length(quoted) > 0, quoted)
      .when(length(bare) > 0, bare)
      .otherwise(fallback)
  }

  /** X10: KiB/MiB/GiB formatting (mend.go:479-490) — reporting only. */
  def humanBytes(bytes: Column): Column =
    when(bytes < 1024, concat(bytes.cast("string"), lit(" B")))
      .when(bytes < 1024L * 1024, concat(round(bytes / 1024.0, 1).cast("string"), lit(" KiB")))
      .when(bytes < 1024L * 1024 * 1024, concat(round(bytes / (1024.0 * 1024), 1).cast("string"), lit(" MiB")))
      .otherwise(concat(round(bytes / (1024.0 * 1024 * 1024), 1).cast("string"), lit(" GiB")))

  /** A2: content-type histogram (extract.go:50-64,284-296). */
  def report(records: DataFrame, contentTypeCol: Column): DataFrame =
    records.groupBy(contentTypeCol.as("content_type")).agg(count(lit(1)).as("n"))

  /**
   * K8: payload file sink. Collision policy from extract.go:218-245 made
   * deterministic: within a (host, filename) group, every row after the
   * first (ordered by record_id) gets a short-digest suffix. Paths are
   * host-sorted directories (W3, extract.go:159-172); the `..`/absolute
   * guard rejects traversal (extract.go:130-137).
   */
  def writeFiles(records: DataFrame, outDir: String,
                 filenameCol: Column, hostCol: Column, contentCol: Column): Long = {
    val w = Window.partitionBy(hostCol, filenameCol).orderBy(col("record_id").asc)
    val named = records
      .withColumn("__file", sanitizeFilename(filenameCol))
      .withColumn("__host", regexp_replace(hostCol, "[/\\\\]", "_"))
      .withColumn("__rank", row_number().over(w))
      .withColumn("__digest8", substring(md5(contentCol.cast("string")), 1, 8))
      .withColumn("__final", when(col("__rank") === 1, col("__file"))
        .otherwise(concat(col("__file"), lit("["), col("__digest8"), lit("]"))))
      .select(col("__host").as("host"), col("__final").as("file"),
        contentCol.cast("string").as("content"))

    val root = Paths.get(outDir).toAbsolutePath.normalize
    Files.createDirectories(root)
    val rootStr = root.toString
    // side-effecting sink: foreachPartition + a tracked accumulator (shows in
    // the Spark UI / event log, unlike an ad-hoc rdd sum job)
    val written = named.sparkSession.sparkContext.longAccumulator("extract_files_written")
    named.toDF().foreachPartition { rows: Iterator[Row] =>
      val rootP = Paths.get(rootStr)
      rows.foreach { r: Row =>
        val target = rootP.resolve(r.getString(0)).resolve(r.getString(1)).normalize()
        require(target.startsWith(rootP), s"path traversal blocked: $target") // extract.go:130-137
        Files.createDirectories(target.getParent)
        Files.write(target, r.getString(2).getBytes(StandardCharsets.UTF_8))
        written.add(1L)
      }
    }
    written.value
  }
}
