package graft.sources

import java.io.BufferedOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row}

/**
 * Rotating WARC sink (K1, SURVEY §2.1): the reference's writer pool
 * (/root/reference/warc.go:149-256) re-expressed as per-partition task
 * writers — Spark's execution already IS the pool (one writer per task,
 * "maximize disk IO" per the README's WARCWriterPoolSize guidance).
 *
 * Reproduced semantics:
 *  - rotation by record budget per file (size-target analog of
 *    isFileSizeExceeded, file.go:75-85)
 *  - `.open` suffix while writing, atomic rename on close
 *    (warc.go:189,244-248)
 *  - filename `Prefix-Timestamp-Serial-Host.warc.gz` (file.go:14-63) with a
 *    DETERMINISTIC serial = partitionId * 100000 + rotation index (the
 *    reference's global CAS counter is replaced per SURVEY §7.6 — no shared
 *    mutable state across tasks)
 *  - gzip: one member per record (WarcIO.writeGzipMember)
 *
 * Input schema: (version: string, headers: map<string,string>,
 * content: binary|string). Use [[toRecordColumns]] to shape arbitrary rows.
 */
object WarcSink {

  def write(df: DataFrame, dir: String, prefix: String = "GRAFT",
            tsCompact: String = "20231114221320000",
            gzip: Boolean = true, maxRecordsPerFile: Int = 100000,
            host: String = "local"): Unit = {
    Files.createDirectories(Paths.get(dir))
    val ext = if (gzip) "warc.gz" else "warc"
    df.toDF().foreachPartition { (rows: Iterator[Row]) =>
      var pid = org.apache.spark.TaskContext.getPartitionId()
      var fileIdx = 0
      var written = 0
      var out: BufferedOutputStream = null
      var openPath: java.nio.file.Path = null
      var finalPath: java.nio.file.Path = null

      def rollover(): Unit = {
        if (out != null) { out.close(); Files.move(openPath, finalPath, StandardCopyOption.ATOMIC_MOVE) }
        val serial = pid * 100000 + fileIdx
        val name = f"$prefix-$tsCompact-$serial%09d-$host.$ext"
        finalPath = Paths.get(dir, name)
        openPath = Paths.get(dir, name + ".open")
        out = new BufferedOutputStream(Files.newOutputStream(openPath), 1 << 16)
        fileIdx += 1
        written = 0
      }

      rows.foreach { row =>
        if (out == null || written >= maxRecordsPerFile) rollover()
        val version = row.getAs[String]("version")
        val headers = row.getAs[Map[String, String]]("headers").toSeq
        val content = row.get(row.fieldIndex("content")) match {
          case b: Array[Byte] => b
          case s: String => s.getBytes(StandardCharsets.UTF_8)
          case null => Array.emptyByteArray
        }
        if (gzip) WarcIO.writeGzipMember(out)(g => WarcIO.writeRecord(g, version, headers, content))
        else WarcIO.writeRecord(out, version, headers, content)
        written += 1
      }
      if (out != null) { out.close(); Files.move(openPath, finalPath, StandardCopyOption.ATOMIC_MOVE) }
      ()
    }
  }

  /** Shape the crawl's warc_rows (plus a content column) into sink rows.
    * `keepDigests=false` drops the digest headers so the writer recomputes
    * the block digest from the actual content — use it whenever the content
    * column is not the original digested block. */
  def toRecordColumns(warcRows: DataFrame, contentCol: String,
                      keepDigests: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions._
    def hdr(k: String, c: org.apache.spark.sql.Column) = Seq(lit(k), c.cast("string"))
    val digests =
      if (keepDigests)
        hdr("WARC-Block-Digest", col("block_digest")) ++
          hdr("WARC-Payload-Digest", col("payload_digest"))
      else Seq.empty
    warcRows.select(
      lit("WARC/1.1").as("version"),
      map_filter(map(
        hdr("WARC-Record-ID", col("record_id")) ++
          hdr("WARC-Type", col("warc_type")) ++
          hdr("WARC-Date", date_format(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'")) ++
          hdr("WARC-Target-URI", col("target_uri")) ++
          hdr("Content-Length", col("content_length")) ++
          digests ++
          hdr("WARC-Concurrent-To", col("concurrent_to")) ++
          hdr("WARC-Refers-To", col("refers_to")) ++
          hdr("WARC-Profile", col("profile")) ++
          hdr("WARC-Truncated", col("truncated")): _*),
        (_, v) => v.isNotNull).as("headers"),
      col(contentCol).cast("string").as("content"))
  }
}
