package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.jobs.Mend
import graft.sources.WarcSink

/** A4 mend semantics: truncate-at-last-valid + .open rename (mend.go:298-375). */
class MendSpec extends SparkSpec {

  private def writePlain(dir: String, n: Int): Unit = {
    import spark.implicits._
    val rows = spark.range(n).select(
      lit("WARC/1.1").as("version"),
      map(lit("WARC-Record-ID"), concat(lit("<urn:uuid:m"), col("id").cast("string"), lit(">")),
        lit("WARC-Type"), lit("response"),
        lit("WARC-Date"), lit("2023-11-14T22:13:20Z")).as("headers"),
      concat(lit("payload-"), col("id").cast("string")).cast("string").as("content"))
    WarcSink.write(rows.coalesce(1), dir, gzip = false)
  }

  test("clean file is untouched; truncated tail is cut at last valid record") {
    val dir = Files.createTempDirectory("mend").toString
    writePlain(dir, 10)
    val f = new java.io.File(dir).list().find(_.endsWith(".warc")).get
    val p = Paths.get(dir, f)
    val cleanSize = Files.size(p)

    val clean = Mend.mendFile(p.toString)
    assert(clean.validRecords === 10 && clean.truncatedBytes === 0 && clean.error == null)
    assert(Files.size(p) === cleanSize)

    // append a partial record (version line + half a header) = crash artifact
    Files.write(p, "WARC/1.1\r\nWARC-Type: resp".getBytes, StandardOpenOption.APPEND)
    val mended = Mend.mendFile(p.toString)
    assert(mended.validRecords === 10)
    assert(mended.truncatedBytes > 0)
    assert(Files.size(p) === cleanSize) // cut exactly back to the valid prefix
    // file scans cleanly again
    val back = spark.read.format("graft.sources.WarcDataSource").load(dir)
    assert(back.count() === 10)
  }

  test(".open files are renamed after mending (warc.go:189,244-248 analog)") {
    val dir = Files.createTempDirectory("mendopen").toString
    writePlain(dir, 3)
    val f = new java.io.File(dir).list().find(_.endsWith(".warc")).get
    val p = Paths.get(dir, f)
    val open = Paths.get(dir, f + ".open")
    Files.move(p, open)
    Files.write(open, "GARBAGE".getBytes, StandardOpenOption.APPEND)
    val r = Mend.mendFile(open.toString)
    assert(r.renamed && r.validRecords === 3 && r.truncatedBytes === 7)
    assert(Files.exists(p) && !Files.exists(open))
  }

  test("mendAll distributes across files and reports gzip as index-needed") {
    val dir = Files.createTempDirectory("mendall").toString
    writePlain(dir, 4)
    val rows = Mend.mendAll(spark, dir).collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("validRecords") === 4)
  }
}
