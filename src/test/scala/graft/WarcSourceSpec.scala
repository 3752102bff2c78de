package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.WarcSink

/** S1/S2/K1 round-trip: rotating gzip sink (one member per record) back
  * through the DataSourceV2 scan, with pruning + pushdown checks. */
class WarcSourceSpec extends SparkSpec {

  private val Fmt = "graft.sources.WarcDataSource"

  private def sampleRows(n: Int) = {
    import spark.implicits._
    spark.range(n).select(
      lit("WARC/1.1").as("version"),
      map(
        lit("WARC-Record-ID"), concat(lit("<urn:uuid:r"), col("id").cast("string"), lit(">")),
        lit("WARC-Type"), when(col("id") % 3 === 0, "request").otherwise("response"),
        lit("WARC-Target-URI"), concat(lit("http://h"), (col("id") % 5).cast("string"),
          lit(".example/p"), col("id").cast("string")),
        lit("WARC-Date"), lit("2023-11-14T22:13:20Z")).as("headers"),
      concat(lit("payload-"), col("id").cast("string")).cast("string").as("content"))
  }

  test("gzip round-trip: sink then scan reproduces records (per-record members)") {
    val dir = Files.createTempDirectory("warcsrc").toString
    WarcSink.write(sampleRows(100).repartition(4), dir, maxRecordsPerFile = 10)
    val back = spark.read.format(Fmt).load(dir)
    assert(back.count() === 100)
    // no .open files remain after commit
    assert(!new java.io.File(dir).list().exists(_.endsWith(".open")))
    // rotation: 4 partitions x 25 rows / 10 per file => at least 8 files
    assert(new java.io.File(dir).list().count(_.endsWith(".warc.gz")) >= 8)
    val row = back.filter(col("record_id") === "<urn:uuid:r7>")
      .select("warc_type", "target_uri", "content").head()
    assert(row.getString(0) === "response")
    assert(row.getString(1) === "http://h2.example/p7")
    assert(new String(row.getAs[Array[Byte]](2), "UTF-8") === "payload-7")
  }

  test("plain (uncompressed) .warc scan works and headers map is case-insensitive-keyed") {
    val dir = Files.createTempDirectory("warcplain").toString
    WarcSink.write(sampleRows(10).coalesce(1), dir, gzip = false)
    val back = spark.read.format(Fmt).load(dir)
    assert(back.count() === 10)
    val h = back.select("headers").head().getAs[Map[String, String]](0)
    assert(h.contains("warc-type")) // lowercased keys (header.go:12-38 semantics)
  }

  test("filter pushdown on warc_type reaches the scan; results correct") {
    val dir = Files.createTempDirectory("warcpush").toString
    WarcSink.write(sampleRows(90).coalesce(1), dir)
    val q = spark.read.format(Fmt).load(dir).filter(col("warc_type") === "request")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[EqualTo(warc_type,request)]"), s"plan was:\n$plan")
    assert(q.count() === 30)
    // IN pushdown
    val q2 = spark.read.format(Fmt).load(dir)
      .filter(col("target_uri").isin("http://h1.example/p1", "http://h2.example/p2"))
    assert(q2.count() === 2)
  }

  test("column pruning: content column not in read schema when unused") {
    val dir = Files.createTempDirectory("warcprune").toString
    WarcSink.write(sampleRows(5).coalesce(1), dir)
    val q = spark.read.format(Fmt).load(dir).select("record_id", "warc_type")
    val scanDesc = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanDesc.contains("columns=record_id,warc_type"), s"scan was:\n$scanDesc")
    assert(q.count() === 5)
  }

  test("crawl warc_rows ship through toRecordColumns and round-trip") {
    val n = 120L
    val res = graft.jobs.Crawl.run(spark,
      graft.web.SyntheticWeb.pages(spark, n),
      graft.web.SyntheticWeb.seeds(spark, 40, n), None, None, None,
      graft.jobs.Crawl.Config(maxRounds = 1, perHostBudget = 50, numSlots = 4,
        dedupSizeThreshold = 32, numShards = 2))
    val rows = res.warcRows
      .withColumn("content", concat_ws("|", col("warc_type"), col("target_uri")))
    val dir = Files.createTempDirectory("warccrawl").toString
    WarcSink.write(WarcSink.toRecordColumns(rows, "content"), dir)
    val back = spark.read.format(Fmt).load(dir)
    assert(back.count() === rows.count())
    // revisit rows carry profile + truncated headers; responses do not
    val rev = back.filter(col("warc_type") === "revisit")
    if (rev.count() > 0) {
      assert(rev.filter(col("profile").isNull).count() === 0)
      assert(rev.filter(col("truncated") =!= "length").count() === 0)
    }
    assert(back.filter(col("warc_type") === "response")
      .filter(col("profile").isNotNull).count() === 0)
  }
}
