package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual drive of the extract/verify jobs end-to-end: crawl -> WARC sink ->
  * VerifyWarc over the files -> Extract payloads to disk + report. */
object JobsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // crawl (with per-round localCheckpoint, the new default) -> sink
    val n = 300L
    val res = graft.jobs.Crawl.run(spark,
      graft.web.SyntheticWeb.pages(spark, n),
      graft.web.SyntheticWeb.seeds(spark, 100, n), None, None, None,
      graft.jobs.Crawl.Config(maxRounds = 2, perHostBudget = 60, numSlots = 8,
        dedupSizeThreshold = 32, numShards = 4))
    println(s"rounds: ${res.rounds.map(r => (r.round, r.scheduled, r.responses, r.revisits))}")
    val warcDir = Files.createTempDirectory("jobs-demo").toString
    val shaped = graft.sources.WarcSink.toRecordColumns(
      res.warcRows.withColumn("content", concat_ws("|", col("warc_type"), col("target_uri"))),
      "content", keepDigests = false) // content is synthetic -> writer recomputes
    graft.sources.WarcSink.write(shaped, warcDir)

    // VerifyWarc over the sink output (block digests were NOT written -> no digest errors possible;
    // header + version checks exercise)
    graft.jobs.VerifyWarc.run(spark, warcDir)
      .orderBy("source_file").show(3, truncate = 60)

    // corrupt one record's digest header by writing a second dir with a bogus digest
    val badDir = Files.createTempDirectory("jobs-demo-bad").toString
    import spark.implicits._
    val bad = Seq(("WARC/0.9", Map("WARC-Type" -> "response",
      "WARC-Block-Digest" -> "sha1:AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"), "body"))
      .toDF("version", "headers", "content")
    graft.sources.WarcSink.write(bad.coalesce(1), badDir)
    println("--- bad file verify (expect version+header+digest errors):")
    graft.jobs.VerifyWarc.run(spark, badDir).show(5, truncate = 50)

    // Extract: filter by content type then write payload files + report
    val recs = spark.read.format("graft.sources.WarcDataSource").load(warcDir)
      .withColumn("ct", lit("text/plain"))
      .filter(graft.jobs.Extract.contentTypeFilter(col("ct"), Seq("text/")))
    val outDir = Files.createTempDirectory("extract-demo").toString
    val nw = graft.jobs.Extract.writeFiles(
      recs.filter(col("warc_type") === "response").limit(50),
      outDir,
      concat(regexp_replace(col("target_uri"), "[:/]+", "_"), lit(".html")),
      regexp_extract(col("target_uri"), "http://([^/]+)", 1),
      col("content").cast("string"))
    println(s"extract wrote $nw files; hosts: ${new java.io.File(outDir).list().sorted.take(5).mkString(",")}")
    val host0 = new java.io.File(outDir).list().head
    println(s"sample files: ${new java.io.File(s"$outDir/$host0").list().take(3).mkString(",")}")
    graft.jobs.Extract.report(recs, col("warc_type")).orderBy("content_type").show()
    spark.stop()
  }
}
