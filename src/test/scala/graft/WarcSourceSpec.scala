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
    val back = spark.read.format(Fmt).load(dir).cache()
    val nFiles = new java.io.File(dir).list().count(_.endsWith(".warc.gz"))
    // one warcinfo record leads every output file (write.go:156-186)
    assert(back.filter(col("warc_type") =!= "warcinfo").count() === 100)
    assert(back.filter(col("warc_type") === "warcinfo").count() === nFiles)
    assert(back.filter(col("warc_type") === "warcinfo")
      .filter(col("record_ordinal") =!= 0).count() === 0)
    // every non-warcinfo record is stamped with its file's warcinfo id
    // (warc.go:218-219)
    assert(back.filter(col("warc_type") =!= "warcinfo")
      .filter(col("warcinfo_id").isNull).count() === 0)
    // no .open files remain after commit
    assert(!new java.io.File(dir).list().exists(_.endsWith(".open")))
    // rotation: 4 partitions x 25 rows / (10+1 warcinfo) per file => >= 8 files
    assert(nFiles >= 8)
    val row = back.filter(col("record_id") === "<urn:uuid:r7>")
      .select("warc_type", "target_uri", "content").head()
    assert(row.getString(0) === "response")
    assert(row.getString(1) === "http://h2.example/p7")
    assert(new String(row.getAs[Array[Byte]](2), "UTF-8") === "payload-7")
    back.unpersist()
  }

  test("byte-size rotation: files straddle the maxFileBytes floor; round-trip intact") {
    val floor = 4096L
    val dir = Files.createTempDirectory("warcbytes").toString
    WarcSink.write(sampleRows(200).coalesce(1), dir,
      maxRecordsPerFile = 1000000, maxFileBytes = floor)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).sortBy(_.getName)
    assert(files.length > 1, "the byte floor must force rotation")
    // floor semantics (file.go:75-85): rotate before the first record at or
    // past the floor — every file except the last crossed it...
    files.dropRight(1).foreach(f => assert(f.length >= floor, s"${f.getName} under floor"))
    // ...and exceeds it by at most ~one compressed record (floor, not a cap)
    files.foreach(f => assert(f.length < floor + 2048, s"${f.getName} overshoot"))
    val back = spark.read.format(Fmt).load(dir)
    assert(back.filter(col("warc_type") =!= "warcinfo").count() === 200)

    // the DSv2 writer honours the same option with identical layout
    val dir2 = Files.createTempDirectory("warcbytes2").toString
    sampleRows(200).coalesce(1).write.format(Fmt)
      .option("maxFileBytes", floor).mode("append").save(dir2)
    val files2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(files2.length === files.length)
    assert(files2.map(_.length).sorted.toSeq === files.map(_.length).sorted.toSeq)
  }

  test("member coordinates: reader-side tracking equals writer-side sidecar index") {
    val dir = Files.createTempDirectory("warcidx").toString
    WarcSink.write(sampleRows(30).coalesce(1), dir, maxRecordsPerFile = 100)
    val files = new java.io.File(dir).list().filter(_.endsWith(".warc.gz")).sorted
    assert(files.length === 1)
    val warc = s"$dir/${files.head}"
    // two independent computations of the member layout (the reference's
    // external-oracle pattern, read_test.go:345-401): the sink counted bytes
    // while WRITING; the scan re-derives coordinates while INFLATING
    val idxIn = Files.newInputStream(java.nio.file.Paths.get(warc + ".idx"))
    val sidecar = try graft.sources.WarcIO.readMemberIndex(idxIn) finally idxIn.close()
    assert(sidecar.length === 31) // 30 records + 1 warcinfo
    val readBack = spark.read.format(Fmt).load(warc)
      .select("member_offset", "member_size").orderBy("member_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(readBack === sidecar)
    assert(sidecar.head._1 === 0L)
    sidecar.sliding(2).foreach {
      case Seq(a, b) => assert(a._1 + a._2 === b._1) // contiguous, no gaps
      case _ =>
    }
    assert(sidecar.last._1 + sidecar.last._2 === new java.io.File(warc).length())
  }

  test("member index splits the scan into member-aligned range partitions") {
    val dir = Files.createTempDirectory("warcsplit").toString
    WarcSink.write(sampleRows(200).coalesce(1), dir, maxRecordsPerFile = 1000)
    // tiny split target => many range partitions over one file
    val back = spark.read.format(Fmt).option("maxPartitionBytes", "2048").load(dir)
    assert(back.rdd.getNumPartitions > 4, s"got ${back.rdd.getNumPartitions} partitions")
    assert(back.filter(col("warc_type") =!= "warcinfo").count() === 200)
    // global ordinals survive the split and stay unique
    assert(back.select("record_ordinal").distinct().count() === back.count())
    // whole-file scan (no option) returns the identical record set
    val whole = spark.read.format(Fmt).load(dir)
    assert(whole.select("record_id").except(back.select("record_id")).count() === 0)
    assert(back.select("record_id").except(whole.select("record_id")).count() === 0)
  }

  test("IndexWarc makes a foreign index-less .warc.gz splittable; rows identical") {
    val dir = Files.createTempDirectory("warcforeign").toString
    WarcSink.write(sampleRows(200).coalesce(1), dir, maxRecordsPerFile = 1000)
    // simulate a FOREIGN archive: strip the sink's sidecar index
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".idx"))
      .foreach(f => assert(f.delete()))
    val unsplit = spark.read.format(Fmt).option("maxPartitionBytes", "2048").load(dir)
    assert(unsplit.rdd.getNumPartitions === 1, "index-less file must scan whole")
    val baseline = unsplit.orderBy("record_ordinal").collect()

    val report = graft.jobs.IndexWarc.indexAll(spark, dir).collect()
    assert(report.length === 1)
    val r = report.head
    assert(r.getAs[Boolean]("built") && r.getAs[String]("error") == null)
    assert(r.getAs[Long]("members") === 201) // 200 records + 1 warcinfo
    val warc = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".warc.gz")).get
    assert(r.getAs[Long]("compressedBytes") === warc.length())

    // built sidecar matches the reader's own coordinates, and the scan splits
    val split = spark.read.format(Fmt).option("maxPartitionBytes", "2048").load(dir)
    assert(split.rdd.getNumPartitions > 4, s"got ${split.rdd.getNumPartitions}")
    assert(split.orderBy("record_ordinal").collect() === baseline)
    // second run is a no-op (index present)
    assert(graft.jobs.IndexWarc.indexAll(spark, dir).count() === 0)
  }

  test("DSv2 write path: df.write -> commit-protocol publish -> scan round-trip") {
    val dir = Files.createTempDirectory("warcv2w").toString
    sampleRows(60).repartition(3).write.format(Fmt)
      .option("maxRecordsPerFile", "10").mode("append").save(dir)
    val listing = new java.io.File(dir).list().toSeq
    // all-or-nothing publish: no attempt files survive a successful commit
    assert(!listing.exists(_.contains(".open")), listing.mkString(","))
    assert(listing.count(_.endsWith(".warc.gz")) >= 6) // 3 partitions x 20/10
    assert(listing.count(_.endsWith(".warc.gz.idx")) ===
      listing.count(_.endsWith(".warc.gz")))
    val back = spark.read.format(Fmt).load(dir).cache()
    assert(back.filter(col("warc_type") =!= "warcinfo").count() === 60)
    assert(back.filter(col("warc_type") =!= "warcinfo")
      .filter(col("warcinfo_id").isNull).count() === 0)
    // sidecar coordinates agree with the reader's member tracking
    assert(back.filter(col("member_offset") < 0).count() === 0)
    val row = back.filter(col("record_id") === "<urn:uuid:r7>")
      .select("warc_type", "content").head()
    assert(row.getString(0) === "response")
    assert(new String(row.getAs[Array[Byte]](1), "UTF-8") === "payload-7")
    back.unpersist()
  }

  test("plain (uncompressed) .warc scan works and headers map is case-insensitive-keyed") {
    val dir = Files.createTempDirectory("warcplain").toString
    WarcSink.write(sampleRows(10).coalesce(1), dir, gzip = false)
    val back = spark.read.format(Fmt).load(dir)
    assert(back.count() === 11) // 10 records + the file's warcinfo
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
    assert(q.count() === 6) // 5 records + the file's warcinfo
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
    assert(back.filter(col("warc_type") =!= "warcinfo").count() === rows.count())
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
