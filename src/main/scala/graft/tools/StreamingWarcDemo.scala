package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end drive of the streaming WARC sink: a rate-source stream shaped
  * into WARC records, written per-micro-batch through the rotating sink,
  * then scanned back with the DSv2 reader. */
object StreamingWarcDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("stream-warc").toString

    val records = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
      .select(
        lit("WARC/1.1").as("version"),
        map(
          lit("WARC-Record-ID"), concat(lit("<urn:uuid:rate"), col("value"), lit(">")),
          lit("WARC-Type"), lit("resource")).as("headers"),
        concat(lit("rate-payload-"), col("value").cast("string")).cast("string").as("content"))

    val q = graft.streaming.StreamingOps.warcFileSink(records, dir, compression = "zstd").start()
    Thread.sleep(5000)
    q.processAllAvailable()
    q.stop()

    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(d => d.listFiles().map(f => s"${d.getName}/${f.getName}"))
      .filter(_.endsWith(".warc.zst"))
    println(s"batch file sets: ${files.map(_.split("/")(0)).distinct.sorted.mkString(",")}")
    val back = spark.read.format("graft.sources.WarcDataSource").load(dir)
    val n = back.filter(col("warc_type") === "resource").count()
    println(s"records written+scanned: $n (files=${files.length})")
    println("distinct ids ok: " + (back.filter(col("warc_type") === "resource")
      .select("record_id").distinct().count() == n))

    // streaming SOURCE: tail the same directory back as micro-batches
    val src = spark.readStream.format("graft.sources.WarcDataSource").load(dir)
      .filter(col("warc_type") === "resource")
      .writeStream.format("memory").queryName("demo_src").start()
    src.processAllAvailable()
    src.stop()
    println(s"streaming source read-back: ${spark.table("demo_src").count()}")
    spark.stop()
  }
}
