package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual drive of the mend job against real crash artifacts on disk. */
object MendDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("mend-demo").toString
    val rows = spark.range(5).select(
      lit("WARC/1.1").as("version"),
      map(lit("WARC-Record-ID"), concat(lit("<urn:uuid:d"), col("id").cast("string"), lit(">")),
        lit("WARC-Type"), lit("response"),
        lit("WARC-Date"), lit("2023-11-14T22:13:20Z")).as("headers"),
      concat(lit("payload-"), col("id").cast("string")).cast("string").as("content"))
    graft.sources.WarcSink.write(rows.coalesce(1), dir, gzip = false)

    // simulate a crash: rename to .open, append half a record
    val f = new java.io.File(dir).list().find(_.endsWith(".warc")).get
    val p = Paths.get(dir, f); val open = Paths.get(dir, f + ".open")
    Files.move(p, open)
    Files.write(open, "WARC/1.1\r\nWARC-Type: response\r\nContent-Le".getBytes, StandardOpenOption.APPEND)
    println(s"before mend: ${Files.size(open)} bytes, file=${open.getFileName}")

    graft.jobs.Mend.mendAll(spark, dir).show(5, truncate = 60)
    println(s"after mend: exists(final)=${Files.exists(p)} exists(.open)=${Files.exists(open)} size=${Files.size(p)}")
    val back = spark.read.format("graft.sources.WarcDataSource").load(dir)
    println(s"rescan count: ${back.count()}")

    // probe: mend an already-clean file twice (idempotence)
    val again = graft.jobs.Mend.mendFile(p.toString)
    println(s"idempotent re-mend: $again")
    // probe: empty file
    val empty = Paths.get(dir, "empty.warc")
    Files.createFile(empty)
    println(s"empty file: ${graft.jobs.Mend.mendFile(empty.toString)}")
    spark.stop()
  }
}
