package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: ZstdFrames walker coordinates vs the sink's sidecar. */
object ZstdFrameProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = spark.range(500).select(
      lit("WARC/1.1").as("version"),
      map(lit("WARC-Record-ID"), concat(lit("<urn:uuid:demo"), col("id").cast("string"), lit(">")),
        lit("WARC-Type"), lit("response")).as("headers"),
      concat(lit("demo-payload-"), col("id").cast("string")).cast("string").as("content"))
    val dir = Files.createTempDirectory("zprobe").toString
    graft.sources.WarcSink.write(rows.coalesce(1), dir, compression = "zstd")
    val f = new java.io.File(dir).listFiles().find(_.getName.endsWith(".warc.zst")).get
    val idxIn = Files.newInputStream(f.toPath.resolveSibling(f.getName + ".idx"))
    val idx = try graft.sources.WarcIO.readMemberIndex(idxIn) finally idxIn.close()
    val in = new java.io.BufferedInputStream(Files.newInputStream(f.toPath), 1 << 16)
    val walked = try graft.sources.ZstdFrames.frames(in).map(fr => (fr.offset, fr.size)).toVector
      finally in.close()
    println(s"idx=${idx.length} walked=${walked.length}")
    val firstDiff = idx.zip(walked).indexWhere { case (a, b) => a != b }
    println(s"firstDiff=$firstDiff")
    if (firstDiff >= 0) {
      println(s"idx around: ${idx.slice(firstDiff - 1, firstDiff + 3)}")
      println(s"walk around: ${walked.slice(firstDiff - 1, firstDiff + 3)}")
    }
    spark.stop()
  }
}
