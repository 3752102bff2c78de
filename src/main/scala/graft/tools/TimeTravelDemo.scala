package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Manual drive: run a 3-round crawl against a snapshot store, then time
  * travel through the committed snapshots with readAt. */
object TimeTravelDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val store = new graft.snapshot.SnapshotStore(
      Files.createTempDirectory("tt-demo").toString)
    val n = 300L
    graft.jobs.Crawl.run(spark,
      graft.web.SyntheticWeb.pages(spark, n),
      graft.web.SyntheticWeb.seeds(spark, 80, n), None, None, None,
      graft.jobs.Crawl.Config(maxRounds = 3, perHostBudget = 30, numSlots = 8,
        dedupSizeThreshold = 32, numShards = 4),
      store = Some(store))

    println(s"snapshot log: ${store.versions.mkString(", ")}")
    store.versions.foreach { v =>
      val warc = store.readAt(spark, "warc_rows", v).map(_.count()).getOrElse(0L)
      val seen = store.readAt(spark, "url_seen", v).map(_.count()).getOrElse(0L)
      val frontier = store.readAt(spark, "frontier", v).map(_.count()).getOrElse(0L)
      println(s"as of v$v: warc_rows=$warc url_seen=$seen frontier=$frontier")
    }
    // probes: nonexistent version + nonexistent table
    println("readAt v99 = " + store.readAt(spark, "warc_rows", 99))
    println("readAt bad table = " + store.readAt(spark, "nope", 0))
    spark.stop()
  }
}
