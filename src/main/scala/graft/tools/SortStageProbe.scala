package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the final-orderBy range-sampling double-evaluation on a narrow
  * regex-heavy chain (the q70 shape): plain orderBy vs a lazy checkpoint
  * barrier before the sort vs no sort at all. */
object SortStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def body = {
      val html = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"),
        concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style>body{color:red}</style><script>var x=1; if(x<2){x=3;}</script></head>"),
          lit("<body><!-- hidden comment --><h1 class=\"t\">Doc "),
          col("doc_id").cast("string"), lit("</h1><p>"), col("text"),
          lit("</p><div>tail &amp; more &lt;b&gt; &quot;q&quot; &#39;x&#39;&nbsp;end</div>"),
          lit("</body></html>")).as("html"))
      html.select(col("doc_id"),
        graft.ops.TextOps.htmlTitle(col("html")).as("title"),
        graft.ops.TextOps.htmlToText(col("html")).as("clean"))
    }
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    // warm
    noop(body.orderBy("doc_id"))
    def time(label: String)(f: => Unit): Unit = (1 to 4).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("no sort")(noop(body))
    time("orderBy")(noop(body.orderBy("doc_id")))
    time("ckpt+orderBy")(noop(body.localCheckpoint(false).orderBy("doc_id")))
    spark.stop()
  }
}
