package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Writes `.explain("formatted")` output for named queries to
  * plans/<tag>/<query>_<suffix>.txt (round-7 deliverable: before/after plan
  * evidence). Usage:
  *   sbt "runMain graft.tools.PlanDump r07 before q23 q85 ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0); val suffix = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        // execute THIS df's own QueryExecution first (collect, not a write —
        // a write wraps a fresh QueryExecution) so AQE finalizes the plan:
        // ReusedExchange / runtime join strategies only appear post-execution
        df.collect()
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"wrote plans/$tag/${name}_$suffix.txt (${txt.length} chars)")
      }
    spark.stop()
  }
}
