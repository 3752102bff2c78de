package graft.tools

import org.apache.spark.sql.SparkSession

/** Drive a single SparkEntry query by name (local iteration aid for the
  * cross-engine oracle loop): prints row count, first rows, and wall time;
  * with a second arg, writes the result parquet for an external DuckDB
  * compare. Usage: runMain graft.tools.RunQuery <query> [outParquet] */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.oracleSql.get(name).filter(_ => sys.env.contains("SPARK_GRAFT_PRINT_ORACLE"))
      .foreach { sql => java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/oracle_$name.sql"), sql) }
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val n = df.count()
    println(f"[$name] rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    df.show(10, truncate = false)
    if (args.length > 1) df.coalesce(1).write.mode("overwrite").parquet(args(1))
    spark.stop()
  }
}
