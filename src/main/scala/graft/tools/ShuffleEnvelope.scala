package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The box's SPARK-SHUFFLE scaling envelope (BENCH/BASELINE.md evidence): a
 * minimal, graft-free workload — generate url-shaped strings, push them
 * through one full repartition exchange plus one high-cardinality aggregate
 * exchange — run at pinned core counts, one level per JVM:
 *
 *   taskset -c 0-7  sbt "runMain graft.tools.ShuffleEnvelope"  (SHUF_CORES=8)
 *   taskset -c 0-31 sbt "runMain graft.tools.ShuffleEnvelope"  (SHUF_CORES=32)
 *
 * The raw-CPU envelope (no-JVM hash loop, ~0.82 at 8->32) is NOT the right
 * ceiling for a shuffle-bound engine: shuffles stream serialized rows
 * through memory and the block manager, so THIS number — same Spark, same
 * shuffle machinery, no graft operators — is the fair hardware floor to
 * judge the crawl bench's 8->32 pair against.
 */
object ShuffleEnvelope {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SHUF_CORES", "8").toInt
    val nRows = sys.env.getOrElse("SHUF_ROWS", "60000000").toLong
    val parts = sys.env.getOrElse("SHUF_PARTS", "128").toInt
    val out = sys.env.get("SHUF_JSON_OUT")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"shuffle-envelope-$cores")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(): Double = {
      val t0 = System.nanoTime()
      val df = spark.range(nRows).select(
        concat(lit("http://host"),
          pmod(xxhash64(col("id")), lit(1000000)).cast("string"),
          lit(".example/path/"), col("id").cast("string"),
          lit("?q="), xxhash64(col("id"), lit(1)).cast("string")).as("url"))
      val agg = df.repartition(parts, xxhash64(col("url"))) // exchange 1: raw strings
        .groupBy(pmod(xxhash64(col("url"), lit(2)), lit(nRows / 3)).as("k")) // exchange 2: little map-side collapse
        .agg(count(lit(1)).as("n"), max(length(col("url"))).as("len"))
        .agg(sum(col("n")), max(col("len"))).head()
      require(agg.getLong(0) == nRows)
      (System.nanoTime() - t0) / 1e9
    }
    once() // identical-workload warmup (codegen + JIT)
    val secs = once()
    val line = s"""{"bench":"shuffle_envelope","cores":$cores,"rows":$nRows,"secs":$secs,"rows_per_sec":${(nRows / secs).toLong}}"""
    println(line)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      line + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND))
    spark.stop()
  }
}
