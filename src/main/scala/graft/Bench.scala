package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Per-round benchmark main (driver contract): every SparkEntry query timed
  * on SPARK_GRAFT_SF_DIR at local[32]; one JSON line out. Each query runs
  * through the noop sink so the full plan materializes (a bare count() would
  * let column pruning skip digest/payload work and under-measure). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // default = cores; SPARK_GRAFT_PARTS overrides (measured: at the sf0.1
    // suite scale, task-fixed overhead beats the L3-spill relief that makes
    // larger part counts win on the 4M-page crawl bench)
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // UNTIMED warm-up: run every query once at the smallest scale first so
    // Janino/JIT compilation is paid before any timer starts (measured: the
    // suite's head query otherwise carries ~4 s of one-time compile tax that
    // pollutes per-query comparison across rounds; with this pass q01 lands
    // at its ~0.2 s steady state). CAVEAT: with AQE on, a stage whose
    // runtime plan differs between scales (e.g. broadcast at sf0.001 where
    // sf0.1 sort-merges) still compiles its codegen inside that query's
    // timer — the warm-up removes the dominant shared-infrastructure tax,
    // not every per-plan compile. Disable with SPARK_GRAFT_NO_WARMUP=1 to
    // measure the cold profile deliberately.
    // warm dir defaults to the smallest sibling scale of sfDir (portable —
    // no absolute machine path baked in); SPARK_GRAFT_WARMUP_SF_DIR overrides
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_SF_DIR",
      new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001").getPath)
    val doWarm = !sys.env.contains("SPARK_GRAFT_NO_WARMUP") &&
      new java.io.File(warmDir).isDirectory
    // NonFatal only: an OOM/JVM error during warm-up must abort the bench,
    // not degrade into a stderr line before a meaningless timed run
    if (doWarm) SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case NonFatal(e) => System.err.println(s"[bench warmup] $name: ${e.getMessage}") }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case NonFatal(e) => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val warm = if (doWarm) s""","warmup":"untimed full pass at $warmDir"""" else ""
    println(f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir"$warm%s}""")
    spark.stop()
  }
}
