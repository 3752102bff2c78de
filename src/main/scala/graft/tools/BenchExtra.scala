package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 measurement harness (guide §1): times a subset of SparkEntry
  * queries through the noop sink with an untimed sf0.001 warm-up pass and
  * N timed repetitions at the target scale, reporting every sample plus
  * min/median — the low-noise signal for before/after comparison on a
  * shared noisy box. Usage:
  *   SPARK_GRAFT_REPS=3 sbt "runMain graft.tools.BenchExtra q23 q85 ..."
  * (no args = the full suite). Does NOT replace graft.Bench, which is the
  * frozen driver contract; numbers cited in OPTIMIZATION_r07.md come from
  * here.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_SF_DIR",
      new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001").getPath)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
    // untimed warm-up at the small scale: pays Janino/JIT before timers
    sel.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[warmup] $name: ${e.getMessage}") }
    }
    sel.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = samples.sorted
      val med = sorted(sorted.size / 2)
      println(f"$name: min=${sorted.head}%.3f med=$med%.3f samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
