package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dump path is the v0 driver contract: `$outDir/$name` with NO suffix.
    // The driver enumerates dump entries and looks up oracle SQL by the
    // entry name — a `.parquet` suffix makes every lookup miss (no_oracle).
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // NAME-CONTRACT SELF-CHECK (round-2 lesson: a `.parquet` suffix on the
    // dump directories made every driver oracle lookup miss → no_oracle × 47
    // two rounds running). Every oracleSql key must have a dump directory of
    // the SAME string, and every dump entry must be a queries key.
    val dumped = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSet
    val qKeys = SparkEntry.queries.keySet
    val oKeys = SparkEntry.oracleSql.keySet
    val missingDump = oKeys.diff(dumped)
    val strayDump = dumped.diff(qKeys)
    val orphanOracle = oKeys.diff(qKeys)
    Files.writeString(Paths.get(s"$outDir/dump_meta.json"),
      s"""{"sf_dir": ${q(sfDir)}, "dump_entries": ${dumped.size}, """ +
        s""""queries": ${qKeys.size}, "oracles": ${oKeys.size}, """ +
        s""""name_contract": ${if (missingDump.isEmpty && strayDump.isEmpty && orphanOracle.isEmpty) "\"pass\"" else "\"FAIL\""}}""")
    if (missingDump.nonEmpty || strayDump.nonEmpty || orphanOracle.nonEmpty) {
      System.err.println(s"[verify] NAME CONTRACT VIOLATION: " +
        s"oracle keys with no dump=$missingDump; dump entries not in queries=$strayDump; " +
        s"oracle keys not in queries=$orphanOracle")
      spark.stop()
      sys.exit(2)
    }
    println(s"[verify] dump complete: $outDir (${dumped.size} entries, " +
      s"${oKeys.size} with oracle SQL, name contract OK)")
    spark.stop()
  }
}
