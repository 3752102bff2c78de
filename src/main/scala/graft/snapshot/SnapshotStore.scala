package graft.snapshot

import scala.jdk.CollectionConverters._
import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Iceberg-shaped snapshot layer (SURVEY §7.0/§7.5): immutable parquet data
 * files + JSON manifests with snapshot-id / parent-id / per-table file lists
 * / row counts / metrics. No Iceberg runtime ships offline, so this layer
 * supplies the properties the north rule uses — atomic commit, resumable
 * checkpoints, per-partition lineage — behind an interface an Iceberg
 * catalog could replace.
 *
 * All I/O goes through the Hadoop FileSystem of the root path's scheme: a
 * 100 TB archive's snapshot state lives on object storage / HDFS, not on a
 * driver-local disk (`file:/` roots behave exactly as before for tests).
 *
 * Commit protocol = the reference's `.open` -> rename-on-close handoff
 * (warc.go:189,244-248) lifted to table level: data files land first, then
 * the manifest is written to a temp name and renamed (atomic on HDFS and
 * posix local fs; object stores substitute conditional-put semantics). A
 * crash mid-round leaves the previous manifest intact (the mend analog,
 * mend.go:298-375: "truncate to last valid"); orphan data files are swept by
 * [[vacuum]].
 *
 * Tables are append-mode (warc_rows, fetch_log, metrics, lineage, url_seen,
 * digest_seen: manifest carries the cumulative file list) or replace-mode
 * (frontier, filters: only the latest round's files).
 */
class SnapshotStore(val root: String) {
  private val mapper = new ObjectMapper()
  private val rootPath = new HPath(root)
  private val fs: FileSystem = rootPath.getFileSystem(
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration()))
  private val manifestsDir = new HPath(rootPath, "manifests")
  private val dataDir = new HPath(rootPath, "data")
  fs.mkdirs(manifestsDir)
  fs.mkdirs(dataDir)

  val ReplaceTables: Set[String] = Set("frontier", "filters")

  private def listNames(dir: HPath): Seq[String] =
    fs.listStatus(dir).map(_.getPath.getName).toVector

  private def walkFiles(dir: HPath): Seq[HPath] = {
    val it = fs.listFiles(dir, true)
    val buf = mutable.Buffer[HPath]()
    while (it.hasNext) buf += it.next().getPath
    buf.toVector
  }

  private def manifestVersions: Seq[Int] =
    listNames(manifestsDir)
      .collect { case s if s.matches("v\\d+\\.json") => s.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted

  case class Manifest(version: Int, round: Int, parent: Int,
                      files: Map[String, Seq[String]],
                      counts: Map[String, Long])

  def latest: Option[Manifest] =
    manifestVersions.reverseIterator.flatMap(v => readManifest(v)).take(1).toSeq.headOption

  private def readManifest(version: Int): Option[Manifest] =
    try {
      val in = fs.open(new HPath(manifestsDir, s"v$version.json"))
      val node = try mapper.readTree(in) finally in.close()
      val files = node.get("tables").fields().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq
      }.toMap
      val counts = node.get("counts").fields().asScala.map { e =>
        e.getKey -> e.getValue.asLong()
      }.toMap
      Some(Manifest(version, node.get("round").asInt(), node.get("parent").asInt(), files, counts))
    } catch { case _: Throwable => None } // partial/corrupt manifest = not committed

  /** Write round outputs and commit atomically. Returns the new manifest. */
  def commit(round: Int, tables: Map[String, DataFrame],
             metrics: Map[String, Long] = Map.empty): Manifest = {
    val parent = latest
    val version = parent.map(_.version + 1).getOrElse(0)
    val written = mutable.Map[String, Seq[String]]()
    tables.foreach { case (name, df) =>
      val dir = new HPath(new HPath(dataDir, name), s"r$round")
      df.write.mode("overwrite").parquet(dir.toString)
      written(name) = walkFiles(dir)
        .filter(_.getName.endsWith(".parquet"))
        .map(_.toString).sorted
    }
    // cumulative file lists for append tables
    val prevFiles = parent.map(_.files).getOrElse(Map.empty)
    val allNames = (prevFiles.keySet ++ written.keySet).toSeq.sorted
    val files = allNames.map { name =>
      val prev = if (ReplaceTables.contains(name)) Seq.empty else prevFiles.getOrElse(name, Seq.empty)
      name -> (prev ++ written.getOrElse(name, Seq.empty))
    }.toMap

    val node = mapper.createObjectNode()
    node.put("version", version)
    node.put("round", round)
    node.put("parent", parent.map(_.version).getOrElse(-1))
    node.put("committed_round_epoch", round.toLong) // logical time, never wall clock
    val tablesNode = node.putObject("tables")
    files.foreach { case (name, fsList) =>
      val arr: ArrayNode = tablesNode.putArray(name)
      fsList.foreach(arr.add)
    }
    val countsNode = node.putObject("counts")
    metrics.foreach { case (k, v) => countsNode.put(k, v) }
    // lineage: which files this round added, per table (per-partition lineage)
    val lineageNode = node.putObject("lineage")
    written.foreach { case (name, fsList) =>
      val arr = lineageNode.putArray(name); fsList.foreach(arr.add)
    }

    val tmp = new HPath(manifestsDir, s".tmp-v$version.json")
    val out = fs.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new HPath(manifestsDir, s"v$version.json"))) // the ".open"->final rename
      throw new java.io.IOException(s"manifest rename failed for v$version")
    Manifest(version, round, parent.map(_.version).getOrElse(-1), files,
      metrics)
  }

  /** Read a table as of the latest snapshot (file-list scoped scan). */
  def read(spark: SparkSession, table: String): Option[DataFrame] =
    latest.flatMap(m => m.files.get(table)).filter(_.nonEmpty)
      .map(files => spark.read.parquet(files: _*))

  /** Time travel: read a table as of snapshot `version` (Iceberg's
    * `VERSION AS OF` — possible because manifests are immutable and data
    * files are never rewritten, only appended or dereferenced). */
  def readAt(spark: SparkSession, table: String, version: Int): Option[DataFrame] =
    readManifest(version).flatMap(m => m.files.get(table)).filter(_.nonEmpty)
      .map(files => spark.read.parquet(files: _*))

  /** All committed snapshot versions, ascending (the snapshot log). */
  def versions: Seq[Int] = manifestVersions

  /**
   * Retention: keep only the newest `keepLast` committed snapshot versions,
   * deleting older manifests (Iceberg's `expire_snapshots`). Without this a
   * long-running crawl accumulates one manifest per round forever, and
   * replace-table history pins every frontier generation's data files.
   * Expired versions become unreadable (`readAt` returns None); the
   * retained versions — including their time travel and lineage — are
   * untouched. Data files orphaned by expiration are reclaimed by the next
   * [[vacuum]]. Returns the expired version numbers.
   */
  def expire(keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val toDrop = manifestVersions.dropRight(keepLast)
    toDrop.foreach(v => fs.delete(new HPath(manifestsDir, s"v$v.json"), false))
    toDrop
  }

  /** Delete data files referenced by NO committed (non-expired) manifest
    * (mend analog). Scoped to the union of all retained manifests — not just
    * the latest — so time travel to every version [[expire]] kept stays
    * intact (replace-mode tables drop old files from later manifests, but an
    * older retained manifest may still reference them). */
  def vacuum(): Seq[String] = {
    val referenced = manifestVersions.flatMap(readManifest)
      .flatMap(_.files.values.flatten).toSet
    val removed = mutable.Buffer[String]()
    if (fs.exists(dataDir)) {
      walkFiles(dataDir)
        .filter(p => p.getName.endsWith(".parquet"))
        .filter(p => !referenced.contains(p.toString))
        .foreach { p => fs.delete(p, false); removed += p.toString }
    }
    removed.toSeq
  }
}
