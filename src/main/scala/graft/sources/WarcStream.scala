package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/**
 * Streaming WARC source: `spark.readStream.format(warc).load(dir)` tails a
 * directory of rotating WARC files — the live side of the capture pipeline
 * (the reference's writer hands finished `.warc.gz` files off by rename,
 * warc.go:189,244-248; this source picks each file up exactly once as it
 * appears). Micro-batch = the set of files that arrived since the last
 * offset, split with the SAME member-index planning as the batch scan, so a
 * newly-landed 1 GB rotation fans out across the cluster immediately.
 *
 * Offsets carry the processed FILE SET (sorted, JSON) — the same
 * design point as Spark's own FileStreamSource seen-files map, so replaying
 * a batch after failure re-reads exactly its files. `.open` in-progress
 * files are invisible (extension filter), and the sink's atomic rename
 * guarantees a listed file is complete.
 */
class WarcMicroBatchStream(path: String, required: StructType,
                           filters: Array[Filter], maxPartitionBytes: Long)
    extends MicroBatchStream {

  private val conf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())
  private val root = new HPath(path)
  private def fs = root.getFileSystem(conf.value)

  override def initialOffset(): Offset = WarcSourceOffset(Seq.empty)

  override def latestOffset(): Offset =
    WarcSourceOffset(
      if (fs.exists(root)) WarcScan.listWarcFiles(fs, root).map(_.getPath.toString)
      else Seq.empty)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcSourceOffset].files.toSet
    val fresh = end.asInstanceOf[WarcSourceOffset].files.filterNot(seen)
    val f = fs
    val statuses = fresh.flatMap { p =>
      val hp = new HPath(p)
      if (f.exists(hp)) Some(f.getFileStatus(hp)) else None // vanished: skip
    }
    WarcScan.partitionsFor(f, statuses, maxPartitionBytes)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, filters, conf)

  override def deserializeOffset(json: String): Offset = WarcSourceOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = sorted set of fully-processed file paths. */
case class WarcSourceOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.sorted.map(WarcSourceOffset.quote).mkString("""{"files":[""", ",", "]}")
}

object WarcSourceOffset {
  private[sources] def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def fromJson(json: String): WarcSourceOffset = {
    // minimal parser for the exact shape json() writes
    val body = json.trim.stripPrefix("""{"files":[""").stripSuffix("]}")
    if (body.isEmpty) WarcSourceOffset(Seq.empty)
    else {
      val out = scala.collection.mutable.Buffer[String]()
      val sb = new StringBuilder
      var i = 0
      var inStr = false
      while (i < body.length) {
        val c = body.charAt(i)
        if (!inStr) { if (c == '"') inStr = true /* skip commas */ }
        else c match {
          case '\\' => sb.append(body.charAt(i + 1)); i += 1
          case '"' => out += sb.toString; sb.clear(); inStr = false
          case o => sb.append(o)
        }
        i += 1
      }
      WarcSourceOffset(out.toSeq)
    }
  }
}
