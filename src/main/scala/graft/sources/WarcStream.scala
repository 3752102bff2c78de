package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.internal.Logging
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
 * Offsets carry the ELIGIBLE file set (sorted, JSON via json4s — the same
 * serializer Spark's own source offsets use). Eligibility is bounded by
 * `maxFileAgeMs` (default 7 days, Spark's FileStreamSource precedent): a
 * file older than the age window is never processed and ages out of the
 * offset, so the offset stays O(files-per-window) instead of growing for
 * the stream's lifetime. `.open` in-progress files are invisible (extension
 * filter), and the sink's atomic rename guarantees a listed file is
 * complete.
 *
 * CAVEAT (shared with FileStreamSource): a file whose modification time is
 * already older than `maxFileAgeMs` when FIRST listed — e.g. after stream
 * downtime longer than the window, or archives bulk-copied with preserved
 * mtimes — is never processed; it ages straight out of eligibility. Only
 * such STALE-ON-ARRIVAL files are logged (once each) so the drop is
 * visible — files that were fresh in an earlier offset (i.e. consumed) age
 * out of the window silently, which is the stream working as designed.
 * Backfill genuine drops with the BATCH scan (`spark.read.format(warc)`),
 * or raise `maxFileAgeMs`.
 */
class WarcMicroBatchStream(path: String, required: StructType,
                           filters: Array[Filter], maxPartitionBytes: Long,
                           maxFileAgeMs: Long = WarcMicroBatchStream.DefaultMaxFileAgeMs)
    extends MicroBatchStream with Logging {

  private val conf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())
  private val root = new HPath(path)
  private def fs = root.getFileSystem(conf.value)

  override def initialOffset(): Offset = WarcSourceOffset(Seq.empty)

  // driver-side, per-query-instance: each STALE-ON-ARRIVAL file warns
  // exactly once. Files that were fresh in an earlier offset (and therefore
  // processed) inevitably age past maxFileAgeMs on a long-lived stream —
  // those are NOT drops and never warn; `everFresh` records them. Both sets
  // are size-capped: on a high-churn directory an unbounded path set is a
  // driver leak. Past the everFresh cap, warning is suppressed entirely
  // (one notice) rather than degrading into false per-path alarms for
  // already-consumed files.
  private val warnedAgedOut = scala.collection.mutable.Set[String]()
  private val everFresh = scala.collection.mutable.Set[String]()
  private val WarnedCap = 10000
  private val EverFreshCap = 100000
  private var freshTrackingSaturated = false

  override def latestOffset(): Offset = {
    val cutoff = System.currentTimeMillis() - maxFileAgeMs
    val listed =
      try WarcScan.listWarcFiles(fs, root)
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    val (fresh, aged) = listed.partition(_.getModificationTime >= cutoff)
    val freshPaths = fresh.map(_.getPath.toString)
    if (!freshTrackingSaturated) {
      freshPaths.foreach(everFresh.add)
      if (everFresh.size > EverFreshCap) {
        freshTrackingSaturated = true
        everFresh.clear() // reclaim; warnings are off from here on
        logWarning(s"WARC stream: more than $EverFreshCap distinct files seen; " +
          "stale-on-arrival warnings disabled (cannot distinguish consumed " +
          "files aging out, which is normal, from genuine stale drops)")
      }
    }
    if (!freshTrackingSaturated) {
      // only files that were ALREADY stale when first listed are drops; a
      // consumed file aging out of the window is the stream working as
      // designed
      val untracked = aged.map(_.getPath.toString)
        .filterNot(everFresh.contains).filterNot(warnedAgedOut.contains)
      val (toTrack, overflow) = untracked.splitAt(
        math.max(0, WarnedCap - warnedAgedOut.size))
      toTrack.filter(warnedAgedOut.add).foreach { p =>
        logWarning(s"WARC stream file is older than maxFileAgeMs=$maxFileAgeMs " +
          s"and will NEVER be processed by this stream (restarting after " +
          s"downtime longer than the age window drops the interim files — " +
          s"backfill with the batch scan): $p")
      }
      if (overflow.nonEmpty)
        logWarning(s"WARC stream: ${overflow.size} additional file(s) stale on " +
          s"arrival this trigger beyond the $WarnedCap-path warning cap (not " +
          "tracked per path)")
    }
    WarcSourceOffset(freshPaths)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcSourceOffset].files.toSet
    val fresh = end.asInstanceOf[WarcSourceOffset].files.filterNot(seen)
    val f = fs
    val statuses = fresh.flatMap { p =>
      try Some(f.getFileStatus(new HPath(p)))
      catch {
        case _: java.io.FileNotFoundException =>
          // the offset marks it consumed, so this is permanent: surface it
          logWarning(s"WARC stream file vanished between listing and planning " +
            s"(its records are LOST to this query): $p")
          None
      }
    }
    WarcScan.partitionsFor(f, statuses, maxPartitionBytes)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, filters, conf)

  override def deserializeOffset(json: String): Offset = WarcSourceOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object WarcMicroBatchStream {
  /** FileStreamSource's default: files older than this are never processed
    * and age out of the offset set. */
  val DefaultMaxFileAgeMs: Long = 7L * 24 * 60 * 60 * 1000
}

/** Offset = sorted set of eligible (age-bounded) file paths. */
case class WarcSourceOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    org.json4s.jackson.Serialization.write(Map("files" -> files.sorted))(
      org.json4s.DefaultFormats)
}

object WarcSourceOffset {
  def fromJson(json: String): WarcSourceOffset = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val parsed = org.json4s.jackson.JsonMethods.parse(json)
    WarcSourceOffset((parsed \ "files").extract[Seq[String]])
  }
}
