package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.UrlCanonicalize.url_canonicalize

/**
 * Link-graph analytics over the crawl's discovered edges (the q72 link
 * discovery output): host-level graph construction and PageRank — the
 * classic crawl-prioritization signal (OPIC/PageRank frontier ordering; the
 * reference's scheduler is FIFO+politeness, cf. pkg/frontier — rank-ordered
 * seeds are the standard upgrade a 100 TB crawl runs on top).
 *
 * Scale shape: the edge list is deduped, degree-joined and hash-partitioned
 * by `src` ONCE and persisted — each power iteration then shuffles only the
 * rank vector (|V| rows, tiny next to |E|) to meet the edges' layout, plus
 * one aggregation by `dst`. Lineage is cut every `checkpointEvery`
 * iterations (`localCheckpoint` here; a cluster run would use a reliable
 * `checkpoint` dir — without the cut, the analysis-time plan doubles per
 * iteration). No windows, no driver-side graph: both sides stay distributed,
 * AQE splits skewed hub hosts.
 */
object GraphOps {

  /** Canonical host-level edges from page-level links: canonicalize both
    * endpoints, take the hosts, drop self-loops and nulls, dedupe. */
  def hostEdges(links: DataFrame, srcUrlCol: String, dstUrlCol: String): DataFrame =
    links.select(
      parse_url(url_canonicalize(col(srcUrlCol)), lit("HOST")).as("src"),
      parse_url(url_canonicalize(col(dstUrlCol)), lit("HOST")).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()

  /** Rank-informed frontier priorities: a discovered URL's priority becomes
    * `max(0, maxPriority − floor(log2(1 + rank)))` of its host's PageRank —
    * log-bucketing, so hub hosts fetch first (lower = better, the
    * scheduler's order) and the score→priority mapping is a pure per-row
    * map: no global sort and no partition-less ntile window over the host
    * table. Unranked hosts keep their existing priority. Ranks broadcast
    * (the host dimension is small next to the frontier). */
  def rankPriorities(frontier: DataFrame, urlCol: String, hostRanks: DataFrame,
                     maxPriority: Int = 9): DataFrame = {
    val prReserved = Seq("__pr_host", "__pr").filter(frontier.columns.contains)
    require(prReserved.isEmpty,
      s"rankPriorities: input already has reserved column(s) ${prReserved.mkString(", ")}")
    val ranks = broadcast(hostRanks.select(
      col("node").as("__pr_host"), col("rank").as("__pr")))
    frontier
      .withColumn("__pr_host", parse_url(url_canonicalize(col(urlCol)), lit("HOST")))
      .join(ranks, Seq("__pr_host"), "left")
      // greatest() SKIPS nulls (greatest(0, null) = 0, not null), so the
      // unranked case must branch explicitly, not ride a coalesce
      .withColumn("priority",
        when(col("__pr").isNotNull,
          greatest(lit(0), lit(maxPriority) - floor(log2(lit(1.0) + col("__pr"))).cast("int")))
          .otherwise(col("priority")).cast("int"))
      .drop("__pr_host", "__pr")
  }

  /** Per-node degree report with reciprocity — the classic link-spam
    * signal set (link farms show high reciprocity and out/in imbalance):
    * `(node, out_deg, in_deg, reciprocal)` over the deduped directed edge
    * set, where `reciprocal` counts this node's out-edges whose reverse
    * edge also exists. One self-semi-join on the reversed edges + two
    * map-side-combinable counts; no windows. */
  def degreeReport(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // null endpoints dropped (the hostEdges convention): a "null node" has
    // no meaningful degree, and the full-outer join below would split it
    // into two node=null rows (null keys never match)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val inDeg = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    val recip = e.join(e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("reciprocal"))
    outDeg.join(inDeg, Seq("node"), "full").join(recip, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("reciprocal"), lit(0L)).as("reciprocal"))
  }

  /** PageRank by power iteration, the standard simplified formulation:
    *
    *   r₀(v) = 1.0
    *   rₜ₊₁(v) = (1 − d) + d · Σ_{u→v} rₜ(u) / outdeg(u)
    *
    * Parallel edges collapse (edges are deduped); dangling nodes (no
    * out-edges) keep receiving but stop forwarding — their mass is dropped,
    * as in the original formulation ranks then sum to ≤ |V|, not 1; callers
    * wanting a distribution can normalize. Deterministic up to float
    * summation order (quantize before cross-engine compares).
    *
    * Returns `(node, rank)` for every node that appears as an endpoint.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, damping: Double = 0.85,
               checkpointEvery: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    // one partitioning of the big side, reused by every iteration's join
    val edgesDeg = e.join(deg, "src").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("node"), lit(1.0).as("rank"))
    for (i <- 1 to iterations) {
      val contribs = edgesDeg
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("__in"), lit(0.0)))
            .as("rank"))
      ranks = if (i % checkpointEvery == 0 && i < iterations)
        next.localCheckpoint(true) else next
    }
    // materialize the result, then release the iteration caches — without
    // this every invocation leaks two storage entries for the session
    val out = ranks.localCheckpoint(true)
    edgesDeg.unpersist(); nodes.unpersist()
    out
  }
}
