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
    ranks
  }
}
