package graft

import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** PageRank against an independent in-test reference (Map-based power
  * iteration, same formulation), plus the host-edge builder. */
class GraphOpsSpec extends SparkSpec {

  /** Reference implementation: same simplified formulation as the doc. */
  private def refPageRank(edges: Seq[(String, String)], iterations: Int,
                          d: Double = 0.85): Map[String, Double] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iterations) {
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(n => n -> ((1 - d) + d * in.getOrElse(n, 0.0))).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iterations: Int): Map[String, Double] = {
    import spark.implicits._
    GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", iterations = iterations)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("matches the reference on a graph with hub, dangling node, and self-loop") {
    val edges = Seq(
      "a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "d" -> "c",
      "e" -> "e", // self-loop
      "a" -> "f") // f is dangling (receives, never forwards)
    for (k <- Seq(1, 3, 10)) {
      val got = run(edges, k)
      val want = refPageRank(edges, k)
      assert(got.keySet === want.keySet)
      want.foreach { case (n, w) =>
        assert(math.abs(got(n) - w) < 1e-9, s"node $n at k=$k: ${got(n)} vs $w")
      }
    }
  }

  test("parallel edges collapse; iteration crosses the lineage cut unchanged") {
    val base = Seq("x" -> "y", "y" -> "z", "z" -> "x")
    val withDupes = base ++ base ++ base
    // k=7 crosses the default checkpointEvery=3 cut twice
    val got = run(withDupes, 7)
    val want = refPageRank(base, 7)
    want.foreach { case (n, w) => assert(math.abs(got(n) - w) < 1e-9, n) }
    // a cycle conserves mass: ranks sum to |V|
    assert(math.abs(got.values.sum - 3.0) < 1e-9)
  }

  test("pageRank matches the reference on random graphs (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(40)((s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}")).distinct
      val got = run(edges, 6)
      val want = refPageRank(edges, 6)
      assert(got.keySet === want.keySet, s"seed $seed")
      want.foreach { case (n, w) =>
        assert(math.abs(got(n) - w) < 1e-9, s"seed $seed node $n") }
    }
  }

  test("pageRank releases its iteration caches (edges/nodes unpersisted on return)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val r = GraphOps.pageRank(Seq("a" -> "b", "b" -> "a").toDF("s", "d"), "s", "d", 3)
    r.count()
    // only the returned checkpoint may remain registered — the
    // MEMORY_AND_DISK edges/nodes caches must be gone
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1,
      s"pageRank leaked caches: ${spark.sparkContext.getPersistentRDDs.size - before} new entries")
  }

  test("rankPriorities: log-bucketed host boost, unranked hosts keep priority") {
    import spark.implicits._
    val frontier = Seq(
      ("http://hub.example/a", 5),
      ("http://mid.example/b", 5),
      ("http://cold.example/c", 5),
      ("http://unranked.example/d", 7)).toDF("url", "priority")
    val ranks = Seq(("hub.example", 1000.0), ("mid.example", 7.0),
      ("cold.example", 1.0)).toDF("node", "rank")
    val got = GraphOps.rankPriorities(frontier, "url", ranks).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[Int]("priority")).toMap
    assert(got("http://hub.example/a") === 0)  // 9 - floor(log2(1001)) = 0
    assert(got("http://mid.example/b") === 6)  // 9 - floor(log2(8))    = 6
    assert(got("http://cold.example/c") === 8) // 9 - floor(log2(2))    = 8
    assert(got("http://unranked.example/d") === 7)
    // column order/schema preserved for the frontier contract
    assert(GraphOps.rankPriorities(frontier, "url", ranks).columns.toSeq
      === frontier.columns.toSeq)
  }

  test("degreeReport: out/in degrees and reciprocal counts on a hand graph") {
    import spark.implicits._
    // a<->b reciprocal; a->c one-way; c->c self-loop (reciprocal with itself);
    // duplicate edge collapses
    val e = Seq("a" -> "b", "b" -> "a", "a" -> "c", "c" -> "c", "a" -> "b")
      .toDF("s", "d")
    val got = GraphOps.degreeReport(e, "s", "d").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") === ((2L, 1L, 1L))) // out: b,c; in: b; reciprocal: a->b
    assert(got("b") === ((1L, 1L, 1L)))
    assert(got("c") === ((1L, 2L, 1L))) // self-loop is its own reverse
  }

  test("hostEdges canonicalizes, drops self-loops, dedupes") {
    import spark.implicits._
    val links = Seq(
      ("HTTP://A.Example:80/p1", "http://b.example/x"),
      ("http://a.example/p2", "http://B.EXAMPLE/y"), // same host pair post-canon
      ("http://a.example/p3", "http://a.example/p4"), // self-loop
      ("http://c.example/", "http://a.example/")).toDF("src_url", "dst_url")
    val got = GraphOps.hostEdges(links, "src_url", "dst_url")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set("a.example" -> "b.example", "c.example" -> "a.example"))
  }
}
