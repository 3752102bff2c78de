package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.frontier.Scheduler

/** RFC 9309 robots semantics (spec-derived goldens — the reference has no
  * robots support, SURVEY §7.5.5): wildcard/$ patterns, longest-match with
  * allow-wins ties (§2.2.2, §5.2 examples), user-agent group selection. */
class RobotsSpec extends SparkSpec {

  private def frontierOf(paths: String*): DataFrame = {
    import spark.implicits._
    paths.toSeq.toDF("p").select(
      concat(lit("http://h.example"), col("p")).as("url_key"),
      lit("h.example").as("host"))
  }

  private def rules(rows: (String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("user_agent", "rule_type", "path_prefix")
      .withColumn("host", lit("h.example"))
  }

  private def allowed(frontier: DataFrame, robots: DataFrame, ua: String = "*"): Set[String] =
    Scheduler.robotsFilter(frontier, robots, ua)
      .select(regexp_replace(col("url_key"), "^http://h.example", "").as("p"))
      .collect().map(_.getString(0)).toSet

  test("wildcard * and end-anchor $ patterns (RFC 9309 §2.2.3)") {
    val r = rules(("*", "disallow", "/*.php$"), ("*", "disallow", "/private*/"))
    val f = frontierOf("/index.php", "/index.php?x=1", "/a/index.php",
      "/private1/x", "/privateer")
    // /*.php$ blocks only paths ENDING in .php; /private*/ needs the slash
    assert(allowed(f, r) === Set("/index.php?x=1", "/privateer"))
  }

  test("longest match wins; allow beats disallow on equal length (§2.2.2, §5.2)") {
    // the RFC's own example shape: allow /example/page/ vs disallow /example/
    val r1 = rules(("*", "allow", "/example/page/"), ("*", "disallow", "/example/"))
    val f1 = frontierOf("/example/page/x", "/example/other", "/else")
    assert(allowed(f1, r1) === Set("/example/page/x", "/else"))
    // equal-length tie: allow is the least restrictive rule
    val r2 = rules(("*", "allow", "/page"), ("*", "disallow", "/page"))
    assert(allowed(frontierOf("/page1"), r2) === Set("/page1"))
  }

  test("user-agent group selection: specific group replaces * entirely (§2.2.1)") {
    val r = rules(
      ("*", "disallow", "/"), // default group bans everything
      ("graftbot", "disallow", "/private/")) // our group only bans /private/
    val f = frontierOf("/open", "/private/x")
    assert(allowed(f, r, ua = "graftbot") === Set("/open"))
    assert(allowed(f, r, ua = "otherbot") === Set.empty) // falls back to *
  }

  test("no rules for a host, or no matching rule, means allow (§2.2.2)") {
    val f = frontierOf("/anything")
    assert(allowed(f, rules(("*", "disallow", "/blocked")), ua = "*") === Set("/anything"))
    // a host absent from the robots table entirely
    val other = frontierOf("/x").withColumn("host", lit("nothing.example"))
    assert(Scheduler.robotsFilter(other, rules(("*", "disallow", "/"))).count() === 1)
  }

  test("raw robots.txt parsing (§2.2): groups, comments, empty values, end-to-end gate") {
    import spark.implicits._
    val body =
      """# a comment line
        |Disallow: /orphan-rule-ignored
        |
        |User-agent: GraftBot
        |User-agent: OtherBot   # two UAs share one group
        |Disallow: /private/
        |Allow: /private/ok
        |Crawl-delay: 5
        |
        |User-Agent: *
        |Disallow: /tmp/*
        |Disallow:
        |Allow: /tmp/keep$
        |""".stripMargin
    val parsed = Scheduler.parseRobots(
      Seq(("h.example", body)).toDF("host", "body"))
    val got = parsed.collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got === Set(
      ("graftbot", "disallow", "/private/"), ("graftbot", "allow", "/private/ok"),
      ("graftbot", "crawl-delay", "5"), ("otherbot", "crawl-delay", "5"),
      ("otherbot", "disallow", "/private/"), ("otherbot", "allow", "/private/ok"),
      ("*", "disallow", "/tmp/*"), ("*", "allow", "/tmp/keep$")))
    // end-to-end: parsed rules drive the same gate as hand-built rules
    val f = frontierOf("/private/x", "/private/ok", "/tmp/a", "/tmp/keep", "/open")
    assert(allowed(f, parsed, ua = "GraftBot") === Set("/private/ok", "/tmp/a", "/tmp/keep", "/open"))
    assert(allowed(f, parsed) === Set("/private/x", "/private/ok", "/tmp/keep", "/open"))
    // bare-CR terminators (§2.1) and a UTF-8 BOM must not drop rules
    // (both would otherwise silently fail OPEN)
    val crBom = Scheduler.parseRobots(Seq(("h.example",
      "\uFEFFUser-agent: *\rDisallow: /cr\rAllow: /cr/ok")).toDF("host", "body"))
      .collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(crBom === Set(("disallow", "/cr"), ("allow", "/cr/ok")))

    // Crawl-delay: group-scoped, parsed as rows, conservative max, and the
    // round-window budget clamp in schedule()
    val delayBody = "User-agent: GraftBot\nCrawl-delay: 10\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 30\nCrawl-delay: 60\nDisallow: /y"
    val delayRules = Scheduler.parseRobots(
      Seq(("h.example", delayBody)).toDF("host", "body"))
    val d = Scheduler.crawlDelays(delayRules, "GraftBot").collect()
    assert(d.head.getLong(1) === 10L)
    assert(Scheduler.crawlDelays(delayRules).head().getLong(1) === 60L) // max wins
    // the delay rows must NOT leak into the path gate
    assert(allowed(frontierOf("/10", "/z"), delayRules) === Set("/10", "/z"))
    // schedule: 300 s window / 60 s delay -> at most 5 of the 10 candidates
    val cand = (0 until 10).map(i => s"http://h.example/c$i")
    val frontier10 = cand.toDF("url").select(col("url"), lit(1).as("priority"),
      timestamp_seconds(lit(1700000000L)).as("discovery_time"),
      lit(0).as("depth"), lit("seed").as("via"))
    val sched = Scheduler.schedule(spark, frontier10, Seq.empty[String].toDF("url_key"),
      None, Some(delayRules), Scheduler.Config(perHostBudget = 40, numSlots = 2,
        roundWindowSec = 300))
    assert(sched.count() === 5, "crawl-delay clamp must bound the host budget")
    // window off -> full budget
    val schedOff = Scheduler.schedule(spark, frontier10, Seq.empty[String].toDF("url_key"),
      None, Some(delayRules), Scheduler.Config(perHostBudget = 40, numSlots = 2))
    assert(schedOff.count() === 10)

    // a second User-agent AFTER rules opens a NEW group (does not extend)
    val regroup = Scheduler.parseRobots(Seq(("h.example",
      "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y")).toDF("host", "body"))
      .collect().map(r => (r.getString(1), r.getString(3))).toSet
    assert(regroup === Set(("a", "/x"), ("b", "/y")))
  }
}
