package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{MinHashSig, SimHash64FromHashes, SortedIntersectCount, UrlCanonicalize, WarcDigest}

/**
 * `SparkSessionExtensions` registration (SURVEY §7.4, the extension-injection
 * pattern): exposes the engine's custom Catalyst expressions to plain SQL —
 *
 *   spark.conf: spark.sql.extensions=graft.GraftExtensions
 *   SELECT url_canonicalize(url), warc_digest(payload, 'sha1') FROM ...
 *
 * so SQL-only users (notebooks, Thrift server, `spark.sql(...)`) get the
 * identical codegen'd expressions the Scala API uses — same determinism
 * contract, same golden digests. Registered functions:
 *
 *  - url_canonicalize(url)                 RFC 3986 canonical form
 *  - warc_digest(col, 'sha1'|'sha256b32'|'sha256'|'blake3')
 *                                          gowarc `algo:encoded` digests
 *  - warc_sha1_b32(col)                    shorthand for the WARC default
 *  - sorted_intersect_count(a, b)          merge-walk |a ∩ b| of sorted
 *                                          long arrays (dedup verification)
 *  - minhash_sig(shingles, n)              n-slot MinHash signature
 *  - simhash64(hashes)                     64-bit SimHash of hashed tokens
 *
 * and one TABLE function:
 *
 *  - graft_snapshot(root, table[, version]) time travel over the snapshot
 *    store (Iceberg's `VERSION AS OF` shape): resolves to the parquet scan
 *    of exactly the files the chosen manifest references — version omitted
 *    reads the latest committed snapshot. `SELECT * FROM
 *    graft_snapshot('/store', 'warc_rows', 3)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Any integral literal (tinyint..bigint within Int range) as an Int —
    * the same plan-time-constant leniency graft_snapshot's version has. */
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Number, _)
        if (v.isInstanceOf[java.lang.Byte] || v.isInstanceOf[java.lang.Short] ||
          v.isInstanceOf[java.lang.Integer] ||
          (v.isInstanceOf[java.lang.Long] &&
            v.longValue >= Int.MinValue && v.longValue <= Int.MaxValue)) =>
      v.intValue
    case other => throw new IllegalArgumentException(
      s"$what must be an integral literal (within Int range), got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String, usage: String,
                       arity: Int, build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, null, name, usage, ""),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity argument(s), got ${args.length}")
        build(args)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "url_canonicalize",
      "url_canonicalize(url) - RFC 3986 canonical url_key", 1,
      args => UrlCanonicalize(args.head))
    register(ext, "surt_key",
      "surt_key(url) - sort-friendly CDX url key (reversed host labels)", 1,
      args => graft.functions.SurtKey(args.head))
    register(ext, "graft_nfc",
      "graft_nfc(text) - Unicode NFC normalization (canonical composition)", 1,
      args => graft.functions.NfcNormalize(args.head))
    register(ext, "robots_rules",
      "robots_rules(body) - RFC 9309 robots.txt parse to (user_agent, " +
        "rule_type, path_prefix) structs", 1,
      args => graft.functions.RobotsRules(args.head))
    register(ext, "url_resolve",
      "url_resolve(base, ref) - RFC 3986 §5.2 reference resolution (keeps " +
        "the fragment; canonicalize separately)", 2,
      args => graft.functions.UrlResolve(args(0), args(1)))
    register(ext, "warc_sha1_b32",
      "warc_sha1_b32(col) - sha1:BASE32 digest (gowarc default)", 1,
      args => WarcDigest(args.head, "sha1"))
    register(ext, "warc_digest",
      "warc_digest(col, algo) - gowarc-format digest; algo in " +
        "('sha1','sha256b32','sha256','blake3')", 2,
      args => args(1) match {
        case Literal(s: UTF8String, _) => WarcDigest(args.head, s.toString)
        case other => throw new IllegalArgumentException(
          s"warc_digest algo must be a string literal (plan-time constant, " +
            s"digest.go:15-23 enum semantics), got $other")
      })
    register(ext, "sorted_intersect_count",
      "sorted_intersect_count(a, b) - |a ∩ b| of two sorted bigint arrays", 2,
      args => SortedIntersectCount(args(0), args(1)))
    register(ext, "minhash_sig",
      "minhash_sig(shingles, n) - n-slot MinHash signature of a string array " +
        "(xxhash64 chain, bit-compatible with the DedupOps HOF form)", 2,
      args => MinHashSig(args.head, intLit(args(1), "minhash_sig n")))
    register(ext, "simhash64",
      "simhash64(hashes) - 64-bit SimHash of an array<bigint> of token hashes", 1,
      args => SimHash64FromHashes(args.head))
    register(ext, "portable_shingle_hashes",
      "portable_shingle_hashes(text, k) - sorted-distinct signed-64 md5-prefix " +
        "hashes of all k-char shingles (cross-engine-reproducible MinHash input)", 2,
      args => graft.functions.PortableShingleHashes(args.head,
        intLit(args(1), "portable_shingle_hashes k")))
    register(ext, "rolling_token_hashes",
      "rolling_token_hashes(tokens, k) - O(n) rolling polynomial hashes of " +
        "all k-token windows (exact-substring dedup's fast shingle key)", 2,
      args => graft.functions.RollingTokenHashes(args.head,
        intLit(args(1), "rolling_token_hashes k")))
    register(ext, "graft_bpe_encode",
      "graft_bpe_encode(text) - struct<tokens array<string>, ids array<int>> " +
        "under the frozen BpeFixture merge table (unknown tokens: id -1)", 1,
      args => graft.functions.BpeEncode(args.head, graft.functions.BpeFixture.model))
    register(ext, "graft_pii_scrub",
      "graft_pii_scrub(text) - emails/intl phones/national phones/IPv6/IPv4 " +
        "replaced by [EMAIL]/[PHONE]/[PHONE]/[IPV6]/[IP] in that order " +
        "(RE2-portable patterns)", 1,
      args => {
        // resolved catalyst nodes (a Column built here would stay an
        // unresolved function inside the builder); same pattern constants,
        // same application order as TextOps.piiScrub (single-sourced chain)
        import org.apache.spark.sql.catalyst.expressions.{Literal => L, RegExpReplace}
        graft.ops.TextOps.PiiChain.foldLeft(args.head) { case (acc, (pat, rep)) =>
          RegExpReplace(acc, L.create(pat), L.create(rep))
        }
      })
    register(ext, "graft_html_to_text",
      "graft_html_to_text(html) - text of an HTML document via the ordered " +
        "RE2-portable strip/decode chain (TextOps.HtmlChain)", 1,
      args => {
        import org.apache.spark.sql.catalyst.expressions.{Literal => L, RegExpReplace}
        graft.ops.TextOps.HtmlChain.foldLeft(args.head) { case (acc, (pat, rep)) =>
          RegExpReplace(acc, L.create(pat), L.create(rep))
        }
      })
    register(ext, "graft_html_title",
      "graft_html_title(html) - <title> contents ('' when absent)", 1,
      args => {
        import org.apache.spark.sql.catalyst.expressions.{Literal => L, RegExpExtract}
        RegExpExtract(args.head, L.create("(?is)<title\\b[^>]*>(.*?)</title>"), L.create(1))
      })
    register(ext, "graft_pii_scrub_count",
      "graft_pii_scrub_count(text) - struct<clean, n0..n4>: the PII chain " +
        "fused to one count-and-replace matcher pass per stage; n_i counts " +
        "stage i's matches after stages 0..i-1 scrubbed (piiReport kernel)", 1,
      args => graft.functions.RegexScrubCount(args.head,
        new graft.functions.CompiledScrubChain(graft.ops.TextOps.PiiChain)))
    register(ext, "http_payload",
      "http_payload(block) - bytes after the first CRLFCRLF of a binary " +
        "HTTP message (null if absent); the payload-digest cut", 1,
      args => graft.warc.HttpPayload(args.head))

    // time-travel table function: the SQL door to SnapshotStore.readAt.
    // Arguments must be plan-time literals (the manifest is resolved during
    // analysis, like any table reference); the resulting plan is the plain
    // parquet relation over the manifest's file list, so pushdown/pruning
    // apply exactly as on a direct spark.read.parquet of those files.
    ext.injectTableFunction((
      FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo(getClass.getName, null, "graft_snapshot",
        "graft_snapshot(root, table[, version]) - read a snapshot table as of " +
          "a committed version (latest when omitted)", ""),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          s"graft_snapshot expects (root, table[, version]), got ${args.length} argument(s)")
        def str(e: Expression, what: String): String = e match {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"graft_snapshot $what must be a string literal, got $other")
        }
        val root = str(args(0), "root")
        val table = str(args(1), "table")
        val spark = org.apache.spark.sql.SparkSession.active
        val store = new graft.snapshot.SnapshotStore(root)
        val df =
          if (args.length == 3) {
            val v = intLit(args(2), "graft_snapshot version")
            store.readAt(spark, table, v).getOrElse(
              throw new IllegalArgumentException(
                s"graft_snapshot: no committed version $v holding " +
                  s"table '$table' under $root (versions: ${store.versions.mkString(",")})"))
          } else store.read(spark, table).getOrElse(
            throw new IllegalArgumentException(
              s"graft_snapshot: no committed snapshot holds table '$table' under $root"))
        df.queryExecution.logical
      }))
  }
}
