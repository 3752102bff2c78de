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
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

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
      args => args(1) match {
        case Literal(n: Integer, _) => MinHashSig(args.head, n.intValue)
        case other => throw new IllegalArgumentException(
          s"minhash_sig n must be an integer literal, got $other")
      })
    register(ext, "simhash64",
      "simhash64(hashes) - 64-bit SimHash of an array<bigint> of token hashes", 1,
      args => SimHash64FromHashes(args.head))
  }
}
