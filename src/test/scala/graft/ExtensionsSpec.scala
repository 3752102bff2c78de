package graft

/** SparkSessionExtensions SQL surface: the custom expressions callable from
  * plain SQL with the same golden values as the Scala API (SURVEY §7.4). */
class ExtensionsSpec extends SparkSpec {

  test("url_canonicalize and warc digests are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  url_canonicalize('HTTP://HOST1.EXAMPLE:80/a/../%705#frag') AS u,
        |  warc_sha1_b32('hello world') AS d1,
        |  warc_digest('hello world', 'sha1') AS d2,
        |  warc_digest('', 'blake3') AS d3,
        |  sorted_intersect_count(array(1L, 3L, 5L, 9L), array(3L, 4L, 5L)) AS n
        |""".stripMargin).head()
    assert(r.getString(0) === "http://host1.example/p5")
    // golden value from the reference's digest_test.go:11
    assert(r.getString(1) === "sha1:FKXGYNOJJ7H3IFO35FPUBC445EPOQRXN")
    assert(r.getString(2) === r.getString(1))
    // empty-payload blake3 matches the dedup guard list (dialer.go:84-89)
    assert(graft.functions.WarcDigest.EmptyDigests.contains(r.getString(3)))
    assert(r.getInt(4) === 2)
    // the payload-digest cut is SQL-reachable too
    val p = spark.sql(
      "SELECT cast(http_payload(cast('HTTP/1.1 200 OK\r\nA: b\r\n\r\nBODY' AS BINARY)) AS STRING), " +
        "http_payload(cast('no terminator' AS BINARY))").head()
    assert(p.getString(0) === "BODY" && p.isNullAt(1))
  }

  test("sketch kernels are callable from SQL and match the Scala API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq("the quick brown fox", "jumps over the lazy dog").toDF("s")
      .createOrReplaceTempView("t_sketch")
    val viaSql = spark.sql(
      """SELECT minhash_sig(array(s, 'x'), 8) AS sig,
        |       simhash64(transform(split(s, ' '), t -> xxhash64(t))) AS sh
        |FROM t_sketch ORDER BY s""".stripMargin).collect()
    val viaApi = spark.table("t_sketch")
      .select(graft.functions.SketchExprs.minhash_sig(array(col("s"), lit("x")), 8).as("sig"),
        graft.functions.SketchExprs.simhash64_from_hashes(
          transform(split(col("s"), " "), t => xxhash64(t))).as("sh"))
      .orderBy("s").collect()
    assert(viaSql.map(_.toString).toSeq === viaApi.map(_.toString).toSeq)
  }

  test("portable_shingle_hashes and graft_pii_scrub are SQL-reachable, identical to the API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq("hello world shingles", "ab").toDF("s").createOrReplaceTempView("t_portable")
    val viaSql = spark.sql(
      """SELECT portable_shingle_hashes(s, 5) AS hs, graft_pii_scrub(s || ' x@y.io') AS c
        |FROM t_portable ORDER BY s""".stripMargin).collect()
    val viaApi = spark.table("t_portable")
      .select(graft.functions.SketchExprs.portable_shingle_hashes(col("s"), 5).as("hs"),
        graft.ops.TextOps.piiScrub(concat(col("s"), lit(" x@y.io"))).as("c"))
      .orderBy("s").collect()
    assert(viaSql.map(_.toString).toSeq === viaApi.map(_.toString).toSeq)
    assert(viaSql.forall(_.getString(1).endsWith("[EMAIL]")))

    // the fused kernel's SQL door agrees with the unfused chain: clean
    // equals graft_pii_scrub, counts match regexp_count on the staged text
    val fused = spark.sql(
      """SELECT graft_pii_scrub_count(s || ' x@y.io 10.0.0.1') AS r,
        |       graft_pii_scrub(s || ' x@y.io 10.0.0.1') AS c
        |FROM t_portable ORDER BY s""".stripMargin).collect()
    fused.foreach { row =>
      val r = row.getStruct(0)
      assert(r.getString(0) === row.getString(1))
      assert((1 to 5).map(r.getLong) === Seq(1L, 0L, 0L, 0L, 1L))
    }

    // two independently-constructed chains over the same patterns must be
    // semanticEquals (the SQL builder makes a fresh CompiledScrubChain per
    // parsed call) — reference equality here would defeat CSE for the one
    // expression whose point is running once per row
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR}
    import org.apache.spark.sql.types.StringType
    val child = AR("s", StringType)()
    val e1 = graft.functions.RegexScrubCount(child,
      new graft.functions.CompiledScrubChain(graft.ops.TextOps.PiiChain))
    val e2 = graft.functions.RegexScrubCount(child,
      new graft.functions.CompiledScrubChain(graft.ops.TextOps.PiiChain))
    assert(e1.semanticEquals(e2))

    // HTML chain through the SQL door agrees with the API
    val htmlRows = spark.sql(
      """SELECT graft_html_to_text('<p>a &amp; b</p><script>x<1</script>') AS t,
        |       graft_html_title('<title>T</title>') AS ti""".stripMargin).head()
    assert(htmlRows.getString(0) === "a & b")
    assert(htmlRows.getString(1) === "T")
    assert(spark.sql("SELECT graft_nfc('Cafe\\u0301')").head().getString(0) === "Caf\u00e9")

    // rolling window hashes through the SQL door agree with the API
    val roll = spark.sql(
      "SELECT rolling_token_hashes(array('a', 'b', 'c', 'a', 'b'), 2) AS h").head()
      .getSeq[Long](0)
    assert(roll.length === 4 && roll(0) === roll(3), // 'a b' window repeats
      roll.toString)
  }

  test("graft_bpe_encode is SQL-reachable, identical to the API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq("the merge sort", "windowed streaming").toDF("s")
      .createOrReplaceTempView("t_bpe")
    val viaSql = spark.sql(
      "SELECT graft_bpe_encode(s) AS e FROM t_bpe ORDER BY s").collect()
    val viaApi = spark.table("t_bpe")
      .select(graft.ops.BpeOps.bpeEncode(col("s"), graft.functions.BpeFixture.model).as("e"))
      .orderBy("s").collect()
    assert(viaSql.map(_.toString).toSeq === viaApi.map(_.toString).toSeq)
    // non-vacuous: hot fixture words become single multi-char tokens
    assert(viaSql.exists(_.toString.contains("merge")))
  }

  test("warc_digest rejects a non-literal algo (plan-time constant, like the reference enum)") {
    val e = intercept[Exception] {
      spark.sql("SELECT warc_digest('x', lower('SHA1'))").collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.toLowerCase.contains("constant"),
      e.getMessage)
  }

  test("graft_snapshot table function: SQL time travel over committed versions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snapsql").toString
    val store = new graft.snapshot.SnapshotStore(root)
    store.commit(0, Map("warc_rows" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    store.commit(1, Map("warc_rows" -> Seq((3L, "c")).toDF("id", "v")))

    // VERSION AS OF 0: only the first round's rows
    val v0 = spark.sql(s"SELECT id, v FROM graft_snapshot('$root', 'warc_rows', 0) ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v0 === Seq((1L, "a"), (2L, "b")))
    // latest (append table): cumulative
    val latest = spark.sql(s"SELECT count(*) FROM graft_snapshot('$root', 'warc_rows')").head().getLong(0)
    assert(latest === 3L)
    // filters still push into the underlying parquet scan
    val one = spark.sql(s"SELECT v FROM graft_snapshot('$root', 'warc_rows', 1) WHERE id = 3").head()
    assert(one.getString(0) === "c")
    // unknown version fails loudly with the committed list
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_snapshot('$root', 'warc_rows', 99)").collect()
    }
    assert(e.getMessage.contains("99"), e.getMessage)
  }

  test("SQL expressions codegen identically to the Scala API over a table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq("a b", "HTTP://X.Y:80/p", "").toDF("s").createOrReplaceTempView("t_ext")
    val viaSql = spark.sql(
      "SELECT warc_sha1_b32(s) AS d, url_canonicalize(s) AS u FROM t_ext ORDER BY s").collect()
    val viaApi = spark.table("t_ext")
      .select(graft.functions.WarcDigest.warc_sha1_b32(col("s")).as("d"),
        graft.functions.UrlCanonicalize.url_canonicalize(col("s")).as("u"))
      .orderBy("s").collect()
    assert(viaSql.map(_.toString).toSeq === viaApi.map(_.toString).toSeq)
  }
}
