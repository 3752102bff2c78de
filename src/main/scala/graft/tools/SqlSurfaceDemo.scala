package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the SparkSessionExtensions SQL surface end-to-end: a session
  * configured with graft.GraftExtensions running every registered function
  * from plain SQL. */
object SqlSurfaceDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      """SELECT url_canonicalize('HTTP://H.EX:80/a/../b') AS u,
        |       warc_sha1_b32('hello world') AS d,
        |       warc_digest('x', 'sha256') AS d2,
        |       sorted_intersect_count(array(1L,2L,3L), array(2L,3L,4L)) AS n,
        |       minhash_sig(array('abcde','bcdef'), 4) AS sig,
        |       simhash64(array(xxhash64('a'), xxhash64('b'))) AS sh
        |""".stripMargin).head()
    println(s"u=${r.getString(0)} d=${r.getString(1)} n=${r.getInt(3)} " +
      s"sig=${r.getSeq[Long](4).mkString(",")} sh=${r.getLong(5)}")

    // time-travel table function over a two-version snapshot store
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snapsqldemo").toString
    val store = new graft.snapshot.SnapshotStore(root)
    store.commit(0, Map("t" -> Seq((1L, "a")).toDF("id", "v")))
    store.commit(1, Map("t" -> Seq((2L, "b")).toDF("id", "v")))
    val v0 = spark.sql(s"SELECT count(*) FROM graft_snapshot('$root', 't', 0)").head().getLong(0)
    val vLatest = spark.sql(s"SELECT count(*) FROM graft_snapshot('$root', 't')").head().getLong(0)
    println(s"snapshot v0=$v0 latest=$vLatest")
    spark.stop()
  }
}
