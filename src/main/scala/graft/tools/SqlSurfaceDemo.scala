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
    spark.stop()
  }
}
