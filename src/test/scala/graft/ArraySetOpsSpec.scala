package graft

import org.apache.spark.sql.functions._

import graft.functions.ArraySetOps.sorted_intersect_count

class ArraySetOpsSpec extends SparkSpec {
  test("sorted_intersect_count matches array_intersect size on sorted distinct arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)), // partial overlap -> 2
      (Seq(1L, 2L), Seq(3L, 4L)), // disjoint -> 0
      (Seq.empty[Long], Seq(1L)), // empty -> 0
      (Seq(7L), Seq(7L))) // identical -> 1
      .toDF("a", "b")
    val rows = df.select(
      sorted_intersect_count(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    assert(rows.map(_.getInt(0)).toSeq === Seq(2, 0, 0, 1))
  }
}
