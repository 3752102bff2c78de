package graft

import org.apache.spark.sql.functions._

import graft.ops.Classifier

/** Hashed-bag logistic regression: learns a separable fixture, is exactly
  * deterministic under repartitioning (the micro-quantized training loop),
  * and degenerates to 0.5 on uninformative data. */
class ClassifierSpec extends SparkSpec {

  private def fixture(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val y = i % 2
      val text = if (y == 1) s"good solid prose number $i with substance"
                 else s"spam junk clickbait number $i buy now"
      (i.toLong, text, y)
    }.toDF("id", "text", "y")
  }

  test("learns a separable corpus: positive docs score high, negative low") {
    val df = fixture(60)
    val model = Classifier.train(df, "id", "text", "y", dim = 256,
      epochs = 40, lr = 4.0)
    val scored = Classifier.score(df, "id", "text", model, dim = 256)
      .join(df.select("id", "y"), Seq("id")).collect()
    val pos = scored.filter(_.getAs[Int]("y") == 1).map(_.getAs[Double]("score"))
    val neg = scored.filter(_.getAs[Int]("y") == 0).map(_.getAs[Double]("score"))
    assert(pos.min > 0.8, s"positive min ${pos.min}")
    assert(neg.max < 0.2, s"negative max ${neg.max}")
  }

  test("training is exactly deterministic under repartitioning") {
    val df = fixture(40)
    def modelRows(parts: Int) =
      Classifier.train(df.repartition(parts), "id", "text", "y",
        dim = 64, epochs = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(modelRows(1) === modelRows(16)) // micro-quantization kills sum-order drift
  }

  test("uninformative corpus scores 0.5; token-less docs drop out") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, "same words every time", i % 2))
      .toDF("id", "text", "y")
    val m = Classifier.train(df, "id", "text", "y", epochs = 5)
    val s = Classifier.score(df, "id", "text", m).select("score")
      .collect().map(_.getDouble(0))
    assert(s.forall(v => math.abs(v - 0.5) < 1e-6), s.take(3).toSeq.toString)

    val withEmpty = df.union(Seq((99L, "   ", 1)).toDF("id", "text", "y"))
    assert(Classifier.score(withEmpty, "id", "text", m).filter(col("id") === 99L).count() === 0)
  }

  test("scoreStream agrees with score; feature-reuse path equals the convenience path") {
    import spark.implicits._
    val df = fixture(30)
    val model = Classifier.train(df, "id", "text", "y", dim = 64, epochs = 6)
    val a = Classifier.score(df, "id", "text", model, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Classifier.scoreStream(df, "id", "text", model, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-9, s"id $k") }
    // trainOnFeatures over prebuilt features = train (same loop, same feats)
    val feats = Classifier.features(df, "id", "text", 64)
    val m2 = Classifier.trainOnFeatures(feats,
      df.select(col("id"), col("y")), epochs = 6)
    assert(model.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ===
      m2.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  test("dim must be a power of two") {
    val e = intercept[IllegalArgumentException] {
      Classifier.features(fixture(2), "id", "text", 100)
    }
    assert(e.getMessage.contains("power of two"))
  }
}
