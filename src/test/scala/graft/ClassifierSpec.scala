package graft

import graft.ext.Classifier
import org.apache.spark.sql.functions._

/** Logistic-regression quality classifier (GD on aggregations). */
class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  // linearly separable in x with margin: label = x > 0
  private def toy = Seq(
    (-4.0, 1.0, 0.0), (-3.0, 0.0, 0.0), (-2.5, 1.0, 0.0), (-2.0, 0.5, 0.0),
    (2.0, 1.0, 1.0), (2.5, 0.0, 1.0), (3.0, 0.5, 1.0), (4.0, 1.0, 1.0))
    .toDF("x", "noise", "label")

  test("learns a separable problem to training accuracy 1.0") {
    val m = Classifier.train(toy, Seq("x", "noise"), "label",
      iters = 50, lr = 1.0)
    val acc = Classifier.score(toy, m)
      .agg(avg(when((col("score") >= 0.5) === (col("label") === 1.0),
        1.0).otherwise(0.0))).head().getDouble(0)
    assert(acc === 1.0)
    // the informative feature dominates the noise feature
    assert(math.abs(m.weights(0)) > 5 * math.abs(m.weights(1)))
  }

  test("training loss decreases monotonically") {
    val m = Classifier.train(toy, Seq("x", "noise"), "label",
      iters = 40, lr = 0.5)
    m.losses.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(1) <= p(0) + 1e-12)
    }
    assert(m.losses.head > m.losses.last)
  }

  test("training is deterministic") {
    val a = Classifier.train(toy, Seq("x", "noise"), "label", iters = 10)
    val b = Classifier.train(toy, Seq("x", "noise"), "label", iters = 10)
    assert(a.weights.toSeq === b.weights.toSeq)
    assert(a.bias === b.bias)
    assert(a.losses === b.losses)
  }

  test("constant features get weight ~0, not a division blowup") {
    val df = toy.withColumn("const", lit(7.0))
    val m = Classifier.train(df, Seq("x", "const"), "label", iters = 20)
    assert(m.weights(1) === 0.0)
  }

  test("null features impute to the mean at scoring time") {
    val m = Classifier.train(toy, Seq("x", "noise"), "label", iters = 20)
    val scored = Classifier.score(
      Seq((java.lang.Double.valueOf(3.0), java.lang.Double.valueOf(1.0)),
        (null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(1.0)))
        .toDF("x", "noise"), m)
    val rows = scored.select("score").as[Double].collect()
    assert(rows.length === 2 && rows.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("model round-trips through parquet bit-exact") {
    val m = Classifier.train(toy, Seq("x", "noise"), "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-lr").toString
    Classifier.modelToDf(spark, m).write.mode("overwrite")
      .parquet(s"$dir/model")
    val m2 = Classifier.modelFromDf(spark.read.parquet(s"$dir/model"))
    assert(m2.featureCols === m.featureCols)
    assert(m2.means.toSeq === m.means.toSeq)
    assert(m2.stds.toSeq === m.stds.toSeq)
    assert(m2.weights.toSeq === m.weights.toSeq)
    assert(m2.bias === m.bias)
    assert(m2.losses === m.losses)
    // and the reloaded model scores identically (raw doubles)
    val a = Classifier.score(toy, m).select("score").as[Double]
      .collect().toSeq
    val b = Classifier.score(toy, m2).select("score").as[Double]
      .collect().toSeq
    assert(a === b)
  }
}
