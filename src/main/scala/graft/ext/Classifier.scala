package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame}

/** Trainable logistic-regression quality classifier — the engine-side
  * analog of fastText / FineWeb-Edu-style model-based filtering: a
  * small dense feature vector per document (e.g. the
  * [[TextStats.stats]] columns), a corpus-wide gradient pass per step,
  * a driver-sized weight vector out, scoring as one codegen'd select.
  *
  * Deterministic end-to-end: zero init, fixed learning rate and
  * iteration count, standardization from exact corpus moments — two
  * trainings on the same frame produce bit-identical weights, which is
  * what lets the driver query gate on its metrics.
  *
  * Scale shape (the reason this is written on aggregations, not MLlib
  * RDDs): training materializes the standardized (label, features)
  * projection ONCE and runs `iters` whole-stage-codegen aggregations
  * over it; each step's shuffle is the map-side-combined partials of
  * d+2 doubles per partition, and the driver receives a single d+2
  * vector — at 100 TB the per-step cost is one columnar scan of the
  * cached projection, there is no per-row UDF, no Python, no vector
  * object allocation anywhere. Scoring folds the weights in as
  * literals: a plain arithmetic Column any plan can fuse.
  */
object Classifier {

  /** Fitted model: standardization moments + weights over
    * `featureCols` (in order) + bias, with the per-iteration mean
    * training losses (monotonicity is the convergence gate).
    */
  final case class LogRegModel(
      featureCols: Seq[String],
      means: Array[Double],
      stds: Array[Double],
      weights: Array[Double],
      bias: Double,
      losses: Seq[Double]) {
    require(featureCols.nonEmpty &&
      featureCols.length == means.length &&
      featureCols.length == stds.length &&
      featureCols.length == weights.length)
  }

  /** The (standardized) decision margin w·x + b as a Column. NULL
    * features impute to the feature mean (margin contribution 0) — a
    * scoring pass must not drop rows the feature extractor nulled.
    */
  private def marginExpr(m: LogRegModel): Column =
    m.featureCols.zipWithIndex.map { case (c, i) =>
      ((coalesce(col(c).cast(DoubleType), lit(m.means(i))) -
        lit(m.means(i))) / lit(m.stds(i))) * lit(m.weights(i))
    }.reduce(_ + _) + lit(m.bias)

  /** σ(w·x + b) in [0,1] — the score column scoring attaches. */
  def scoreExpr(m: LogRegModel): Column =
    lit(1.0) / (lit(1.0) + exp(-marginExpr(m)))

  /** Score `df` with a fitted model (adds `scoreCol`). */
  def score(df: DataFrame, m: LogRegModel,
      scoreCol: String = "score"): DataFrame =
    df.withColumn(scoreCol, scoreExpr(m))

  /** Batch-gradient-descent training. `labelCol` must be 0.0/1.0.
    * Features standardize to zero-mean unit-variance from exact corpus
    * moments (constant features get weight 0 via a variance floor
    * rather than a divide-by-zero).
    */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int = 30, lr: Double = 0.5): LogRegModel = {
    require(iters > 0 && lr > 0)
    val momentAggs = featureCols.flatMap(c => Seq(
      avg(col(c).cast(DoubleType)).as(s"m_$c"),
      stddev_pop(col(c).cast(DoubleType)).as(s"s_$c")))
    val mr = df.agg(momentAggs.head, momentAggs.tail: _*).head()
    val means = featureCols.indices
      .map(i => Option(mr.getAs[Any](2 * i))
        .fold(0.0)(_.asInstanceOf[Double])).toArray
    val stds = featureCols.indices
      .map(i => math.max(Option(mr.getAs[Any](2 * i + 1))
        .fold(0.0)(_.asInstanceOf[Double]), 1e-9)).toArray

    // one narrow cached projection feeds every gradient step
    val proj = df.select(
      (col(labelCol).cast(DoubleType).as("_y") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          ((coalesce(col(c).cast(DoubleType), lit(means(i))) -
            lit(means(i))) / lit(stds(i))).as(s"_x$i")
        }): _*).persist()
    try {
      val n = proj.count().toDouble
      require(n > 0, "empty training frame")
      var w = Array.fill(featureCols.length)(0.0)
      var b = 0.0
      val losses = Seq.newBuilder[Double]
      (1 to iters).foreach { _ =>
        val margin = featureCols.indices
          .map(i => col(s"_x$i") * lit(w(i)))
          .reduce(_ + _) + lit(b)
        val p = lit(1.0) / (lit(1.0) + exp(-margin))
        val err = p - col("_y")
        // overflow-stable logistic loss: max(m,0) − y·m + log1p(e^−|m|)
        val loss = greatest(margin, lit(0.0)) - col("_y") * margin +
          log1p(exp(-abs(margin)))
        val aggs = featureCols.indices
          .map(i => sum(err * col(s"_x$i")).as(s"g$i")) ++
          Seq(sum(err).as("gb"), sum(loss).as("l"))
        val r = proj.agg(aggs.head, aggs.tail: _*).head()
        w = featureCols.indices
          .map(i => w(i) - lr * r.getDouble(i) / n).toArray
        b = b - lr * r.getDouble(featureCols.length) / n
        losses += r.getDouble(featureCols.length + 1) / n
      }
      LogRegModel(featureCols, means, stds, w, b, losses.result())
    } finally proj.unpersist(blocking = false)
  }

  /** Model persistence (the [[Bpe.mergesToDf]] pattern): one row per
    * feature carrying its standardization moments and weight, plus the
    * scalar bias/losses replicated per row — parquet round-trips
    * doubles bit-exact, so a reloaded model scores identically
    * (train once, score many — the deployment surface for gating a
    * corpus on a previously fitted filter). */
  def modelToDf(spark: org.apache.spark.sql.SparkSession,
      m: LogRegModel): DataFrame = {
    import spark.implicits._
    m.featureCols.indices.map { i =>
      (i, m.featureCols(i), m.means(i), m.stds(i), m.weights(i),
        m.bias, m.losses)
    }.toDF("idx", "feature", "mean", "std", "weight", "bias", "losses")
  }

  /** Reload a model persisted via [[modelToDf]] (feature order
    * restored by idx; the collect is feature-count-sized — metadata,
    * not data). */
  def modelFromDf(df: DataFrame): LogRegModel = {
    val rows = df.select("idx", "feature", "mean", "std", "weight",
        "bias", "losses")
      .orderBy("idx").collect().toSeq
    require(rows.nonEmpty, "empty model frame")
    LogRegModel(
      rows.map(_.getString(1)),
      rows.map(_.getDouble(2)).toArray,
      rows.map(_.getDouble(3)).toArray,
      rows.map(_.getDouble(4)).toArray,
      rows.head.getDouble(5),
      rows.head.getSeq[Double](6))
  }
}
