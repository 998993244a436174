package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Element-wise mean of float vectors — a typed [[Aggregator]] (the
  * user-facing UDAF extension point): distributed partial sums merge
  * associatively, so Spark runs it with map-side partial aggregation
  * like any built-in agg. Used to train IVF centroids
  * ([[graft.ext.Similarity.trainCentroids]]) — each k-means iteration
  * is one `groupBy(list).agg(vectorMean)`.
  */
final case class VectorMeanBuf(var sums: Array[Double], var n: Long)

object VectorMean
    extends Aggregator[Array[Float], VectorMeanBuf, Array[Float]] {
  type Buf = VectorMeanBuf

  override def zero: Buf = VectorMeanBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: Buf, v: Array[Float]): Buf = {
    if (b.sums.isEmpty) b.sums = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { b.sums(i) += v(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      a.n += b.n
      a
    }
  }

  override def finish(b: Buf): Array[Float] =
    if (b.n == 0) Array.emptyFloatArray
    else b.sums.map(s => (s / b.n).toFloat)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}
