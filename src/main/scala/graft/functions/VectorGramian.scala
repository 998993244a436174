package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One-pass second-moment statistics of a float-vector column — the
  * distributed half of PCA ([[graft.ext.Pca]]): per-element sums and
  * the UPPER-TRIANGULAR packed gramian Σ xᵢxⱼ (d(d+1)/2 doubles, not
  * d² — the matrix is symmetric, so the packed form nearly halves the
  * shuffle bytes of every partial buffer). A typed [[Aggregator]] like
  * [[VectorMean]]: partials merge associatively, Spark runs it with
  * map-side combine, and ONE reduced buffer reaches the driver
  * regardless of corpus size — at 100 TB the covariance of a 64-d
  * embedding column costs a single scan plus a 17 KB result.
  */
final case class GramBuf(var n: Long, var sums: Array[Double],
    var gram: Array[Double])

final case class GramStats(n: Long, sums: Array[Double],
    gram: Array[Double])

object VectorGramian
    extends Aggregator[Array[Float], GramBuf, GramStats] {

  override def zero: GramBuf =
    GramBuf(0L, Array.emptyDoubleArray, Array.emptyDoubleArray)

  override def reduce(b: GramBuf, v: Array[Float]): GramBuf = {
    val d = v.length
    if (b.sums.isEmpty) {
      b.sums = new Array[Double](d)
      b.gram = new Array[Double](d * (d + 1) / 2)
    }
    var i = 0
    var idx = 0
    while (i < d) {
      val vi = v(i).toDouble
      b.sums(i) += vi
      var j = i
      while (j < d) {
        b.gram(idx) += vi * v(j)
        j += 1
        idx += 1
      }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      i = 0
      while (i < a.gram.length) { a.gram(i) += b.gram(i); i += 1 }
      a.n += b.n
      a
    }
  }

  override def finish(b: GramBuf): GramStats = GramStats(b.n, b.sums, b.gram)

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[GramStats] = Encoders.product[GramStats]
}
