package graft.ext

import graft.functions.{GramStats, VectorFunctions, VectorGramian}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Principal-component analysis over an embedding column — the LEARNED
  * dimensionality reduction next to the data-oblivious
  * [[Similarity.randomProject]] (SemDeDup-style pipelines PCA-reduce
  * embeddings before clustering; whitening/centering is also the
  * standard pre-step for sign-LSH on anisotropic corpora).
  *
  * Decomposed for Spark's execution model the way MLlib's RowMatrix
  * PCA is, but with zero MLlib surface:
  *
  *   1. DISTRIBUTED, one pass: per-element sums + the packed
  *      upper-triangular gramian via the [[VectorGramian]] typed
  *      Aggregator — map-side combined, a single d(d+2)-double buffer
  *      reaches the driver no matter the corpus size (17 KB at d=64;
  *      a 100 TB scan produces the same 17 KB).
  *   2. DRIVER, metadata-sized: covariance from the moments, then a
  *      cyclic Jacobi eigensolve of the symmetric d×d matrix —
  *      deterministic (no random init, unlike power iteration), exact
  *      to machine precision, microseconds at d=64.
  *   3. DISTRIBUTED transform: `(x − μ)ᵀWᵀ` as the codegen'd affine
  *      kernel `xᵀWᵀ − (μᵀWᵀ)` ([[VectorFunctions.matVecBiasFD]]) with
  *      W and the precomputed bias riding the plan as literals —
  *      map-only, zero shuffle, same shape as the JL projection.
  *
  * Cross-engine note: an eigendecomposition is not expressible in the
  * DuckDB oracle, so the driver query (`sim_pca`) verifies INVARIANTS
  * in-query — orthonormal components, sorted nonnegative eigenvalues,
  * top-p variance share ≥ uniform, and Var(proj_r) = λ_r recomputed
  * over the actual projected column (which pins the distributed
  * transform against the driver-side math) — with the corpus size
  * value-oracled. Same posture as the Lloyd-centroid and sketch
  * surfaces (SparkEntry.rowsOnlyWaivers precedent, here without even
  * needing a waiver: the emitted row is deterministic).
  */
object Pca {

  /** `components` are ROWS (each a d-vector), eigenvalue-descending;
    * `eigenvalues` are the top-p variances; `totalVariance` is the
    * trace of the covariance (sum of ALL d eigenvalues).
    */
  case class Model(dim: Int, mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double],
      totalVariance: Double)

  /** Fit a p-component model. One distributed pass + a driver-side
    * d×d eigensolve.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, p: Int): Model = {
    require(p > 0 && p <= dim, s"pca: need 0 < p=$p <= dim=$dim")
    val spark = df.sparkSession
    val gram = udaf(VectorGramian,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    val st = df.select(gram(col(vecCol)).as("g"))
      .selectExpr("g.n", "g.sums", "g.gram")
      .as[GramStats](org.apache.spark.sql.Encoders.product[GramStats])
      .head()
    require(st.n > 1, s"pca: need more than one vector, got ${st.n}")
    require(st.sums.length == dim,
      s"pca: declared dim=$dim but vectors have ${st.sums.length}")
    val n = st.n.toDouble
    val mean = st.sums.map(_ / n)
    // covariance from the raw moments: C = E[xxᵀ] − μμᵀ
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    var idx = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = st.gram(idx) / n - mean(i) * mean(j)
        c(i)(j) = v
        c(j)(i) = v
        j += 1
        idx += 1
      }
      i += 1
    }
    val trace = (0 until dim).map(k => c(k)(k)).sum
    val (eigs, vecs) = jacobiEigen(c)
    val order = eigs.indices.sortBy(k => -eigs(k)).take(p)
    Model(dim, mean,
      order.map(k => vecs.map(_(k))).toArray,
      order.map(eigs).toArray, trace)
  }

  /** Project onto the model's components: `outCol` = array<double> of
    * length p. Map-only; W and μᵀWᵀ are plan literals. With
    * `whiten = true` each component is scaled by 1/√λ so every output
    * coordinate has unit variance — the standard pre-step before
    * sign-LSH / k-means on anisotropic embeddings (dominant directions
    * stop dominating every hash bit). Components with λ ≤ 0 (numerical
    * zeros) are left unscaled rather than exploded.
    */
  def transform(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "pc", whiten: Boolean = false): DataFrame = {
    VectorFunctions.register(df.sparkSession)
    val comps =
      if (!whiten) model.components
      else model.components.zip(model.eigenvalues).map { case (w, lam) =>
        if (lam > 1e-12) w.map(_ / math.sqrt(lam)) else w
      }
    val flat = comps.flatten.toSeq
    val bias = comps
      .map(w => w.indices.foldLeft(0.0)((a, j) => a + w(j) * model.mean(j)))
      .toSeq
    df.withColumn(outCol,
      VectorFunctions.matVecBiasFD(col(vecCol), typedLit(flat),
        typedLit(bias)))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * deterministic, O(d³) per sweep, converges quadratically —
    * microseconds at embedding dims, and every eigenpair comes out
    * (the caller picks the top p). Returns (eigenvalues, V) with
    * eigenvectors as COLUMNS of V.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 100): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val frob = math.sqrt(a.map(_.map(x => x * x).sum).sum)
    val tol = 1e-14 * math.max(frob, 1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol * 1e-2) {
            val tau = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (tau >= 0) 1.0 / (tau + math.sqrt(1.0 + tau * tau))
              else 1.0 / (tau - math.sqrt(1.0 + tau * tau))
            val cc = 1.0 / math.sqrt(1.0 + t * t)
            val ss = t * cc
            var k = 0
            while (k < d) { // column rotation A := A·J
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = cc * akp - ss * akq
              a(k)(q) = ss * akp + cc * akq
              k += 1
            }
            k = 0
            while (k < d) { // row rotation A := Jᵀ·A
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = cc * apk - ss * aqk
              a(q)(k) = ss * apk + cc * aqk
              k += 1
            }
            k = 0
            while (k < d) { // accumulate V := V·J
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = cc * vkp - ss * vkq
              v(k)(q) = ss * vkp + cc * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { off += math.abs(a(i)(j)); j += 1 }
        i += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(k => a(k)(k)), v)
  }
}
