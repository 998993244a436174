package graft

import graft.ext.Pca
import org.apache.spark.sql.functions._

import scala.util.Random

/** PCA unit tests: the Jacobi eigensolve against algebraic invariants,
  * axis recovery on constructed anisotropic data, the distributed
  * transform against a driver-side replica, determinism.
  */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def matVec(a: Array[Array[Double]], x: Array[Double]) =
    a.map(row => row.indices.foldLeft(0.0)((s, j) => s + row(j) * x(j)))

  test("jacobiEigen: A·v = λ·v and VᵀV = I on a random symmetric matrix") {
    val rnd = new Random(7)
    val d = 12
    val a = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val v = rnd.nextGaussian(); a(i)(j) = v; a(j)(i) = v
    }
    val (eigs, vmat) = Pca.jacobiEigen(a)
    for (k <- 0 until d) {
      val v = vmat.map(_(k))
      val av = matVec(a, v)
      val resid = av.indices.map(i => math.abs(av(i) - eigs(k) * v(i))).max
      assert(resid < 1e-9, s"eigenpair $k residual $resid")
    }
    for (k <- 0 until d; l <- k until d) {
      val dot = (0 until d).foldLeft(0.0)((s, i) => s + vmat(i)(k) * vmat(i)(l))
      assert(math.abs(dot - (if (k == l) 1.0 else 0.0)) < 1e-10)
    }
    // trace is preserved by similarity transforms
    val trace = (0 until d).map(i => a(i)(i)).sum
    assert(math.abs(eigs.sum - trace) < 1e-9)
  }

  test("fit recovers the stretched axis of constructed anisotropic data") {
    val rnd = new Random(11)
    val dim = 16
    // x = t·axis + small isotropic noise; the top component must align
    val axis = Array.tabulate(dim)(j => if (j == 3) 0.8 else if (j == 9) 0.6 else 0.0)
    val rows = Seq.tabulate(400) { i =>
      val t = rnd.nextGaussian() * 10.0
      (i.toLong, Array.tabulate(dim)(j =>
        (t * axis(j) + rnd.nextGaussian() * 0.1).toFloat))
    }
    val df = rows.toDF("id", "v")
    val m = Pca.fit(df, "v", dim, p = 2)
    val c0 = m.components(0)
    val cos = math.abs(c0.indices.foldLeft(0.0)((s, j) => s + c0(j) * axis(j)))
    assert(cos > 0.999, s"top component misaligned, |cos|=$cos")
    assert(m.eigenvalues(0) > 50 * m.eigenvalues(1),
      "stretched axis should dominate the spectrum")
  }

  test("transform == driver-side (x−μ)ᵀWᵀ replica on real embeddings") {
    val m = Pca.fit(emb, "embedding", 64, p = 4)
    val got = Pca.transform(emb.limit(30), "embedding", m)
      .select($"vec_id", $"pc").as[(Long, Seq[Double])].collect().toMap
    val raw = emb.limit(30).select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    raw.foreach { case (id, v) =>
      val expect = m.components.map { w =>
        w.indices.foldLeft(0.0)((s, j) => s + w(j) * v(j)) -
          w.indices.foldLeft(0.0)((s, j) => s + w(j) * m.mean(j))
      }
      got(id).zip(expect).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"id=$id") }
    }
  }

  test("whiten: every projected coordinate has unit variance") {
    val m = Pca.fit(emb, "embedding", 64, p = 6)
    val stats = Pca.transform(emb, "embedding", m, whiten = true)
      .select(posexplode_outer($"pc").as(Seq("r", "x")))
      .groupBy($"r")
      .agg(avg($"x").as("mu"), avg($"x" * $"x").as("m2"))
      .as[(Int, Double, Double)].collect()
    assert(stats.length === 6)
    stats.foreach { case (r, mu, m2) =>
      assert(math.abs(mu) < 1e-9, s"component $r not centered")
      assert(math.abs((m2 - mu * mu) - 1.0) < 1e-6,
        s"component $r variance ${m2 - mu * mu}")
    }
  }

  test("fit is deterministic and eigenvalues are sorted nonnegative") {
    val m1 = Pca.fit(emb, "embedding", 64, p = 8)
    val m2 = Pca.fit(emb, "embedding", 64, p = 8)
    assert(m1.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq ===
      m2.components.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
    assert(m1.eigenvalues.forall(_ >= -1e-9))
    assert(m1.eigenvalues.sum <= m1.totalVariance + 1e-9)
  }
}
