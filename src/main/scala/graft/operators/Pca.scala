package graft.operators

/** Principal components for embedding columns — the dimensionality
  * reduction / whitening step a vector pipeline runs before indexing
  * (smaller vectors -> cheaper ANN) or for drift dashboards.
  *
  * Division of labor mirrors the other trained operators (Ivf, Pq): the
  * EIGENPROBLEM is solved on the driver over a bounded sample's d×d
  * covariance (d = embedding dim, so the driver work is O(d²·iters) —
  * independent of corpus size), and the corpus-sized PROJECTION pass is a
  * linear codegen'd scan (one dot product per component against literal
  * eigenvectors). Everything is deterministic: basis-vector init, fixed
  * iteration count, sign canonicalized by the largest coordinate.
  */
object Pca {

  /** Sample mean and covariance (population, 1/n) as plain doubles. */
  def meanCov(sample: Array[Array[Float]]): (Array[Double], Array[Array[Double]]) = {
    val n = sample.length
    require(n > 1, "PCA needs at least 2 sample vectors")
    val d = sample.head.length
    val mean = new Array[Double](d)
    sample.foreach { v => var j = 0; while (j < d) { mean(j) += v(j); j += 1 } }
    (0 until d).foreach(j => mean(j) /= n)
    val cov = Array.fill(d)(new Array[Double](d))
    sample.foreach { v =>
      var i = 0
      while (i < d) {
        val di = v(i) - mean(i)
        var j = i
        while (j < d) { cov(i)(j) += di * (v(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { cov(i)(j) /= n; cov(j)(i) = cov(i)(j); j += 1 }
      i += 1
    }
    (mean, cov)
  }

  /** Top-r eigenpairs of a symmetric PSD matrix by power iteration with
    * deflation (Gram–Schmidt against already-found components every step —
    * numerically the orthogonal-iteration variant). Deterministic: starts
    * from the basis vector of the largest remaining diagonal entry, runs a
    * fixed `iters`, flips sign so the largest-|coordinate| entry is
    * positive. Returns (eigenvalues desc, unit eigenvectors). */
  def topComponents(cov: Array[Array[Double]], r: Int, iters: Int = 200)
      : (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val vecs = new Array[Array[Double]](r)
    val vals = new Array[Double](r)
    def matVec(v: Array[Double]): Array[Double] = {
      val out = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0; var j = 0
        while (j < d) { s += cov(i)(j) * v(j); j += 1 }
        out(i) = s; i += 1
      }
      out
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    (0 until r).foreach { k =>
      // deterministic init: basis vector of the largest diagonal entry
      // after removing variance already explained by found components
      val residDiag = (0 until d).map { i =>
        cov(i)(i) - (0 until k).map(p => vals(p) * vecs(p)(i) * vecs(p)(i)).sum
      }
      var v = Array.tabulate(d)(i => if (i == residDiag.indexOf(residDiag.max)) 1.0 else 0.0)
      (0 until iters).foreach { _ =>
        var w = matVec(v)
        // deflate: project out previously found components
        (0 until k).foreach { p =>
          val c = dot(w, vecs(p))
          var i = 0
          while (i < d) { w(i) -= c * vecs(p)(i); i += 1 }
        }
        val norm = math.sqrt(dot(w, w))
        v = if (norm > 1e-12) w.map(_ / norm) else v
      }
      // canonical sign: largest-|coordinate| entry positive
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v = v.map(-_)
      vecs(k) = v
      vals(k) = dot(v, matVec(v))
    }
    (vals, vecs)
  }
}
