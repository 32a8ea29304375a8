package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA: one mergeable-moment pass over the corpus
  * (functions.GramianAgg — constant 1+d+d² buffer, map-side
  * combined), then O(d²) eigen work on the DRIVER via power iteration
  * with deflation. The corpus is never touched again after the moment
  * pass; projecting is an ordinary column expression. This is the
  * 100 TB decomposition: d is small (embedding width), n is huge, so
  * everything O(n) is one aggregate and everything per-component is
  * driver-side arithmetic on a d×d matrix.
  *
  * Deterministic by construction: fixed init (e_argmax-variance),
  * fixed iteration count, sign normalized so the largest-|entry|
  * coordinate is positive. (Float merge order across partitions can
  * perturb the last ulp of the moments; PCA consumers gate on
  * variance/orthogonality properties, not bit equality.)
  */
object Pca {

  /** (mean, components): top-`k` unit principal axes of the vectors in
    * column `vCol` (array<double>, width d) of `df`. */
  def fit(df: DataFrame, vCol: String, d: Int, k: Int,
      iters: Int = 100): (Array[Double], Array[Array[Double]]) = {
    require(k <= d, s"cannot extract $k orthonormal components in $d dims")
    val m = df.agg(graft.functions.Sketches.gramian(col(vCol), d).as("g"))
      .head().getSeq[Double](0).toArray
    val n = m(0)
    require(n > 1, "PCA needs more than one vector")
    val mean = Array.tabulate(d)(i => m(1 + i) / n)
    // covariance C = ΣxxT/n − μμT. LIMITATION: the single-pass moment
    // form cancels catastrophically when ||μ||² >> variance (vectors
    // offset far from the origin) — fine for the near-zero-mean
    // hashing embeddings this serves; for large-mean corpora, run a
    // mean-only first pass and aggregate the gramian of (x − μ̂), or
    // have the caller pre-shift.
    val c = Array.tabulate(d, d)((i, j) => m(1 + d + i * d + j) / n - mean(i) * mean(j))
    val comps = new Array[Array[Double]](k)
    var ki = 0
    while (ki < k) {
      comps(ki) = powerIterate(c, comps.take(ki), iters)
      deflate(c, comps(ki))
      ki += 1
    }
    (mean, comps)
  }

  /** Power iteration with per-step Gram-Schmidt against the already-
    * found components: deflation alone leaves an O(convergence-error)
    * residue of earlier axes in later ones when the eigengap is small
    * (near-random corpora); re-projecting every step pins
    * orthogonality at machine precision regardless of gap. */
  private def powerIterate(c: Array[Array[Double]], prev: Array[Array[Double]],
      iters: Int): Array[Double] = {
    val d = c.length
    // deterministic init: the axis with the largest diagonal (variance)
    var best = 0
    var i = 1
    while (i < d) { if (c(i)(i) > c(best)(best)) best = i; i += 1 }
    var v = Array.tabulate(d)(j => if (j == best) 1.0 else 0.0)
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var r = 0
      while (r < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += c(r)(j) * v(j); j += 1 }
        w(r) = acc
        r += 1
      }
      projectOut(w, prev)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = if (nrm < 1e-12) v else w.map(_ / nrm)
      it += 1
    }
    // Rank-deficient input: the deflated matrix can annihilate the
    // iterate (every Cv step lands in span(prev)), leaving v at its
    // un-orthogonalized init — which would DUPLICATE an earlier
    // component. Re-orthogonalize the final v against prev; if
    // nothing survives, fall back to the first basis axis with a
    // component outside span(prev) (one always exists while
    // |prev| < d), so the returned set is orthonormal even when the
    // data has fewer directions than requested components.
    v = orthonormalize(v, prev).getOrElse {
      (0 until d).iterator
        .flatMap(j => orthonormalize(
          Array.tabulate(d)(x => if (x == j) 1.0 else 0.0), prev))
        .next()
    }
    // sign convention: largest-magnitude entry positive
    var am = 0
    i = 1
    while (i < d) { if (math.abs(v(i)) > math.abs(v(am))) am = i; i += 1 }
    if (v(am) < 0) v.map(-_) else v
  }

  /** In place: w ← w − Σ_p (p·w) p — the one Gram-Schmidt kernel, so
    * the in-loop projection and the final orthonormalization cannot
    * drift apart numerically. */
  private def projectOut(w: Array[Double], prev: Array[Array[Double]]): Unit = {
    val d = w.length
    prev.foreach { p =>
      var pw = 0.0
      var j = 0
      while (j < d) { pw += p(j) * w(j); j += 1 }
      j = 0
      while (j < d) { w(j) -= pw * p(j); j += 1 }
    }
  }

  /** Gram-Schmidt `v` against `prev` and normalize; None if v lies in
    * span(prev) (nothing of it survives). */
  private def orthonormalize(v0: Array[Double],
      prev: Array[Array[Double]]): Option[Array[Double]] = {
    val w = v0.clone()
    projectOut(w, prev)
    val nrm = math.sqrt(w.map(x => x * x).sum)
    if (nrm < 1e-12) None else Some(w.map(_ / nrm))
  }

  /** C ← C − λ vvT with λ = vTCv (the component's eigenvalue). */
  private def deflate(c: Array[Array[Double]], v: Array[Double]): Unit = {
    val d = c.length
    val cv = Array.tabulate(d) { r =>
      var acc = 0.0; var j = 0
      while (j < d) { acc += c(r)(j) * v(j); j += 1 }
      acc
    }
    var lambda = 0.0
    var i = 0
    while (i < d) { lambda += v(i) * cv(i); i += 1 }
    i = 0
    while (i < d) {
      var j = 0
      while (j < d) { c(i)(j) -= lambda * v(i) * v(j); j += 1 }
      i += 1
    }
  }
}
