package graft.ml

/** Nonnegative least squares over a bounded normal-equations system
  * (reference mllib/src/main/scala/org/apache/spark/mllib/optimization/
  * NNLS.scala:1 — the Polyak-projected-CG solver that ALS's nonnegative
  * mode hands its dim×dim Gramians to, mllib/recommendation/
  * ALS.scala:78-79,154):
  *
  *   minimize  ½·xᵀAx − bᵀx   subject to  x ≥ 0,   A symmetric PSD.
  *
  * Re-expressed as cyclic coordinate descent with exact clamped
  * per-coordinate minimization (the standard NNLS-CD kernel; for a PSD
  * system each coordinate step solves min over x_j ≥ 0 holding the rest
  * fixed in closed form: x_j ← max(0, ρ_j / A_jj)). The delta from the
  * reference's projected CG is deliberate: CD is branch-free,
  * allocation-free, bit-deterministic, and — the property the
  * nonnegative-ALS monotone certificate rides on — every coordinate
  * step is an exact constrained minimization, so the objective is
  * PROVABLY non-increasing from the warm start `x0`.
  *
  * Cost is O(d²) per sweep with O(d) extra memory — the per-key bounded
  * kernel shape ([[graft.operators.Recommender.alsFactors]] calls it
  * once per key per half-round inside mapGroups; nothing here scales
  * with corpus size).
  */
object NNLS {

  /** Solve min ½xᵀAx − bᵀx, x ≥ 0.
    *
    * @param a  dense symmetric PSD matrix (row-major d×d); a
    *           non-positive diagonal entry pins that coordinate at 0
    * @param b  right-hand side (length d)
    * @param x0 optional warm start; negative entries are clamped to 0
    *           (identity for any previous NNLS output). null → start
    *           from the origin
    * @param sweeps max full coordinate sweeps; iteration stops early at
    *           the deterministic fixed point (no coordinate moved more
    *           than `tol` relative)
    */
  def solve(a: Array[Array[Double]], b: Array[Double],
            x0: Array[Double] = null, sweeps: Int = 200,
            tol: Double = 1e-14): Array[Double] = {
    val n = b.length
    require(a.length == n && a.forall(_.length == n), "A must be d×d")
    val x =
      if (x0 == null) new Array[Double](n)
      else Array.tabulate(n)(j => math.max(0.0, x0(j)))
    var s = 0
    var moved = true
    while (s < sweeps && moved) {
      moved = false
      var j = 0
      while (j < n) {
        val ajj = a(j)(j)
        var rho = b(j)
        var k = 0
        while (k < n) { if (k != j) rho -= a(j)(k) * x(k); k += 1 }
        val nx = if (ajj > 0.0) math.max(0.0, rho / ajj) else 0.0
        if (math.abs(nx - x(j)) > tol * math.max(1.0, math.abs(x(j)))) moved = true
        x(j) = nx
        j += 1
      }
      s += 1
    }
    x
  }
}
