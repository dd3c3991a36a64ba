package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Full-covariance multivariate Gaussian density (reference mllib/src/
  * main/scala/org/apache/spark/mllib/stat/distribution/
  * MultivariateGaussian.scala:1), re-expressed as a pure COLUMN
  * function: the O(d²) inverse and log-determinant are computed once on
  * the driver (d is model-sized, bounded), embedded as plan literals,
  * and the per-row logpdf is a codegen'd nested fold — map-only over
  * any number of rows, the d08/gm01 "stats as plan literals" class.
  *
  * logpdf(x) = −½·(x−μ)ᵀΣ⁻¹(x−μ) − ½·(d·ln 2π + ln det Σ)
  *
  * Documented delta vs the reference: the reference tolerates singular
  * Σ through an SVD pseudo-inverse; here Σ must be symmetric positive
  * definite (Gaussian elimination with partial pivoting) — the
  * well-posed case every consumer in this library produces. A singular
  * Σ fails loudly at construction, not with silent ∞ densities.
  */
final case class MultivariateGaussian(mu: Seq[Double], sigma: Seq[Seq[Double]]) {
  private val d = mu.length
  require(sigma.length == d && sigma.forall(_.length == d),
    s"sigma must be ${d}x$d")
  require(sigma.indices.forall(i => sigma.indices.forall(j =>
    math.abs(sigma(i)(j) - sigma(j)(i)) < 1e-12)), "sigma must be symmetric")

  /** (Σ⁻¹, ln det Σ) by in-place Gaussian elimination with partial
    * pivoting on [Σ | I]; det accumulates from the pivots. */
  private val (inv, logDet): (Array[Array[Double]], Double) = {
    val a = Array.tabulate(d, d)((i, j) => sigma(i)(j))
    val e = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var det = 1.0
    for (c <- 0 until d) {
      val p = (c until d).maxBy(r => math.abs(a(r)(c)))
      require(math.abs(a(p)(c)) > 1e-12,
        s"sigma is singular at column $c (pivot ${a(p)(c)})")
      if (p != c) { val t = a(p); a(p) = a(c); a(c) = t
        val t2 = e(p); e(p) = e(c); e(c) = t2; det = -det }
      det *= a(c)(c)
      val pv = a(c)(c)
      for (j <- 0 until d) { a(c)(j) /= pv; e(c)(j) /= pv }
      for (r <- 0 until d if r != c) {
        val f = a(r)(c)
        if (f != 0.0)
          for (j <- 0 until d) { a(r)(j) -= f * a(c)(j); e(r)(j) -= f * e(c)(j) }
      }
    }
    require(det > 0, s"sigma is not positive definite (det $det)")
    (e, math.log(det))
  }

  private val logNorm = -0.5 * (d * math.log(2.0 * math.Pi) + logDet)

  /** The centered vector x − μ as a column expression — stage THIS as
    * an attribute (one projection) before feeding [[logpdfFromCentered]]
    * when the density is consumed more than once per row: Column
    * composition inlines the producer, so an unstaged u re-evaluates
    * its zip_with at every element_at of the d² quadratic-form fold. */
  def centered(x: Column): Column =
    zip_with(x, typedlit(mu), (xi, mi) => xi.cast("double") - mi)

  /** Log density from an ALREADY-CENTERED `array<double>` column
    * (ideally an attribute, see [[centered]]): the d² fold then reads
    * each element in O(1) instead of re-deriving the centering. */
  def logpdfFromCentered(u: Column): Column = {
    val invL = typedlit(inv.map(_.toSeq).toSeq)
    val quad = aggregate(sequence(lit(0), lit(d - 1)), lit(0.0), (acc, i) =>
      acc + element_at(u, i + 1) *
        aggregate(sequence(lit(0), lit(d - 1)), lit(0.0), (a2, j) =>
          a2 + element_at(element_at(invL, i + 1), j + 1) * element_at(u, j + 1)))
    lit(logNorm) - lit(0.5) * quad
  }

  /** Per-row log density of an `array<double>` (or float, cast) column —
    * a bounded nested fold over plan literals, no shuffle, no UDF.
    * Self-contained convenience form: the centering is INLINED into
    * every element read of the fold (O(d³) per row); per-row hot paths
    * should stage [[centered]] and call [[logpdfFromCentered]]. */
  def logpdf(x: Column): Column = logpdfFromCentered(centered(x))

  def pdf(x: Column): Column = exp(logpdf(x))
}
