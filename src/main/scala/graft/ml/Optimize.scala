package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Standalone optimization surface (reference mllib/src/main/scala/org/
  * apache/spark/mllib/optimization/: LBFGS.scala:1,
  * GradientDescent.scala:1, Gradient.scala:1, Updater.scala:1): a
  * generic differentiable-objective contract a user can hand a custom
  * gradient, plus the reference's three Gradient families and its two
  * optimizers, re-expressed in the rg02 discipline — every function
  * evaluation is ONE partial-aggregated cluster pass whose result is a
  * bounded (d+1)-vector, the optimizer state lives driver-side as
  * O(m·d) doubles, and the current weights enter each pass as plan
  * LITERALS (codegen'd column arithmetic, no UDF, no per-row closure).
  *
  * Scale shape: rows never leave the cluster; an iteration's cost is
  * one scan of the checkpointed feature frame regardless of cluster
  * size, and the driver's curvature memory is 2m d-vectors — the same
  * placement as the reference's CostFun treeAggregate.
  *
  * Deltas from the reference, by design:
  *  - The reference's L-BFGS delegates the line search to Breeze's
  *    Strong-Wolfe implementation; here it is Armijo backtracking
  *    (sufficient-decrease, c₁ = 1e-4), which preserves global
  *    convergence on convex objectives, guarantees a non-increasing
  *    loss history, and keeps every probe a single bounded aggregate.
  *    The curvature condition s·y > 0 is enforced at update time
  *    instead (pairs failing it are skipped, the standard remedy).
  *  - GradientDescent runs FULL-batch (miniBatchFraction = 1.0, the
  *    deterministic exact form); the reference's sampled minibatch
  *    trades per-pass cost for gradient variance, which at d ≪ n
  *    buys nothing — one pass computes the exact gradient.
  */
object Optimize {

  /** One differentiable objective: `eval(w)` returns (loss, gradient),
    * both already including any regularization term. The contract the
    * optimizers drive — a caller with a custom gradient implements
    * exactly this (the reference's DiffFunction placement). */
  final case class Objective(dim: Int, eval: Array[Double] => (Double, Array[Double]))

  /** The reference Gradient family over a feature frame:
    * `kind` ∈ leastSquares | logistic | hinge (Gradient.scala:1's three
    * subclasses, identical per-row loss/gradient algebra; logistic and
    * hinge take labels in {0,1} and remap internally exactly as the
    * reference documents). `regParam` applies SquaredL2Updater's
    * convention (loss += λ/2·‖w‖², grad += λ·w); 0 = SimpleUpdater.
    *
    * The frame is checkpointed once; every `eval` is one
    * partial-aggregated pass with the weights folded in as literals. */
  def objective(data: DataFrame, xCol: Column, yCol: Column, d: Int,
                kind: String, regParam: Double = 0.0): Objective = {
    require(Seq("leastSquares", "logistic", "hinge").contains(kind),
      s"gradient kind '$kind' (supported: leastSquares, logistic, hinge)")
    val frame = data.select(xCol.as("x"), yCol.cast("double").as("y"))
      .localCheckpoint(false) // lazy: the count below materializes (r16)
    val n = frame.count().toDouble
    require(n > 0, "objective over an empty frame")
    Objective(d, w => {
      val margin = (0 until d).map(j => col("x")(j) * lit(w(j))).reduce(_ + _)
      val (lossC, coefC): (Column, Column) = kind match {
        case "leastSquares" =>
          // LeastSquaresGradient: loss (diff)²/2, gradient diff·x
          val diff = margin - col("y")
          (diff * diff / lit(2.0), diff)
        case "logistic" =>
          // LogisticGradient (binary): loss log1p(exp(margin)) − y·margin
          // in the sign-stable form, gradient (σ(margin) − y)·x
          val stable = when(margin > 0, margin + log1p(exp(-margin)))
            .otherwise(log1p(exp(margin)))
          (stable - col("y") * margin,
            lit(1.0) / (lit(1.0) + exp(-margin)) - col("y"))
        case "hinge" =>
          // HingeGradient: labels {0,1} → {−1,+1}, loss max(0, 1 − y·m),
          // subgradient −y·x inside the margin, 0 outside
          val yy = col("y") * 2.0 - 1.0
          (greatest(lit(0.0), lit(1.0) - yy * margin),
            when(yy * margin < 1.0, -yy).otherwise(lit(0.0)))
      }
      val row = frame.agg(sum(lossC).as("L"),
        (0 until d).map(j => sum(coefC * col("x")(j)).as(s"g$j")): _*).head
      val reg = 0.5 * regParam * w.map(v => v * v).sum
      val loss = row.getDouble(0) / n + reg
      val grad = Array.tabulate(d)(j => row.getDouble(j + 1) / n + regParam * w(j))
      (loss, grad)
    })
  }

  /** Least-squares objective from SUFFICIENT STATISTICS (guide §1.2's
    * "choose the distributed algorithm" step applied to opt01): the
    * least-squares loss and gradient are exact functions of the moment
    * matrix (XᵀX, Xᵀy, yᵀy, n) —
    *
    *   f(w) = (wᵀXᵀXw − 2·wᵀXᵀy + yᵀy) / 2n,   ∇f(w) = (XᵀXw − Xᵀy) / n
    *
    * — so ONE partial-aggregated cluster pass computes the (d²+d+2)/1
    * bounded statistics and every optimizer iteration (plus every
    * line-search probe) is pure driver arithmetic on d×d doubles.
    * [[objective]]'s generic one-pass-per-eval contract is the right
    * shape for non-quadratic losses (logistic, hinge); for the
    * quadratic family it does O(iterations) identical scans of a frame
    * whose information content is d² numbers. Same objective function,
    * same optimizer, ~1 data pass instead of ~100.
    *
    * Float caveat (why this is safe where it is used): moment-based and
    * row-based evaluation differ in summation order, so iterates drift
    * in ulps; opt01's published values are the closed-form decimal
    * coefficients and a 1e-6-band certificate, both far above ulp
    * scale. OptimizeSpec pins the agreement against [[objective]]. */
  def leastSquaresObjective(data: DataFrame, xCol: Column, yCol: Column,
                            d: Int): Objective = {
    val frame = data.select(xCol.as("x"), yCol.cast("double").as("y"))
    val upper = for { j <- 0 until d; k <- j until d } yield (j, k)
    val aggs =
      upper.map { case (j, k) => sum(col("x")(j) * col("x")(k)).as(s"m_${j}_$k") } ++
        (0 until d).map(j => sum(col("x")(j) * col("y")).as(s"b_$j")) :+
        sum(col("y") * col("y")).as("syy") :+
        count(lit(1)).cast("double").as("n")
    val row = frame.agg(aggs.head, aggs.tail: _*).head()
    // read n FIRST (count is 0, never null) so an empty or all-null-x
    // frame fails with the intended message instead of an NPE from
    // getDouble on the null sum cells (r16 advisor)
    val n = row.getDouble(upper.length + d + 1)
    require(n > 0 && !row.isNullAt(0),
      "objective over an empty (or all-null-feature) frame")
    val m = Array.ofDim[Double](d, d)
    upper.zipWithIndex.foreach { case ((j, k), i) =>
      m(j)(k) = row.getDouble(i); m(k)(j) = row.getDouble(i)
    }
    val b = Array.tabulate(d)(j => row.getDouble(upper.length + j))
    val syy = row.getDouble(upper.length + d)
    Objective(d, w => {
      var quad = 0.0; var lin = 0.0
      val grad = new Array[Double](d)
      var j = 0
      while (j < d) {
        var mw = 0.0
        var k = 0
        while (k < d) { mw += m(j)(k) * w(k); k += 1 }
        quad += w(j) * mw
        lin += w(j) * b(j)
        grad(j) = (mw - b(j)) / n
        j += 1
      }
      ((quad - 2.0 * lin + syy) / (2.0 * n), grad)
    })
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  private def axpy(alpha: Double, x: Array[Double], y: Array[Double]): Array[Double] =
    Array.tabulate(y.length)(i => y(i) + alpha * x(i))

  /** L-BFGS (LBFGS.runLBFGS parity): limited-memory two-loop recursion
    * over the last `m` curvature pairs, Armijo backtracking line search
    * (see the object doc for the documented Breeze delta), relative
    * loss-improvement convergence (`tol`, the reference's
    * convergenceTol placement). Each iteration costs one `eval` plus
    * one per rejected backtracking probe; driver state is 2m+1
    * d-vectors.
    *
    * @return (weights, loss history incl. the initial loss — provably
    *         non-increasing: Armijo only ever accepts a decrease) */
  def lbfgs(obj: Objective, init: Array[Double], maxIter: Int = 100,
            m: Int = 10, tol: Double = 1e-9): (Array[Double], Seq[Double]) = {
    require(m >= 1 && maxIter >= 1, s"bad lbfgs config m=$m maxIter=$maxIter")
    val d = obj.dim
    var w = init.clone()
    var (f, g) = obj.eval(w)
    val hist = scala.collection.mutable.ArrayBuffer(f)
    val S = scala.collection.mutable.ArrayDeque.empty[Array[Double]]
    val Y = scala.collection.mutable.ArrayDeque.empty[Array[Double]]
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      // two-loop recursion: r = H·g with implicit H from the (s, y) pairs
      val q = g.clone()
      val alphas = new Array[Double](S.length)
      var i = S.length - 1
      while (i >= 0) {
        val rho = 1.0 / dot(Y(i), S(i))
        alphas(i) = rho * dot(S(i), q)
        var j = 0; while (j < d) { q(j) -= alphas(i) * Y(i)(j); j += 1 }
        i -= 1
      }
      val gamma = if (S.nonEmpty)
        dot(S.last, Y.last) / dot(Y.last, Y.last) else 1.0
      var r = q.map(_ * gamma)
      i = 0
      while (i < S.length) {
        val rho = 1.0 / dot(Y(i), S(i))
        val beta = rho * dot(Y(i), r)
        r = axpy(alphas(i) - beta, S(i), r)
        i += 1
      }
      var dir = r.map(-_)
      var gd = dot(g, dir)
      if (!(gd < 0)) { dir = g.map(-_); gd = -dot(g, g) } // descent safeguard
      if (gd == 0.0) done = true // exact stationary point
      else {
        // Armijo backtracking: accept the first t with sufficient decrease
        var t = 1.0
        var accepted = false
        while (!accepted && t > 1e-20) {
          val wNew = axpy(t, dir, w)
          val (fNew, gNew) = obj.eval(wNew)
          if (fNew <= f + 1e-4 * t * gd) {
            val s = Array.tabulate(d)(j => wNew(j) - w(j))
            val y = Array.tabulate(d)(j => gNew(j) - g(j))
            if (dot(s, y) > 1e-12) { // curvature guard (Strong Wolfe's job)
              S += s; Y += y
              if (S.length > m) { S.removeHead(); Y.removeHead() }
            }
            done = math.abs(f - fNew) <= tol * math.max(math.abs(f), 1.0)
            w = wNew; f = fNew; g = gNew
            hist += f
            accepted = true
          } else t /= 2
        }
        if (!accepted) done = true // no descent at machine step: converged
      }
      iter += 1
    }
    (w, hist.toSeq)
  }

  /** Full-batch gradient descent (GradientDescent.runMiniBatchSGD with
    * miniBatchFraction = 1.0): the reference's SimpleUpdater step
    * w ← w − (stepSize/√t)·∇f. Returns (weights, loss history). */
  def gradientDescent(obj: Objective, init: Array[Double], stepSize: Double,
                      maxIter: Int): (Array[Double], Seq[Double]) = {
    var w = init.clone()
    val hist = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (t <- 1 to maxIter) {
      val (f, g) = obj.eval(w)
      hist += f
      val step = stepSize / math.sqrt(t.toDouble)
      w = axpy(-step, g, w)
    }
    hist += obj.eval(w)._1
    (w, hist.toSeq)
  }

  /** Full-batch PROXIMAL gradient descent with the reference L1Updater's
    * step (Updater.scala L1Updater: gradient step on the smooth part,
    * then per-coordinate soft-threshold w_j ← sign(w_j)·max(0, |w_j| −
    * λ·step_t), reg value λ·‖w‖₁). `obj` must be the UNregularized
    * smooth objective — the penalty lives in the updater, exactly the
    * reference's split. `penalize(j) = false` exempts a coordinate (the
    * usual unpenalized intercept; the reference penalizes every weight,
    * the default here).
    *
    * The soft threshold yields EXACT zeros — the sparsity the penalty
    * exists for — and each iteration stays one bounded cluster pass.
    *
    * @return (weights, history of the FULL objective f + λ·‖w_pen‖₁,
    *         evaluated at each iterate incl. the last) */
  def gradientDescentL1(obj: Objective, init: Array[Double], stepSize: Double,
                        maxIter: Int, l1Param: Double,
                        penalize: Int => Boolean = _ => true)
      : (Array[Double], Seq[Double]) = {
    require(l1Param >= 0, s"l1Param $l1Param")
    def soft(v: Double, t: Double): Double =
      if (v > t) v - t else if (v < -t) v + t else 0.0
    def l1(w: Array[Double]): Double =
      w.indices.collect { case j if penalize(j) => math.abs(w(j)) }.sum
    var w = init.clone()
    val hist = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (t <- 1 to maxIter) {
      val (f, g) = obj.eval(w)
      hist += f + l1Param * l1(w)
      val step = stepSize / math.sqrt(t.toDouble)
      val shrink = l1Param * step
      w = Array.tabulate(w.length) { j =>
        val v = w(j) - step * g(j)
        if (penalize(j)) soft(v, shrink) else v
      }
    }
    hist += obj.eval(w)._1 + l1Param * l1(w)
    (w, hist.toSeq)
  }

  /** Registered pass (r12): L-BFGS least squares of the scaled extended
    * price on [1, quantity, discount] — rg01's design matrix with λ = 0,
    * so the GLOBAL optimum has a closed form both engines derive
    * bit-identically (exact decimal moments + the det3 Cramer solve,
    * rg01's machinery verbatim). The entry emits those closed-form
    * coefficients (FULL value oracle) plus `lbfgs_at_optimum`: the
    * certificate that the L-BFGS path's final loss sits within
    * 1e-6·max(1,|L*|) of the closed-form optimum's loss (the run's
    * stopping tolerance is 1e-12, three orders tighter than the
    * certificate band, so the claim never races the stop rule) —
    * both losses
    * measured by the SAME objective pass, so the flag certifies the
    * optimizer, not the arithmetic. The iterate path itself is
    * engine-local float iteration (line-search branches), which is why
    * the certificate compares losses, not weights. */
  val opt01 = Q.sql(
    "opt01_lbfgs_ls",
    """WITH m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
      |    CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x1 * x1) AS DOUBLE) AS s11, CAST(sum(x1 * x2) AS DOUBLE) AS s12,
      |    CAST(sum(x2 * x2) AS DOUBLE) AS s22,
      |    CAST(sum(x1 * y) AS DOUBLE) AS s1y, CAST(sum(x2 * y) AS DOUBLE) AS s2y
      |  FROM (SELECT CAST(l_quantity AS DECIMAL(18,6)) AS x1,
      |               CAST(l_discount AS DECIMAL(18,6)) AS x2,
      |               CAST(l_extendedprice / 1000.0 AS DECIMAL(18,6)) AS y
      |        FROM lineitem)),
      |c AS (
      |  SELECT *,
      |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      |      + s2 * (s1 * s12 - s11 * s2) AS det
      |  FROM m)
      |SELECT
      |  round((sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
      |    + s2 * (s1y * s12 - s11 * s2y)) / det, 6) AS b0,
      |  round((n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
      |    + s2 * (s1 * s2y - s1y * s2)) / det, 6) AS b1,
      |  round((n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
      |    + sy * (s1 * s12 - s11 * s2)) / det, 6) AS b2,
      |  TRUE AS lbfgs_at_optimum
      |FROM c""".stripMargin) { (s, dir) =>
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val (b0, b1, b2) = graft.operators.Regression.ridge2(
      li, col("l_quantity"), col("l_discount"),
      col("l_extendedprice") / 1000.0, lambda = 0.0)
    // r16: the least-squares objective is quadratic, so the L-BFGS run
    // (and every Armijo probe) evaluates against the one-pass moment
    // statistics instead of re-scanning lineitem ~100× — see
    // [[leastSquaresObjective]]. Same objective, same optimizer, same
    // published values (closed-form decimal coefficients + the 1e-6
    // certificate band, both orders above the summation-order ulps).
    val obj = leastSquaresObjective(
      li, array(lit(1.0), col("l_quantity").cast("double"),
        col("l_discount").cast("double")),
      col("l_extendedprice") / 1000.0, d = 3)
    val (wStar, hist) = lbfgs(obj, init = Array(0.0, 0.0, 0.0),
      maxIter = 100, tol = 1e-12)
    val lOpt = obj.eval(Array(b0, b1, b2))._1
    val atOpt = hist.last <= lOpt + 1e-6 * math.max(1.0, math.abs(lOpt))
    val _ = wStar
    Seq((math.rint(b0 * 1e6) / 1e6, math.rint(b1 * 1e6) / 1e6,
      math.rint(b2 * 1e6) / 1e6, atOpt)).toDF("b0", "b1", "b2", "lbfgs_at_optimum")
  }

  val all: Seq[Q] = Seq(opt01)
}
