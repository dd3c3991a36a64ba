package graft

import org.apache.spark.sql.functions._
import graft.operators.Regression

class RegressionSpec extends SparkTestBase {

  test("ridge2 with lambda 0 recovers exact planted linear coefficients") {
    import TestSpark.spark.implicits._
    val df = (0 until 400).map { i =>
      val x1 = (i % 20).toDouble
      // /16 keeps every value exact at the decimal(18,6) input cast
      val x2 = ((i * 7) % 13).toDouble / 16.0
      (x1, x2, 2.0 + 3.0 * x1 - 5.0 * x2)
    }.toDF("x1", "x2", "y")
    val (b0, b1, b2) = Regression.ridge2(df, col("x1"), col("x2"), col("y"), 0.0)
    assert(math.abs(b0 - 2.0) < 1e-6, s"b0 = $b0")
    assert(math.abs(b1 - 3.0) < 1e-6, s"b1 = $b1")
    assert(math.abs(b2 + 5.0) < 1e-6, s"b2 = $b2")
  }

  test("ridge shrinks the weight vector monotonically in lambda") {
    import TestSpark.spark.implicits._
    val df = (0 until 300).map { i =>
      val x1 = (i % 17).toDouble
      val x2 = ((i * 5) % 11).toDouble
      (x1, x2, 1.0 + 2.0 * x1 + 0.5 * x2 + math.sin(i.toDouble))
    }.toDF("x1", "x2", "y")
    def norm(l: Double) = {
      val (_, b1, b2) = Regression.ridge2(df, col("x1"), col("x2"), col("y"), l)
      math.sqrt(b1 * b1 + b2 * b2)
    }
    val ns = Seq(0.0, 10.0, 1000.0, 100000.0).map(norm)
    assert(ns.zip(ns.tail).forall { case (a, b) => b < a + 1e-12 },
      s"weight norms must shrink with lambda: $ns")
  }

  test("rg01 on the real table: one-row output, fit no worse than the mean-only model") {
    val out = Regression.rg01.run(spark, sfDir).collect()
    assert(out.length == 1)
    val Seq(b0, b1, b2) = (0 until 3).map(out.head.getDouble)
    // λ=1 is tiny relative to the moment matrix, so the fit's MSE must not
    // exceed the variance of y (the mean-only model) — data-independent,
    // unlike a sign assumption on this synthetic corpus (quantity and
    // extended price are uncorrelated in the generated tables).
    val li = Tables.lineitem(spark, sfDir).select(
      col("l_quantity").cast("double").as("x1"),
      col("l_discount").cast("double").as("x2"),
      (col("l_extendedprice") / 1000.0).cast("double").as("y"))
    val pred = lit(b0) + col("x1") * lit(b1) + col("x2") * lit(b2)
    val r = li.agg(
      avg(pow(col("y") - pred, 2.0)).as("mse"),
      var_pop(col("y")).as("vy")).head
    assert(r.getDouble(0) <= r.getDouble(1) * (1 + 1e-9),
      s"ridge MSE ${r.getDouble(0)} must not exceed var(y) ${r.getDouble(1)}")
  }

  test("logistic recovers a planted separable rule and is deterministic") {
    import TestSpark.spark.implicits._
    val df = (0 until 600).map { i =>
      val f = if (i % 2 == 0) 0.2 + (i % 7) * 0.01 else 0.8 + (i % 7) * 0.01
      val noise = ((i * 31) % 10) / 100.0
      (i.toLong, f, noise, if (i % 2 == 0) 0.0 else 1.0)
    }.toDF("id", "f1", "f2", "y")
    val beta = Regression.logistic(df, Seq("f1", "f2"), "y", eta = 4.0, iters = 60)
    val beta2 = Regression.logistic(df, Seq("f1", "f2"), "y", eta = 4.0, iters = 60)
    assert(beta.toSeq == beta2.toSeq, "full-batch training must be deterministic")
    assert(beta(1) > 0, s"f1 separates upward, got ${beta.toSeq}")
    val m = lit(beta(0)) + col("f1") * lit(beta(1)) + col("f2") * lit(beta(2))
    val acc = df.select(
      avg(((m > 0).cast("double") === col("y")).cast("double"))).head.getDouble(0)
    assert(acc >= 0.99, s"planted separable accuracy $acc")
  }

  test("rg02 on the real table: full coverage and the certified majority floor") {
    val out = Regression.rg02.run(spark, sfDir).cache()
    try {
      val docs = Tables.documents(spark, sfDir).count()
      assert(out.count() == docs)
      // the in-plan certificate IS the accuracy assertion: the entry
      // computed learned accuracy >= the exact majority count from one
      // confusion aggregate (probability surface pinned by the planted
      // logistic test above)
      assert(out.filter(!col("acc_ge_majority")).count() == 0,
        "the accuracy-floor certificate must hold on the real table")
    } finally out.unpersist()
  }

  test("lasso recovers the planted support with EXACT zeros, matches ridge at lambda 0") {
    import TestSpark.spark.implicits._
    // y depends only on x1; x2 is pure noise
    val df = (0 until 400).map { i =>
      val x1 = (i % 20).toDouble
      val x2 = ((i * 13) % 16).toDouble / 16.0
      (x1, x2, 2.0 + 3.0 * x1)
    }.toDF("x1", "x2", "y")
    val (b0, b1, b2) = Regression.lasso2(df, col("x1"), col("x2"), col("y"),
      lambda = 2.0, sweeps = 500)
    assert(b2 == 0.0, s"L1 must zero the noise feature exactly, got $b2")
    // the optimum is the planted 3.0 SHRUNK by ~lambda/var(x1) ≈ 0.06
    assert(math.abs(b1 - 3.0) < 0.1 && b1 < 3.0, s"b1 = $b1 must be 3.0 shrunk")
    assert(math.abs(b0 - 2.0) < 0.8, s"b0 = $b0")

    val (r0, r1, r2) = Regression.ridge2(df, col("x1"), col("x2"), col("y"), 0.0)
    val (l0, l1, l2) = Regression.lasso2(df, col("x1"), col("x2"), col("y"),
      lambda = 0.0, sweeps = 2000)
    assert(math.abs(l0 - r0) < 1e-3 && math.abs(l1 - r1) < 1e-3 &&
      math.abs(l2 - r2) < 1e-3,
      s"lambda 0 coordinate descent ($l0,$l1,$l2) must approach the exact solve ($r0,$r1,$r2)")
  }

  test("rg04 on the real table: one row, both slopes collapse to exact zero") {
    val out = Regression.rg04.run(spark, sfDir).collect()
    assert(out.length == 1)
    // quantity and discount carry ~zero signal in the synthetic corpus,
    // so at lambda=5 the L1 penalty must zero both exactly while the
    // intercept absorbs the mean
    assert(out.head.getDouble(1) == 0.0 && out.head.getDouble(2) == 0.0,
      s"want exact-zero slopes, got ${out.head}")
    assert(out.head.getDouble(0) > 0.0, "intercept carries the mean price")
    assert(out.head.getBoolean(3) && out.head.getBoolean(4) && out.head.getBoolean(5),
      s"KKT optimality flags must all hold at the fixed point: ${out.head}")
  }

  test("svmHinge recovers a planted separable rule with margin and is deterministic") {
    import TestSpark.spark.implicits._
    val df = (0 until 600).map { i =>
      val f = if (i % 2 == 0) 0.1 + (i % 7) * 0.01 else 0.9 + (i % 7) * 0.01
      (i.toLong, f, ((i * 31) % 10) / 100.0, if (i % 2 == 0) 0.0 else 1.0)
    }.toDF("id", "f1", "f2", "y")
    val beta = Regression.svmHinge(df, Seq("f1", "f2"), "y",
      eta = 1.0, lambda = 0.01, iters = 80)
    val beta2 = Regression.svmHinge(df, Seq("f1", "f2"), "y",
      eta = 1.0, lambda = 0.01, iters = 80)
    assert(beta.toSeq == beta2.toSeq, "full-batch hinge training must be deterministic")
    val m = lit(beta(0)) + col("f1") * lit(beta(1)) + col("f2") * lit(beta(2))
    val acc = df.select(
      avg(((m >= 0).cast("double") === col("y")).cast("double"))).head.getDouble(0)
    assert(acc >= 0.99, s"planted separable accuracy $acc")
  }

  test("svm01 on the real table: full coverage and the certified majority floor") {
    val out = Regression.svm01.run(spark, sfDir).cache()
    try {
      val docs = Tables.documents(spark, sfDir).count()
      assert(out.count() == docs)
      assert(out.filter(!col("acc_ge_majority")).count() == 0,
        "the hinge accuracy-floor certificate must hold on the real table")
    } finally out.unpersist()
  }

  test("pav matches the brute-force max-min characterization and is monotone") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 24).map { i =>
      (i.toDouble, BigDecimal(math.rint(rnd.nextDouble() * 1000) / 10), 1L + rnd.nextInt(5))
    }
    val fit = Regression.pav(pts.map { case (x, s, w) => (x, s * w, w) }).map(_._2)
    assert(fit.zip(fit.tail).forall { case (a, b) => a <= b + 1e-12 }, "monotone")
    // brute force: fit_i = max_{j<=i} min_{k>=i} weighted avg over [j,k]
    val n = pts.length
    def avg(j: Int, k: Int): Double = {
      val num = (j to k).map(i => pts(i)._2 * pts(i)._3).sum
      num.toDouble / (j to k).map(pts(_)._3).sum.toDouble
    }
    for (i <- 0 until n) {
      val want = (0 to i).map(j => (i until n).map(k => avg(j, k)).min).max
      assert(math.abs(fit(i) - want) < 1e-9,
        s"fit($i) = ${fit(i)}, max-min gives $want")
    }
  }

  test("rg03 on the real table: one point per quantity, monotone, mass-complete") {
    val out = Regression.rg03.run(spark, sfDir).collect()
    val nq = Tables.lineitem(spark, sfDir).select(count_distinct(col("l_quantity")))
      .head.getLong(0)
    assert(out.length == nq, s"${out.length} points vs $nq distinct quantities")
    val fits = out.map(_.getDouble(1)).toSeq
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b + 1e-12 },
      "isotonic fit must be nondecreasing in quantity")
    val w = out.map(_.getLong(2)).sum
    assert(w == Tables.lineitem(spark, sfDir).count())
  }
}
