package graft

import org.apache.spark.sql.functions._
import graft.functions.MultivariateGaussian

/** Hand-computed density checks for the full-covariance Gaussian
  * (reference mllib/stat/distribution/MultivariateGaussian.scala:1). */
class MultivariateGaussianSpec extends SparkTestBase {

  test("diagonal covariance factorizes into independent 1-D densities") {
    import TestSpark.spark.implicits._
    val g = MultivariateGaussian(Seq(1.0, -2.0), Seq(Seq(4.0, 0.0), Seq(0.0, 0.25)))
    def d1(x: Double, m: Double, v: Double): Double =
      -0.5 * (math.log(2 * math.Pi * v) + (x - m) * (x - m) / v)
    val pts = Seq(Seq(1.0, -2.0), Seq(0.0, 0.0), Seq(3.5, -1.2), Seq(-2.0, 1.0))
    val got = pts.toDF("x").select(g.logpdf(col("x"))).collect().map(_.getDouble(0))
    pts.zip(got).foreach { case (p, lp) =>
      val want = d1(p(0), 1.0, 4.0) + d1(p(1), -2.0, 0.25)
      assert(math.abs(lp - want) < 1e-12, s"$p: $lp vs $want")
    }
  }

  test("correlated covariance matches the closed form; mode is the max") {
    import TestSpark.spark.implicits._
    // Sigma = [[2, 1], [1, 2]] -> inverse [[2/3, -1/3], [-1/3, 2/3]], det 3
    val g = MultivariateGaussian(Seq(0.0, 0.0), Seq(Seq(2.0, 1.0), Seq(1.0, 2.0)))
    def want(x: Double, y: Double): Double =
      -0.5 * (2 * math.log(2 * math.Pi) + math.log(3.0)) -
        0.5 * ((2.0 / 3) * x * x - (2.0 / 3) * x * y + (2.0 / 3) * y * y)
    val pts = Seq((0.0, 0.0), (1.0, 1.0), (1.0, -1.0), (2.5, 0.5))
    val got = pts.map(p => Seq(p._1, p._2)).toDF("x")
      .select(g.logpdf(col("x"))).collect().map(_.getDouble(0))
    pts.zip(got).foreach { case ((x, y), lp) =>
      assert(math.abs(lp - want(x, y)) < 1e-12, s"($x,$y): $lp vs ${want(x, y)}")
    }
    assert(got(0) == got.max, "density must peak at the mean")
    // pdf integrates consistently: total mass over a coarse grid ~ 1
    val grid = for { i <- -60 to 60; j <- -60 to 60 } yield Seq(i * 0.2, j * 0.2)
    val mass = grid.toDF("x").select(g.pdf(col("x")).as("p"))
      .agg(sum("p") * 0.04).head.getDouble(0)
    assert(math.abs(mass - 1.0) < 0.01, s"grid mass $mass")
  }

  test("singular or asymmetric sigma fails loudly at construction") {
    intercept[IllegalArgumentException] {
      MultivariateGaussian(Seq(0.0, 0.0), Seq(Seq(1.0, 1.0), Seq(1.0, 1.0)))
    }
    intercept[IllegalArgumentException] {
      MultivariateGaussian(Seq(0.0, 0.0), Seq(Seq(1.0, 0.5), Seq(0.2, 1.0)))
    }
  }
}
