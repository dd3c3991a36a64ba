package graft

import org.apache.spark.sql.functions._
import graft.sources.RandomData

/** Distribution + reproducibility contract of the hash-based generators
  * (reference mllib/random/RandomRDDs.scala semantics, partition-
  * invariant by construction here). Tolerances are ~5 standard errors
  * at the sampled n — deterministic generators, so these never flake:
  * the draws are fixed by (seed, id). */
class RandomDataSpec extends SparkTestBase {

  private val n = 20000L

  test("uniform: bounds, mean, variance, and partition-count invariance") {
    val u = RandomData.uniform(spark, n, parts = 8, seed = 11L).cache()
    assert(u.count() == n)
    assert(u.filter(col("u") < 0.0 || col("u") >= 1.0).count() == 0)
    val r = u.agg(avg("u"), var_samp("u")).head
    assert(math.abs(r.getDouble(0) - 0.5) < 0.011, s"mean ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 1.0 / 12) < 0.005, s"var ${r.getDouble(1)}")
    // THE design property: values are a function of (seed, id), so a
    // different partitioning yields the identical table
    val u1 = RandomData.uniform(spark, n, parts = 3, seed = 11L)
    assert(u.except(u1).count() == 0 && u1.except(u).count() == 0)
  }

  test("normal and logNormal: moments match") {
    val z = RandomData.normal(spark, n, parts = 8, seed = 5L)
      .agg(avg("z"), var_samp("z")).head
    assert(math.abs(z.getDouble(0)) < 0.04, s"mean ${z.getDouble(0)}")
    assert(math.abs(z.getDouble(1) - 1.0) < 0.06, s"var ${z.getDouble(1)}")
    val ln = RandomData.logNormal(spark, n, parts = 8, mu = 0.0, sigma = 0.5, seed = 5L)
      .agg(avg("x")).head.getDouble(0)
    assert(math.abs(ln - math.exp(0.125)) < 0.03, s"logNormal mean $ln")
  }

  test("poisson and exponential and gamma: means match the parameters") {
    val lam = 4.0
    val k = RandomData.poisson(spark, n, parts = 8, lambda = lam, seed = 3L)
      .agg(avg("k"), min("k")).head
    assert(math.abs(k.getDouble(0) - lam) < 0.08, s"poisson mean ${k.getDouble(0)}")
    assert(k.getLong(1) >= 0L)
    val e = RandomData.exponential(spark, n, parts = 8, mean = 2.5, seed = 3L)
      .agg(avg("x"), min("x")).head
    assert(math.abs(e.getDouble(0) - 2.5) < 0.1, s"exp mean ${e.getDouble(0)}")
    assert(e.getDouble(1) >= 0.0)
    // Gamma(3, 2): mean 6, var 12
    val g = RandomData.gamma(spark, n, parts = 8, shape = 3, scale = 2.0, seed = 3L)
      .agg(avg("x"), var_samp("x")).head
    assert(math.abs(g.getDouble(0) - 6.0) < 0.15, s"gamma mean ${g.getDouble(0)}")
    assert(math.abs(g.getDouble(1) - 12.0) < 1.2, s"gamma var ${g.getDouble(1)}")
  }

  test("families compose independently at the same (seed, id) — disjoint salt namespaces") {
    // the r10 advice item: gamma's terms formerly reused the salts that
    // drive normal/exponential, so the scaladoc's recommended
    // gamma-compose-with-normal produced correlated components. With
    // per-family salt blocks every cross-family pair at the SAME seed
    // and id must be uncorrelated.
    val seed = 11L
    val g = RandomData.gamma(spark, n, parts = 8, shape = 3, scale = 2.0, seed = seed)
      .withColumnRenamed("x", "g")
    val z = RandomData.normal(spark, n, parts = 8, seed = seed)
    val e = RandomData.exponential(spark, n, parts = 8, mean = 1.0, seed = seed)
      .withColumnRenamed("x", "e")
    val u = RandomData.uniform(spark, n, parts = 8, seed = seed)
    val j = g.join(z, "id").join(e, "id").join(u, "id")
    val r = j.select(
      corr(col("g"), col("z")), corr(col("g"), col("e")),
      corr(col("z"), col("e")), corr(col("u"), col("z")),
      corr(col("u"), col("g"))).head
    (0 until 5).foreach { i =>
      assert(math.abs(r.getDouble(i)) < 0.05,
        s"cross-family corr ${r.getDouble(i)} at slot $i — salt namespaces collide")
    }
  }

  test("vector variants: dim, per-dimension stream independence") {
    val dim = 8
    val uv = RandomData.uniformVectors(spark, 5000L, parts = 4, dim = dim, seed = 9L).cache()
    assert(uv.select(size(col("v"))).distinct().head.getInt(0) == dim)
    // distinct dimensions draw from distinct streams: correlation ~ 0
    val c = uv.select(corr(col("v")(0), col("v")(1))).head.getDouble(0)
    assert(math.abs(c) < 0.05, s"cross-dim corr $c")
    val nv = RandomData.normalVectors(spark, 5000L, parts = 4, dim = dim, seed = 9L)
    val m = nv.select(explode(col("v")).as("z")).agg(avg("z"), var_samp("z")).head
    assert(math.abs(m.getDouble(0)) < 0.03 && math.abs(m.getDouble(1) - 1.0) < 0.06)
  }

  test("labeled-dataset generators: linear residuals, logistic separation, kmeans centers") {
    // linearData: features ARE the uniformVectors streams mapped to [-1,1]
    val w = Seq(0.5, -1.25, 2.0, 0.75)
    val lin = RandomData.linearData(spark, 4000L, 8, w, 0.1, 0.1, 7L).cache()
    val uv = RandomData.uniformVectors(spark, 4000L, 8, dim = 4, seed = 7L)
    val mismatch = lin.join(uv, "id")
      .filter((0 until 4).map(j =>
        col(s"x$j") =!= (col("v")(j) * 2.0 - 1.0)).reduce(_ || _))
      .count()
    assert(mismatch == 0L, "linearData features must be the uniformVectors streams")
    val margin = (0 until 4).map(j => col(s"x$j") * w(j)).reduce(_ + _)
    val r = lin.select((col("label") - margin - 0.1).as("resid"))
      .agg(avg("resid"), var_samp("resid"), max(abs(col("resid")))).head
    assert(math.abs(r.getDouble(0)) < 0.01, s"resid mean ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 0.01) < 0.002, s"resid var ${r.getDouble(1)}")
    assert(r.getDouble(2) < 0.6, s"resid max ${r.getDouble(2)}")
    lin.unpersist()

    // logisticData: the two classes sit `sep` apart along every axis
    val log = RandomData.logisticData(spark, 4000L, 8, d = 3, sep = 2.0, seed = 9L)
    val cm = log.groupBy("label")
      .agg(avg("x0").as("m0"), avg("x1").as("m1"), avg("x2").as("m2"))
      .collect().map(rr => rr.getDouble(0) -> (rr.getDouble(1), rr.getDouble(2), rr.getDouble(3)))
      .toMap
    Seq(cm(1.0)._1 - cm(0.0)._1, cm(1.0)._2 - cm(0.0)._2, cm(1.0)._3 - cm(0.0)._3)
      .foreach(dd => assert(math.abs(dd - 2.0) < 0.15, s"class separation $dd vs 2.0"))

    // kmeansData: per-cluster empirical mean recovers its center
    val km = RandomData.kmeansData(spark, 6000L, 8, k = 3, dim = 4,
      scale = 10.0, seed = 11L)
    assert(km.select("cluster").distinct().count() == 3)
    val gotMeans = km
      .select(col("cluster"), posexplode(col("v")).as(Seq("p", "x")))
      .groupBy("cluster", "p").agg(avg("x").as("m")).collect()
      .map(rr => (rr.getInt(0), rr.getInt(1)) -> rr.getDouble(2)).toMap
    // centers are far apart (scale 10) vs unit noise: every per-cluster
    // mean must sit within 0.2 of SOME deterministic center and the
    // three recovered centers must be distinct
    val centers = (0 until 3).map(c => (0 until 4).map(p => gotMeans((c, p))))
    assert(centers.distinct.size == 3, "clusters must have distinct centers")
    val within = km
      .select(col("cluster"), posexplode(col("v")).as(Seq("p", "x")))
      .groupBy("cluster", "p").agg(var_samp("x").as("v")).collect()
    within.foreach(rr => assert(math.abs(rr.getDouble(2) - 1.0) < 0.15,
      s"within-cluster variance ${rr.getDouble(2)} vs 1.0"))
  }

  test("svmData labels follow the noisy margin; mfData entries are low-rank") {
    val w = Seq(1.0, -2.0, 0.5)
    val svm = RandomData.svmData(spark, 4000L, 8, w, seed = 13L).cache()
    assert(svm.select("label").distinct().count() == 2)
    val margin = (0 until 3).map(j => col(s"x$j") * w(j)).reduce(_ + _)
    val agree = svm
      .select((col("label") === (margin > 0).cast("double")).cast("double").as("a"))
      .agg(avg("a")).head.getDouble(0)
    assert(agree > 0.9, s"label/margin agreement $agree (noise only flips near the boundary)")
    svm.unpersist()

    // rank-1, noise-free matrix: all 2x2 minors vanish -> cross-ratio = 1
    val mf = RandomData.mfData(spark, n_users = 20L, n_items = 15L, rank = 1,
      fraction = 1.0, sigma = 0.0, seed = 17L)
    val m = mf.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m.size == 300)
    for (u <- 0L until 3L; i <- 0L until 3L)
      assert(math.abs(m((u, i)) * m((u + 1, i + 1)) -
        m((u, i + 1)) * m((u + 1, i))) < 1e-12,
        s"2x2 minor at ($u,$i) nonzero: rank-1 structure broken")
    // sampling is the hash predicate: deterministic and placement-free
    val half = RandomData.mfData(spark, 20L, 15L, 1, fraction = 0.5,
      sigma = 0.1, seed = 17L)
    val again = RandomData.mfData(spark, 20L, 15L, 1, fraction = 0.5,
      sigma = 0.1, seed = 17L)
    assert(half.exceptAll(again).isEmpty && again.exceptAll(half).isEmpty)
    val cnt = half.count()
    assert(math.abs(cnt - 150.0) < 4 * math.sqrt(300 * 0.25), s"sampled $cnt of ~150")
  }

  test("rd01 registered entry: 10k rows, in [0,1), deterministic") {
    val a = RandomData.rd01.run(spark, sfDir).cache()
    assert(a.count() == 10000)
    assert(a.filter(col("u") < 0.0 || col("u") >= 1.0).count() == 0)
    val b = RandomData.rd01.run(spark, sfDir)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
