package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q

/** Synthetic random-data generation (reference mllib/src/main/scala/org/
  * apache/spark/mllib/random/RandomRDDs.scala:1 — uniformRDD/normalRDD/
  * poissonRDD/exponentialRDD/gammaRDD/logNormalRDD + vector variants),
  * re-expressed Spark-first and REPRODUCIBLE BY CONSTRUCTION:
  *
  * the reference seeds one java.util.Random per partition, so the
  * stream depends on the partition count and re-partitioning reshuffles
  * everyone's values. Here every value is a pure column function of
  * (seed, row id): u = (xxhash64(seed, id) >>> 11) · 2⁻⁵³ — the
  * standard 53-bit uniform — and every distribution derives from such
  * uniforms per row (inverse-CDF / Box-Muller / sums). Generation is
  * one codegen'd map over `spark.range` (embarrassingly parallel, no
  * shuffle, no driver state), identical at ANY parallelism — the
  * property a 100 TB pipeline actually needs from synthetic data (the
  * same id always draws the same value, so reruns, retries, and
  * repartitions can't silently change the corpus).
  *
  * Documented delta vs the reference: gammaRDD accepts any shape via
  * per-sample rejection; rejection loops are data-dependent and break
  * the pure-column model, so [[gamma]] supports INTEGER shape (the sum
  * of shape exponentials — exact) and arbitrary-shape callers compose
  * it with [[normal]] via the usual large-shape approximation.
  */
object RandomData {

  /** Disjoint per-family salt namespaces (r11, advice item): every
    * distribution family draws its uniforms from its OWN 1e6-wide salt
    * block, so generators COMPOSE at the same (seed, id) without hidden
    * dependence — previously gamma term 0 reused exponential's salt and
    * normal's salts collided with gamma terms 0-1, so the scaladoc's own
    * "compose gamma with normal" advice produced correlated components.
    * (Plain `uniform` hashes (seed, id) with no salt — a different
    * xxhash64 arity, hence already an independent stream.)
    * RandomDataSpec asserts cross-family independence of the composed
    * draws. */
  private val NormalBase = 1000000L
  private val ExpBase = 2000000L
  private val PoissonBase = 3000000L
  private val GammaBase = 4000000L
  private val UniformVecBase = 5000000L
  private val NormalVecBase = 6000000L
  private val FamilyWidth = 1000000L

  /** 53-bit uniform in [0, 1) from the row hash; extra `salt` columns
    * derive independent streams from the same id. */
  private def u01(seed: Long, salt: Column*): Column =
    shiftrightunsigned(xxhash64(lit(seed) +: salt: _*), 11).cast("double") /
      lit(9007199254740992.0) // 2^53

  private def ids(spark: SparkSession, n: Long, parts: Int): DataFrame =
    spark.range(0, n, 1, parts).toDF("id")

  /** (id, u) with u ~ U[0, 1). */
  def uniform(spark: SparkSession, n: Long, parts: Int, seed: Long): DataFrame =
    ids(spark, n, parts).select(col("id"), u01(seed, col("id")).as("u"))

  /** Standard normal via Box-Muller on two per-id streams (1−u₁ keeps
    * the log argument in (0, 1]). */
  private def z01(seed: Long, id: Column, stream: Int): Column =
    sqrt(lit(-2.0) * log(lit(1.0) - u01(seed, id, lit(NormalBase + 2 * stream)))) *
      cos(lit(2.0 * math.Pi) * u01(seed, id, lit(NormalBase + 2 * stream + 1)))

  /** (id, z) with z ~ N(0, 1). */
  def normal(spark: SparkSession, n: Long, parts: Int, seed: Long): DataFrame =
    ids(spark, n, parts).select(col("id"), z01(seed, col("id"), 0).as("z"))

  /** (id, x) with x ~ LogNormal(mu, sigma). */
  def logNormal(spark: SparkSession, n: Long, parts: Int,
                mu: Double, sigma: Double, seed: Long): DataFrame =
    ids(spark, n, parts).select(col("id"),
      exp(lit(mu) + lit(sigma) * z01(seed, col("id"), 0)).as("x"))

  /** (id, x) with x ~ Exponential(mean). */
  def exponential(spark: SparkSession, n: Long, parts: Int,
                  mean: Double, seed: Long): DataFrame =
    ids(spark, n, parts).select(col("id"),
      (lit(-mean) * log(lit(1.0) - u01(seed, col("id"), lit(ExpBase)))).as("x"))

  /** (id, k) with k ~ Poisson(lambda) by exact inverse-CDF over a
    * bounded literal table (terms until the tail mass < 1e-12, cap
    * 200): k = #{cdf entries ≤ u} — a pure codegen'd array scan, no
    * rejection loop. */
  def poisson(spark: SparkSession, n: Long, parts: Int,
              lambda: Double, seed: Long): DataFrame = {
    require(lambda > 0 && lambda <= 50.0,
      "poisson: inverse-CDF table supports 0 < lambda <= 50; " +
        "approximate larger rates with normal(lambda, sqrt(lambda))")
    val cdf = scala.collection.mutable.ArrayBuffer.empty[Double]
    var p = math.exp(-lambda); var c = p; var k = 0
    cdf += c
    while (1.0 - c > 1e-12 && k < 200) {
      k += 1; p = p * lambda / k; c += p; cdf += c
    }
    val cdfLit = typedlit(cdf.toSeq)
    ids(spark, n, parts).select(col("id"),
      size(filter(cdfLit, e => e <= u01(seed, col("id"), lit(PoissonBase))))
        .cast("long").as("k"))
  }

  /** (id, x) with x ~ Gamma(shape, scale), INTEGER shape: the exact sum
    * of `shape` independent exponentials (see the scaladoc delta). */
  def gamma(spark: SparkSession, n: Long, parts: Int,
            shape: Int, scale: Double, seed: Long): DataFrame = {
    require(shape >= 1 && shape < FamilyWidth, "gamma: integer shape >= 1")
    val terms = (0 until shape).map(j =>
      lit(-scale) * log(lit(1.0) - u01(seed, col("id"), lit(GammaBase + j))))
    ids(spark, n, parts).select(col("id"),
      terms.reduce(_ + _).as("x"))
  }

  /** (id, v: array<double> of dim) — per-dimension independent uniform
    * streams from (seed, id, dim index). */
  def uniformVectors(spark: SparkSession, n: Long, parts: Int,
                     dim: Int, seed: Long): DataFrame = {
    require(dim >= 1 && dim < FamilyWidth, "uniformVectors: dim in [1, 1e6)")
    ids(spark, n, parts).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => u01(seed, col("id"), lit(UniformVecBase) + j)).as("v"))
  }

  /** (id, v) with v ~ N(0, I_dim). */
  def normalVectors(spark: SparkSession, n: Long, parts: Int,
                    dim: Int, seed: Long): DataFrame = {
    require(dim >= 1 && dim * 2 < FamilyWidth, "normalVectors: dim in [1, 5e5)")
    ids(spark, n, parts).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        sqrt(lit(-2.0) * log(lit(1.0) -
          u01(seed, col("id"), lit(NormalVecBase) + j * 2))) *
          cos(lit(2.0 * math.Pi) *
            u01(seed, col("id"), lit(NormalVecBase + 1) + j * 2))).as("v"))
  }

  // ---- labeled-dataset generators (reference mllib/src/main/scala/org/
  // apache/spark/mllib/util/LinearDataGenerator.scala:1,
  // LogisticRegressionDataGenerator.scala:1, KMeansDataGenerator.scala:1,
  // SVMDataGenerator.scala:1) — compositions of the hash-based
  // primitives above, so the same (seed, id) always generates the same
  // example at any parallelism ----

  /** Linear-regression data (LinearDataGenerator parity):
    * x ~ U[-1,1]^d (the [[uniformVectors]] streams, so feature j of row
    * id is bit-identical to `uniformVectors(...).v[j]` mapped to
    * [-1,1]), label = w·x + intercept + epsScale·N(0,1). Columns
    * (id, x0..x{d-1}, label). */
  def linearData(spark: SparkSession, n: Long, parts: Int,
                 weights: Seq[Double], intercept: Double,
                 epsScale: Double, seed: Long): DataFrame = {
    val d = weights.length
    require(d >= 1 && d < FamilyWidth, "linearData: 1 <= d < 1e6")
    val xs = (0 until d).map(j =>
      (u01(seed, col("id"), lit(UniformVecBase) + lit(j)) * 2.0 - 1.0).as(s"x$j"))
    val withX = ids(spark, n, parts).select(col("id") +: xs: _*)
    val margin = (0 until d).map(j => col(s"x$j") * weights(j)).reduce(_ + _)
    withX.withColumn("label",
      margin + lit(intercept) + z01(seed, col("id"), 0) * epsScale)
  }

  /** Binary-classification data (LogisticRegressionDataGenerator
    * parity): label = id mod 2, x_j = N(0,1) + label·sep — two gaussian
    * clouds separated by `sep` along every axis. */
  def logisticData(spark: SparkSession, n: Long, parts: Int, d: Int,
                   sep: Double, seed: Long): DataFrame = {
    require(d >= 1 && d * 2 < FamilyWidth, "logisticData: 1 <= d < 5e5")
    val label = (col("id") % 2).cast("double").as("label")
    val xs = (0 until d).map(j =>
      (sqrt(lit(-2.0) * log(lit(1.0) -
        u01(seed, col("id"), lit(NormalVecBase) + lit(j * 2)))) *
        cos(lit(2.0 * math.Pi) *
          u01(seed, col("id"), lit(NormalVecBase) + lit(j * 2 + 1))) +
        col("label") * sep).as(s"x$j"))
    ids(spark, n, parts).select(col("id"), label)
      .select(col("id") +: col("label") +: xs: _*)
  }

  /** Clustered data (KMeansDataGenerator parity): k centers drawn
    * uniform in [-scale, scale]^d from (seed, center id), each point =
    * its (id mod k) center + N(0, I). Columns (id, cluster, v). */
  def kmeansData(spark: SparkSession, n: Long, parts: Int, k: Int, dim: Int,
                 scale: Double, seed: Long): DataFrame = {
    require(k >= 1 && dim >= 1 && dim * 2 < FamilyWidth)
    // centers from the driver with the same hash construction (k·dim
    // bounded): center c dim j uses the uniformVectors stream of id=-(c+1)
    val centers = Array.tabulate(k, dim) { (c, j) =>
      val h = graft.functions.DuckXxhash.hashLong(UniformVecBase + j,
        graft.functions.DuckXxhash.hashLong(-(c + 1).toLong,
          graft.functions.DuckXxhash.hashLong(seed, 42L)))
      ((h >>> 11).toDouble / 9007199254740992.0 * 2.0 - 1.0) * scale
    }
    val cl = (col("id") % k).cast("int").as("cluster")
    val ctr = typedlit(centers.map(_.toSeq).toSeq)
    ids(spark, n, parts).select(col("id"), cl)
      .select(col("id"), col("cluster"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          element_at(element_at(ctr, col("cluster") + 1), j + 1) +
            sqrt(lit(-2.0) * log(lit(1.0) -
              u01(seed, col("id"), lit(NormalVecBase) + j * 2))) *
              cos(lit(2.0 * math.Pi) *
                u01(seed, col("id"), lit(NormalVecBase + 1) + j * 2))).as("v"))
  }

  /** Registered pass: 10,000 uniform draws at seed 7 — with a FULL
    * VALUE oracle: the generator is pure hash arithmetic, so DuckDB
    * replays xxhash64(7, id) through [[graft.functions.DuckXxhash]]'s
    * hashLong chain (the fold constant hashLong(7, 42) computed
    * driver-side, exactly Spark's multi-argument accumulation) and the
    * (h >>> 11) · 2⁻⁵³ mantissa division — both exact powers of two,
    * bit-identical doubles. Even the "random" numbers are oracled;
    * that IS the reproducibility contract. Distribution quality
    * (means, variances, bounds, independence across streams) is
    * spec'd in RandomDataSpec. */
  val rd01: Q = {
    import graft.functions.DuckXxhash
    // Spark's xxhash64(lit(7L), col("id")) folds hashLong(7, 42) first
    val foldSeed = DuckXxhash.hashLong(7L, 42L)
    val (chain, fin) = DuckXxhash.hashLongCtes("inp", foldSeed)
    Q.sql(
      "rd01_random_uniform",
      s"""WITH inp AS (
        |  SELECT range AS id,
        |         (CASE WHEN range < 0 THEN range::HUGEINT + ${DuckXxhash.M64}
        |               ELSE range::HUGEINT END) AS v
        |  FROM range(0, 10000)),
        |$chain
        |SELECT id, CAST(h // 2048 AS DOUBLE) / 9007199254740992.0 AS u
        |FROM $fin ORDER BY id""".stripMargin) { (s, _) =>
      uniform(s, n = 10000L, parts = 8, seed = 7L).orderBy("id")
    }
  }

  /** SVM data (SVMDataGenerator parity): x ~ U[-1,1]^d, label =
    * sign(w·x + 0.1·N(0,1)) ∈ {0, 1} for a fixed true weight vector —
    * the reference's uniform-features-plus-noisy-margin construction.
    * Reuses [[linearData]]'s streams: same (seed, id) → same features. */
  def svmData(spark: SparkSession, n: Long, parts: Int,
              weights: Seq[Double], seed: Long): DataFrame = {
    val d = weights.length
    val lin = linearData(spark, n, parts, weights, intercept = 0.0,
      epsScale = 0.1, seed = seed)
    lin.withColumn("label", (col("label") > 0).cast("double"))
      .select((col("id") +: (0 until d).map(j => col(s"x$j"))) :+ col("label"): _*)
  }

  /** Low-rank matrix data (MFDataGenerator parity): the sampled entries
    * of A = z·U·Vᵀ with U, V gaussian and z = rank^(−1/4) (the
    * reference's scaling, so entries are O(1)), plus optional
    * N(0, sigma) noise; `fraction` of the m×n cells survive via the
    * hash predicate (placement-invariant sampling — the training-set
    * split a factorization benchmark needs to be reproducible).
    * Columns (u, i, r). Entry (u, i)'s factor rows derive from
    * (seed, u) / (seed, −1−i) streams, so any cell is recomputable in
    * isolation. */
  def mfData(spark: SparkSession, n_users: Long, n_items: Long, rank: Int,
             fraction: Double, sigma: Double, seed: Long): DataFrame = {
    require(rank >= 1 && rank * 2 < FamilyWidth)
    val z = 1.0 / math.sqrt(math.sqrt(rank.toDouble))
    def factor(id: Column) =
      transform(sequence(lit(0), lit(rank - 1)), j =>
        sqrt(lit(-2.0) * log(lit(1.0) -
          u01(seed, id, lit(NormalVecBase) + j * 2))) *
          cos(lit(2.0 * math.Pi) *
            u01(seed, id, lit(NormalVecBase + 1) + j * 2)))
    val cells = ids(spark, n_users * n_items, 32)
      .select((col("id") % n_items).as("i"),
        (col("id") / n_items).cast("long").as("u"))
      .filter(graft.operators.Sampling.hashU(seed + 1, col("u"), col("i"))
        < lit(fraction))
    val noise =
      if (sigma == 0.0) lit(0.0)
      else z01(seed + 2, col("u") * n_items + col("i"), 0) * sigma
    cells.select(col("u"), col("i"),
      (aggregate(zip_with(factor(col("u")), factor(lit(-1L) - col("i")),
        (a, b) => a * b), lit(0.0), (acc, p) => acc + p) * z + noise).as("r"))
  }

  /** Registered pass for the generator family: 20,000 linear-regression
    * examples (d=4, w=(0.5,−1.25,2,0.75), b=0.1, ε=0.1, seed 7) in the
    * q30/q41 claim split: the FEATURES are full oracle VALUES — each
    * x_j = u·2−1 with u replayed bit-exactly through the three-stage
    * xxhash64 fold (constant fold seed → variable id → constant
    * per-feature salt, the [[uniformVectors]] streams) — while the
    * label's gaussian noise is engine-local (Box-Muller's log/cos are
    * not bit-portable across libms), so the label is certified by
    * IN-PLAN flags instead of emitted: per-row |label−w·x−b| ≤ 6ε and
    * global noise moments (mean within 5ε/√n, variance within 10% of
    * ε²) — deterministic booleans the oracle asserts as literal TRUE.
    * Distribution quality is additionally spec'd in RandomDataSpec. */
  val gen01: Q = {
    import graft.functions.DuckXxhash
    val n = 20000L
    val w = Seq(0.5, -1.25, 2.0, 0.75)
    val foldSeed = DuckXxhash.hashLong(7L, 42L)
    val (c1, f1) = DuckXxhash.hashLongCtes("inp", foldSeed, "g1")
    val perJ = (0 until 4).map { j =>
      val salt = 5000000L + j // UniformVecBase + j
      val src = if (j == 0) "base" else s"pout${j - 1}"
      val keep = "id" + (0 until j).map(k => s", x$k").mkString
      val (cj, fj) = DuckXxhash.hashLongCtesExpr(s"pin$j", "hid", s"gj$j")
      Seq(
        s"pin$j AS MATERIALIZED (SELECT $keep, hid, ${salt}::HUGEINT AS v FROM $src)",
        cj,
        s"pout$j AS MATERIALIZED (SELECT $keep, hid, " +
          s"(CAST(h // 2048 AS DOUBLE) / 9007199254740992.0) * 2.0 - 1.0 AS x$j FROM $fj)")
        .mkString(",\n")
    }.mkString(",\n")
    Q.sql(
      "gen01_linear_data",
      s"""WITH inp AS (
        |  SELECT range AS id, range::HUGEINT AS v FROM range(0, $n)),
        |$c1,
        |base AS MATERIALIZED (SELECT id, h AS hid FROM $f1),
        |$perJ
        |SELECT id, x0, x1, x2, x3,
        |  TRUE AS resid_bounded, TRUE AS mean_ok, TRUE AS var_ok
        |FROM pout3 ORDER BY id""".stripMargin) { (s, _) =>
      val df = linearData(s, n, parts = 8, weights = w,
        intercept = 0.1, epsScale = 0.1, seed = 7L)
      val margin = (0 until 4).map(j => col(s"x$j") * w(j)).reduce(_ + _)
      val flagged = df.withColumn("resid", col("label") - margin - lit(0.1))
      val m = flagged.agg(avg("resid").as("mr"), var_samp("resid").as("vr"))
      flagged.crossJoin(broadcast(m))
        .select(col("id"), col("x0"), col("x1"), col("x2"), col("x3"),
          (abs(col("resid")) <= lit(0.6)).as("resid_bounded"),
          (abs(col("mr")) < lit(5 * 0.1 / math.sqrt(n.toDouble))).as("mean_ok"),
          (abs(col("vr") / 0.01 - 1.0) < lit(0.1)).as("var_ok"))
        .orderBy("id")
    }
  }

  val all: Seq[Q] = Seq(rd01, gen01)
}
