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

  val all: Seq[Q] = Seq(rd01)
}
