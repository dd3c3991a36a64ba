package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling (reference
  * core/src/main/scala/org/apache/spark/rdd/RDD.scala:1 `sample` and
  * core/src/main/scala/org/apache/spark/rdd/PairRDDFunctions.scala:1
  * `sampleByKey` semantics, re-expressed reproducible-by-construction).
  *
  * The reference's samplers (BernoulliSampler over a per-partition XORShift
  * stream) make membership a function of PLACEMENT: repartition the input, or
  * run on a different engine, and a different subset survives. Here
  * membership is a pure column predicate on the row's OWN key:
  *
  *   u(row) = (xxhash64(seed, key...) >>> 11) · 2⁻⁵³   ∈ [0, 1)
  *   keep   ⇔ u(row) < fraction
  *
  * — the exact 53-bit-mantissa construction [[graft.sources.RandomData]]
  * uses, one codegen'd comparison per row, no shuffle, no RNG state. The
  * sample is identical at any partition count, across retries, and across
  * ENGINES: DuckDB replays the xxhash64 fold through
  * [[graft.functions.DuckXxhash]]'s hashLong chains and derives the same
  * membership bit per row, which is what upgrades q38/q52 from rows-only
  * checks to full value oracles. That reproducibility contract — the same
  * document always lands in the same split — is what a 100 TB training-data
  * pipeline needs from its subsampling/rebalancing pass (placement-dependent
  * samples silently churn the corpus on every retry).
  *
  * xxhash64's avalanche makes u uniform on [0,1) even over structured keys
  * (sequential order keys, clustered ids); per-stratum rate specs in
  * StatsSpec hold at 4-sigma binomial tolerance.
  */
object Sampling {

  /** u ~ U[0,1) as a pure function of (seed, keys): 53-bit mantissa of the
    * row hash. Long-typed keys keep the DuckDB replay on the hashLong-only
    * path (ints would take the 4-byte fold variant). */
  def hashU(seed: Long, keys: Column*): Column =
    shiftrightunsigned(xxhash64(lit(seed) +: keys: _*), 11).cast("double") /
      lit(9007199254740992.0) // 2^53

  /** Bernoulli(fraction) sample keyed on `keys` — a map-side filter, no
    * shuffle; membership is partition- and engine-invariant. */
  def sample(df: DataFrame, fraction: Double, seed: Long, keys: Column*): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0,1]")
    df.filter(hashU(seed, keys: _*) < lit(fraction))
  }

  /** Fold id in [0, k) as a pure function of (seed, keys): exact integer
    * arithmetic (pmod of the row hash), no float edge cases, bit-portable
    * across engines. */
  def foldId(seed: Long, k: Int, keys: Column*): Column =
    pmod(xxhash64(lit(seed) +: keys: _*), lit(k.toLong))

  /** k-fold cross-validation splits (reference mllib/src/main/scala/org/
    * apache/spark/mllib/util/MLUtils.scala:1 `kFold`): (train, validation)
    * for fold `fold` of `k`. The reference assigns folds with a
    * BernoulliCellSampler over a per-partition RNG — placement-dependent,
    * so a repartition reshuffles every fold. Here fold membership is
    * [[foldId]]'s pure column function of the row's own key: the SAME row
    * lands in the SAME fold on any partition count, any retry, any
    * engine, and the k validation sets partition the input exactly (each
    * row in precisely one), which the reference's independent Bernoulli
    * draws only guarantee in expectation. */
  def kFold(df: DataFrame, k: Int, fold: Int, seed: Long, keys: Column*)
      : (DataFrame, DataFrame) = {
    require(k >= 2, s"kFold needs k >= 2, got $k")
    require(fold >= 0 && fold < k, s"fold $fold outside [0, $k)")
    val f = foldId(seed, k, keys: _*)
    (df.filter(f =!= fold), df.filter(f === fold))
  }

  /** Stratified sample: per-stratum Bernoulli fractions in the same single
    * map-side pass (`stat.sampleBy` / `sampleByKey` surface) — the
    * language/domain-mix rebalancing move. Strata without a listed fraction
    * drop out (null fraction ⇒ predicate null ⇒ filtered), matching
    * DataFrameStatFunctions.sampleBy. */
  def sampleBy(df: DataFrame, strataCol: String, fractions: Map[String, Double],
               seed: Long, keys: Column*): DataFrame = {
    fractions.values.foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f outside [0,1]"))
    val frac = fractions.foldLeft(lit(null).cast("double")) {
      case (acc, (k, f)) => when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(hashU(seed, keys: _*) < frac)
  }
}
