package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Registers graft's native expressions.
  *
  * Two entry points:
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions` picks the
  *    functions up at session build (cluster deployments);
  *  - [[GraftFunctions.register]]: idempotent runtime registration for an
  *    existing session (tests, notebooks, the Verify/Bench mains).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_cosine"), FloatCosine.info, FloatCosine.builder))
    ext.injectFunction((
      FunctionIdentifier("hashed_word_grams"), HashedWordGrams.info, HashedWordGrams.builder))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"), MinhashSignature.info, MinhashSignature.builder))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sign"), HyperplaneSign.info, HyperplaneSign.builder))
    ext.injectFunction((
      FunctionIdentifier("simhash63"), SimHash63.info, SimHash63.builder))
    ext.injectFunction((
      FunctionIdentifier("float_dot"), FloatDot.info, FloatDot.builder))
    ext.injectFunction((
      FunctionIdentifier("pcm_s16le"), PcmS16Le.info, PcmS16Le.builder))
    ext.injectFunction((
      FunctionIdentifier("rgb24_pixels"), Rgb24Pixels.info, Rgb24Pixels.builder))
    ext.injectFunction((
      FunctionIdentifier("u8_moments"), U8Moments.info, U8Moments.builder))
    ext.injectOptimizerRule(_ => RewriteHofCosine)
  }
}

object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("float_cosine"), FloatCosine.info, FloatCosine.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hashed_word_grams"), HashedWordGrams.info, HashedWordGrams.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_signature"), MinhashSignature.info, MinhashSignature.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hyperplane_sign"), HyperplaneSign.info, HyperplaneSign.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash63"), SimHash63.info, SimHash63.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("float_dot"), FloatDot.info, FloatDot.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pcm_s16le"), PcmS16Le.info, PcmS16Le.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("rgb24_pixels"), Rgb24Pixels.info, Rgb24Pixels.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("u8_moments"), U8Moments.info, U8Moments.builder)
  }
}
