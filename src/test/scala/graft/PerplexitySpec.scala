package graft

import org.apache.spark.sql.functions._
import graft.operators.Perplexity

class PerplexitySpec extends SparkTestBase {

  test("hand-computed model on a tiny corpus, including the <unk> path") {
    import TestSpark.spark.implicits._
    // tokens [a, a, b, a]: counts a=3, b=1; top-1 vocab = {a}; V = 2
    // (vocab + unk), T = 4; uni: a→3, unk→1. Mapped transitions
    // (a,a), (a,unk), (unk,a), each with bigram count 1.
    val docs = Seq((0L, "a a b a")).toDF("doc_id", "text")
    def lpq(c12: Double, c1: Double, c2: Double): Long =
      math.floor(math.log(
        (0.7 * ((c12 + 1.0) / (c1 + 2.0))) + (0.3 * ((c2 + 1.0) / (4.0 + 2.0)))
      ) * 1000000.0).toLong
    val expS = -(lpq(1, 3, 3) + lpq(1, 3, 1) + lpq(1, 1, 3))
    val theta = 700000L
    val row = Perplexity.perplexityFilter(docs, topNVocab = 1,
      thresholdMicroNats = theta).collect().head
    assert(row.getLong(1) == 4L, s"n_tok ${row.getLong(1)}")
    assert(row.getLong(2) == 1L, s"n_oov ${row.getLong(2)}")
    assert(row.getLong(3) == 3L, s"n_tr ${row.getLong(3)}")
    assert(row.getLong(4) == expS, s"surprisal_q ${row.getLong(4)} vs $expS")
    assert(row.getBoolean(5) == (expS <= theta * 3L))
  }

  test("predictable text scores lower mean transition surprisal than gibberish") {
    import TestSpark.spark.implicits._
    // doc 0 cycles one dominant bigram; doc 1 is 40 distinct words seen
    // once each — every transition is rare, so its surprisal must be
    // strictly higher per transition under the self-trained model
    val predictable = Array.fill(20)("tick tock").mkString(" ")
    val gibberish = (0 until 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, predictable), (1L, gibberish)).toDF("doc_id", "text")
    val got = Perplexity.perplexityFilter(docs, topNVocab = 20000,
      thresholdMicroNats = 3400000L)
      .orderBy("doc_id").collect()
    val mean0 = got(0).getLong(4).toDouble / got(0).getLong(3)
    val mean1 = got(1).getLong(4).toDouble / got(1).getLong(3)
    assert(mean0 < mean1, s"predictable $mean0 !< gibberish $mean1")
  }

  test("registered entry is non-vacuous at the test SF and keep is its own integer recheck") {
    val out = SparkEntry.queries("t13_lm_perplexity")(spark, sfDir)
    val rows = out.collect()
    assert(rows.length == 500)
    val keeps = rows.count(_.getBoolean(5))
    assert(keeps > 0 && keeps < rows.length, s"vacuous keep split: $keeps")
    assert(rows.forall(_.getLong(2) == 0L), "31-word corpus: no OOV expected")
    // keep is pure 64-bit integer arithmetic over the emitted columns —
    // re-derive it exactly
    assert(rows.forall(r =>
      r.getBoolean(5) == (r.getLong(4) <= 3400000L * r.getLong(3))))
  }

  test("quantization boundary margin at the test SF clears cross-engine ln noise") {
    // The single cross-engine float risk: ln (libm vs Math.log) landing
    // within ulps of a floor boundary. Re-derive every distinct
    // transition's pre-floor value and measure its distance to the
    // boundary: at y ≈ 3.4e6 micro-nats, a last-ulp ln disagreement
    // moves y by ~5e-10, so a 1e-5 floor margin is ~10^4× clearance.
    // (Measured: 1.1e-4 at sf0.001, 2.5e-5 at sf0.01, 6.4e-4 at sf0.1.)
    val docs = Tables.documents(spark, sfDir)
    val withWs = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("ws"))
    val pairs = withWs
      .select(col("doc_id"), col("ws"),
        explode(when(size(col("ws")) >= 2, sequence(lit(1), size(col("ws")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(element_at(col("ws"), col("i")).as("w1"),
        element_at(col("ws"), col("i") + lit(1)).as("w2"))
    val tok = withWs.select(explode(col("ws")).as("word"))
    val wc = tok.groupBy("word").agg(count(lit(1)).as("c"))
    val tot = wc.agg(sum("c").cast("double").as("t"),
      (count(lit(1)) + 1L).cast("double").as("v"))
    val bc = pairs.groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("c12"))
    val y = bc
      .join(broadcast(wc.select(col("word").as("w1"), col("c").cast("double").as("c1"))), Seq("w1"))
      .join(broadcast(wc.select(col("word").as("w2"), col("c").cast("double").as("c2"))), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select((log(
        (lit(0.7) * ((col("c12") + lit(1.0)) / (col("c1") + col("v")))) +
          (lit(0.3) * ((col("c2") + lit(1.0)) / (col("t") + col("v"))))
      ) * lit(1000000.0)).as("y"))
      .select(least(col("y") - floor(col("y")), ceil(col("y")) - col("y")).as("d"))
      .agg(min("d")).collect().head.getDouble(0)
    assert(y > 1e-5, s"floor-boundary margin $y too small for a safe value oracle")
  }
}
