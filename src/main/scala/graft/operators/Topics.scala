package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** LDA topic modeling (reference mllib/src/main/scala/org/apache/spark/
  * mllib/clustering/LDA.scala:1 — the 1.3-era EM optimizer over the
  * doc⇄term graph) re-expressed as DataFrame iteration, the corpus-
  * exploration move of an LLM-data pipeline (what IS in this crawl?).
  *
  * Smoothed EM on word-count edges (d, w, cnt): each round every edge
  * computes its topic responsibilities
  *
  *   γ_k ∝ (n_dk + α)(n_wk + β) / (n_k + V·β)
  *
  * and the three count tables re-aggregate: n_dk (doc-topic) shuffles
  * on doc, n_wk (topic-word) shuffles on TERM — vocabulary-safe, the
  * same discipline as t06's df join — and n_k is a 1-row aggregate that
  * rides back as plan literals. Topics are k COLUMNS, not exploded
  * rows, so a round is two key-equality joins + two partial-agg
  * groupBys + one bounded agg, all codegen column math; nothing
  * driver-side scales beyond k.
  *
  * Init is hash-derived per (edge, topic) — seeded end-to-end like t05
  * and r01. Loop state is checkpointed WITHOUT inherited stats: each
  * round joins BOTH previous leaves, so plain checkpoint stats would
  * double in bit-length per round (see GraftDatasetFactory.
  * localCheckpointFreshStats).
  */
object Topics {

  private def cut(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftshim.GraftDatasetFactory.localCheckpointFreshStats(df)

  /** Lazy lineage cut (r16): the next round's topic-mass aggregate
    * materializes γ and n_wk in one cascaded job instead of two eager
    * checkpoint jobs per round — see GraftDatasetFactory. */
  private def cutLazy(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftshim.GraftDatasetFactory.localCheckpointFreshStatsLazy(df)

  /** Train and return the topic-word summary: for every topic, the
    * `topWords` highest-φ terms, φ_wk = (n_wk + β)/(n_k + V·β).
    *
    * @param docs (doc_id, text)
    * @return (topic, rk, term, phi6) ordered by (topic, rk)
    */
  def ldaTopics(docs: DataFrame, k: Int, iters: Int = 10, topWords: Int = 5,
                alpha: Double = 0.1, beta: Double = 0.1, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = docs
      .select(col("doc_id").as("d"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("d", "w").agg(count(lit(1)).cast("double").as("cnt"))
      .localCheckpoint(false) // lazy: the vocab count below materializes (r16)
    val vocabSize = edges.select("w").distinct().count().toDouble

    def ts(prefix: String): Seq[String] = (0 until k).map(j => s"$prefix$j")

    // seeded init: per-edge hash responsibilities, normalized, weighted
    // by the edge count — then aggregated into the three count tables
    val g0: Seq[Column] = (0 until k).map(j =>
      lit(1.0) + pmod(xxhash64(col("d"), col("w"), lit(seed + j)), lit(1000L))
        .cast("double") / 1000.0)
    val z0 = g0.reduce(_ + _)
    val gInit = edges.select(
      col("d") +: col("w") +: (0 until k).map(j =>
        (col("cnt") * g0(j) / z0).as(s"g$j")): _*)

    def aggTo(g: DataFrame, key: String): DataFrame = {
      val sums = (0 until k).map(j => sum(col(s"g$j")).as(s"t$j"))
      g.groupBy(key).agg(sums.head, sums.tail: _*)
    }
    var nDK = aggTo(gInit, "d") // single-consumer: plan over the edges checkpoint (r16)
    var nWK = cut(aggTo(gInit, "w"))

    def nK(wk: DataFrame): Array[Double] = {
      val sums = (0 until k).map(j => sum(col(s"t$j")).as(s"t$j"))
      val row = wk.agg(sums.head, sums.tail: _*).head
      Array.tabulate(k)(row.getDouble)
    }

    for (_ <- 1 to iters) {
      val topicMass = nK(nWK)
      val dk = nDK.select(col("d") +: ts("t").zipWithIndex.map {
        case (c, j) => col(c).as(s"dk$j") }: _*)
      val wk = nWK.select(col("w") +: ts("t").zipWithIndex.map {
        case (c, j) => col(c).as(s"wk$j") }: _*)
      val scored = edges.join(dk, "d").join(wk, "w")
      val g: Seq[Column] = (0 until k).map(j =>
        (col(s"dk$j") + alpha) * (col(s"wk$j") + beta) /
          lit(topicMass(j) + vocabSize * beta))
      val z = g.reduce(_ + _)
      val gamma = scored.select(
        col("d") +: col("w") +: (0 until k).map(j =>
          (col("cnt") * g(j) / z).as(s"g$j")): _*)
      // one materialization feeds both re-aggregations; nWK stays
      // checkpointed (it is read twice — the E-step join and the
      // topic-mass aggregate — one evaluation keeps them consistent).
      // nDK is EAGERLY checkpointed (r17 adjudication): r16 demoted it
      // to a plan over the gamma checkpoint (single consumer, −1 job per
      // round), the builder's A/B read neutral, but BOTH r16 driver runs
      // read lda01 +30–36%; a same-host 5-round A/B this round read the
      // two variants equal within noise (plan min 4.78 s vs eager min
      // 4.55 s, overlapping samples), so the r15 eager shape — whose
      // driver reading was clean — is restored.
      val gammaCk = cutLazy(gamma)
      nDK = cut(aggTo(gammaCk, "d"))
      nWK = cutLazy(aggTo(gammaCk, "w"))
    }

    val topicMass = nK(nWK)
    val perTopic = (0 until k).map { j =>
      nWK.select(lit(j).as("topic"), col("w").as("term"),
        round((col(s"t$j") + beta) / lit(topicMass(j) + vocabSize * beta), 6).as("phi6"))
    }.reduce(_ unionByName _)
    // native bounded-heap top-k per topic (q39's operator) — the rank
    // window then runs over ≤ k·topWords rows, never the vocabulary
    val top = graft.plans.TopK.perKey(perTopic, "topic", "phi6", "term", topWords)
    val w = Window.partitionBy("topic").orderBy(col("phi6").desc, col("term"))
    top.withColumn("rk", row_number().over(w))
      .select(col("topic"), col("rk"), col("term"), col("phi6"))
      .orderBy("topic", "rk")
  }

  /** k=4 topics over the documents table, top-5 terms each. The EM fit
    * is seeded-engine-local, but three surfaces are certifiable (the
    * d08 claim-flag pattern): the ROW SET is exactly k×topWords (right
    * topic count, exactly topWords ranked terms each — DuckDB
    * enumerates it); `phi_in_unit` asserts every emitted 6dp-rounded φ
    * ∈ [0, 1] (the raw φ = (t_j+β)/(mass_j+Vβ) with t_j ≤ mass_j is
    * provably in (0, 1], so its rounding is provably in [0, 1] — the
    * flag bounds the ROUNDED value because a legitimate φ < 5e-7
    * rounds to 0); and
    * `term_in_vocab` asserts each top term is a real corpus token,
    * checked by an INDEPENDENT semi-join against the tokenized corpus
    * rather than by construction. TopicsSpec keeps pinning planted
    * two-vocabulary recovery and determinism via [[ldaTopics]]. */
  val lda01 = Q.sql(
    "lda01_topics",
    """SELECT t.topic, r.rk, TRUE AS phi_in_unit, TRUE AS term_in_vocab
      |FROM range(0, 4) t(topic) CROSS JOIN range(1, 6) r(rk)
      |ORDER BY topic, rk""".stripMargin) { (s, dir) =>
    import graft.functions.TextFunctions.tokens
    val docs = Tables.documents(s, dir)
    val vocab = docs.select(explode(tokens(col("text"))).as("term")).distinct()
      .withColumn("in_vocab", lit(true))
    ldaTopics(docs, k = 4, iters = 10)
      .join(vocab, Seq("term"), "left")
      .select(col("topic").cast("long").as("topic"), col("rk").cast("long").as("rk"),
        (col("phi6") >= 0.0 && col("phi6") <= 1.0).as("phi_in_unit"),
        coalesce(col("in_vocab"), lit(false)).as("term_in_vocab"))
      .orderBy("topic", "rk")
  }

  val all: Seq[Q] = Seq(lda01)
}
