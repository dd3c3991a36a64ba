package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions._

/** CCNet-style language-model perplexity filtering over `documents` —
  * SURVEY.md §2.4. The canonical LLM-training-data quality gate the
  * heuristic rules (t02/t10/t11) cannot express: score every document
  * by how predictable its text is under an n-gram language model and
  * keep the low-perplexity band (Wenzek et al. 2019 "CCNet: Extracting
  * High Quality Monolingual Datasets from Web Crawl Data"; the same
  * gate appears in the Gopher/LLaMA/RedPajama pipelines). The reference
  * has no LM filter; this is part of the beyond-reference pipeline
  * suite (prompt §"training-data pipeline").
  *
  * Model: an interpolated bigram LM with Laplace smoothing, self-trained
  * on the corpus (CCNet trains KenLM on a trusted corpus; the fit/score
  * machinery is identical, the training frame is a parameter):
  *
  *   p(w2 | w1) = wBi·(c(w1,w2)+1)/(c(w1)+V) + wUni·(c(w2)+1)/(T+V)
  *
  * over a top-N vocabulary with out-of-vocabulary tokens mapped to
  * `<unk>` (the standard open-vocabulary construction — V counts the
  * unk bucket). A document's surprisal is the sum of −ln p over its
  * n−1 token transitions; `keep` gates mean transition surprisal
  * against a fixed budget.
  *
  * EXACTNESS ACROSS ENGINES (what makes the full value oracle safe):
  * every model quantity is an integer count; each transition's log-prob
  * is QUANTIZED ONCE, per distinct (w1, w2), to integer micro-nats
  * (floor(ln p · 1e6) — the per-pair float work), and everything after
  * that point is 64-bit integer arithmetic: the per-document sum is
  * order-invariant, and the keep comparison is exact. The only
  * cross-engine float risk is the single ln call per distinct pair
  * landing within ulps of a floor boundary; PerplexitySpec measures the
  * minimum boundary distance at the driver SFs (≥1.1e-4 micro-nats,
  * ~10^5× above last-ulp ln noise at this magnitude).
  *
  * Scale shape (100 TB): the vocabulary and unigram model are bounded
  * (top-N + unk) and BROADCAST; the bigram model is corpus-scale and
  * joins the transition stream by its (w1, w2) key — a bucket-equality
  * shuffle join, never a cross product; the per-document reduction is
  * one sum aggregate on the doc key. Corpus-scale work is therefore:
  * one unigram count shuffle, one bigram count shuffle, one scoring
  * join, one doc-key agg. At 100 TB the mapped transition stream (fed
  * to both the bigram count and the scoring join) would be persisted
  * rather than recomputed; at bench scale the second scan is cheaper
  * than the write.
  */
object Perplexity {

  /** LM-filter verdicts for `docs`: per document, exact token stats,
    * the integer micro-nat transition surprisal under the interpolated
    * bigram model self-trained on `docs`, and the keep flag
    * (mean transition surprisal ≤ `thresholdMicroNats`).
    *
    * `wBi`/`wUni` are taken as two explicit doubles (never derived as
    * 1−wBi: 1.0−0.7 ≠ 0.3 in binary, and the oracle writes 0.3). */
  def perplexityFilter(docs: DataFrame, topNVocab: Int,
                       thresholdMicroNats: Long,
                       wBi: Double = 0.7, wUni: Double = 0.3): DataFrame = {
    val unk = "<unk>"
    // one staged tokenizer split per scan branch (the t02/pl01 lesson)
    val withWs = docs.select(col("doc_id"), tokens(col("text")).as("ws"))
    val tok = withWs.select(col("doc_id"), explode(col("ws")).as("word"))

    val wc = tok.groupBy("word").agg(count(lit(1)).as("c"))
    // top-N vocabulary, deterministic tiebreak — a bounded TakeOrdered,
    // so the mapping/model broadcasts no matter the corpus vocabulary
    val vocab = wc.orderBy(col("c").desc, col("word")).limit(topNVocab)
    // Laplace totals: T over the FULL corpus, V = |vocab| + 1 (unk)
    val tot = wc.agg(sum("c").cast("double").as("t"))
      .crossJoin(vocab.agg((count(lit(1)) + 1L).cast("double").as("v")))
    // mapped unigram model: vocab counts + the unk mass (T − Σ vocab)
    val uni = vocab.select(col("word"), col("c").cast("double").as("c"))
      .unionAll(
        wc.agg(sum("c").as("_all")).crossJoin(vocab.agg(sum("c").as("_inv")))
          .select(lit(unk).as("word"),
            (col("_all") - col("_inv")).cast("double").as("c")))

    // token transitions (w_i, w_i+1), map-only generator; guarded
    // sequence (Spark's sequence(1, 0) counts DOWN, not empty)
    val pairs = withWs
      .select(col("doc_id"), col("ws"),
        explode(when(size(col("ws")) >= 2, sequence(lit(1), size(col("ws")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"),
        element_at(col("ws"), col("i")).as("w1"),
        element_at(col("ws"), col("i") + lit(1)).as("w2"))
    val vFlag = broadcast(vocab.select(col("word"), lit(1).as("_inv")))
    def mapped(side: String): DataFrame => DataFrame = df => df
      .join(vFlag.withColumnRenamed("word", side).withColumnRenamed("_inv", s"_inv_$side"),
        Seq(side), "left")
      .withColumn(side, when(col(s"_inv_$side").isNull, lit(unk)).otherwise(col(side)))
      .drop(s"_inv_$side")
    val mp = mapped("w2")(mapped("w1")(pairs))

    val bc = mp.groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("c12"))

    // scoring: corpus-scale transition stream ⋈ bigram model on its key
    // (shuffle join at scale; the bounded unigram/total sides broadcast).
    // Parenthesization mirrors the oracle SQL literally — see the
    // exactness note on the object.
    val p: Column =
      (lit(wBi) * ((coalesce(col("c12"), lit(0.0)) + lit(1.0)) / (col("c1") + col("v")))) +
        (lit(wUni) * ((col("c2") + lit(1.0)) / (col("t") + col("v"))))
    val scored = mp
      .join(bc, Seq("w1", "w2"), "left")
      .join(broadcast(uni.select(col("word").as("w1"), col("c").as("c1"))), Seq("w1"))
      .join(broadcast(uni.select(col("word").as("w2"), col("c").as("c2"))), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), floor(log(p) * lit(1000000.0)).cast("long").as("lpq"))
    val sc = scored.groupBy("doc_id")
      .agg((-sum("lpq")).as("surprisal_q"), count(lit(1)).as("n_tr"))

    val st = tok
      .join(vFlag, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"))

    docs.select("doc_id")
      .join(st, Seq("doc_id"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        coalesce(col("n_tr"), lit(0L)).as("n_tr"),
        coalesce(col("surprisal_q"), lit(0L)).as("surprisal_q"),
        (coalesce(col("surprisal_q"), lit(0L)) <=
          lit(thresholdMicroNats) * coalesce(col("n_tr"), lit(0L))).as("keep"))
  }

  /** Registered entry: the corpus-trained filter at the standard 20k
    * vocabulary cap (vacuous on this 31-word synthetic corpus — the
    * unk path is exercised by PerplexitySpec's planted small-vocab
    * corpus, the t11 degenerate-rule pattern) and a 3.4 nat/transition
    * budget, which splits the corpus non-vacuously at both test SFs
    * (232/500 keep at sf0.001, 238/500 at sf0.01). */
  val t13 = Q.sql(
    "t13_lm_perplexity",
    """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') AS ws FROM documents),
      |tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
      |wc AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
      |vocab AS (SELECT word, c FROM wc ORDER BY c DESC, word LIMIT 20000),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t,
      |               CAST((SELECT count(*) FROM vocab) + 1 AS DOUBLE) AS v FROM wc),
      |uni AS (SELECT word, CAST(c AS DOUBLE) AS c FROM vocab
      |        UNION ALL
      |        SELECT '<unk>', CAST((SELECT sum(c) FROM wc) - (SELECT sum(c) FROM vocab) AS DOUBLE)),
      |mp AS (
      |  SELECT doc_id,
      |    CASE WHEN v1.word IS NULL THEN '<unk>' ELSE p.w1 END AS w1,
      |    CASE WHEN v2.word IS NULL THEN '<unk>' ELSE p.w2 END AS w2
      |  FROM (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      |        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w)) p
      |  LEFT JOIN vocab v1 ON p.w1 = v1.word
      |  LEFT JOIN vocab v2 ON p.w2 = v2.word),
      |bc AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12 FROM mp GROUP BY w1, w2),
      |lp AS (
      |  SELECT mp.doc_id,
      |    CAST(floor(ln((0.7 * ((COALESCE(b.c12, 0.0) + 1.0) / (u1.c + v))) +
      |               (0.3 * ((u2.c + 1.0) / (t + v)))) * 1000000.0) AS BIGINT) AS lpq
      |  FROM mp
      |  LEFT JOIN bc b ON mp.w1 = b.w1 AND mp.w2 = b.w2
      |  JOIN uni u1 ON mp.w1 = u1.word
      |  JOIN uni u2 ON mp.w2 = u2.word
      |  CROSS JOIN tot),
      |sc AS (SELECT doc_id, CAST(-sum(lpq) AS BIGINT) AS surprisal_q,
      |              count(*) AS n_tr FROM lp GROUP BY doc_id),
      |st AS (SELECT t.doc_id, count(*) AS n_tok,
      |              CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |       FROM tok t LEFT JOIN vocab v ON t.word = v.word GROUP BY t.doc_id)
      |SELECT d.doc_id, st.n_tok, st.n_oov,
      |  COALESCE(sc.n_tr, 0) AS n_tr,
      |  COALESCE(sc.surprisal_q, 0) AS surprisal_q,
      |  COALESCE(sc.surprisal_q, 0) <= 3400000 * COALESCE(sc.n_tr, 0) AS keep
      |FROM documents d JOIN st ON d.doc_id = st.doc_id
      |LEFT JOIN sc ON d.doc_id = sc.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    perplexityFilter(Tables.documents(s, dir),
      topNVocab = 20000, thresholdMicroNats = 3400000L)
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(t13)
}
