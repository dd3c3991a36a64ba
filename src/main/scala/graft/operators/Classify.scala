package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions.tokens

/** Multinomial Naive Bayes text classification (reference mllib/src/
  * main/scala/org/apache/spark/mllib/classification/NaiveBayes.scala:1)
  * re-expressed Spark-first — the quality/language-filter model a
  * training-data pipeline actually ships (fs01's χ²-selected features
  * feed exactly this). t03's heuristic shares the likelihood shape;
  * this is the full estimator: class PRIORS, full-vocabulary Laplace
  * likelihoods, and a scoring pass exact enough to carry a complete
  * DuckDB value oracle.
  *
  * Everything is counts, so every stage is a partial aggregate:
  *  - (lang, term) counts shuffle on TERM (vocabulary-safe — t06/fs01's
  *    discipline); per-label token totals and doc priors collapse to L
  *    rows; vocabulary size to one row — both ride as broadcasts;
  *  - scoring joins each doc's term counts against the likelihood table
  *    (shuffle on term, linear in corpus × L) and LEFT-joins so a term
  *    never seen with some label contributes that label's smoothed
  *    default log(λ/(N_l + λV)) — the exact multinomial score, not the
  *    drop-missing shortcut;
  *  - the per-doc argmax is a per-doc-partitioned window (never global).
  *
  * Oracle discipline: log arguments are exact integer ratios (identical
  * IEEE ops both engines); only the per-doc score SUM absorbs
  * summation-order noise, so it alone is rounded (4 dp) and the argmax
  * ranks on the ROUNDED score with a lang tiebreak (t06's rule).
  */
object Classify {

  /** Train multinomial NB (Laplace λ=1) on `train`, score `score`;
    * @return (doc_id, pred_lang, score) — the winning label's rounded
    *         log-posterior, deterministic lang-asc tiebreak */
  def naiveBayes(train: DataFrame, score: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val trainToks = train.select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("term"))
    // per-(label, term) counts — the sufficient statistics
    val tl = trainToks.groupBy("lang", "term").agg(count(lit(1)).as("c"))
    val nl = tl.groupBy("lang").agg(sum("c").cast("long").as("nl"))
    val vocab = tl.select(count_distinct(col("term")).as("v"))
    val priors = train.groupBy("lang").agg(count(lit(1)).as("dl"))
      .crossJoin(broadcast(train.select(count(lit(1)).as("nd"))))
      .select(col("lang"), log(col("dl") * lit(1.0) / col("nd")).as("prior"))
    val labels = priors.join(nl, "lang").crossJoin(broadcast(vocab))
      .select(col("lang"), col("prior"),
        log(lit(1.0) / (col("nl") + col("v"))).as("defll"))
    val lik = tl.join(broadcast(nl), "lang").crossJoin(broadcast(vocab))
      .select(col("lang"), col("term"),
        log((col("c") + lit(1.0)) / (col("nl") + col("v"))).as("ll"))

    val dt = score.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    val scored = dt.crossJoin(broadcast(labels))
      .join(lik, Seq("term", "lang"), "left")
      .select(col("doc_id"), col("lang"), col("prior"),
        (col("cnt") * coalesce(col("ll"), col("defll"))).as("contrib"))
      .groupBy("doc_id", "lang")
      .agg(round(max(col("prior")) + sum(col("contrib")), 4).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"), col("score"))
  }

  val nb01 = Q.sql(
    "nb01_naive_bayes",
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |tl AS (SELECT lang, term, count(*) AS c FROM toks GROUP BY lang, term),
      |nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nl FROM tl GROUP BY lang),
      |v AS (SELECT count(DISTINCT term) AS v FROM toks),
      |d AS (SELECT lang, count(*) AS dl FROM documents GROUP BY lang),
      |n AS (SELECT count(*) AS nd FROM documents),
      |labels AS (
      |  SELECT d.lang, ln(d.dl * 1.0 / n.nd) AS prior,
      |         ln(1.0 / (nl.nl + v.v)) AS defll
      |  FROM d CROSS JOIN n JOIN nl ON d.lang = nl.lang CROSS JOIN v),
      |lik AS (
      |  SELECT tl.lang, tl.term, ln((tl.c + 1.0) / (nl.nl + v.v)) AS ll
      |  FROM tl JOIN nl ON tl.lang = nl.lang CROSS JOIN v),
      |dt AS (SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY doc_id, term),
      |scored AS (
      |  SELECT dt.doc_id, L.lang,
      |    round(max(L.prior) + sum(dt.cnt * coalesce(lik.ll, L.defll)), 4) AS score
      |  FROM dt CROSS JOIN labels L
      |  LEFT JOIN lik ON lik.term = dt.term AND lik.lang = L.lang
      |  GROUP BY dt.doc_id, L.lang),
      |ranked AS (
      |  SELECT doc_id, lang, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
      |  FROM scored)
      |SELECT doc_id, lang AS pred_lang, score FROM ranked WHERE rk = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    naiveBayes(docs, docs).orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(nb01)
}
