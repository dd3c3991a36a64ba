package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions.tokens

/** Feature selection — the reference's MLlib feature-selection surface
  * (mllib/src/main/scala/org/apache/spark/mllib/feature/
  * ChiSqSelector.scala:1) re-expressed over the documents table: select
  * the k terms whose PRESENCE is most dependent on the document's
  * language by the chi-squared statistic of each term's 2×L contingency
  * table — the classic text-pipeline move for pruning a vocabulary to
  * its label-informative core before training a classifier.
  */
object Features {

  /** Top-k terms by χ² of (presence × label).
    *
    * Shape at scale: per-(term, label) presence counts are one partial
    * agg shuffled on term (vocabulary-safe — the vocabulary never sits
    * on one node or in a broadcast); the label margin (L rows) and the
    * corpus size (1 row) ride as broadcasts; every χ² cell is then
    * map-side column math. Terms below `minDf` are dropped FIRST —
    * hapaxes carry no usable signal and pruning them bounds the ranked
    * set.
    *
    * Determinism across engines: every count is exact integer; each
    * cell's double arithmetic is written identically in the oracle, so
    * only the per-term SUM over L cells is order-dependent — χ² is
    * therefore rounded (6 dp) on both sides and RANKED on the rounded
    * value with a term-asc tiebreak, t06's rule.
    *
    * @return (rk, term, chi2) — rank 1..k by χ² desc
    */
  def chiSqSelect(docs: DataFrame, labelCol: String, k: Int, minDf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val present = docs.select(col(labelCol).as("label"),
      explode(array_distinct(tokens(col("text")))).as("term"))
    val nTL = present.groupBy("term", "label").agg(count(lit(1)).as("o1"))
    val nT = nTL.groupBy("term").agg(sum("o1").as("df"))
      .filter(col("df") >= minDf)
    val nL = docs.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("nl"))
    val n = docs.agg(count(lit(1)).as("n"))
    // all 2×L cells per candidate term: cross the kept terms with the
    // label margin (L rows, broadcast) and fill absent (term, label)
    // presence counts with 0 — the zero cells still carry signal
    val cells = nT.crossJoin(broadcast(nL)).crossJoin(broadcast(n))
      .join(nTL, Seq("term", "label"), "left")
      .withColumn("o1", coalesce(col("o1"), lit(0L)))
    val e1 = col("df").cast("double") * col("nl") / col("n")
    val e0 = (col("n") - col("df")).cast("double") * col("nl") / col("n")
    val o1 = col("o1").cast("double")
    val o0 = (col("nl") - col("o1")).cast("double")
    // a zero EXPECTED cell forces a zero observed cell (df = 0 or
    // df = n): the cell contributes nothing, and dividing would be 0/0 —
    // the standard χ² convention, guarded identically in the oracle
    val cell = when(e1 > 0, (o1 - e1) * (o1 - e1) / e1).otherwise(0.0) +
      when(e0 > 0, (o0 - e0) * (o0 - e0) / e0).otherwise(0.0)
    val chi2 = cells.groupBy("term")
      .agg(round(sum(cell), 6).as("chi2"))
    // top-k FIRST (TakeOrderedAndProject — distributed per-partition
    // heaps, plan-locked in PlanSpec), THEN the rank window over only k
    // rows: an unpartitioned row_number over the full χ² table would
    // funnel the whole vocabulary through one reducer
    val w = Window.orderBy(col("chi2").desc, col("term"))
    chi2.orderBy(col("chi2").desc, col("term")).limit(k)
      .withColumn("rk", row_number().over(w))
      .select(col("rk"), col("term"), col("chi2"))
  }

  /** Registered pass: top-50 language-discriminative terms, df ≥ 10. */
  val fs01 = Q.sql(
    "fs01_chisq_select",
    """WITH present AS (
      |  SELECT lang AS label, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS term
      |  FROM documents),
      |ntl AS (SELECT term, label, count(*) AS o1 FROM present GROUP BY term, label),
      |nt AS (SELECT term, sum(o1) AS df FROM ntl GROUP BY term HAVING sum(o1) >= 10),
      |nl AS (SELECT lang AS label, count(*) AS nl FROM documents GROUP BY lang),
      |n AS (SELECT count(*) AS n FROM documents),
      |cells AS (
      |  SELECT nt.term, nt.df, nl.label, nl.nl, n.n, coalesce(ntl.o1, 0) AS o1
      |  FROM nt CROSS JOIN nl CROSS JOIN n
      |  LEFT JOIN ntl ON ntl.term = nt.term AND ntl.label = nl.label),
      |chi AS (
      |  SELECT term, round(sum(
      |      CASE WHEN CAST(df AS DOUBLE) * nl / n > 0 THEN
      |        (o1 - CAST(df AS DOUBLE) * nl / n) * (o1 - CAST(df AS DOUBLE) * nl / n)
      |          / (CAST(df AS DOUBLE) * nl / n) ELSE 0 END
      |    + CASE WHEN CAST(n - df AS DOUBLE) * nl / n > 0 THEN
      |        ((nl - o1) - CAST(n - df AS DOUBLE) * nl / n) * ((nl - o1) - CAST(n - df AS DOUBLE) * nl / n)
      |          / (CAST(n - df AS DOUBLE) * nl / n) ELSE 0 END), 6) AS chi2
      |  FROM cells GROUP BY term),
      |ranked AS (
      |  SELECT row_number() OVER (ORDER BY chi2 DESC, term) AS rk, term, chi2 FROM chi)
      |SELECT CAST(rk AS INT) AS rk, term, chi2 FROM ranked WHERE rk <= 50
      |ORDER BY rk""".stripMargin) { (s, dir) =>
    chiSqSelect(Tables.documents(s, dir), "lang", k = 50, minDf = 10L)
      .orderBy("rk")
  }

  val all: Seq[Q] = Seq(fs01)
}
