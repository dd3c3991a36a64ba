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

  /** Pearson χ² independence test between two categorical columns —
    * the hypothesis-test surface of the reference
    * (mllib/src/main/scala/org/apache/spark/mllib/stat/test/
    * ChiSqTest.scala:1): statistic, degrees of freedom AND p-value,
    * completing fs01 (which uses the same statistic as a selection
    * score).
    *
    * The contingency table is one partial-agg groupBy (bounded by
    * category cardinality), margins are broadcast re-aggregates of the
    * CELLS (never a second corpus pass), the statistic is map-side cell
    * math. The p-value P(χ²_dof > x) for even dof has the exact finite
    * form exp(−x/2)·Σ_{k<dof/2} (x/2)^k/k! — computed IN-PLAN with the
    * identical pow/factorial formulation on both engines (factorials
    * stay exact in doubles for dof ≤ ~36; [[chiSqPValue]] covers the
    * general case driver-side and is spec'd against classic table
    * values).
    *
    * @return one row (statistic, dof, p_value)
    */
  def chiSqTest(data: DataFrame, a: String, b: String): DataFrame = {
    val cells = data.groupBy(col(a).as("ca"), col(b).as("cb"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("ca").agg(sum("o").as("ra"))
    val cb = cells.groupBy("cb").agg(sum("o").as("cbt"))
    val n = cells.agg(sum("o").as("n"))
    val e = col("ra").cast("double") * col("cbt") / col("n")
    val stat = cells.join(broadcast(ra), "ca").join(broadcast(cb), "cb")
      .crossJoin(broadcast(n))
      .select(((col("o") - e) * (col("o") - e) / e).as("cell"))
      .agg(round(sum("cell"), 6).as("statistic"))
    val dims = cells.agg(
      ((count_distinct(col("ca")) - 1) * (count_distinct(col("cb")) - 1)).as("dof"))
    // survival series for even dof: t_k = (x/2)^k/k!, k = 0..dof/2−1
    val x2 = col("statistic") / 2.0
    val fact = (k: org.apache.spark.sql.Column) =>
      when(k === 0, lit(1.0)).otherwise(
        aggregate(sequence(lit(1), k), lit(1.0), (acc, i) => acc * i.cast("double")))
    val series = aggregate(
      transform(sequence(lit(0), (col("dof") / 2).cast("int") - 1),
        k => pow(x2, k.cast("double")) / fact(k)),
      lit(0.0), (acc, t) => acc + t)
    stat.crossJoin(dims)
      .select(col("statistic"), col("dof"),
        // the finite series is exact only for EVEN dof (odd dof would
        // additionally need erfc) — odd-dof callers read NULL here and
        // use chiSqPValue; Spark's sequence() would otherwise count
        // BACKWARD for dof < 2 and silently corrupt the series
        when(pmod(col("dof"), lit(2)) === 0, round(exp(-x2) * series, 6))
          .otherwise(lit(null).cast("double")).as("p_value"))
  }

  /** General-dof upper-tail χ² probability (regularized incomplete
    * gamma Q(dof/2, x/2)), series/continued-fraction split — driver-side
    * scalar math for callers that need odd dof; FeaturesSpec pins it to
    * classic table values. */
  def chiSqPValue(x: Double, dof: Int): Double = {
    require(dof >= 1 && x >= 0)
    val s = dof / 2.0
    val z = x / 2.0
    def lnGamma(a: Double): Double = {
      // Lanczos g=7, n=9 — standard coefficients
      val c = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
        771.32342877765313, -176.61502916214059, 12.507343278686905,
        -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
      val a1 = a - 1.0
      var acc = c(0)
      for (i <- 1 until 9) acc += c(i) / (a1 + i)
      val t = a1 + 7.5
      0.5 * math.log(2 * math.Pi) + (a1 + 0.5) * math.log(t) - t + math.log(acc)
    }
    if (z == 0) return 1.0
    if (z < s + 1.0) {
      // P(s,z) by series, Q = 1 - P
      var term = 1.0 / s
      var sum = term
      var k = 1
      while (math.abs(term) > math.abs(sum) * 1e-15 && k < 10000) {
        term *= z / (s + k); sum += term; k += 1
      }
      1.0 - sum * math.exp(-z + s * math.log(z) - lnGamma(s))
    } else {
      // Q(s,z) by Lentz continued fraction
      var b = z + 1.0 - s
      var c0 = 1e300
      var d = 1.0 / b
      var h = d
      var i = 1
      var del = 0.0
      do {
        val an = -i * (i - s)
        b += 2.0
        d = an * d + b; if (math.abs(d) < 1e-300) d = 1e-300
        c0 = b + an / c0; if (math.abs(c0) < 1e-300) c0 = 1e-300
        d = 1.0 / d
        del = d * c0
        h *= del
        i += 1
      } while (math.abs(del - 1.0) > 1e-15 && i < 10000)
      math.exp(-z + s * math.log(z) - lnGamma(s)) * h
    }
  }

  /** Registered pass: independence of the quantity bucket (l_quantity
    * mod 5) and line number over lineitem — two genuinely independent
    * generator dimensions, so the p-value lands strictly inside (0, 1)
    * and the even-dof series is exercised for real (dof = 24). */
  val fs02 = Q.sql(
    "fs02_chisq_test",
    """WITH cells AS (
      |  SELECT CAST(l_quantity AS BIGINT) % 5 AS ca, l_linenumber AS cb, count(*) AS o
      |  FROM lineitem GROUP BY 1, 2),
      |ra AS (SELECT ca, sum(o) AS ra FROM cells GROUP BY ca),
      |cbt AS (SELECT cb, sum(o) AS cbt FROM cells GROUP BY cb),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      |stat AS (
      |  SELECT round(sum(
      |    (o - CAST(ra.ra AS DOUBLE) * cbt.cbt / n.n)
      |      * (o - CAST(ra.ra AS DOUBLE) * cbt.cbt / n.n)
      |      / (CAST(ra.ra AS DOUBLE) * cbt.cbt / n.n)), 6) AS statistic
      |  FROM cells JOIN ra ON cells.ca = ra.ca JOIN cbt ON cells.cb = cbt.cb CROSS JOIN n),
      |dims AS (
      |  SELECT CAST((count(DISTINCT ca) - 1) * (count(DISTINCT cb) - 1) AS BIGINT) AS dof
      |  FROM cells)
      |SELECT statistic, dof,
      |  round(exp(-statistic / 2.0) * list_sum(list_transform(
      |    range(0, dof // 2),
      |    k -> pow(statistic / 2.0, CAST(k AS DOUBLE)) / CAST(factorial(CAST(k AS INT)) AS DOUBLE))), 6)
      |    AS p_value
      |FROM stat CROSS JOIN dims""".stripMargin) { (s, dir) =>
    chiSqTest(
      Tables.lineitem(s, dir)
        .select(pmod(col("l_quantity").cast("long"), lit(5)).as("qb"), col("l_linenumber")),
      "qb", "l_linenumber")
  }

  val all: Seq[Q] = Seq(fs01, fs02)
}
