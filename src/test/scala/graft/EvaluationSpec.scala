package graft

import org.apache.spark.sql.functions._
import graft.operators.Evaluation

/** Planted-value tests for the evaluation metric suite (reference
  * mllib/evaluation parity): hand-computed AUCs including the tied-score
  * path, a brute-force Mann-Whitney cross-check, exact confusion-cell
  * metrics, the OLS r2 == explained-variance identity, and hand-computed
  * MAP/NDCG with an empty-truth user. */
class EvaluationSpec extends SparkTestBase {

  test("ev01 binary: perfect separation gives AUC 1, tie gives 0.5 / PR 0.75") {
    import TestSpark.spark.implicits._
    val perfect = Seq((0.9, 1), (0.8, 1), (0.7, 0), (0.6, 0))
      .toDF("score", "pos")
    val p = Evaluation.binaryMetrics(perfect).head
    assert(p.getAs[Double]("auc_roc") == 1.0)
    assert(p.getAs[Double]("auc_pr") == 1.0)

    // one tied threshold: ROC is the diagonal (AUC .5); PR curve is the
    // single point (recall 1, precision .5) with (0,1) prepended →
    // trapezoid (1-0)*(0.5+1)/2 = 0.75
    val tied = Seq((0.5, 1), (0.5, 0)).toDF("score", "pos")
    val t = Evaluation.binaryMetrics(tied).head
    assert(t.getAs[Long]("n_thresholds") == 1L)
    assert(t.getAs[Double]("auc_roc") == 0.5)
    assert(t.getAs[Double]("auc_pr") == 0.75)
  }

  test("ev01 binary: rank-sum AUC equals brute-force pair counting") {
    import TestSpark.spark.implicits._
    // deterministic pseudo-random scores with heavy ties (7 levels)
    val rows = (1 to 400).map { i =>
      (((i * 37) % 7).toDouble, if ((i * 61) % 5 < 2) 1 else 0)
    }
    val auc = Evaluation.binaryMetrics(rows.toDF("score", "pos"))
      .head.getAs[Double]("auc_roc")
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val brute = math.rint(wins / (pos.size * neg.size) * 1e6) / 1e6
    assert(auc == brute, s"rank-sum $auc vs brute $brute")
  }

  test("ev02 multiclass: exact confusion-cell metrics") {
    import TestSpark.spark.implicits._
    // actual a: 3 rows (2 correct), actual b: 2 rows (1 correct, 1 → a)
    val pl = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"))
      .toDF("actual", "pred")
    val out = Evaluation.multiclassMetrics(pl).collect()
    val a = out.find(_.getAs[String]("label") == "a").get
    assert(a.getAs[Long]("n_actual") == 3 && a.getAs[Long]("n_pred") == 3 &&
      a.getAs[Long]("tp") == 2)
    assert(a.getAs[Double]("prec") == 0.666667 && a.getAs[Double]("recall") == 0.666667)
    assert(a.getAs[Double]("f1") == 0.666667)
    val b = out.find(_.getAs[String]("label") == "b").get
    assert(b.getAs[Double]("prec") == 0.5 && b.getAs[Double]("recall") == 0.5)
    assert(out.forall(_.getAs[Double]("accuracy") == 0.6))
  }

  test("ev03 regression: exact fit scores perfectly; registered invariants hold") {
    import TestSpark.spark.implicits._
    // residuals of a perfect fit: all zeros → mse/rmse/mae 0, r2 = ev = 1
    val exact = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1)).toDF("x", "y")
    val ssTot = {
      val m = exact.agg(avg("y")).head.getDouble(0)
      exact.select(sum((col("y") - m) * (col("y") - m))).head.getDouble(0)
    }
    val r = Evaluation.regressionMetricsAgg(
      exact, col("y") - (lit(1.0) + lit(2.0) * col("x")), ssTot, 50.0).head
    assert(r.getAs[Double]("mse") == 0.0 && r.getAs[Double]("mae") == 0.0)
    assert(r.getAs[Double]("r2") == 1.0 &&
      r.getAs[Double]("explained_variance") == 1.0)

    // registered query: OLS with intercept ⇒ Σresid = 0 ⇒ r2 ==
    // explained variance exactly; rmse² == mse to rounding
    val reg = Evaluation.ev03.run(spark, sfDir).head
    assert(reg.getAs[Double]("r2") == reg.getAs[Double]("explained_variance"))
    val mse = reg.getAs[Double]("mse"); val rmse = reg.getAs[Double]("rmse")
    assert(math.abs(rmse * rmse - mse) < 1e-3)
    assert(reg.getAs[Double]("mae") <= rmse + 1e-9)
  }

  test("ev04 ranking: hand-computed MAP/NDCG with an empty-truth user") {
    import TestSpark.spark.implicits._
    // user 1: preds [a hit, b miss, c hit], truth {a, c, d}
    // user 2: preds [z], truth ∅ → contributes 0 to every mean
    val preds = Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3), (2L, "z", 1))
      .toDF("c", "part", "pos")
    val truth = Seq((1L, "a"), (1L, "c"), (1L, "d")).toDF("c", "part")
    val out = Evaluation.rankingMetrics(preds, truth).head
    assert(out.getAs[Long]("users") == 2L)
    // u1: p5 = 2/5, p10 = 2/10; ap = (1/1 + 2/3)/3; ndcg = (1/ln2 + 1/ln4)
    // over (1/ln2 + 1/ln3 + 1/ln4); u2 all-zero
    val ap1 = (1.0 + 2.0 / 3.0) / 3.0
    val ndcg1 = (1 / math.log(2) + 1 / math.log(4)) /
      (1 / math.log(2) + 1 / math.log(3) + 1 / math.log(4))
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(out.getAs[Double]("precision_at_5") == r6(0.4 / 2))
    assert(out.getAs[Double]("precision_at_10") == r6(0.2 / 2))
    assert(out.getAs[Double]("mean_ap") == r6(ap1 / 2))
    assert(out.getAs[Double]("ndcg_at_10") == r6(ndcg1 / 2))
  }

  test("ev05 multilabel: hand-computed suite incl. an empty prediction set") {
    import TestSpark.spark.implicits._
    // doc1 L={A} P={A}; doc2 L={A,N} P={N,R}; doc3 L={R} P=∅
    val per = Seq(
      (1, 0, 0, 1, 0, 0),
      (1, 1, 0, 0, 1, 1),
      (0, 0, 1, 0, 0, 0))
      .toDF("la", "ln", "lr", "pa", "pn", "pr")
    val m = Evaluation.multilabelMetrics(per).head
    assert(m.getAs[Long]("n_docs") == 3L && m.getAs[Long]("n_labels") == 3L)
    assert(m.getAs[Double]("subset_accuracy") == 0.333333)
    assert(m.getAs[Double]("accuracy") == 0.444444)
    assert(m.getAs[Double]("hamming_loss") == 0.333333)
    assert(m.getAs[Double]("doc_precision") == 0.5)
    assert(m.getAs[Double]("doc_recall") == 0.5)
    assert(m.getAs[Double]("doc_f1") == 0.5)
    assert(m.getAs[Double]("micro_precision") == 0.666667)
    assert(m.getAs[Double]("micro_recall") == 0.5)
    assert(m.getAs[Double]("micro_f1") == 0.571429)
  }

  test("ev01/ev02/ev04 registered entries run with sane shapes") {
    val b = Evaluation.ev01.run(spark, sfDir).head
    assert(b.getAs[Long]("n_pos") > 0 && b.getAs[Long]("n_neg") > 0)
    val auc = b.getAs[Double]("auc_roc")
    assert(auc >= 0.0 && auc <= 1.0)
    val m = Evaluation.ev02.run(spark, sfDir).collect()
    assert(m.length == 5 && m.map(_.getAs[String]("label")).distinct.length == 5)
    val rk = Evaluation.ev04.run(spark, sfDir).head
    assert(rk.getAs[Long]("users") > 0)
    val nd = rk.getAs[Double]("ndcg_at_10")
    assert(nd >= 0.0 && nd <= 1.0)
  }
}
