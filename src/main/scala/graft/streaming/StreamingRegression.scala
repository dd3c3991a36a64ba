package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming linear regression with per-batch SGD (reference
  * mllib/src/main/scala/org/apache/spark/mllib/regression/
  * StreamingLinearRegressionWithSGD.scala:1 over
  * StreamingLinearAlgorithm.scala:1) — the model-maintenance half of
  * the regression surface: rg01 fits a corpus snapshot exactly, this
  * keeps weights CURRENT as micro-batches arrive.
  *
  * Per micro-batch the model takes `stepsPerBatch` full-batch gradient
  * steps on that batch (the reference runs its SGD optimizer to
  * convergence on each incoming RDD — trainOn,
  * StreamingLinearAlgorithm.scala:88): each step is ONE bounded
  * aggregate of d+1 residual sums with the current weights as plan
  * literals (rg02's discipline). Driver state is the (d+1)-vector —
  * exactly the reference's latestModel placement.
  */
class StreamingLinearModel(val dim: Int, eta: Double, stepsPerBatch: Int) {
  @volatile private var betaVec: Array[Double] = Array.fill(dim + 1)(0.0)

  def weights: Array[Double] = betaVec.clone()
  def setInitialWeights(w: Array[Double]): this.type = {
    require(w.length == dim + 1, s"want ${dim + 1} weights (intercept first)")
    betaVec = w.clone(); this
  }

  /** ŷ for a features array column under the CURRENT weights. */
  def predictExpr(x: Column): Column = {
    val b = betaVec
    (0 until dim).map(j => x(j) * lit(b(j + 1))).foldLeft(lit(b(0)): Column)(_ + _)
  }

  /** The per-row model output the gradient compares against y — the
    * margin itself for the linear model; the logistic subclass applies
    * its sigmoid link here. */
  protected def linkExpr(x: Column): Column = predictExpr(x)

  /** Fold one micro-batch of (x: array<double>, y: double) rows in. */
  def update(batch: DataFrame): Unit = synchronized {
    if (batch.isEmpty) return
    val data = batch.select(col("x"), col("y").cast("double").as("y"))
    for (_ <- 0 until stepsPerBatch) {
      val resid = linkExpr(col("x")) - col("y")
      val aggs = sum(resid).as("g0") +:
        (0 until dim).map(j => sum(resid * col("x")(j)).as(s"g${j + 1}"))
      val g = data.agg(count(lit(1)).as("n"), aggs: _*).head
      val n = g.getLong(0).toDouble
      betaVec = Array.tabulate(dim + 1)(j => betaVec(j) - eta * g.getDouble(j + 1) / n)
    }
  }
}

/** Streaming logistic regression (reference mllib/classification/
  * StreamingLogisticRegressionWithSGD.scala:1) — the reference layers it
  * over the same StreamingLinearAlgorithm, differing only in the
  * gradient's link; re-expressed as exactly that: the sigmoid replaces
  * the identity in the residual, everything else (per-step bounded
  * aggregate, (d+1)-vector driver state) inherits. */
final class StreamingLogisticModel(dim: Int, eta: Double, stepsPerBatch: Int)
    extends StreamingLinearModel(dim, eta, stepsPerBatch) {
  override protected def linkExpr(x: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-predictExpr(x)))

  /** P(y=1 | x) under the current weights. */
  def probabilityExpr(x: Column): Column = linkExpr(x)
}

object StreamingRegressionOps {
  /** Wire a model to a streaming (x, y) frame via foreachBatch. */
  def start(stream: DataFrame, model: StreamingLinearModel, name: String): StreamingQuery =
    stream.writeStream
      .queryName(name)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => model.update(batch) }
      .start()
}
