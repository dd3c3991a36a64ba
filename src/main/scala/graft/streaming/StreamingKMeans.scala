package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming k-means with exponential forgetfulness (reference
  * mllib/src/main/scala/org/apache/spark/mllib/clustering/
  * StreamingKMeans.scala:1) — the model-maintenance half of the
  * clustering surface: d08's batch k-means fits a corpus snapshot,
  * this keeps centroids CURRENT as micro-batches arrive.
  *
  * Per micro-batch, each point is assigned to its nearest centroid (a
  * codegen'd map against plan literals — d08's pattern, Euclidean here
  * like the reference), per-cluster (count, per-dimension sum)
  * aggregates come back k×dim-bounded, and every centroid updates
  *
  *   c' = (α·n·c + s) / (α·n + m),   n' = α·n + m
  *
  * where (m, s) are the batch's count/sum, n is the decayed mass of all
  * earlier batches and α = 0.5^(1/halfLifeBatches) — the reference's
  * half-life contract in batch units: after `halfLifeBatches` batches,
  * old data's influence has halved. Empty clusters keep their centroid
  * while their mass decays, exactly the reference's dying-cluster
  * behavior.
  *
  * Scale shape: driver state is O(k·dim) (MLlib holds the same model on
  * the driver); the per-batch plan is one narrow shuffle of k×dim rows,
  * so batch size never changes what crosses to the driver.
  */
final class StreamingKMeansModel(val k: Int, val dim: Int, halfLifeBatches: Double) {
  private val alpha = math.pow(0.5, 1.0 / halfLifeBatches)
  @volatile private var centroids: Array[Array[Float]] = Array.empty
  @volatile private var weights: Array[Double] = Array.empty

  def setInitialCenters(centers: Array[Array[Float]], weight: Double = 0.0): this.type = {
    require(centers.length == k && centers.forall(_.length == dim))
    centroids = centers.map(_.clone())
    weights = Array.fill(k)(weight)
    this
  }

  def centers: Array[Array[Float]] = centroids.map(_.clone())
  def clusterWeights: Array[Double] = weights.clone()

  /** Nearest-centroid id per row (argmin Euclidean, ties to the smaller
    * cluster id via struct ordering). */
  def assignExpr: Column = {
    require(centroids.nonEmpty, "setInitialCenters must be called before assign/update")
    val scored: Seq[Column] = centroids.toIndexedSeq.zipWithIndex.map { case (c, j) =>
      val d = aggregate(
        zip_with(col("embedding"), typedlit(c.toSeq),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v.cast("double"))
      struct(d.as("d"), lit(j).as("c"))
    }
    if (k == 1) lit(0) else least(scored: _*).getField("c")
  }

  /** Fold one (micro-)batch of (vec_id, embedding) rows into the model. */
  def update(batch: DataFrame): Unit = synchronized {
    if (batch.isEmpty) { weights = weights.map(_ * alpha); return }
    val assigned = batch.withColumn("cluster", assignExpr)
    val counts = assigned.groupBy("cluster").agg(count(lit(1)).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sums = assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("p", "x")))
      .groupBy("cluster", "p").agg(sum(col("x").cast("double")).as("s"))
      .collect()
    val sArr = Array.fill(k, dim)(0.0)
    sums.foreach(r => sArr(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val newC = Array.tabulate(k) { j =>
      val m = counts.getOrElse(j, 0L).toDouble
      val n = weights(j) * alpha
      if (m == 0) centroids(j)
      else Array.tabulate(dim)(p =>
        ((n * centroids(j)(p) + sArr(j)(p)) / (n + m)).toFloat)
    }
    val newW = Array.tabulate(k)(j => weights(j) * alpha + counts.getOrElse(j, 0L))
    centroids = newC
    weights = newW
  }
}

object StreamingKMeansOps {
  /** Wire a model to a streaming (vec_id, embedding) frame: every
    * micro-batch folds into the model via foreachBatch. */
  def start(stream: DataFrame, model: StreamingKMeansModel, name: String): StreamingQuery =
    stream.writeStream
      .queryName(name)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => model.update(batch) }
      .start()
}
