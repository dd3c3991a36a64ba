package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Embedding clustering — distributed spherical k-means over the
  * `embeddings` table (SURVEY.md §2.4): semantic bucketing for
  * training-data pipelines (dedup within topic, stratified sampling,
  * diversity filtering).
  *
  * Re-expresses the reference's MLlib KMeans
  * (mllib/src/main/scala/org/apache/spark/mllib/clustering/KMeans.scala:1)
  * as DataFrame aggregation with Lloyd's iterations driven from the
  * driver: centroids are k×dim doubles living on the driver, shipped to
  * executors as plan literals each iteration (MLlib broadcasts the same
  * array). Assignment is a single codegen'd map stage — one native
  * [[graft.plans.FloatCosine]] per centroid per row — and the centroid
  * update is one shuffle whose output is bounded by k×dim, never by row
  * count. That per-iteration shape (map + tiny agg) is exactly what
  * scales to 100 TB; nothing driver-side grows with the corpus.
  *
  * Cosine assignment is scale-invariant in the centroid, so per-cluster
  * unnormalized means serve directly as spherical centroids. Fixed
  * deterministic init (the k smallest vec_ids) and a fixed iteration
  * count keep runs reproducible.
  */
object Embeddings {

  /** Cluster id per row: argmax over cosine(embedding, centroid_j),
    * ties to the larger j (deterministic struct ordering). */
  private def withCluster(base: DataFrame, centroids: Array[Array[Float]]): DataFrame = {
    graft.plans.GraftFunctions.register(base.sparkSession)
    val scored: Seq[Column] = centroids.toIndexedSeq.zipWithIndex.map { case (c, j) =>
      struct(
        call_function("float_cosine", col("embedding"), typedlit(c.toSeq)).as("s"),
        lit(j).as("c"))
    }
    base.withColumn("cluster", greatest(scored: _*).getField("c"))
  }

  /** Lloyd's spherical k-means: returns (vec_id, cluster). */
  def kmeansAssign(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 2, "k-means needs k >= 2")
    val base = emb.select(col("vec_id"), col("embedding"))
    // deterministic seed: the k smallest vec_ids (k rows to the driver —
    // bounded by k, not by corpus size)
    var centroids: Array[Array[Float]] = base
      .orderBy("vec_id").limit(k)
      .collect().map(_.getSeq[Float](1).toArray)
    val dim = centroids.head.length
    for (_ <- 1 to iters) {
      // per-dimension means, k×dim rows back to the driver
      val sums = withCluster(base, centroids)
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(avg("x").as("m"))
        .collect()
      val next = Array.tabulate(k)(j => centroids(j).clone()) // empty clusters keep their centroid
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat
      }
      centroids = next
    }
    withCluster(base, centroids).select(col("vec_id"), col("cluster"))
  }

  /** k=8 spherical k-means over the embeddings table. Rows-only (the
    * iteration is not SQL-expressible); EmbeddingsSpec asserts planted
    * clusters are recovered and runs are deterministic. */
  val d08 = Q.rowsOnly("d08_kmeans") { (s, dir) =>
    kmeansAssign(Tables.embeddings(s, dir), k = 8, iters = 10)
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(d08)
}
