package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph algorithms over plain edge DataFrames — the GraphX surface of
  * the reference (graphx/src/main/scala/org/apache/spark/graphx/lib/
  * PageRank.scala:1) re-expressed as driver-coordinated DataFrame
  * iteration, the same pattern as [[Clusters.connectedComponents]] and
  * [[Embeddings.kmeansAssign]]: per iteration one join on the edge key +
  * one aggregate, lineage cut each round, nothing driver-side scaling
  * with graph size (the dangling-mass scalar is a 1-row aggregate).
  */
object Graphs {

  /** Standard damped PageRank with uniform dangling-mass redistribution.
    *
    * @param vertices single column `id`
    * @param edges    directed edges `src`,`dst`
    * @return (id, rank); ranks sum to 1 over the vertex set
    */
  def pageRank(vertices: DataFrame, edges: DataFrame,
               iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val n = vertices.count().toDouble
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src").localCheckpoint()
    var ranks = vertices.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      // rank mass parked on sink nodes (no out-edges) is spread uniformly
      val danglingMass = ranks.join(deg, ranks("id") === deg("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0))).head.getDouble(0)
      ranks = vertices.select(col("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + lit(danglingMass / n)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
