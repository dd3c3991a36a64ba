package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Graph algorithms over plain edge DataFrames — the GraphX surface of
  * the reference (graphx/src/main/scala/org/apache/spark/graphx/lib/
  * PageRank.scala:1, LabelPropagation.scala:1) re-expressed as
  * driver-coordinated DataFrame iteration, the same pattern as
  * [[Clusters.connectedComponents]] and [[Embeddings.kmeansAssign]]: per
  * iteration one join on the edge key + one aggregate, lineage cut each
  * round, nothing driver-side scaling with graph size (the dangling-mass
  * scalar is a 1-row aggregate).
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

  /** Synchronous label propagation (reference graphx/lib/
    * LabelPropagation.scala:1): every vertex starts as its own label;
    * each iteration it adopts the most frequent label among its
    * neighbors — the community-detection pass a near-dup pipeline runs
    * over its pair graph to find loosely-knit duplicate families that
    * strict connected components would split or that transitive closure
    * would over-merge.
    *
    * Deterministic where GraphX is arbitrary: frequency ties go to the
    * SMALLEST label (max over struct(count, -label)). Isolated vertices
    * keep their own label. Synchronous LPA can oscillate on bipartite
    * structures, hence the fixed iteration cap instead of a fixpoint
    * test — the GraphX contract. Per iteration: one join on the edge key
    * + two aggregates, all bounded by the edge/vertex count, lineage cut
    * per round.
    *
    * @param vertices single column `id`
    * @param edges    undirected pairs `src`,`dst` (both orientations
    *                 generated internally)
    * @return (id, label)
    */
  def labelPropagation(vertices: DataFrame, edges: DataFrame, iters: Int = 5): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("label")).localCheckpoint()
    for (_ <- 1 to iters) {
      val msgs = bidir.join(labels, bidir("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val votes = msgs.groupBy("id", "label").agg(count(lit(1)).as("n"))
      val best = votes.groupBy("id")
        .agg(max(struct(col("n"), (-col("label")).as("negl"))).as("b"))
        .select(col("id"), (-col("b.negl")).as("label"))
      labels = vertices.select(col("id"))
        .join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Community labels over the d02 near-dup pair graph (the shared
    * persisted candidate stage). Rows-only — the iteration is not
    * SQL-expressible; GraphsSpec asserts community recovery on a planted
    * barbell graph. */
  val lp01 = Q.rowsOnly("lp01_label_propagation") { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val pairs = Similarity
      .jaccardPairsShared(docs, dir, dfCap = Similarity.d02DfCap, minJaccard = 0.5)
      .select(col("d1").as("src"), col("d2").as("dst"))
    labelPropagation(docs.select(col("doc_id").as("id")), pairs, iters = 5)
      .select(col("id").as("doc_id"), col("label").as("community"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(lp01)
}
