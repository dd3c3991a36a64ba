package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clusters, Similarity}

class ClustersSpec extends SparkTestBase {

  test("connected components: chain A-B, B-C clusters all three; isolated stays put") {
    import TestSpark.spark.implicits._
    val vertices = Seq(1L, 2L, 3L, 10L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val labels = Clusters.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L))
  }

  test("text chain A~B, B~C, A≁C still lands in one cluster (transitivity)") {
    import TestSpark.spark.implicits._
    def txt(r: Range) = r.map(i => s"w$i").mkString(" ")
    // trigram Jaccard: A-B and B-C ≈ 0.54 (pair), A-C = 0.25 (no pair)
    val docs = Seq(
      (1L, txt(1 to 12)), (2L, txt(4 to 15)), (3L, txt(7 to 18)),
      (9L, txt(100 to 140))).toDF("doc_id", "text")
    val pairs = Similarity.jaccardPairs(docs, dfCap = 1000, minJaccard = 0.5)
      .select(col("d1"), col("d2"))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 3L)), s"expected exactly the chain pairs, got $got")
    val labels = Clusters.connectedComponents(
        docs.select(col("doc_id").as("id")), pairs.select(col("d1").as("src"), col("d2").as("dst")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("star contraction clusters a 256-link chain in O(log² n) rounds") {
    import TestSpark.spark.implicits._
    // a path graph is the adversarial case for min-label propagation
    // (needs 256 iterations = the diameter); star contraction must
    // finish well inside its 40-round cap
    val n = 256
    val vertices = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = Clusters.connectedComponentsStar(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L), "whole chain must collapse to the minimum id")
  }

  test("star contraction agrees with min-label propagation on a random graph") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 120
    val vertices = (0L until n.toLong).toDF("id")
    val edges = Seq.fill(140)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    val a = Clusters.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Clusters.connectedComponentsStar(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "both algorithms must produce identical min-id labels")
  }

  test("d07 covers every document once; keep marks exactly the cluster minima") {
    val docs = Tables.documents(spark, sfDir)
    val out = Clusters.d07.run(spark, sfDir).cache()
    assert(out.count() == docs.count(), "one row per document")
    assert(out.select("doc_id").distinct().count() == out.count())
    // keep=1 iff the doc is its own cluster representative
    assert(out.filter(
      (col("doc_id") === col("cluster_id")) =!= (col("keep") === 1L)).count() == 0)
    // every cluster's representative exists and is kept
    val reps = out.select(col("cluster_id")).distinct()
    val kept = out.filter(col("keep") === 1L).select(col("doc_id").as("cluster_id"))
    assert(reps.except(kept).count() == 0, "each cluster_id must be a kept doc")
    // the corpus has planted dups: at least one multi-doc cluster
    assert(out.filter(col("keep") === 0L).count() > 0, "expected at least one dropped dup")
  }
}
