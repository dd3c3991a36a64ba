package graft

import graft.operators.Graphs

class GraphsSpec extends SparkTestBase {

  test("pagerank on a cycle is uniform and conserves mass") {
    import TestSpark.spark.implicits._
    val n = 6
    val vertices = (0L until n.toLong).toDF("id")
    val edges = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val ranks = Graphs.pageRank(vertices, edges, iters = 15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9, "ranks must sum to 1")
    ranks.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-9,
      "a cycle is rank-uniform by symmetry"))
  }

  test("pagerank favors the hub and handles dangling sinks") {
    import TestSpark.spark.implicits._
    // leaves 1..4 all point at 0; 0 has no out-edges (dangling sink)
    val vertices = (0L to 4L).toDF("id")
    val edges = (1L to 4L).map(i => (i, 0L)).toDF("src", "dst")
    val ranks = Graphs.pageRank(vertices, edges, iters = 25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9, "dangling mass must be redistributed, not lost")
    assert((1L to 4L).forall(i => ranks(0L) > ranks(i) * 2), "the hub must dominate")
    val leafRanks = (1L to 4L).map(ranks)
    assert(leafRanks.forall(v => math.abs(v - leafRanks.head) < 1e-12), "leaves are symmetric")
  }
}
