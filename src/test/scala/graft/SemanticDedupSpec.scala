package graft

import org.apache.spark.sql.functions._
import graft.operators.SemanticDedup

class SemanticDedupSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val dim = 64

  /** axis-aligned unit vector + optional second component. */
  private def vec(axis: Int, other: Int = -1, w: Float = 0f): Seq[Float] = {
    val a = Array.fill(dim)(0f)
    a(axis) = 1f
    if (other >= 0) a(other) = w
    a.toSeq
  }

  /** 4 well-separated regions (orthogonal base axes). Per region r:
    *  - a duplicate group: ids r*100+0..2, identical vectors (sim 1.0);
    *  - 8 singletons: ids r*100+10+i, base + 0.45 on a distinct noise
    *    axis — pairwise sim 1/(1+0.45²) ≈ 0.83 and sim vs the dup group
    *    1/sqrt(1.2025) ≈ 0.91, both safely below tau=0.99. */
  private def planted() = {
    val rows = for {
      r <- 0 until 4
      (id, v) <- Seq.tabulate(3)(j => (r * 100 + j).toLong -> vec(r)) ++
        Seq.tabulate(8)(i => (r * 100 + 10 + i).toLong -> vec(r, 24 + i, 0.45f))
    } yield (id, v)
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("semanticDedup keeps one survivor per planted duplicate group, all singletons") {
    val emb = planted()
    val out = SemanticDedup.semanticDedup(
      emb, k = 4, iters = 5, nPlanes = 4, nTables = 4, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.size == 44)
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    for (r <- 0 until 4) {
      // dup group collapses to min id; only the min survives
      for (j <- 0 until 3) {
        val (cid, keep) = byId(r * 100 + j)
        assert(cid == r * 100, s"dup member ${r * 100 + j} got component $cid")
        assert(keep == (if (j == 0) 1L else 0L))
      }
      // singletons keep themselves
      for (i <- 0 until 8) {
        val (cid, keep) = byId(r * 100 + 10 + i)
        assert(cid == r * 100 + 10 + i && keep == 1L)
      }
    }
    assert(out.count(_._3 == 1L) == 4 + 32)
  }

  test("no cross-cluster pair is ever scored: identical vectors split by the assignment produce no edge") {
    // two IDENTICAL vectors (cosine 1.0 >= any tau) forced into different
    // clusters by an injected assignment: the (cluster, tbl, bucket) join
    // key keeps them from ever reaching the scoring stage
    val emb = Seq(1L -> vec(0), 2L -> vec(0), 3L -> vec(5), 4L -> vec(5))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val split = Seq(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 2).toDF("vec_id", "cluster")
    val crossEdges = SemanticDedup.edges(emb, split, nPlanes = 4, nTables = 4, tau = 0.9)
    val got = crossEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((1L, 2L)), "cross-cluster identical pair must not be scored")
    assert(got == Set((3L, 4L)), s"same-cluster identical pair must survive, got $got")
  }

  test("edges are cluster-tagged and every scored pair shares a k-means cluster") {
    val emb = planted()
    val assign = graft.operators.Embeddings.kmeansAssign(emb, k = 4, iters = 5)
      .localCheckpoint()
    val e = SemanticDedup.edges(emb, assign, nPlanes = 4, nTables = 4, tau = 0.99)
    val bad = e
      .join(assign.select(col("vec_id").as("d1"), col("cluster").as("c1")), "d1")
      .join(assign.select(col("vec_id").as("d2"), col("cluster").as("c2")), "d2")
      .filter(col("c1") =!= col("c2") || col("c1") =!= col("cluster"))
    assert(bad.count() == 0, "every edge must join two members of one k-means cluster")
    // exactly the 3 within-group pairs per region survive tau=0.99
    assert(e.count() == 4 * 3)
  }

  test("planesFor bounds expected occupancy at any cluster population") {
    // occupancy target 64: expected cell size = size / 2^p stays <= 64
    for (size <- Seq(1L, 63L, 64L, 65L, 500L, 5000L, 50000L, 5000000L)) {
      val p = SemanticDedup.planesFor(size, 64, 16)
      assert(p >= 1 && p <= 16)
      if (p < 16)
        assert(size.toDouble / (1L << p) <= 64.0,
          s"size $size with $p planes leaves occupancy ${size / (1L << p)}")
      if (p > 1) // one plane fewer would overflow the target
        assert(size.toDouble / (1L << (p - 1)) > 64.0,
          s"size $size over-partitioned at $p planes")
    }
    // sf0.1 regime (~625 per cluster) derives the 4 planes the constant pinned
    assert(SemanticDedup.planesFor(625, 64, 16) == 4)
  }

  test("auto-occupancy edges keep the planted survivor structure") {
    val emb = planted()
    val out = SemanticDedup.semanticDedup(
      emb, k = 4, iters = 5, nPlanes = 16, nTables = 4, tau = 0.99,
      targetOccupancy = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.size == 44)
    // 11-vector clusters mask to 1 plane (coarse buckets, full recall):
    // the same 4 dup groups collapse, every singleton survives
    assert(out.count(_._3 == 1L) == 4 + 32)
    for (r <- 0 until 4; j <- 0 until 3)
      assert(out.find(_._1 == r * 100 + j).get._2 == r * 100)
  }

  test("d09 covers the embeddings table with both structure certificates true") {
    val out = SemanticDedup.d09.run(spark, sfDir).cache()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.count() == n)
    // the certificates carry the old partition assertions: label_le_id
    // (min-label contract) and one_keeper (exactly one survivor per
    // component, independently recounted in-plan)
    assert(out.filter(!col("label_le_id") || !col("one_keeper")).count() == 0)
  }

  test("semanticDedup keep-flags partition the corpus (pipeline surface)") {
    val out = SemanticDedup.semanticDedup(
      Tables.embeddings(spark, sfDir),
      k = 8, iters = 5, nPlanes = 16, nTables = 4, tau = 0.99,
      targetOccupancy = 64).cache()
    // every component's survivor is its own cluster_id
    assert(out.filter(col("keep") === 1 && col("cluster_id") =!= col("vec_id")).count() == 0)
    // every non-survivor points at a surviving cluster_id
    val survivors = out.filter(col("keep") === 1).select(col("vec_id").as("cluster_id"))
    assert(out.select("cluster_id").distinct().except(survivors).count() == 0)
  }
}
