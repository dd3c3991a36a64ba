package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

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

  test("label propagation recovers both communities of a barbell graph within the iteration cap") {
    import TestSpark.spark.implicits._
    // two K5 cliques {0..4} and {10..14} joined by the single bridge
    // 4-14 (K5, not K4: with only 3 in-clique neighbors, synchronous LPA's
    // all-distinct first-round ties keep re-importing the bridge label and
    // oscillate — the same hazard GraphX documents; 4 neighbors form a
    // majority by round 2 and the cap converges)
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(0L to 4L) ++ clique(10L to 14L) :+ (4L, 14L)).toDF("src", "dst")
    val vertices = ((0L to 4L) ++ (10L to 14L)).toDF("id")
    val labels = Graphs.labelPropagation(vertices, edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = (0L to 4L).map(labels).toSet
    val right = (10L to 14L).map(labels).toSet
    assert(left.size == 1, s"left clique must agree on one label, got $left")
    assert(right.size == 1, s"right clique must agree on one label, got $right")
    assert(left != right, "the bridge must not merge the two communities")
  }

  test("generic pregel reproduces the bespoke LPA loop bit-identically (barbell + random graphs)") {
    import TestSpark.spark.implicits._
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    // barbell with an isolated vertex 99 (exercises the keep-own-label path)
    val bEdges = (clique(0L to 4L) ++ clique(10L to 14L) :+ (4L, 14L)).toDF("src", "dst")
    val bVerts = ((0L to 4L) ++ (10L to 14L) :+ 99L).toDF("id")
    assert(labelsOf(Graphs.labelPropagationPregel(bVerts, bEdges, iters = 5)) ==
      labelsOf(Graphs.labelPropagation(bVerts, bEdges, iters = 5)),
      "pregel LPA must equal the bespoke loop on the barbell")
    // seeded random graph: 60 vertices, ~150 edges
    val rnd = new scala.util.Random(13)
    val rEdges = Seq.fill(150) {
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct.toDF("src", "dst")
    val rVerts = (0L until 60L).toDF("id")
    assert(labelsOf(Graphs.labelPropagationPregel(rVerts, rEdges, iters = 4)) ==
      labelsOf(Graphs.labelPropagation(rVerts, rEdges, iters = 4)),
      "pregel LPA must equal the bespoke loop on the random graph")
  }

  test("pregel with a custom program: hop-count flood from a source, early-halt on silence") {
    import TestSpark.spark.implicits._
    // path 0-1-2-3 plus isolated 9: attr = min hops from vertex 0
    // (Long.MaxValue = unreached). sendMsg relaxes along both directions;
    // merge = min; vprog keeps the minimum. Converges in 3 rounds —
    // maxIter 10 proves the activeMessages==0 early stop terminates it.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val inf = Long.MaxValue / 4
    val verts = Seq(0L, 1L, 2L, 3L, 9L).toDF("id")
      .select(col("id"), when(col("id") === 0L, 0L).otherwise(inf).as("attr"))
    // only IMPROVING messages are sent, so after convergence (3 rounds)
    // the message stream is empty and the activeMessages==0 stop must
    // fire — maxIter 200 would take minutes if it didn't
    val out = Graphs.pregel(verts, edges, maxIter = 200)(
      sendMsg = t =>
        t.select(col("dst").as("id"), (col("src_attr") + 1L).as("msg"),
            col("dst_attr").as("cur"))
          .union(t.select(col("src").as("id"), (col("dst_attr") + 1L).as("msg"),
            col("src_attr").as("cur")))
          .filter(col("msg") < col("cur")).select("id", "msg"),
      mergeMsg = m => m.groupBy("id").agg(min("msg").as("msg")),
      vprog = (attr, msg) => least(attr, coalesce(msg, attr)))
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 9L -> inf), s"got $got")
  }

  test("triangle counts: K4 plus a pendant edge") {
    import TestSpark.spark.implicits._
    // K4 on {0..3} has 4 triangles, each vertex in exactly 3; the pendant
    // 3-4 closes nothing and 4 must not appear
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(0L to 3L) :+ (3L, 4L)).toDF("src", "dst")
    val counts = Graphs.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == (0L to 3L).map(_ -> 3L).toMap,
      s"each K4 vertex sits in 3 triangles, pendant in none; got $counts")
  }

  test("triangle counts are invariant to edge orientation, duplicates and self-loops") {
    import TestSpark.spark.implicits._
    // same K4, but every edge reversed, duplicated, and a self-loop added
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val noisy = (clique(0L to 3L).map { case (a, b) => (b, a) } ++
      clique(0L to 3L) :+ (2L, 2L)).toDF("src", "dst")
    val counts = Graphs.triangleCounts(noisy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == (0L to 3L).map(_ -> 3L).toMap,
      s"canonicalization must absorb orientation/dup/self-loop noise; got $counts")
  }

  test("shortest paths relax to exact hop counts and respect the hop cap") {
    import TestSpark.spark.implicits._
    // path 0-1-2-3-4 plus shortcut 0-3: dist(0->3)=1, dist(0->4)=2;
    // vertex 9 is disconnected and must not appear
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L), (8L, 9L))
      .toDF("src", "dst")
    val lm = Seq(0L).toDF("lm")
    val d = Graphs.shortestPaths(edges, lm, maxHops = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L),
      s"wrong distances: $d")
    // a cap below the true distance hides the far vertex, never miscounts
    val capped = Graphs.shortestPaths(
        Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst"), lm, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(capped == Map(0L -> 0L, 1L -> 1L, 2L -> 2L), s"cap leaked: $capped")
  }

  test("SCC recovers two planted cycles joined by a one-way bridge, exactly") {
    import TestSpark.spark.implicits._
    // SCC A = {1,2,3} (cycle), SCC B = {10,11} (2-cycle), one-way bridge
    // 3->10 (must NOT merge them), DAG tail 11->20, and a diamond of
    // singletons 40->{41,42}->35 whose middle vertices carry IDENTICAL
    // (f,b) = (40,35) labels: grouping by label equality would merge
    // 41 and 42 — only the per-vertex f=b mutual-reachability proof
    // (which also takes three outer rounds here) keeps them apart
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 10L), (3L, 10L), (11L, 20L),
      (40L, 41L), (40L, 42L), (41L, 35L), (42L, 35L)).toDF("src", "dst")
    val verts = (Seq(1L, 2L, 3L, 10L, 11L, 20L, 35L, 40L, 41L, 42L)).toDF("id")
    val got = Graphs.stronglyConnectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 35L -> 35L, 40L -> 40L, 41L -> 41L, 42L -> 42L)
    assert(got == want, s"wrong SCC assignment: $got")
  }

  test("SCC on a pure path needs one round per condensation layer and still finishes") {
    import TestSpark.spark.implicits._
    // worst-case-shaped chain 0->1->...->5: every vertex its own SCC
    val edges = (0L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = (0L to 5L).toDF("id")
    val got = Graphs.stronglyConnectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 5L).map(i => i -> i).toMap, s"chain must be all singletons: $got")
  }

  test("power iteration clustering separates two cliques joined by one weak edge") {
    import TestSpark.spark.implicits._
    def clique(ids: Seq[Long], w: Double) =
      for (a <- ids; b <- ids if a < b) yield (a, b, w)
    // ASYMMETRIC cliques (size 6 w=5 vs size 8 w=3): a perfectly
    // symmetric barbell maps mirror vertices to the SAME embedding
    // value (the known degenerate case of value-based spectral
    // clustering), so the planted recovery needs distinct plateaus
    val edges = (clique(0L to 5L, 5.0) ++ clique(10L to 17L, 3.0) ++ Seq((5L, 10L, 0.1)))
      .toDF("src", "dst", "w")
    val got = Graphs.powerIterationClustering(edges, k = 2, iters = 15)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cA = got(0L)
    assert((0L to 5L).forall(got(_) == cA), s"clique A split: $got")
    val cB = got(10L)
    assert(cB != cA, s"cliques merged: $got")
    assert((10L to 17L).forall(got(_) == cB), s"clique B split: $got")
    // deterministic across runs (same plan, same tiebreaks)
    val again = Graphs.powerIterationClustering(edges, k = 2, iters = 15)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == again)
  }

  test("label propagation: isolated vertices keep their own label; deterministic across runs") {
    import TestSpark.spark.implicits._
    val vertices = (0L to 5L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val run1 = Graphs.labelPropagation(vertices, edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val run2 = Graphs.labelPropagation(vertices, edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run1 == run2, "tie-breaks must be deterministic")
    Seq(3L, 4L, 5L).foreach(i => assert(run1(i) == i, s"isolated $i must keep its own label"))
  }

  test("pagerank-until-convergence stops early on a fast-mixing graph and matches fixed iteration at tol=0") {
    import TestSpark.spark.implicits._
    // fast-mixing: complete directed graph on 6 vertices — after one
    // round every vertex already holds the uniform stationary rank, so
    // a tolerance run must halt far before the cap
    val n = 6
    val vertices = (0L until n.toLong).toDF("id")
    val edges = (for (a <- 0L until n.toLong; b <- 0L until n.toLong if a != b)
      yield (a, b)).toDF("src", "dst")
    val (ranks, rounds) = Graphs.pageRankUntilConvergenceTracked(
      vertices, edges, tol = 1e-6, maxIter = 100)
    assert(rounds < 100, s"fast-mixing graph must converge before the cap, ran $rounds")
    assert(rounds >= 1)
    val rs = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rs.values.sum - 1.0) < 1e-9)
    rs.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-6))

    // tol = 0 is the explicit fixed-iteration mode (r15 advisor: float
    // ranks CAN hit an exact fixed point, so "never converges" was not
    // a guarantee) → exactly maxIter rounds with per-round plans
    // identical to the fixed-iteration pageRank
    val hubV = (0L to 4L).toDF("id")
    val hubE = (1L to 4L).map(i => (i, 0L)).toDF("src", "dst")
    val (dyn, dynRounds) = Graphs.pageRankUntilConvergenceTracked(
      hubV, hubE, tol = 0.0, maxIter = 10)
    assert(dynRounds == 10)
    val fixed = Graphs.pageRank(hubV, hubE, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = dyn.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == fixed, "tol=0 must reproduce the fixed-iteration ranks bit-identically")
  }

  test("structural combinators: subgraphTriplets evaluates the predicate over endpoint attributes") {
    import TestSpark.spark.implicits._
    // keep edges whose endpoints share an attribute — the triplet
    // predicate the edge-columns-only subgraph cannot express
    val verts = Seq((0L, "x"), (1L, "x"), (2L, "y"), (3L, "y")).toDF("id", "attr")
    val edges = Seq((0L, 1L, 5), (1L, 2L, 20), (2L, 3L, 30)).toDF("src", "dst", "w")
    val (v, e) = Graphs.subgraphTriplets(verts, edges,
      epred = col("src_attr") === col("dst_attr"))
    assert(v.count() == 4)
    val es = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(es.toSeq == Seq((0L, 1L, 5), (2L, 3L, 30)), s"got ${es.toSeq}")
    assert(e.columns.toSeq == Seq("src", "dst", "w"), "column order preserved")
    // vpred still enforces both-endpoints-survive before epred sees the edge
    val (v2, e2) = Graphs.subgraphTriplets(verts, edges,
      vpred = col("id") =!= 3, epred = col("src_attr") === col("dst_attr"))
    assert(v2.count() == 3)
    assert(e2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
    // r15 advisor: the vertex attribute column is a parameter, and an
    // edges frame already carrying src_attr/dst_attr fails loudly
    // instead of producing ambiguous references under epred
    val named = verts.withColumnRenamed("attr", "grp")
    val (_, e3) = Graphs.subgraphTriplets(named, edges,
      epred = col("src_attr") === col("dst_attr"), attrCol = "grp")
    assert(e3.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((0L, 1L), (2L, 3L)))
    val clashing = edges.withColumn("src_attr", lit("x"))
    val err = intercept[IllegalArgumentException] {
      Graphs.subgraphTriplets(verts, clashing)
    }
    assert(err.getMessage.contains("src_attr"), err.getMessage)
    val missing = intercept[IllegalArgumentException] {
      Graphs.subgraphTriplets(named, edges)
    }
    assert(missing.getMessage.contains("no 'attr' column"), missing.getMessage)
  }

  test("structural combinators: subgraph drops edges with a filtered endpoint") {
    import TestSpark.spark.implicits._
    // path 0→1→2→3 with weights; keep ids < 3 and weight > 10
    val verts = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("id", "attr")
    val edges = Seq((0L, 1L, 5), (1L, 2L, 20), (2L, 3L, 30)).toDF("src", "dst", "w")
    val (v, e) = Graphs.subgraph(verts, edges,
      vpred = col("id") < 3, epred = col("w") > 10)
    assert(v.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    // (0,1) fails epred; (2,3) loses endpoint 3; only (1,2) survives
    val es = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(es.toSeq == Seq((1L, 2L, 20)), s"got ${es.toSeq}")
    assert(e.columns.toSeq == Seq("src", "dst", "w"), "column order preserved")
  }

  test("structural combinators: mask keeps this graph's attrs on the other's structure") {
    import TestSpark.spark.implicits._
    val verts = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "attr")
    val edges = Seq((0L, 1L, 5), (1L, 2L, 7)).toDF("src", "dst", "w")
    val oVerts = Seq((0L, 99), (1L, 99)).toDF("id", "x")
    val oEdges = Seq((0L, 1L)).toDF("src", "dst")
    val (v, e) = Graphs.mask(verts, edges, oVerts, oEdges)
    assert(v.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(0L -> "a", 1L -> "b"), "attrs come from THIS graph")
    assert(e.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((0L, 1L, 5)))
  }

  test("structural combinators: outerJoinVertices keeps every vertex, nulls for misses") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.coalesce
    val verts = Seq((0L, 10L), (1L, 20L), (2L, 30L)).toDF("id", "attr")
    val degrees = Seq((0L, 3L), (2L, 1L)).toDF("id", "attr")
    val got = Graphs.outerJoinVertices(verts, degrees)(
      (attr, deg) => attr + coalesce(deg, org.apache.spark.sql.functions.lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 13L, 1L -> 20L, 2L -> 31L), s"got $got")
  }

  test("degrees/inDegrees/outDegrees match hand counts and compose with outerJoinVertices") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, lit}
    // 0→1, 0→2, 1→2, plus isolated 9
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Graphs.outDegrees(edges)) == Map(0L -> 2L, 1L -> 1L))
    assert(m(Graphs.inDegrees(edges)) == Map(1L -> 1L, 2L -> 2L))
    assert(m(Graphs.degrees(edges)) == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // the reference idiom: attach degrees to every vertex, 0 for missing
    val verts = Seq((0L, 0L), (1L, 0L), (2L, 0L), (9L, 0L)).toDF("id", "attr")
    val attached = Graphs.outerJoinVertices(verts, Graphs.degrees(edges))(
      (_, deg) => coalesce(deg, lit(0L)))
    assert(m(attached) == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 9L -> 0L))
  }

  test("structural combinators: reverse swaps direction, keeps attrs, and is an involution") {
    import TestSpark.spark.implicits._
    val edges = Seq((0L, 1L, 5), (1L, 2L, 7)).toDF("src", "dst", "w")
    val rev = Graphs.reverse(edges)
    assert(rev.columns.toSeq == Seq("src", "dst", "w"))
    assert(rev.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ==
      Set((1L, 0L, 5), (2L, 1L, 7)))
    val back = Graphs.reverse(rev)
    assert(back.exceptAll(edges).isEmpty && edges.exceptAll(back).isEmpty)
    // in-degree via reverse + out-degree machinery matches hand count
    val indeg = rev.groupBy("src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(indeg == Map(1L -> 1L, 2L -> 1L))
  }
}
