package graft

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {

  private def runMerges(docs: org.apache.spark.sql.DataFrame, merges: Int) =
    Bpe.bpeVocab(docs, merges).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("BPE learns the classic low/lower/newest merge sequence with lexicographic tie-breaks") {
    import TestSpark.spark.implicits._
    // Sennrich et al.'s canonical corpus shape: low x5, lower x2,
    // newest x6. Hand-derived: round 0 merges (w,e) at 8 (lower's 2 +
    // newest's 6; 'low' has no w-e pair); round 1 (l,o) at 7 (the 'we'
    // merge dropped o-w to 5, so no tie); round 2 ties at 6 among
    // (n,e),(e,we),(we,s),(s,t) -> (e,we) by lexicographic lhs.
    val docs = Seq(
      (0L, Array.fill(5)("low").mkString(" ")),
      (1L, Array.fill(2)("lower").mkString(" ")),
      (2L, Array.fill(6)("newest").mkString(" ")))
      .toDF("doc_id", "text")
    val got = runMerges(docs, 3)
    assert(got == Seq((0L, "w", "e", 8L), (1L, "l", "o", 7L), (2L, "e", "we", 6L)),
      s"got $got")
  }

  test("BPE sentinel guard: bracketed tokens raise instead of silently mis-segmenting") {
    import TestSpark.spark.implicits._
    // '<' / '>' collide with the segmentation sentinels — before the
    // guard (r15 advisor) a pair replace could span symbol boundaries
    val bad = Seq((0L, "ok a<b ok")).toDF("doc_id", "text")
    val e1 = intercept[Exception] { Bpe.bpeVocab(bad, 1).collect() }
    assert(e1.getMessage.contains("must not contain"), e1.getMessage)
    val e2 = intercept[Exception] {
      Bpe.encode(bad, Seq(("a", "b"))).collect()
    }
    assert(e2.getMessage.contains("must not contain"), e2.getMessage)
    // merge symbols themselves are guarded driver-side
    val ok = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val e3 = intercept[IllegalArgumentException] {
      Bpe.encode(ok, Seq(("a", "b>")))
    }
    assert(e3.getMessage.contains("merge symbols"), e3.getMessage)
    // and clean corpora are unaffected
    assert(Bpe.encode(ok, Seq(("a", "b"))).collect()
      .map(_.getSeq[String](1)).forall(_ == Seq("ab", "ab")))
  }

  test("BPE merge application is left-to-right non-overlapping (the aaa case)") {
    import TestSpark.spark.implicits._
    // 'aaaa' under merge (a,a): left-to-right gives [aa][aa]; 'aaa'
    // gives [aa][a] — the overlap rule both engines' replace implements
    val docs = Seq((0L, "aaaa aaa ab")).toDF("doc_id", "text")
    val got = runMerges(docs, 2)
    // round 0: pairs a-a: aaaa has 3 slots, aaa has 2, ab has a-b 1 ->
    // (a,a,5); round 1 segments: [aa aa], [aa a], [a b] -> pairs
    // (aa,aa,1), (aa,a,1), (a,b,1) -> lexicographic: (a,b) wins
    assert(got == Seq((0L, "a", "a", 5L), (1L, "a", "b", 1L)), s"got $got")
  }

  test("BPE encode applies learned merges in training order: reference-equal, reconstruction-safe") {
    import TestSpark.spark.implicits._
    val docs = Seq(
      (0L, Array.fill(5)("low").mkString(" ")),
      (1L, "lower lowest newest low"),
      (2L, Array.fill(6)("newest").mkString(" ")),
      (3L, " ")) // whitespace-only doc: must encode to ZERO subwords
      .toDF("doc_id", "text")
    val merges = runMerges(docs.filter($"doc_id" =!= 3L), 4)
      .map(t => (t._2, t._3))
    val got = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // driver-side reference: same left-to-right merge application
    def mergeSeq(s: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    def ref(text: String): Seq[String] =
      text.split("\\s+").toSeq.flatMap { w =>
        merges.foldLeft(w.map(_.toString).toVector) {
          case (seg, (l, r)) => mergeSeq(seg, l, r)
        }
      }
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      assert(got(id) == ref(text), s"doc $id")
      // reconstruction: concatenating subwords recovers the raw words
      assert(got(id).mkString == text.split("\\s+").mkString,
        s"doc $id must reconstruct")
    }
    // the merges actually compress: fewer subwords than characters
    assert(got(2L).length < "newest".length * 6)
  }

  test("batched BPE equals sequential merge-for-merge, count-for-count (r16)") {
    import TestSpark.spark.implicits._
    def batched(docs: org.apache.spark.sql.DataFrame, merges: Int, batch: Int) =
      Bpe.bpeVocabBatched(docs, merges, batch).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    // the classic corpus — clean separation, batches actually form
    val classic = Seq(
      (0L, Array.fill(5)("low").mkString(" ")),
      (1L, Array.fill(2)("lower").mkString(" ")),
      (2L, Array.fill(6)("newest").mkString(" ")))
      .toDF("doc_id", "text")
    val seqClassic = runMerges(classic, 6)
    for (b <- Seq(1, 2, 4, 8))
      assert(batched(classic, 6, b) == seqClassic, s"batch=$b diverged on classic")

    // adversarial: a 2-letter alphabet makes overlaps and merged-string
    // collisions (rule 3: e.g. 'ab' exists both as an early merge and
    // inside later candidates) the COMMON case — prefixes must
    // degenerate rather than diverge
    val rnd = new scala.util.Random(7)
    val tight = (0 until 60).map(id => (id.toLong,
      (0 until 8).map(_ =>
        (0 until (2 + rnd.nextInt(6))).map(_ => if (rnd.nextBoolean()) "a" else "b")
          .mkString).mkString(" ")))
      .toDF("doc_id", "text").localCheckpoint()
    val seqTight = runMerges(tight, 16)
    for (b <- Seq(3, 8))
      assert(batched(tight, 16, b) == seqTight, s"batch=$b diverged on {a,b} corpus")

    // richer seeded corpus + the round-count observable: batching must
    // actually collapse driver round-trips when the data allows it
    val vocab = Seq("low", "lower", "lowest", "new", "newer", "newest",
      "wide", "wider", "widest", "tall", "form", "format", "union", "onion")
    val rnd2 = new scala.util.Random(11)
    val rich = (0 until 120).map(id => (id.toLong,
      (0 until (5 + rnd2.nextInt(20)))
        .map(_ => vocab(rnd2.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text").localCheckpoint()
    val seqRich = runMerges(rich, 20)
    val (df, rounds) = Bpe.bpeVocabBatchedTracked(rich, 20, batch = 8)
    val gotRich = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(gotRich == seqRich, "batched diverged on the rich corpus")
    assert(rounds < 20, s"batching saved no rounds ($rounds/20)")
    assert(rounds >= (20 + 7) / 8, "round count below the batch-size floor?")
  }

  test("BPE matches a driver-side reference implementation on a seeded random corpus") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(4242)
    val vocab = (0 until 40).map(_ =>
      (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = (0 until 200).map(id =>
      (id.toLong, (0 until (5 + rnd.nextInt(25)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    // driver-side reference BPE over the exact word counts
    val wordCounts = docs.collect()
      .flatMap(_.getString(1).split("\\s+"))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    def mergeSeq(s: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    var cur = wordCounts.toSeq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val expect = (0 until 12).map { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((s, n) <- cur; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) += n
      val ((l, r), c) = counts.toSeq.minBy { case ((l0, r0), c0) => (-c0, l0, r0) }
      cur = cur.map { case (s, n) => (mergeSeq(s, l, r), n) }
      (step.toLong, l, r, c)
    }
    assert(runMerges(docs, 12) == expect)
  }
}
