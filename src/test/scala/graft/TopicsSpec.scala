package graft

import org.apache.spark.sql.functions._
import graft.operators.Topics

class TopicsSpec extends SparkTestBase {

  test("LDA separates two planted vocabularies into distinct topics") {
    import TestSpark.spark.implicits._
    val vocabA = Seq("apple", "banana", "cherry", "date", "elderberry")
    val vocabB = Seq("zebra", "yak", "walrus", "vulture", "urchin")
    // 60 docs, each drawing 12 words from ONE vocabulary (deterministic
    // round-robin with varying emphasis so counts differ across docs)
    val docs = (0 until 60).map { i =>
      val v = if (i % 2 == 0) vocabA else vocabB
      val words = (0 until 12).map(t => v((i * 5 + t * 3 + t % 4) % 5))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")

    val topics = Topics.ldaTopics(docs, k = 2, iters = 15, topWords = 5)
      .collect().map(r => (r.getInt(0), r.getString(2))).groupBy(_._1)
      .map { case (t, rows) => t -> rows.map(_._2).toSet }
    assert(topics.size == 2)
    val Seq(t0, t1) = topics.values.toSeq
    // each topic's top words must come from ONE planted vocabulary, and
    // the two topics must pick different vocabularies
    def side(s: Set[String]): Int =
      if (s.subsetOf(vocabA.toSet)) 0 else if (s.subsetOf(vocabB.toSet)) 1 else -1
    assert(side(t0) >= 0, s"mixed topic: $t0")
    assert(side(t1) >= 0, s"mixed topic: $t1")
    assert(side(t0) != side(t1), s"both topics learned the same vocabulary: $t0 / $t1")

    val again = Topics.ldaTopics(docs, k = 2, iters = 15, topWords = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    val first = Topics.ldaTopics(docs, k = 2, iters = 15, topWords = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(first == again, "seeded EM must be deterministic")
  }

  test("lda01 emits exactly topWords rows per topic with valid probabilities") {
    val out = Topics.lda01.run(spark, sfDir).cache()
    val perTopic = out.groupBy("topic").count().collect().map(r => r.getLong(1))
    assert(perTopic.length == 4 && perTopic.forall(_ == 5L), perTopic.mkString(","))
    assert(out.filter(col("phi6") <= 0.0 || col("phi6") > 1.0).count() == 0)
  }
}
