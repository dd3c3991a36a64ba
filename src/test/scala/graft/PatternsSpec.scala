package graft

import org.apache.spark.sql.functions._
import graft.operators.Patterns

class PatternsSpec extends SparkTestBase {

  /** Brute-force reference: enumerate every subset (size 2..max) of
    * every basket and count. */
  private def bruteForce(baskets: Seq[Seq[Long]], minSup: Long, maxItems: Int)
  : Map[String, Long] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    baskets.foreach { b =>
      val d = b.distinct.sorted
      (2 to math.min(maxItems, d.length)).foreach { n =>
        d.combinations(n).foreach { c =>
          val k = c.mkString(",")
          counts(k) = counts.getOrElse(k, 0L) + 1
        }
      }
    }
    counts.filter(_._2 >= minSup).toMap
  }

  test("PFP mining equals brute-force subset counting on planted baskets") {
    import TestSpark.spark.implicits._
    // planted structure: {1,2,3} bought together 4x, {1,2} twice more,
    // {7,8,9,10} 3x, plus noise baskets
    val baskets: Seq[Seq[Long]] = Seq(
      Seq(1L, 2L, 3L), Seq(1L, 2L, 3L, 50L), Seq(1L, 2L, 3L, 51L), Seq(3L, 2L, 1L),
      Seq(1L, 2L, 60L), Seq(2L, 1L),
      Seq(7L, 8L, 9L, 10L), Seq(10L, 9L, 8L, 7L), Seq(7L, 8L, 9L, 10L, 99L),
      Seq(20L, 21L), Seq(22L), Seq(23L, 24L, 25L))
    val tx = baskets.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("tid", "items")
    val got = Patterns.freqItemsets(tx, minSupport = 2L, maxItems = 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = bruteForce(baskets, minSup = 2L, maxItems = 4)
    assert(got == want,
      s"missing=${(want.keySet -- got.keySet).toSeq.sorted} " +
        s"extra=${(got.keySet -- want.keySet).toSeq.sorted} " +
        s"diff=${want.keys.filter(k => got.get(k).exists(_ != want(k)))}")
    // spot-check the planted supports
    assert(got("1,2,3") == 4L && got("1,2") == 6L && got("7,8,9,10") == 3L)
  }

  test("maxItems caps the itemset size; minSupport filters") {
    import TestSpark.spark.implicits._
    val tx = (0 until 5).map(i => (i.toLong, Seq(1L, 2L, 3L, 4L, 5L))).toDF("tid", "items")
    val got = Patterns.freqItemsets(tx, minSupport = 5L, maxItems = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.forall(_._2 <= 3), s"size cap violated: ${got.mkString(";")}")
    assert(got.forall(_._3 == 5L))
    // all C(5,2)+C(5,3) = 10+10 subsets present
    assert(got.length == 20, s"expected 20 itemsets, got ${got.length}")
  }

  test("fp01 emits sorted csv itemsets with support >= 2") {
    val out = Patterns.fp01.run(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("support") < 2).count() == 0)
    val bad = out.collect().count { r =>
      val parts = r.getString(0).split(",").map(_.toLong)
      parts.toSeq != parts.sorted.toSeq || parts.length != r.getInt(1)
    }
    assert(bad == 0, "itemset csv must be ascending and match n_items")
  }
}
