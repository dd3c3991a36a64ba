package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

class StatsSpec extends SparkTestBase {

  test("q38 seeded sample is deterministic and near the target fraction") {
    val a = Stats.q38.run(spark, sfDir).collect().toSeq
    val b = Stats.q38.run(spark, sfDir).collect().toSeq
    assert(a == b, "same seed must give identical samples")
    val total = Tables.lineitem(spark, sfDir).count()
    val frac = a.size.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"fraction $frac far from 0.1")
  }

  test("q37 weighted average equals the algebraic identity") {
    val got = Stats.q37.run(spark, sfDir)
    val want = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(round(sum(col("l_discount") * col("l_quantity")) / sum("l_quantity"), 6).as("w"))
    val joined = got.join(want, "l_returnflag")
      .filter(abs(col("wavg_disc") - col("w")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("q32 arg_max returns the order with the group's max price") {
    val got = Stats.q32.run(spark, sfDir).collect()
    val orders = Tables.orders(spark, sfDir)
    got.foreach { r =>
      val prio = r.getString(0)
      val priciest = r.getLong(1)
      val maxPrice = r.getDouble(3)
      val hit = orders.filter(col("o_orderkey") === priciest).head
      assert(hit.getAs[String]("o_orderpriority") == prio)
      assert(math.abs(hit.getAs[Double]("o_totalprice") - maxPrice) < 1e-6)
    }
  }

  test("q52 sampleBy hits each stratum's rate, drops unlisted strata, repeats per seed") {
    val fractions = Map("en" -> 0.8, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.1)
    val docs = Tables.documents(spark, sfDir)
    val got = Stats.q52.run(spark, sfDir).cache()
    assert(got.filter(!col("lang").isInCollection(fractions.keys.toSeq)).count() == 0,
      "strata without a fraction must not appear")
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (lang, f) =>
      val n = base(lang).toDouble
      val rate = sampled.getOrElse(lang, 0L) / n
      // 4-sigma binomial tolerance around the requested fraction
      val tol = 4 * math.sqrt(f * (1 - f) / n)
      assert(math.abs(rate - f) <= tol, s"$lang rate $rate vs $f (n=$n, tol=$tol)")
    }
    val again = Stats.q52.run(spark, sfDir)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty,
      "same seed must reproduce the same sample")
    got.unpersist()
  }
}
