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

  test("kFold splits partition the table, complement each other, and ignore placement") {
    import graft.operators.Sampling
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val n = li.count()
    val keys = Seq(col("l_orderkey"), col("l_linenumber").cast("long"))
    val sizes = (0 until 4).map { f =>
      val (train, valid) = Sampling.kFold(li, 4, f, 42L, keys: _*)
      assert(train.count() + valid.count() == n, s"fold $f must partition the table")
      assert(train.intersect(valid).isEmpty, s"fold $f train/validation overlap")
      valid.count()
    }
    assert(sizes.sum == n, "the k validation sets must cover every row exactly once")
    sizes.foreach(s =>
      assert(math.abs(s - n / 4.0) < 4 * math.sqrt(n * 0.25 * 0.75),
        s"fold size $s far from n/k = ${n / 4.0}"))
    // placement invariance: fold of a given key never depends on partitioning
    val a = Sampling.kFold(li.repartition(1), 4, 0, 42L, keys: _*)._2
    val b = Sampling.kFold(li.repartition(13), 4, 0, 42L, keys: _*)._2
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("st01 colStats agrees with the built-in aggregates") {
    import graft.operators.Stats
    val got = Stats.st01.run(spark, sfDir).collect()
    assert(got.length == 64)
    val want = Tables.embeddings(spark, sfDir)
      .select(posexplode(col("embedding")).as(Seq("p", "x")))
      .groupBy("p")
      .agg(avg(col("x").cast("double")).as("m"),
        var_samp(col("x").cast("double")).as("v"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    got.foreach { r =>
      val p = r.getInt(0)
      val (m, v, n) = want(p)
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - m) < 1e-5, s"dim $p mean")
      assert(math.abs(r.getDouble(3) - v) < 1e-5, s"dim $p variance")
      assert(r.getLong(4) <= n, "nnz <= n")
      assert(r.getDouble(5) >= r.getDouble(2) && r.getDouble(6) <= r.getDouble(2),
        s"dim $p: mean outside [min, max]")
    }
  }

  test("hist01 buckets partition the value range and sum to the row count") {
    import graft.operators.Stats
    val got = Stats.hist01.run(spark, sfDir).collect()
    assert(got.length == 20)
    val total = Tables.lineitem(spark, sfDir).count()
    assert(got.map(_.getLong(3)).sum == total,
      "bucket counts must sum to the table size (max value included)")
    // edges tile [lo, hi] contiguously
    got.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getDouble(2) == w(1).getDouble(1), "edges must tile")
    }
    val mm = Tables.lineitem(spark, sfDir)
      .agg(min("l_extendedprice"), max("l_extendedprice")).head
    assert(got.head.getDouble(1) == mm.getDouble(0))
    assert(math.abs(got.last.getDouble(2) - mm.getDouble(1)) < 1e-9)
  }

  test("hash sampling membership is partition-count invariant") {
    import graft.operators.Sampling
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    def keys(df: org.apache.spark.sql.DataFrame) =
      Sampling.sample(df, 0.1, 42L,
          col("l_orderkey"), col("l_linenumber").cast("long"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val one = keys(li.repartition(1))
    val many = keys(li.repartition(17))
    assert(one == many, "sample membership must not depend on placement")
    // a different seed draws a genuinely different subset
    val other = Sampling.sample(li, 0.1, 43L,
        col("l_orderkey"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(other != one, "distinct seeds must give distinct samples")
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
    // partition invariance: the same doc_ids survive at any parallelism
    import graft.operators.Sampling
    val oneP = Sampling.sampleBy(docs.repartition(1), "lang", fractions, 42L,
        col("doc_id")).select("doc_id")
    assert(oneP.exceptAll(got.select("doc_id")).isEmpty &&
      got.select("doc_id").exceptAll(oneP).isEmpty,
      "stratified sample membership must not depend on placement")
    got.unpersist()
  }

  test("spearman fractional ranks average over ties exactly") {
    import TestSpark.spark.implicits._
    // values 5,5,7,9,9,9 → avg ranks 1.5, 1.5, 3, 5, 5, 5
    val df = Seq(5.0, 9.0, 5.0, 7.0, 9.0, 9.0).toDF("x")
    val rk = Stats.spearmanRanks(df, "x").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(rk(5.0) == 1.5 && rk(7.0) == 3.0 && rk(9.0) == 5.0,
      s"fractional ranks wrong: $rk")
  }

  test("spearman is exactly ±1 on monotone (nonlinear) relationships, despite ties") {
    import TestSpark.spark.implicits._
    // y = x³ is monotone but nonlinear: Pearson < 1, Spearman = 1;
    // z reverses order → −1. Duplicated xs exercise the tie path on
    // both sides of each pair.
    val rows = (1 to 40).map(i => (i / 2 * 1.0, math.pow(i / 2, 3), -(i / 2) * 1.0))
    val df = rows.toDF("x", "y", "z")
    val ranked = df
      .join(Stats.spearmanRanks(df, "x"), "x")
      .join(Stats.spearmanRanks(df, "y"), "y")
      .join(Stats.spearmanRanks(df, "z"), "z")
    val r = ranked.agg(
      corr("rk_x", "rk_y").as("up"), corr("rk_x", "rk_z").as("down")).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12, s"monotone-up must give 1, got ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12, s"monotone-down must give -1, got ${r.getDouble(1)}")
  }

  test("q59 agrees with a single-partition window formulation") {
    val got = Stats.q59.run(spark, sfDir).head
    val li = Tables.lineitem(spark, sfDir)
      .select("l_quantity", "l_extendedprice", "l_discount")
    import org.apache.spark.sql.expressions.Window
    def naiveRank(c: String) =
      rank().over(Window.orderBy(col(c))) +
        (count(lit(1)).over(Window.partitionBy(col(c))) - 1) / 2.0
    val naive = li
      .withColumn("rq", naiveRank("l_quantity"))
      .withColumn("rp", naiveRank("l_extendedprice"))
      .withColumn("rd", naiveRank("l_discount"))
      .agg(round(corr("rq", "rp"), 6).as("a"), round(corr("rq", "rd"), 6).as("b")).head
    assert(got.getDouble(1) == naive.getDouble(0),
      s"scalable rank path ${got.getDouble(1)} != naive window ${naive.getDouble(0)}")
    assert(got.getDouble(2) == naive.getDouble(1))
  }
}
