package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkTestBase {

  test("every analytics query runs") {
    Analytics.all.foreach { q =>
      assert(q.run(spark, sfDir).count() >= 0, s"${q.name} failed")
    }
  }

  test("q13 emits at most 3 rows per customer, ranks 1..3") {
    val got = Analytics.q13.run(spark, sfDir)
    val maxPer = got.groupBy("o_custkey").count().agg(max("count")).head.getLong(0)
    assert(maxPer <= 3)
    assert(got.agg(min("rk"), max("rk")).head.toSeq == Seq(1, 3))
  }

  test("q14 running_spend final row equals customer total") {
    val got = Analytics.q14.run(spark, sfDir)
    val finalRunning = got.groupBy("o_custkey").agg(max("running_spend").as("rs"))
    val direct = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("tot"))
    val joined = finalRunning.join(direct, "o_custkey")
      .filter(abs(col("rs") - col("tot")) > 1e-6)
    assert(joined.count() == 0)
  }

  test("q15 rollup includes grand total row equal to table count") {
    val got = Analytics.q15.run(spark, sfDir)
    val grand = got.filter(col("o_orderstatus").isNull && col("o_orderpriority").isNull)
    assert(grand.count() == 1)
    assert(grand.head.getLong(2) == Tables.orders(spark, sfDir).count())
  }

  test("q30 HLL approx distinct within 5% of exact") {
    val rows = Analytics.q30.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"HLL err out of bound for ${r.getString(0)}")
    }
  }

  test("q41 approx percentiles track exact q25 within 3%") {
    // approx_percentile returns an actual element; exact `percentile`
    // interpolates between elements — at sf0.001 group sizes (~300 rows)
    // adjacent elements near the median already differ by ~1%, so the
    // bound covers discretization, not just sketch error. The in-plan
    // flags carry the bound claim; the exact columns must match q25.
    val exact = Analytics.q25.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val got = Analytics.q41.run(spark, sfDir).collect()
    assert(got.length == exact.size)
    got.foreach { r =>
      val (m, p90) = exact(r.getString(0))
      assert(r.getDouble(1) == m && r.getDouble(2) == p90,
        s"exact columns diverged from q25 for ${r.getString(0)}")
      assert(r.getBoolean(3), s"median sketch out of bound for ${r.getString(0)}")
      assert(r.getBoolean(4), s"p90 sketch out of bound for ${r.getString(0)}")
    }
  }

  test("q29 pivot cell sums equal order count") {
    val got = Analytics.q29.run(spark, sfDir)
    val total = got.agg(sum(col("F") + col("O") + col("P"))).head.getLong(0)
    assert(total == Tables.orders(spark, sfDir).count())
  }
}
