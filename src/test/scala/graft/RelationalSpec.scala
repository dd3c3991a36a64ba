package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkTestBase {

  test("every registered query runs and respects its declared contract") {
    (Relational.all ++ graft.operators.Analytics.all).foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      assert(df.count() >= 0, s"${q.name}: failed to execute")
    }
  }

  test("q01_agg matches hand-computed aggregate") {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
    val expectRows = li.select("l_returnflag", "l_linestatus").distinct().count()
    val got = Relational.q01.run(spark, sfDir)
    assert(got.count() == expectRows)
    val totalOrders = got.agg(sum("count_order")).head.getLong(0)
    assert(totalOrders == li.count())
  }

  test("q07 top-k returns exactly k rows in descending price order") {
    val rows = Relational.q07.run(spark, sfDir).collect()
    assert(rows.length == 25)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q12 outer join keeps customers with zero orders at n_orders=0") {
    val got = Relational.q12.run(spark, sfDir)
    assert(got.count() == Tables.customer(spark, sfDir).count())
    assert(got.filter(col("n_orders") === 0 && col("spend") =!= 0).count() == 0)
  }

  test("q10 semi join row count equals distinct matching customers") {
    val expected = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(Relational.q10.run(spark, sfDir).count() == expected)
  }

  test("oracle map only references registered queries and vice versa") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
