package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

class SourcesSpec extends SparkTestBase {

  test("csv and json round-trip with explicit schemas") {
    val dir = Files.createTempDirectory("graft-src").toString
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    orders.write.mode("overwrite").json(s"$dir/json")

    val backCsv = Sources.csv(spark, s"$dir/csv", orders.schema)
    val backJson = Sources.json(spark, s"$dir/json", orders.schema)
    assert(backCsv.count() == orders.count())
    assert(backJson.count() == orders.count())
    assert(backCsv.agg(sum("o_totalprice")).head.getDouble(0) ==
      backJson.agg(sum("o_totalprice")).head.getDouble(0))
  }

  test("partitioned write enables partition pruning at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.orders(spark, sfDir)
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("status") === "F")
    val p = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F").count())
    assert(p.contains("PartitionFilters: [") && p.contains("status"),
      s"no partition filter in:\n$p")
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    Sources.writeBucketed(
      Tables.orders(spark, sfDir), "orders_b", 4, "o_custkey", Seq("o_custkey"))
    Sources.writeBucketed(
      Tables.customer(spark, sfDir), "customer_b", 4, "c_custkey", Seq("c_custkey"))
    // force the sort-merge path: broadcast would bypass bucketing entirely
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(joined.count() > 0)
      assert(p.contains("SortMergeJoin") && !p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("q40 bucketed orders⋈lineitem: zero exchange on the join key, equal to unbucketed") {
    import graft.operators.Bucketed
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (oTbl, lTbl) = Bucketed.bucketedOrdersLineitem(spark, sfDir)
      val joined = spark.table(oTbl)
        .join(spark.table(lTbl), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total_price"))
      val got = joined.orderBy("o_orderpriority").collect().toSeq
      // AQE finalizes only after executing this same QueryExecution
      val p = joined.queryExecution.executedPlan.toString
      val smj = p.indexOf("SortMergeJoin")
      assert(smj >= 0, s"expected sort-merge join on the bucketed key:\n$p")
      assert(!p.substring(smj).contains("Exchange"),
        s"bucketed o⋈l join must read co-partitioned buckets, not shuffle:\n$p")
      val want = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total_price"))
        .orderBy("o_orderpriority").collect().toSeq
      assert(got == want, "bucketing must be semantically invisible")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
