package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.sources.Sources

/** Bucketed-layout join: the end-to-end demonstration that a co-located
  * physical layout removes the join shuffle entirely (SURVEY.md §2.1 /
  * the q03 join shape on a bucketed warehouse).
  *
  * At 100 TB the orders⋈lineitem shuffle is the single largest data
  * movement in the TPC-H-shaped queries; writing both tables bucketed by
  * the order key once lets every subsequent join on that key read
  * co-partitioned buckets with zero Exchange (reference shape: Spark's
  * own bucketing, sql/core/.../datasources/BucketingUtils.scala — the
  * 1.3-era reference had no bucketing, making this a Spark-4-native
  * upgrade of its repeated-join workloads).
  */
object Bucketed {

  val nBuckets = 8

  /** Ensure bucketed copies of orders/lineitem exist for `dir`, keyed by
    * the order key; idempotent per session (catalog check) and safe
    * across sessions (overwrite into a dir-keyed scratch path). Returns
    * the two table names. */
  def bucketedOrdersLineitem(s: SparkSession, dir: String): (String, String) = {
    val suf = math.abs(dir.hashCode).toString
    val scratch = s"${sys.props("java.io.tmpdir")}/graft-bucketed-$suf"
    val oTbl = s"orders_bkt_$suf"
    val lTbl = s"lineitem_bkt_$suf"
    if (!s.catalog.tableExists(oTbl)) {
      Sources.writeBucketedAt(Tables.orders(s, dir), oTbl, s"$scratch/orders",
        nBuckets, "o_orderkey", Seq("o_orderkey"))
      Sources.writeBucketedAt(Tables.lineitem(s, dir), lTbl, s"$scratch/lineitem",
        nBuckets, "l_orderkey", Seq("l_orderkey"))
    }
    (oTbl, lTbl)
  }

  /** The q03 join shape on the bucketed layout: orders⋈lineitem joins
    * bucket-to-bucket (no Exchange on the join key — asserted in
    * SourcesSpec), the customer dim broadcasts. Oracle = the plain join
    * on the unbucketed tables: bucketing must be semantically invisible. */
  val q40 = Q.sql(
    "q40_bucketed_join",
    """SELECT o_orderpriority, c_mktsegment, count(*) AS n,
      |  round(sum(l_extendedprice), 2) AS total_price
      |FROM orders
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_orderpriority, c_mktsegment
      |ORDER BY o_orderpriority, c_mktsegment""".stripMargin) { (s, dir) =>
    val (oTbl, lTbl) = bucketedOrdersLineitem(s, dir)
    s.table(oTbl)
      .join(s.table(lTbl), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority", "c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total_price"))
      .orderBy("o_orderpriority", "c_mktsegment")
  }

  val all: Seq[Q] = Seq(q40)
}
