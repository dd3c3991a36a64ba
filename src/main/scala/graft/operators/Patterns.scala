package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Frequent-itemset mining (reference mllib/src/main/scala/org/apache/
  * spark/mllib/fpm/FPGrowth.scala:1 — Parallel FP-Growth, Li et al.
  * RecSys'08) re-expressed Spark-first. In a data pipeline this is t08's
  * big sibling: t08 finds frequent single terms, this finds frequent
  * COMBINATIONS (boilerplate templates, bundled products).
  *
  * The PFP decomposition, exactly the reference's:
  *
  *  1. one pass counts item frequencies; items under `minSupport` are
  *     discarded and survivors get a (count desc, item asc) RANK that
  *     rides as a broadcast map literal (bounded by ≤ totalItems /
  *     minSupport entries — t03's capped-model discipline);
  *  2. each transaction keeps its frequent items rank-sorted, and for
  *     every kept item emits ONE conditional transaction (the rank
  *     prefix ending at that item), keyed by it. Every itemset is then
  *     mined in EXACTLY ONE shard — that of its least-frequent item —
  *     so shards need no cross-talk and the output needs no dedup;
  *  3. per shard, a local DFS miner (flatMapGroups — the genuinely-
  *     sequential kernel, like t07's first-fit) counts suffix
  *     projections recursively, bounded by `maxItems`.
  *
  * One explode + one groupBy shuffle; nothing driver-side beyond the
  * rank map; shard work is bounded by that item's conditional database,
  * never the corpus.
  */
object Patterns {

  /** @param transactions (tid, items: array<long>) — items need not be
    *                     distinct or sorted; both are normalized here
    * @param minSupport   absolute transaction count
    * @param maxItems     DFS depth cap (largest itemset emitted)
    * @return (items: csv of the itemset sorted ascending, n_items,
    *         support) for itemsets of size ≥ 2 — size-1 sets are the
    *         plain frequency table (t08 territory) and omitted
    */
  def freqItemsets(transactions: DataFrame, minSupport: Long, maxItems: Int = 4): DataFrame = {
    val spark = transactions.sparkSession
    import spark.implicits._
    val tx = transactions.select(col("tid"), array_distinct(col("items")).as("items"))
    val freq = tx.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minSupport)
      .orderBy(col("cnt").desc, col("item"))
      .collect().map(_.getLong(0))
    if (freq.isEmpty) return Seq.empty[(String, Int, Long)].toDF("items", "n_items", "support")
    val itemOf: Map[Int, Long] = freq.zipWithIndex.map { case (it, r) => r -> it }.toMap
    val bItemOf = spark.sparkContext.broadcast(itemOf)

    // rank items via a BROADCAST join (a rank-map plan LITERAL of
    // |F| entries bloats analysis+codegen — measured 3× slower), then
    // re-assemble each transaction's rank-sorted frequent items
    val rankDF = broadcast(
      freq.zipWithIndex.toSeq.toDF("item", "rank"))
    val ranked = tx.select(col("tid"), explode(col("items")).as("item"))
      .join(rankDF, "item")
      .groupBy("tid").agg(sort_array(collect_list(col("rank"))).as("rs"))
    val conditionals = ranked
      .select(col("rs"), posexplode(col("rs")).as(Seq("p", "key")))
      .withColumn("cond", expr("slice(rs, 1, p + 1)"))

    val mined = conditionals
      .select(col("key"), col("cond"))
      .as[(Int, Seq[Int])]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        // conditional DB: rank prefixes ending at `key` (key dropped)
        val db = rows.map(_._2.dropRight(1).toArray).toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(List[Int], Long)]
        // DFS: extend the suffix {key} ∪ prefix by ever-SMALLER ranks so
        // each itemset is enumerated exactly once
        def mine(cur: Array[Array[Int]], suffix: List[Int]): Unit = {
          if (suffix.length >= maxItems) return
          val counts = scala.collection.mutable.LongMap.empty[Long]
          cur.foreach(_.foreach(r => counts(r) = counts.getOrElse(r.toLong, 0L) + 1))
          counts.toSeq.sortBy(_._1).foreach { case (rL, c) =>
            if (c >= minSupport) {
              val r = rL.toInt
              out += ((r :: suffix, c))
              mine(
                cur.filter(_.contains(r)).map(_.filter(_ < r)),
                r :: suffix)
            }
          }
        }
        mine(db, List(key))
        val io = bItemOf.value
        out.iterator.map { case (rs, sup) =>
          val items = rs.map(io).sorted
          (items.mkString(","), items.length, sup)
        }
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.scalaLong))
      .toDF("items", "n_items", "support")
    mined
  }

  /** Frequent co-purchase part bundles: itemsets of parts bought
    * together in ≥ max(2, 2e-5·|tx|) orders. minSupport is derived as a
    * FRACTION of the transaction count (MLlib's contract — one 1-row
    * agg), so the driver-side rank table stays O(avgItemsPerTx /
    * fraction) — CONSTANT in corpus size — instead of approaching the
    * whole item domain as an absolute threshold would at 100 TB; the
    * max(2, ·) floor keeps small-SF results identical to the absolute-2
    * behavior the spec pins.
    *
    * FULL value oracle (r10): with `maxItems = 4` the registered output
    * is exactly the frequent 2-/3-/4-itemsets, which DuckDB enumerates
    * brute-force as ordered self-joins of the distinct (tid, item)
    * pairs with HAVING count ≥ minSupport — exact supports for every
    * itemset, same CSV serialization (any frequent 5-set's 4-subsets
    * are frequent and already emitted, so the size cap is identical on
    * both sides). The Spark side is unchanged: PFP stays the 100 TB
    * path (the oracle's all-pairs joins are the thing PFP exists to
    * avoid); PatternsSpec still checks planted baskets brute-force. */
  val fp01 = Q.sql(
    "fp01_freq_itemsets",
    """WITH it AS (
      |  SELECT DISTINCT l_orderkey AS tid, l_partkey AS item FROM lineitem),
      |n AS (
      |  SELECT greatest(2, CAST(ceil(count(DISTINCT tid) * 2e-5) AS BIGINT)) AS ms
      |  FROM it),
      |p2 AS (
      |  SELECT a.item AS i1, b.item AS i2, count(*) AS sup
      |  FROM it a JOIN it b ON a.tid = b.tid AND a.item < b.item
      |  GROUP BY 1, 2 HAVING count(*) >= (SELECT ms FROM n)),
      |p3 AS (
      |  SELECT a.item AS i1, b.item AS i2, c.item AS i3, count(*) AS sup
      |  FROM it a JOIN it b ON a.tid = b.tid AND a.item < b.item
      |       JOIN it c ON b.tid = c.tid AND b.item < c.item
      |  GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT ms FROM n)),
      |p4 AS (
      |  SELECT a.item AS i1, b.item AS i2, c.item AS i3, d.item AS i4,
      |         count(*) AS sup
      |  FROM it a JOIN it b ON a.tid = b.tid AND a.item < b.item
      |       JOIN it c ON b.tid = c.tid AND b.item < c.item
      |       JOIN it d ON c.tid = d.tid AND c.item < d.item
      |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= (SELECT ms FROM n))
      |SELECT CAST(i1 AS VARCHAR) || ',' || CAST(i2 AS VARCHAR) AS items,
      |       2 AS n_items, sup AS support FROM p2
      |UNION ALL
      |SELECT CAST(i1 AS VARCHAR) || ',' || CAST(i2 AS VARCHAR) || ',' ||
      |       CAST(i3 AS VARCHAR), 3, sup FROM p3
      |UNION ALL
      |SELECT CAST(i1 AS VARCHAR) || ',' || CAST(i2 AS VARCHAR) || ',' ||
      |       CAST(i3 AS VARCHAR) || ',' || CAST(i4 AS VARCHAR), 4, sup FROM p4
      |ORDER BY items""".stripMargin) { (s, dir) =>
    val tx = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("tid"))
      .agg(collect_set("l_partkey").as("items"))
    val nTx = tx.agg(count(lit(1))).head.getLong(0)
    val minSupport = math.max(2L, math.ceil(nTx * 2e-5).toLong)
    freqItemsets(tx, minSupport, maxItems = 4)
      .orderBy("items")
  }

  val all: Seq[Q] = Seq(fp01)
}
