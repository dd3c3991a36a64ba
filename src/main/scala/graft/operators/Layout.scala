package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Data-layout operators — the write-side levers that make 100 TB READS
  * cheap. Z-order clustering interleaves the bits of two scan
  * predicates' key columns so that range-partitioning on ONE derived
  * value co-locates rows that are close in BOTH dimensions: a
  * multi-dimensional filter then prunes most files/row-groups instead
  * of one dimension's worth (the Delta/Iceberg OPTIMIZE ZORDER shape,
  * as plain deterministic column arithmetic).
  */
object Layout {

  /** Spread the low 32 bits of a non-negative long into the even bit
    * positions of a 64-bit value (the classic mask ladder). Pure
    * integer column ops — bit-identical in any engine that has
    * shift/and/or, which is what makes the z-value fully oracleable. */
  private[operators] def spreadBits(c: Column): Column = {
    val m1 = lit(0x0000FFFF0000FFFFL)
    val m2 = lit(0x00FF00FF00FF00FFL)
    val m3 = lit(0x0F0F0F0F0F0F0F0FL)
    val m4 = lit(0x3333333333333333L)
    val m5 = lit(0x5555555555555555L)
    val x0 = c.bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(m1)
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(m2)
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(m3)
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(m4)
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(m5)
  }

  /** 64-bit Morton (z-order) value of two non-negative 32-bit keys:
    * x occupies the even bits, y the odd bits. */
  def zOrderValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Range-partition `df` on the z-value of (xCol, yCol) — the
    * production layout job: one shuffle at write time buys
    * two-dimensional file pruning on every later scan. */
  def zOrderRepartition(df: DataFrame, xCol: String, yCol: String,
                        numPartitions: Int): DataFrame =
    df.withColumn("_z", zOrderValue(col(xCol), col(yCol)))
      .repartitionByRange(numPartitions, col("_z"))
      .drop("_z")

  /** Registered pass: z-order lineitem on (l_partkey, l_suppkey) and
    * summarize each z-prefix bucket (z >> 20, i.e. 10 remaining bits
    * per dimension). FULL value oracle — the mask ladder is replayed
    * op-for-op in DuckDB, so every bucket's count and key bounds are
    * bit-exact integers. The locality CERTIFICATE is the z-curve
    * property made a flag: fixing a z-prefix confines each dimension to
    * one 1024-aligned window, so every bucket's per-dimension spread
    * must be < 1024 — PROVABLE, asserted in-plan per bucket (and the
    * reason a two-dimensional filter prunes: a (part, supp) rectangle
    * touches few buckets). LayoutSpec pins the interleave against a
    * bit-reference and the repartition row preservation. */
  val zo01 = Q.sql(
    "zo01_zorder_stats",
    """WITH k AS (
      |  SELECT CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y
      |  FROM lineitem),
      |sx AS (SELECT x, y, (x | (x << 16)) & 281470681808895 AS s FROM k),
      |sx2 AS (SELECT x, y, (s | (s << 8)) & 71777214294589695 AS s FROM sx),
      |sx3 AS (SELECT x, y, (s | (s << 4)) & 1085102592571150095 AS s FROM sx2),
      |sx4 AS (SELECT x, y, (s | (s << 2)) & 3689348814741910323 AS s FROM sx3),
      |sx5 AS (SELECT x, y, (s | (s << 1)) & 6148914691236517205 AS s FROM sx4),
      |sy AS (SELECT x, y, s AS xs, (y | (y << 16)) & 281470681808895 AS t FROM sx5),
      |sy2 AS (SELECT x, y, xs, (t | (t << 8)) & 71777214294589695 AS t FROM sy),
      |sy3 AS (SELECT x, y, xs, (t | (t << 4)) & 1085102592571150095 AS t FROM sy2),
      |sy4 AS (SELECT x, y, xs, (t | (t << 2)) & 3689348814741910323 AS t FROM sy3),
      |sy5 AS (SELECT x, y, xs, (t | (t << 1)) & 6148914691236517205 AS t FROM sy4),
      |z AS (SELECT x, y, (xs | (t << 1)) AS zv FROM sy5)
      |SELECT (zv >> 20) AS bucket, CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(x) AS BIGINT) AS min_part, CAST(max(x) AS BIGINT) AS max_part,
      |  CAST(min(y) AS BIGINT) AS min_supp, CAST(max(y) AS BIGINT) AS max_supp,
      |  TRUE AS box_bounded
      |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey").cast("long").as("x"),
        col("l_suppkey").cast("long").as("y"))
    li.withColumn("zv", zOrderValue(col("x"), col("y")))
      .groupBy(shiftright(col("zv"), 20).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("x").as("min_part"), max("x").as("max_part"),
        min("y").as("min_supp"), max("y").as("max_supp"))
      .select(col("bucket"), col("n"),
        col("min_part"), col("max_part"), col("min_supp"), col("max_supp"),
        (col("max_part") - col("min_part") < 1024 &&
          col("max_supp") - col("min_supp") < 1024).as("box_bounded"))
      .orderBy("bucket")
  }

  val all: Seq[Q] = Seq(zo01)
}
