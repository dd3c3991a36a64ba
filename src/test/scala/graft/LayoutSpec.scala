package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkTestBase {

  /** Bit-by-bit reference interleave, the definition the mask ladder
    * must reproduce. */
  private def zRef(x: Long, y: Long): Long = {
    var z = 0L
    for (b <- 0 until 32) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("zOrderValue matches the bit-definition on random and boundary keys") {
    val rnd = new scala.util.Random(42)
    val keys = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFFFFL, 0xFFFFFFFFL),
      (123456789L, 987654321L)) ++
      Seq.fill(200)((rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(keys.map { case (x, y) => Row(x, y) }: _*),
      StructType(Seq(StructField("x", LongType), StructField("y", LongType))))
    val got = df.select(col("x"), col("y"),
        Layout.zOrderValue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1)),
        s"z(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order is monotone within a row/column and interleaves locality") {
    // along one axis with the other fixed, z increases with the key
    val xs = (0L until 100L).map(x => (x, 37L))
    xs.sliding(2).foreach { case Seq((x1, y), (x2, _)) =>
      assert(zRef(x1, y) < zRef(x2, y))
    }
    // the quadrant property: both keys < 2^b => z < 4^b
    for (b <- 1 to 15; x <- Seq(0L, (1L << b) - 1); y <- Seq(0L, (1L << b) - 1))
      assert(zRef(x, y) < (1L << (2 * b)))
  }

  test("zOrderRepartition preserves rows and co-locates key rectangles") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val parts = Layout.zOrderRepartition(li, "l_partkey", "l_suppkey", 8)
    assert(parts.count() == li.count())
    assert(parts.rdd.getNumPartitions == 8)
    // layout quality: a two-dimensional rectangle predicate touches
    // FEWER z-range partitions than rows spread uniformly would --
    // each partition owns a contiguous z range, and the rectangle's
    // z-image is a few runs
    // the corpus domain is partkey 0..~200·sf-scale, suppkey 0..~10;
    // the [0,32)×[0,4) rectangle's z-image is the contiguous prefix
    // z < 1024 (quadrant property), i.e. the bottom few percent of the
    // z-sorted order — a handful of range partitions, not all of them
    val withPid = parts
      .withColumn("_pid", spark_partition_id())
      .filter(col("l_partkey") < 32 && col("l_suppkey") < 4)
    assert(withPid.count() > 0, "rectangle must be non-empty")
    val touched = withPid.select("_pid").distinct().count()
    assert(touched <= 3, s"rectangle touched $touched of 8 partitions")
  }

  test("zo01 buckets respect the provable box bound") {
    val rows = Layout.zo01.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(6)), "a z-prefix bucket broke its 1024 box")
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.lineitem(spark, sfDir).count())
  }
}
