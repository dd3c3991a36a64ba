package graft

import org.apache.spark.sql.functions._
import graft.functions.DuckXxhash

/** Pins the driver-side XXH64 fold against Spark's OWN `xxhash64`:
  * five oracles (rd01, q38, q52, kf01, gen01) derive constants or
  * replay chains through [[DuckXxhash.hashLong]], and the
  * per-field-hash-seeds-the-next accumulation contract must match the
  * engine exactly — on random values, not just the corpus. */
class XxhashFoldSpec extends SparkTestBase {

  test("hashLong replicates Spark's multi-argument xxhash64 fold on random longs") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(1234)
    val triples = Seq.fill(500)((rnd.nextLong(), rnd.nextLong(), rnd.nextLong())) ++
      // edge values the random draw may miss
      Seq((0L, 0L, 0L), (Long.MinValue, Long.MaxValue, -1L), (42L, 7L, 1L))
    val rows = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        xxhash64(col("a")).as("h1"),
        xxhash64(col("a"), col("b")).as("h2"),
        xxhash64(col("a"), col("b"), col("c")).as("h3"))
      .collect()
    rows.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val f1 = DuckXxhash.hashLong(a, 42L)
      val f2 = DuckXxhash.hashLong(b, f1)
      val f3 = DuckXxhash.hashLong(c, f2)
      assert(r.getLong(3) == f1, s"1-arg fold diverges at $a")
      assert(r.getLong(4) == f2, s"2-arg fold diverges at ($a, $b)")
      assert(r.getLong(5) == f3, s"3-arg fold diverges at ($a, $b, $c)")
    }
  }

  test("the sampling predicates' mantissa construction matches Spark end-to-end") {
    // u = (xxhash64(seed, key) >>> 11) * 2^-53 recomputed driver-side
    import TestSpark.spark.implicits._
    val keys = Seq.fill(200)(scala.util.Random.nextLong())
    val got = keys.toDF("k")
      .select(col("k"), graft.operators.Sampling.hashU(42L, col("k")).as("u"))
      .collect()
    got.foreach { r =>
      val h = DuckXxhash.hashLong(r.getLong(0), DuckXxhash.hashLong(42L, 42L))
      val want = (h >>> 11).toDouble / 9007199254740992.0
      assert(r.getDouble(1) == want, s"u mismatch at key ${r.getLong(0)}")
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0)
    }
  }
}
