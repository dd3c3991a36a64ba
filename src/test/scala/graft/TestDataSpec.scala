package graft

import org.apache.spark.sql.types._

/** Corpus-schema guard: pins the Spark-visible dtype of every column of
  * every driver-generated table (TESTDATA.md is the ground truth). When
  * the driver regenerates the corpus with a different physical encoding
  * (the round-7 events.ts TIMESTAMP(NANOS) → TIMESTAMP(MICROS) drift that
  * silently crashed 16 queries), THIS test goes red and names the drifted
  * column — one loud failure instead of 17 downstream analysis exceptions.
  */
class TestDataSpec extends SparkTestBase {

  // timestamp[us] without isAdjustedToUTC loads as TIMESTAMP_NTZ or
  // TIMESTAMP depending on spark.sql.parquet.inferTimestampNTZ; both are
  // handled by every consumer (UTC session makes them value-identical),
  // so the guard accepts either — what it must catch is a LONG/NANOS or
  // string regression.
  private def isTs(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private val expected: Map[String, Seq[(String, DataType => Boolean)]] = {
    def is(d: DataType): DataType => Boolean = _ == d
    Map(
      "region" -> Seq("r_regionkey" -> is(IntegerType), "r_name" -> is(StringType)),
      "nation" -> Seq("n_nationkey" -> is(IntegerType), "n_name" -> is(StringType),
        "n_regionkey" -> is(IntegerType)),
      "customer" -> Seq("c_custkey" -> is(LongType), "c_name" -> is(StringType),
        "c_nationkey" -> is(IntegerType), "c_acctbal" -> is(DoubleType),
        "c_mktsegment" -> is(StringType)),
      "supplier" -> Seq("s_suppkey" -> is(LongType), "s_name" -> is(StringType),
        "s_nationkey" -> is(IntegerType), "s_acctbal" -> is(DoubleType)),
      "part" -> Seq("p_partkey" -> is(LongType), "p_name" -> is(StringType),
        "p_brand" -> is(StringType), "p_type" -> is(StringType),
        "p_size" -> is(IntegerType), "p_retailprice" -> is(DoubleType)),
      "orders" -> Seq("o_orderkey" -> is(LongType), "o_custkey" -> is(LongType),
        "o_orderstatus" -> is(StringType), "o_totalprice" -> is(DoubleType),
        "o_orderdate" -> isTs _, "o_orderpriority" -> is(StringType)),
      "lineitem" -> Seq("l_orderkey" -> is(LongType), "l_partkey" -> is(LongType),
        "l_suppkey" -> is(LongType), "l_linenumber" -> is(IntegerType),
        "l_quantity" -> is(DoubleType), "l_extendedprice" -> is(DoubleType),
        "l_discount" -> is(DoubleType), "l_tax" -> is(DoubleType),
        "l_returnflag" -> is(StringType), "l_linestatus" -> is(StringType),
        "l_shipdate" -> isTs _),
      "events" -> Seq("event_id" -> is(LongType), "ts" -> isTs _,
        "user_id" -> is(LongType), "event_type" -> is(StringType),
        "value" -> is(DoubleType), "props" -> is(StringType)),
      "documents" -> Seq("doc_id" -> is(LongType), "text" -> is(StringType),
        "lang" -> is(StringType), "source" -> is(StringType),
        "n_chars" -> is(LongType)),
      "embeddings" -> Seq("vec_id" -> is(LongType),
        "embedding" -> is(ArrayType(FloatType, containsNull = true)),
        "label" -> is(IntegerType))
    )
  }

  test("every table matches the TESTDATA.md column inventory, in order") {
    Tables.all.foreach { t =>
      val exp = expected(t)
      val got = Tables(spark, sfDir, t).schema
        .map(f => f.name -> f.dataType)
      assert(got.map(_._1) == exp.map(_._1),
        s"$t column names drifted: got ${got.map(_._1)}")
      got.zip(exp).foreach { case ((name, dt), (_, ok)) =>
        assert(ok(dt), s"$t.$name dtype drifted: got $dt")
      }
    }
  }

  test("documents.text is pure ASCII (mm01's byte-decode oracle assumes it)") {
    // mm01's DuckDB oracle replays the byte-bucket decode from ASCII char
    // codes and equates length(text) with the byte count — valid only
    // while every char is single-byte. A multibyte corpus must fail HERE,
    // not as an opaque mm01 hash mismatch far from the cause.
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, sfDir)
      .where(not(col("text").rlike("^[\\x00-\\x7F]*$")) ||
        octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0L, s"$nonAscii documents contain non-ASCII text")
  }

  test("documents tokens stay under 10 bytes (d03/d04's XXH64 oracle unrolls <32)") {
    // The DuckDB XXH64 replay (graft.functions.DuckXxhash) unrolls only
    // the sub-32-byte path: tokens (d04) and word 3-grams (d03, worst
    // case 3·maxTok+2 bytes) must stay below 32 bytes or the oracle
    // emits NULL hashes. A corpus with longer words must fail HERE, not
    // as an opaque d03/d04 hash mismatch. Whitespace beyond plain
    // spaces would also break the split parity — pinned together.
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val longTok = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .where(length(col("tok")) > 9).count()
    assert(longTok == 0L, s"$longTok tokens exceed 9 bytes (3-gram could reach 32)")
    val oddWs = docs.where(col("text").rlike("[\\t\\n\\r]|^ | $|  ")).count()
    assert(oddWs == 0L, s"$oddWs documents have tabs/newlines/edge/double spaces")
  }

  test("l_quantity is integral (r01/r02's CAST-sum oracles rest on exact double sums)") {
    // r01/r02 compare CAST(sum(l_quantity) AS DOUBLE) against Spark's
    // double sum; double summation is order-dependent, so bit-equality
    // holds only while every l_quantity is integral (< 2^53 — exact in
    // any summation order). A regenerated corpus with fractional
    // quantities must fail HERE, not as a flaky r01/r02 hash mismatch.
    import org.apache.spark.sql.functions._
    val nonIntegral = Tables.lineitem(spark, sfDir)
      .where(col("l_quantity") =!= floor(col("l_quantity"))).count()
    assert(nonIntegral == 0L, s"$nonIntegral lineitem rows have fractional l_quantity")
  }

  test("embeddings are exactly 64-dim (d13's oracle hardcodes range(1,65))") {
    import org.apache.spark.sql.functions._
    val offDim = Tables.embeddings(spark, sfDir)
      .where(size(col("embedding")) =!= 64).count()
    assert(offDim == 0L, s"$offDim vectors are not 64-dim")
  }

  test("events reader normalizes ts to TimestampType on the current corpus") {
    val dt = Tables.events(spark, sfDir).schema("ts").dataType
    assert(dt == TimestampType, s"Tables.events ts is $dt")
    // and it actually evaluates (the round-7 regression failed at analysis)
    assert(Tables.events(spark, sfDir).selectExpr("max(ts)").head.get(0) != null)
  }
}
