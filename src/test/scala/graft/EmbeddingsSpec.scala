package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import graft.operators.Embeddings

class EmbeddingsSpec extends SparkTestBase {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  test("k-means recovers planted orthogonal blobs exactly") {
    val dim = 64
    // 3 near-orthogonal blobs, interleaved ids (i % 3)
    val rows: java.util.List[Row] = new java.util.ArrayList()
    for (i <- 0 until 30) {
      val g = i % 3
      val v = Array.fill(dim)(0.001f * ((i * 7 + 3) % 5))
      v(g * 20) = 1.0f
      rows.add(Row(i.toLong, v.toSeq))
    }
    val df = spark.createDataFrame(rows, embSchema)
    val out = Embeddings.kmeansAssign(df, k = 3, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (i <- 0 until 30)
      assert(out(i) == out(i % 3), s"vec $i must cluster with its blob seed ${i % 3}")
    assert(Set(out(0L), out(1L), out(2L)).size == 3, "blobs must map to distinct clusters")
  }

  test("k-means|| seeding recovers blobs even when all small ids share one blob") {
    val dim = 64
    // ids 0-9 are ALL in blob 0 — first-k init would put every seed in
    // one dense region; k-means|| must still spread seeds across blobs
    val rows: java.util.List[Row] = new java.util.ArrayList()
    for (i <- 0 until 30) {
      val g = i / 10
      val v = Array.fill(dim)(0.001f * ((i * 7 + 3) % 5))
      v(g * 20) = 1.0f
      rows.add(Row(i.toLong, v.toSeq))
    }
    val df = spark.createDataFrame(rows, embSchema)
    val out = Embeddings.kmeansAssign(df, k = 3, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (i <- 0 until 30)
      assert(out(i) == out((i / 10) * 10), s"vec $i must cluster with its blob")
    assert(Set(out(0L), out(10L), out(20L)).size == 3,
      "k-means|| seeds must land in all three blobs")
  }

  test("d08 assigns every embedding, uses multiple clusters, and is deterministic") {
    val run1 = Embeddings.d08.run(spark, sfDir).collect().toSeq
    val run2 = Embeddings.d08.run(spark, sfDir).collect().toSeq
    assert(run1 == run2, "fixed init + fixed iterations must be reproducible")
    assert(run1.size == Tables.embeddings(spark, sfDir).count())
    assert(run1.map(_.getInt(1)).distinct.size >= 2, "clustering must not collapse to one cluster")
  }
}
