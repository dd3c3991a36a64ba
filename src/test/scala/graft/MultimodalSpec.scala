package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("mm01 carries binary payloads through batched partition-wise extraction") {
    val got = Multimodal.mm01.run(spark, sfDir).cache()
    val n = Tables.documents(spark, sfDir).count()
    assert(got.count() == n)
    assert(got.columns.toSeq == Seq("doc_id", "n_bytes", "feat_dim", "feat_norm"))
    assert(got.filter(col("feat_dim") =!= 8).count() == 0)
    assert(got.filter(col("feat_norm") <= 0).count() == 0)
    assert(got.filter(col("n_bytes") <= 0).count() == 0)
  }

  test("decode stub is deterministic and payload-sensitive") {
    val a = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val b = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val c = Multimodal.decodeStub("different bytes".getBytes("UTF-8"))
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
  }

  test("extraction preserves partitioning (no implicit shuffle)") {
    val docs = Tables.documents(spark, sfDir).repartition(7)
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[Multimodal.MediaRecord]
    val media = docs.select(
      col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[Multimodal.MediaRecord]
    assert(Multimodal.extractFeatures(media).rdd.getNumPartitions == 7)
  }
}
