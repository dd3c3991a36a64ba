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

  test("mm02 frame sampling cuts the right frames and resize halves the bytes") {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    // 1000-byte payload, 128-byte frames -> frames 0..6 (tail dropped),
    // stride 2 -> sampled frames 0,2,4,6
    val payload = Array.tabulate(1000)(i => (i % 251).toByte)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, payload, "video/fake", 1000L)),
      StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType),
        StructField("mime", StringType), StructField("n_bytes", LongType))))
    implicit val enc = Encoders.product[Multimodal.MediaRecord]
    val frames = Multimodal.sampleFrames(df.as[Multimodal.MediaRecord],
        frameBytes = 128, stride = 2, resizeFactor = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    assert(frames.forall(_.n_bytes == 64), "resize by 2 must halve the 128-byte frame")
    // deterministic: same payload -> same checksums on a second run
    val again = Multimodal.sampleFrames(df.as[Multimodal.MediaRecord],
        frameBytes = 128, stride = 2, resizeFactor = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    // payload-sensitive: a one-byte change flips at least one checksum
    val mutated = payload.clone(); mutated(0) = (mutated(0) ^ 0x7F).toByte
    val df2 = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, mutated, "video/fake", 1000L)), df.schema)
    val other = Multimodal.sampleFrames(df2.as[Multimodal.MediaRecord],
        frameBytes = 128, stride = 2, resizeFactor = 2)
      .collect().sortBy(_.frame_idx)
    assert(other.map(_.checksum).toSeq != frames.map(_.checksum).toSeq)
  }

  test("mm03 hop grid overlaps correctly and trims silent windows") {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    implicit val enc = Encoders.product[Multimodal.MediaRecord]
    // 1000 loud bytes: windows at hop 128 with width 256 -> floor((1000-256)/128)+1 = 6
    val loud = Array.tabulate(1000)(i => ((i * 37) % 256).toByte)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType),
      StructField("mime", StringType), StructField("n_bytes", LongType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, loud, "audio/fake", 1000L)), schema)
    val wins = Multimodal.windowAudio(df.as[Multimodal.MediaRecord],
        windowBytes = 256, hopBytes = 128, minEnergy = 0.0)
      .collect().sortBy(_.win_idx)
    assert(wins.map(_.win_idx).toSeq == (0 until 6), s"hop grid wrong: ${wins.map(_.win_idx).toSeq}")
    assert(wins.map(_.offset).toSeq == (0 until 6).map(_ * 128L), "offsets must step by hop")
    assert(wins.forall(w => w.energy > 0 && w.peak > 0))

    // an all-128 payload is digital silence (centered samples all zero):
    // every window must be trimmed at any positive threshold
    val silent = Array.fill(1000)(128.toByte)
    val df2 = spark.createDataFrame(
      java.util.Arrays.asList(Row(2L, silent, "audio/fake", 1000L)), schema)
    val trimmed = Multimodal.windowAudio(df2.as[Multimodal.MediaRecord],
        windowBytes = 256, hopBytes = 128, minEnergy = 1.0)
      .collect()
    assert(trimmed.isEmpty, s"silent windows must be trimmed, got ${trimmed.length}")

    // payload shorter than one window yields nothing (no partial windows)
    val short = Array.tabulate(100)(_.toByte)
    val df3 = spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, short, "audio/fake", 100L)), schema)
    assert(Multimodal.windowAudio(df3.as[Multimodal.MediaRecord],
      windowBytes = 256, hopBytes = 128, minEnergy = 0.0).collect().isEmpty)

    // determinism
    val again = Multimodal.windowAudio(df.as[Multimodal.MediaRecord],
        windowBytes = 256, hopBytes = 128, minEnergy = 0.0)
      .collect().sortBy(_.win_idx)
    assert(wins.map(w => (w.energy, w.peak)).toSeq == again.map(w => (w.energy, w.peak)).toSeq)
  }
}
