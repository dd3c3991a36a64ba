package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal column plumbing — SURVEY.md §2.4 mm01.
  *
  * Media assets ride through the engine as opaque `binary` columns with
  * typed metadata beside them; decode / feature-extraction runs batched
  * per partition (mapPartitions) so a real decoder would amortize codec
  * or model initialization once per task, not per row. The container has
  * no image/audio codecs, so [[decodeStub]] is a clearly-marked
  * deterministic fake — the Spark-side schema, batching and partition
  * behavior are real and tested (MultimodalSpec).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, feat_dim: Int, feat_norm: Double)

  /** STUB: stands in for an image/audio decoder + feature extractor.
    * Deterministic byte-bucket averages shaped like an 8-dim embedding. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val dim = 8
    val acc = new Array[Float](dim)
    val cnt = new Array[Int](dim)
    var i = 0
    while (i < payload.length) {
      val b = i % dim
      acc(b) += (payload(i) & 0xFF).toFloat
      cnt(b) += 1
      i += 1
    }
    var j = 0
    while (j < dim) { if (cnt(j) > 0) acc(j) /= cnt(j); j += 1 }
    acc
  }

  /** Batched per-partition feature extraction over binary payloads. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-task init happens here once (decoder/model warm-up in real use)
      rows.map { r =>
        val feats = decodeStub(r.payload)
        val norm = math.sqrt(feats.map(f => f.toDouble * f).sum)
        MediaFeatures(r.doc_id, r.n_bytes, feats.length, norm)
      }
    }
  }

  /** documents.text encoded to UTF-8 bytes plays the role of the media
    * payload; metadata (mime, byte length) rides beside it. */
  val mm01 = Q.rowsOnly("mm01_binary_meta") { (s, dir) =>
    implicit val enc = Encoders.product[MediaRecord]
    val media = Tables.documents(s, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
    extractFeatures(media).toDF()
      .withColumn("feat_norm", round(col("feat_norm"), 6))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(mm01)
}
