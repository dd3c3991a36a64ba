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

  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Long, checksum: Long)

  /** STUB: stands in for a pixel resampler — keeps every `factor`-th
    * byte. Real decode/resample plugs in here unchanged. */
  def resizeStub(frame: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((frame.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = frame(i * factor); i += 1 }
    out
  }

  /** Frame-sampling + resize plumbing (the video path of the multimodal
    * surface): the payload is treated as a sequence of fixed-size frames;
    * every `stride`-th frame is sliced out with codegen'd binary
    * `substring` over a posexploded frame-offset sequence — the row
    * explosion is all column expressions, so Catalyst sees and optimizes
    * it — and only the per-frame byte work (the resize stub) runs batched
    * in mapPartitions. Frames shorter than `frameBytes` (payload tail)
    * are dropped, as a real fixed-frame decoder would. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, stride: Int,
                   resizeFactor: Int): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    val nFrames = (col("n_bytes") / frameBytes).cast("int")
    val sampled = media.toDF()
      .filter(nFrames > 0)
      .select(col("doc_id"),
        posexplode(sequence(lit(0), nFrames - 1, lit(stride))).as(Seq("_p", "frame_idx")))
      .select(col("doc_id"), col("frame_idx"))
    val frames = media.toDF().select(col("doc_id"), col("payload"))
      .join(sampled, "doc_id")
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
    frames.as[(Long, Int, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, idx, frame) =>
          val resized = resizeStub(frame, resizeFactor)
          var ck = 1125899906842597L
          var i = 0
          while (i < resized.length) { ck = ck * 31 + (resized(i) & 0xFF); i += 1 }
          Frame(id, idx, resized.length.toLong, ck)
        }
      }
  }

  /** Frame-sample + resize over the same text-as-bytes payloads: 128-byte
    * frames, every 2nd frame, resized by 2. Rows-only; MultimodalSpec
    * pins frame counts, indexes, sizes and checksum determinism. */
  val mm02 = Q.rowsOnly("mm02_frame_sample") { (s, dir) =>
    implicit val enc = Encoders.product[MediaRecord]
    val media = Tables.documents(s, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("video/fake").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
    sampleFrames(media, frameBytes = 128, stride = 2, resizeFactor = 2).toDF()
      .orderBy("doc_id", "frame_idx")
  }

  final case class AudioWindow(doc_id: Long, win_idx: Int, offset: Long,
                               energy: Double, peak: Int)

  /** Audio-path plumbing (the third modality beside mm01's image-style
    * decode and mm02's video frames): OVERLAPPING windows on a hop grid
    * — window w covers bytes [w·hop, w·hop + windowBytes), hop <
    * windowBytes, the STFT-style layout every audio featurizer consumes.
    * The hop grid and the window slices are column expressions
    * (posexplode over a sequence + codegen'd binary substring); only the
    * per-window sample math (RMS energy + peak over centered bytes — the
    * stand-in for a real DSP kernel) runs batched in mapPartitions.
    * Windows quieter than `minEnergy` are dropped AFTER feature
    * extraction with a declarative filter — voice-activity-style
    * trimming the optimizer can see. Partial tail windows are dropped,
    * as a fixed-window featurizer would. */
  def windowAudio(media: Dataset[MediaRecord], windowBytes: Int, hopBytes: Int,
                  minEnergy: Double): Dataset[AudioWindow] = {
    implicit val enc = Encoders.product[AudioWindow]
    val nWins = ((col("n_bytes") - windowBytes) / hopBytes).cast("int") + 1
    val grid = media.toDF()
      .filter(col("n_bytes") >= windowBytes)
      .select(col("doc_id"), posexplode(sequence(lit(0), nWins - 1)).as(Seq("_p", "win_idx")))
      .select(col("doc_id"), col("win_idx"))
    val windows = media.toDF().select(col("doc_id"), col("payload"))
      .join(grid, "doc_id")
      .select(col("doc_id"), col("win_idx"),
        (col("win_idx").cast("long") * hopBytes).as("offset"),
        expr(s"substring(payload, win_idx * $hopBytes + 1, $windowBytes)").as("win"))
    windows.as[(Long, Int, Long, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, idx, off, win) =>
          var sumSq = 0.0
          var peak = 0
          var i = 0
          while (i < win.length) {
            val centered = (win(i) & 0xFF) - 128
            sumSq += centered.toDouble * centered
            if (math.abs(centered) > peak) peak = math.abs(centered)
            i += 1
          }
          AudioWindow(id, idx, off, math.sqrt(sumSq / win.length), peak)
        }
      }
      .filter(col("energy") >= minEnergy)
  }

  /** Overlapping 256-byte windows, 128-byte hop, energy-trimmed. Rows
    * only; MultimodalSpec pins the hop-grid arithmetic, overlap, trim
    * behavior and determinism on planted payloads. */
  val mm03 = Q.rowsOnly("mm03_audio_windows") { (s, dir) =>
    implicit val enc = Encoders.product[MediaRecord]
    val media = Tables.documents(s, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("audio/fake").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
    windowAudio(media, windowBytes = 256, hopBytes = 128, minEnergy = 1.0).toDF()
      .withColumn("energy", round(col("energy"), 6))
      .orderBy("doc_id", "win_idx")
  }

  val all: Seq[Q] = Seq(mm01, mm02, mm03)
}
