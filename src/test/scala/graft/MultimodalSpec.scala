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

  /** WAV bytes written by java.nio — completely independent of
    * Multimodal.wavPayload, so parseWav is proven against a second
    * writer, not just its own column-expression twin. */
  private def buildWav(samples: Array[Short], rate: Int,
                       extraChunks: Seq[(String, Array[Byte])] = Nil,
                       channels: Int = 1, bits: Int = 16,
                       fmtCode: Int = 1): Array[Byte] = {
    import java.io.ByteArrayOutputStream
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int, nBytes: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n)
        .array().take(nBytes)
    val body = new ByteArrayOutputStream()
    body.write("fmt ".getBytes("US-ASCII")); body.write(le(16, 4))
    body.write(le(fmtCode, 2)); body.write(le(channels, 2))
    body.write(le(rate, 4)); body.write(le(rate * channels * bits / 8, 4))
    body.write(le(channels * bits / 8, 2)); body.write(le(bits, 2))
    extraChunks.foreach { case (tag, payload) =>
      body.write(tag.getBytes("US-ASCII")); body.write(le(payload.length, 4))
      body.write(payload)
      if (payload.length % 2 == 1) body.write(0) // RIFF even-byte pad
    }
    body.write("data".getBytes("US-ASCII")); body.write(le(samples.length * 2, 4))
    samples.foreach(s => body.write(le(s & 0xFFFF, 2)))
    val b = body.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le(b.length + 4, 4))
    out.write("WAVE".getBytes("US-ASCII")); out.write(b)
    out.toByteArray
  }

  private def wavDf(payloads: (Long, Array[Byte])*) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(payloads.map { case (id, p) => Row(id, p) }: _*),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
  }

  test("parseWav reads java.nio-written WAVs byte-for-byte (extra chunks, odd sizes, negatives)") {
    // full signed-16 range incl. both extremes and an odd count
    val s1 = Array[Short](0, 1, -1, 32767, -32768, 1234, -4321)
    // an odd-sized LIST chunk between fmt and data exercises the pad rule
    val s2 = Array[Short](100, -200, 300)
    val wav1 = buildWav(s1, rate = 44100)
    val wav2 = buildWav(s2, rate = 16000,
      extraChunks = Seq(("LIST", Array[Byte](73, 78, 70, 79, 1, 2, 3)),
        ("fact", Array[Byte](3, 0, 0, 0))))
    val got = Multimodal.parseWav(wavDf(1L -> wav1, 2L -> wav2), "payload")
      .select("doc_id", "sample_rate", "num_channels", "bits_per_sample",
        "n_samples", "samples")
      .collect().sortBy(_.getLong(0))
    assert(got.length == 2)
    assert(got(0).getInt(1) == 44100 && got(1).getInt(1) == 16000)
    assert(got.forall(r => r.getInt(2) == 1 && r.getInt(3) == 16))
    assert(got(0).getLong(4) == s1.length && got(1).getLong(4) == s2.length)
    assert(got(0).getSeq[Int](5) == s1.map(_.toInt).toSeq,
      s"sample decode wrong: ${got(0).getSeq[Int](5)}")
    assert(got(1).getSeq[Int](5) == s2.map(_.toInt).toSeq,
      "LIST/fact chunk walk or pad-byte handling wrong")
  }

  test("parseWav rejects non-WAV, stereo and non-PCM payloads loudly") {
    val notWav = "definitely not a RIFF container payload".getBytes("UTF-8")
    val e1 = intercept[Exception] {
      Multimodal.parseWav(wavDf(1L -> notWav), "payload").collect()
    }
    assert((e1.toString + Option(e1.getCause).map(_.toString).getOrElse(""))
      .contains("RIFF"), s"wrong error: $e1")
    val stereo = buildWav(Array[Short](1, 2, 3, 4), rate = 8000, channels = 2)
    intercept[Exception] {
      Multimodal.parseWav(wavDf(1L -> stereo), "payload").collect()
    }
    val float32 = buildWav(Array[Short](1, 2), rate = 8000, fmtCode = 3)
    intercept[Exception] {
      Multimodal.parseWav(wavDf(1L -> float32), "payload").collect()
    }
  }

  test("parseWav and parseBmp reject TRUNCATED payloads loudly (header-declared extent past the bytes)") {
    // a valid WAV with its last 4 sample bytes cut off: every magic and
    // fmt assert still passes, but the declared data chunk no longer
    // fits — the new truncation assert must fire, not a silent NULL
    // samples column
    val wav = buildWav(Array[Short](10, -20, 30, -40, 50), rate = 8000)
    val cut = wav.take(wav.length - 4)
    val e1 = intercept[Exception] {
      Multimodal.parseWav(wavDf(1L -> cut), "payload").collect()
    }
    assert((e1.toString + Option(e1.getCause).map(_.toString).getOrElse(""))
      .contains("truncated"), s"wrong error: $e1")
    // same for BMP: header says 4x4 pixels, payload ends mid-block
    val px = Array.tabulate(16)(i => i * 0x010203)
    val bmp = buildBmp(4, 4, px)
    val cutBmp = bmp.take(bmp.length - 6)
    val e2 = intercept[Exception] {
      Multimodal.parseBmp(wavDf(1L -> cutBmp), "payload").collect()
    }
    assert((e2.toString + Option(e2.getCause).map(_.toString).getOrElse(""))
      .contains("truncated"), s"wrong error: $e2")
    // untouched payloads still parse
    assert(Multimodal.parseWav(wavDf(1L -> wav), "payload").count() == 1)
    assert(Multimodal.parseBmp(wavDf(1L -> bmp), "payload").count() == 1)
  }

  test("wavPayload -> parseWav round trip recovers the closed-form sample law") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ids = spark.createDataFrame(
      java.util.Arrays.asList((0L until 6L).map(Row(_)): _*),
      StructType(Seq(StructField("doc_id", LongType))))
    val n = lit(5L) + col("doc_id") % 3 // 5..7 samples
    val rate = lit(8000L) + (col("doc_id") % 4) * 4000L
    val media = ids.select(col("doc_id"),
      Multimodal.wavPayload(n, rate,
        k => (col("doc_id") * 31L + k * 7L) % 2048L - 1024L).as("payload"))
    val got = Multimodal.parseWav(media, "payload")
      .select("doc_id", "sample_rate", "n_samples", "samples")
      .collect().sortBy(_.getLong(0))
    assert(got.length == 6)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8000 + (id % 4) * 4000)
      val nn = 5 + (id % 3)
      assert(r.getLong(2) == nn)
      val want = (0L until nn).map(k => ((id * 31 + k * 7) % 2048 - 1024).toInt)
      assert(r.getSeq[Int](3) == want, s"doc $id samples: ${r.getSeq[Int](3)} != $want")
    }
  }

  /** BMP bytes written by java.nio — independent of
    * Multimodal.bmpPayload, so parseBmp is proven against a second
    * writer. Pixels given TOP-DOWN as packed r<<16|g<<8|b; the writer
    * flips to the file's bottom-up padded BGR rows. */
  private def buildBmp(width: Int, height: Int, pixels: Array[Int],
                       bpp: Int = 24, planes: Int = 1,
                       compression: Int = 0): Array[Byte] = {
    import java.io.ByteArrayOutputStream
    import java.nio.{ByteBuffer, ByteOrder}
    require(pixels.length == width * height)
    def le(n: Int, nBytes: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n)
        .array().take(nBytes)
    val rowSize = ((3 * width + 3) / 4) * 4
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le(54 + rowSize * height, 4))
    out.write(le(0, 4)); out.write(le(54, 4))
    out.write(le(40, 4)); out.write(le(width, 4)); out.write(le(height, 4))
    out.write(le(planes, 2)); out.write(le(bpp, 2)); out.write(le(compression, 4))
    out.write(le(rowSize * height, 4))
    out.write(le(2835, 4)); out.write(le(2835, 4))
    out.write(le(0, 4)); out.write(le(0, 4))
    for (j <- 0 until height) {
      val y = height - 1 - j
      for (x <- 0 until width) {
        val v = pixels(y * width + x)
        out.write(v & 0xFF); out.write((v >> 8) & 0xFF); out.write((v >> 16) & 0xFF)
      }
      for (_ <- 0 until rowSize - 3 * width) out.write(0)
    }
    out.toByteArray
  }

  test("parseBmp reads java.nio-written BMPs byte-for-byte (padding widths 0..3, flip)") {
    // widths 5,6,7,8 exercise every row-padding amount (1,2,3,0 bytes);
    // a position-dependent pixel law catches any flip/transpose error
    val cases = Seq(5, 6, 7, 8).map { w =>
      val h = 3
      val px = Array.tabulate(w * h) { i =>
        val (x, y) = (i % w, i / w)
        ((x * 30 + 7) << 16) | ((y * 80 + 3) << 8) | ((x + y * w) % 256)
      }
      (w.toLong, w, h, px)
    }
    val got = Multimodal.parseBmp(
      wavDf(cases.map { case (id, w, h, px) => id -> buildBmp(w, h, px) }: _*),
      "payload")
      .select("doc_id", "width", "height", "bits_per_pixel", "pixels")
      .collect().sortBy(_.getLong(0))
    got.zip(cases).foreach { case (r, (_, w, h, px)) =>
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == 24)
      assert(r.getSeq[Int](4) == px.toSeq,
        s"width-$w pixel decode wrong (padding=${(4 - 3 * w % 4) % 4} bytes)")
    }
  }

  test("parseBmp rejects non-BMP, 32bpp and compressed payloads loudly") {
    val notBmp = "certainly not a bitmap".getBytes("UTF-8")
    val e1 = intercept[Exception] {
      Multimodal.parseBmp(wavDf(1L -> notBmp), "payload").collect()
    }
    assert((e1.toString + Option(e1.getCause).map(_.toString).getOrElse(""))
      .contains("BMP"), s"wrong error: $e1")
    val px = Array.fill(4)(0x112233)
    intercept[Exception] {
      Multimodal.parseBmp(wavDf(1L -> buildBmp(2, 2, px, bpp = 32)), "payload")
        .collect()
    }
    intercept[Exception] {
      Multimodal.parseBmp(wavDf(1L -> buildBmp(2, 2, px, compression = 1)), "payload")
        .collect()
    }
  }

  test("bmpPayload -> parseBmp round trip recovers the closed-form pixel law") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ids = spark.createDataFrame(
      java.util.Arrays.asList((0L until 9L).map(Row(_)): _*),
      StructType(Seq(StructField("doc_id", LongType))))
    val w = lit(8L) + col("doc_id") % 9
    val h = lit(6L) + col("doc_id") % 5
    def law(ch: Int)(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      (col("doc_id") * 7L + y * 31L + x * 13L + ch * 5L) % 256L
    val media = ids.select(col("doc_id"),
      Multimodal.bmpPayload(w, h,
        (x, y) => (law(0)(x, y), law(1)(x, y), law(2)(x, y))).as("payload"))
    val got = Multimodal.parseBmp(media, "payload")
      .select("doc_id", "width", "height", "pixels")
      .collect().sortBy(_.getLong(0))
    assert(got.length == 9)
    got.foreach { r =>
      val id = r.getLong(0)
      val (ww, hh) = ((8 + id % 9).toInt, (6 + id % 5).toInt)
      assert(r.getInt(1) == ww && r.getInt(2) == hh)
      val want = for (y <- 0 until hh; x <- 0 until ww) yield {
        def c(ch: Int) = ((id * 7 + y * 31 + x * 13 + ch * 5) % 256).toInt
        (c(0) << 16) | (c(1) << 8) | c(2)
      }
      assert(r.getSeq[Int](3) == want, s"doc $id (${ww}x$hh) pixels differ")
    }
  }

  test("mm05 runs end-to-end on the corpus with exact channel-sum bounds") {
    val got = Multimodal.mm05.run(spark, sfDir).cache()
    assert(got.count() > 0)
    assert(got.columns.toSeq == Seq("doc_id", "width", "height",
      "sum_r", "sum_g", "sum_b", "peak_luma"))
    // every channel sum is bounded by 255 * n_pixels; peak luma by the
    // integer weights' full-white value
    assert(got.filter(col("sum_r") > col("width") * col("height") * 255L ||
      col("sum_g") > col("width") * col("height") * 255L ||
      col("sum_b") > col("width") * col("height") * 255L).count() == 0)
    assert(got.filter(col("peak_luma") > 255L * 1000L).count() == 0)
  }

  /** Y4M bytes written by java.nio — independent of
    * Multimodal.y4mPayload. Luma given per frame top-down row-major;
    * chroma planes constant-filled. */
  private def buildY4m(width: Int, height: Int, lumas: Seq[Array[Byte]],
                       uv: Byte = 64, header: String = null): Array[Byte] = {
    import java.io.ByteArrayOutputStream
    val out = new ByteArrayOutputStream()
    val hdr = Option(header).getOrElse(
      s"YUV4MPEG2 W$width H$height F30:1 Ip A1:1 C420jpeg\n")
    out.write(hdr.getBytes("US-ASCII"))
    lumas.foreach { y =>
      require(y.length == width * height)
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(y)
      for (_ <- 0 until width * height / 2) out.write(uv)
    }
    out.toByteArray
  }

  test("parseY4m + frameLumaStats read java.nio-written streams (header variants, stride)") {
    val (w, h) = (6, 4)
    val lumas = (0 until 5).map(f =>
      Array.tabulate(w * h)(i => ((f * 50 + i * 3) % 256).toByte))
    // C420jpeg tag + a different fps; stride 2 samples frames 0,2,4
    val y4m = buildY4m(w, h, lumas)
    val parsed = Multimodal.parseY4m(wavDf(1L -> y4m), "payload")
    val head = parsed.select("width", "height", "fps_num", "fps_den", "n_frames")
      .head
    assert((head.getInt(0), head.getInt(1), head.getInt(2), head.getInt(3),
      head.getLong(4)) == ((w, h, 30, 1, 5L)))
    val stats = Multimodal.frameLumaStats(parsed, "payload", stride = 2)
      .select("frame_idx", "y_sum", "y_max")
      .collect().sortBy(_.getInt(0))
    assert(stats.map(_.getInt(0)).toSeq == Seq(0, 2, 4))
    stats.foreach { r =>
      val f = r.getInt(0)
      val vals = lumas(f).map(_ & 0xFF)
      assert(r.getLong(1) == vals.map(_.toLong).sum, s"frame $f sum")
      assert(r.getLong(2) == vals.max.toLong, s"frame $f max")
    }
  }

  test("parseY4m rejects bad magic, odd dims, C444 and truncated frames loudly") {
    val ok = buildY4m(4, 4, Seq(Array.fill(16)(1.toByte)))
    val e1 = intercept[Exception] {
      Multimodal.parseY4m(wavDf(1L -> "MPEG4 something".getBytes("UTF-8")),
        "payload").collect()
    }
    assert((e1.toString + Option(e1.getCause).map(_.toString).getOrElse(""))
      .contains("YUV4MPEG2"), s"wrong error: $e1")
    intercept[Exception] { // odd width advertised in the header
      Multimodal.parseY4m(wavDf(1L -> buildY4m(4, 4,
        Seq(Array.fill(16)(1.toByte)),
        header = "YUV4MPEG2 W5 H4 F30:1\n")), "payload").collect()
    }
    intercept[Exception] { // 4:4:4 colorspace
      Multimodal.parseY4m(wavDf(1L -> buildY4m(4, 4,
        Seq(Array.fill(16)(1.toByte)),
        header = "YUV4MPEG2 W4 H4 F30:1 C444\n")), "payload").collect()
    }
    intercept[Exception] { // truncated frame section
      Multimodal.parseY4m(wavDf(1L -> ok.dropRight(3)), "payload").collect()
    }
    intercept[Exception] { // corrupted FRAME marker
      val bad = ok.clone()
      val hdrLen = ok.indexOf('\n'.toByte) + 1
      bad(hdrLen) = 'X'.toByte
      Multimodal.frameLumaStats(
        Multimodal.parseY4m(wavDf(1L -> bad), "payload"), "payload", 1).collect()
    }
  }

  test("y4mPayload -> parseY4m round trip recovers the closed-form luma law") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ids = spark.createDataFrame(
      java.util.Arrays.asList((0L until 12L).map(Row(_)): _*),
      StructType(Seq(StructField("doc_id", LongType))))
    val w = lit(4L) + (col("doc_id") % 3) * 2L
    val h = lit(4L) + (col("doc_id") % 2) * 2L
    val nf = lit(3L) + col("doc_id") % 4
    val media = ids.select(col("doc_id"),
      Multimodal.y4mPayload(w, h, nf,
        (f, x, yy) => (col("doc_id") * 11L + f * 17L + yy * 5L + x * 3L) % 256L,
        f => (col("doc_id") + f * 7L) % 256L).as("payload"))
    val got = Multimodal.frameLumaStats(
      Multimodal.parseY4m(media, "payload"), "payload", stride = 2)
      .select("doc_id", "width", "height", "n_frames", "frame_idx", "y_sum", "y_max")
      .collect().sortBy(r => (r.getLong(0), r.getInt(4)))
    got.foreach { r =>
      val id = r.getLong(0)
      val (ww, hh, nn) = ((4 + (id % 3) * 2).toInt, (4 + (id % 2) * 2).toInt,
        3 + id % 4)
      assert(r.getInt(1) == ww && r.getInt(2) == hh && r.getLong(3) == nn)
      val f = r.getInt(4)
      val vals = for (yy <- 0 until hh; x <- 0 until ww)
        yield (id * 11 + f * 17 + yy * 5 + x * 3) % 256
      assert(r.getLong(5) == vals.sum, s"doc $id frame $f sum")
      assert(r.getLong(6) == vals.max, s"doc $id frame $f max")
    }
    // frame grid: every even index below n_frames, per doc
    val byDoc = got.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rs) =>
      assert(rs.map(_.getInt(4)).toSeq.sorted ==
        (0L until (3 + id % 4) by 2).map(_.toInt))
    }
  }

  test("mm04 runs end-to-end on the corpus with positive window counts") {
    val got = Multimodal.mm04.run(spark, sfDir).cache()
    assert(got.count() > 0)
    assert(got.columns.toSeq ==
      Seq("doc_id", "sample_rate", "n_samples", "win_idx", "rms", "peak"))
    assert(got.filter(col("peak") < 0 || col("peak") > 1024).count() == 0)
    assert(got.filter(col("rms") < 0 || col("rms") > 1024).count() == 0)
    assert(got.filter(col("n_samples") < 160).count() == 0,
      "windows require at least one full 160-sample span")
  }
}
