package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * runs per-partition in batches.
  *
  * The image path uses a REAL codec (`javax.imageio` PNG): payload
  * bytes are the pixels of an 8-bit grayscale PNG, and feature
  * extraction decodes that PNG back to pixels before computing the
  * histogram — so the oracle replaying the histogram over the source
  * bytes proves decode(encode(b)) == b through a genuine compressed
  * image format. Undecodable payloads flow to a reject channel
  * (`decode_error`), never throw.
  *
  * Scale notes: mapPartitions is the right boundary for codec work —
  * per-partition batching amortizes decoder init (model load, JNI
  * handles, ImageIO cache config), exactly like mapInPandas batches in
  * PySpark. Binary payloads stay columnar (parquet binary) at rest;
  * repartition by size class before decode when payload sizes are
  * skewed.
  */
object Multimodal {

  /** Payload row contract: id + raw bytes + media metadata. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Build a payload table from the documents table (text bytes stand in
    * for an image payload; real pipelines read binary parquet columns). */
  def payloadsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("image/fake").as("media_type"),
      col("text").cast(BinaryType).as("payload"))

  /** 8-bin intensity histogram normalized by length. Counts and the
    * final division are exact in double, which is what lets mm02's
    * oracle replay the histogram in SQL. */
  private def histogram8(bytes: Array[Byte]): Array[Double] = {
    val counts = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) >>> 5) += 1L
      i += 1
    }
    val hist = new Array[Double](8)
    if (bytes.length > 0) {
      var j = 0
      while (j < 8) { hist(j) = counts(j).toDouble / bytes.length; j += 1 }
    }
    hist
  }

  /** Per-partition batched decode over RAW byte payloads: the
    * multimodal execution shape with an identity "codec". One decoder
    * context per partition (the `iter =>` scope), rows streamed
    * through it. For the real-codec path see extractImageFeatures. */
  def extractFeatures(payloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    payloads.select("doc_id", "payload").mapPartitions { iter =>
      // decoder init would happen here, once per partition
      iter.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        Row(r.getAs[Long]("doc_id"), bytes.length,
          histogram8(bytes).toIndexedSeq)
      }
    }(enc)
  }

  // ---------------------------------------------------------------
  // Real image codec path (javax.imageio PNG)
  // ---------------------------------------------------------------

  /** Partition-scoped PNG codec: ONE reader, ONE writer, ONE reusable
    * input stream and ONE reusable output buffer, shared across every
    * frame the partition processes — the codec-init-amortization the
    * mapPartitions boundary exists for, actually enforced.
    *
    * Why this matters (all measured, 20k tiny-PNG decodes/thread):
    * `ImageIO.read`/`write` per frame walk the synchronized
    * `IIORegistry`, re-sniff the format, and allocate a FINALIZABLE
    * cache stream per call; single-threaded that costs ~30 µs/frame,
    * but at local[32] the registry lock and the single finalizer
    * thread CONVOY — 0.75 s at 1 thread became 49–65 s at 32 threads
    * (worse than serial!). Per-thread reader + reusable byte-array
    * streams restore linear scaling (0.65 s → 0.95 s at 32×20k).
    * Reader/Writer instances are single-threaded by contract;
    * partition scope is exactly that. On a per-frame failure the
    * instances are `reset()` before reuse. */
  private final class PngCodec {
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams only
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    private lazy val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private val iis = new ByteArrayImageInputStream
    private lazy val ios = new ByteArrayImageOutputStream

    /** Decode one PNG. Throws on corrupt input (callers map to their
      * reject channel via [[resetAfterError]]). */
    def read(png: Array[Byte]): java.awt.image.BufferedImage = {
      iis.setBytes(png)
      reader.setInput(iis, true, true)
      reader.read(0)
    }

    /** Encode one image to PNG bytes. */
    def write(img: java.awt.image.BufferedImage): Array[Byte] = {
      ios.resetBuffer()
      writer.setOutput(ios)
      writer.write(img)
      ios.toByteArray
    }

    def resetAfterError(): Unit = { reader.reset(); writer.reset() }
  }

  private def grayImage(bytes: Array[Byte], width: Int): java.awt.image.BufferedImage = {
    val h = math.max(1, (bytes.length + width - 1) / width)
    val img = new java.awt.image.BufferedImage(
      width, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < bytes.length) {
      raster.setSample(i % width, i / width, 0, bytes(i) & 0xff)
      i += 1
    }
    img
  }

  /** Deterministic PNG encode: `bytes` become the row-major pixels of
    * an 8-bit grayscale image, width 16, last row zero-padded. The
    * true byte count travels as metadata (n_bytes) so decode can drop
    * the padding. A real PNG — CRC-checked chunks, zlib-compressed
    * scanlines — not a byte-copy. One-shot convenience (tests); the
    * partition loops reuse a [[PngCodec]]. */
  def encodePng(bytes: Array[Byte], width: Int = 16): Array[Byte] =
    new PngCodec().write(grayImage(bytes, width))

  /** Decode a PNG payload back to its leading `nBytes` pixel bytes
    * (row-major), or an error message for corrupt/non-image payloads. */
  private def decodePng(codec: PngCodec, png: Array[Byte],
                        nBytes: Int): Either[String, Array[Byte]] =
    try {
      val img = codec.read(png)
      val w = img.getWidth
      val avail = w * img.getHeight
      if (nBytes > avail) Left(s"metadata n_bytes=$nBytes exceeds $avail pixels")
      else {
        val raster = img.getRaster
        val out = new Array[Byte](nBytes)
        var i = 0
        while (i < nBytes) {
          out(i) = raster.getSample(i % w, i / w, 0).toByte
          i += 1
        }
        Right(out)
      }
    } catch { case e: Exception =>
      codec.resetAfterError()
      Left(s"decode failed: ${e.getMessage}")
    }

  /** Codec-stage parallelism: Spark sizes file splits by COMPRESSED
    * bytes (`spark.sql.files.maxPartitionBytes`), so a small or
    * heavily-compressed source collapses to a handful of partitions —
    * and a codec pass whose cost is per-PIXEL, not per-byte, then runs
    * nearly single-threaded (measured on mm04: the 594 KB sf0.1
    * documents file is ONE split, so ~185k PNG encode+decodes ran on
    * one of 32 cores — 97% idle, 12–30 s; hash-spread, sub-second
    * codec stages). Every codec entry point therefore hash-spreads its
    * input across the session's shuffle parallelism before the
    * `mapPartitions` boundary; the downstream decode/extract stages
    * are narrow and inherit it. The shuffled bytes are the compressed
    * payloads themselves — negligible next to decode cost, and at
    * petabyte scale the same spread rebalances per-row compute skew
    * (one pathological payload can't serialize a whole split).
    *
    * The partition count is EXPLICIT (session shuffle parallelism),
    * not left to the planner: AQE's byte-based coalescing would fold a
    * kilobyte-sized shuffle right back to one partition (measured:
    * `repartition(col)` without a count left every codec stage at
    * tasks=1 under AQE — bytes are exactly the wrong cost model for a
    * per-pixel stage, which is the same blindness that created the
    * single-split problem upstream). */
  private def spreadForCodec(df: DataFrame, keyCol: String): DataFrame = {
    val n = try df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
            catch { case _: NumberFormatException => 200 } // "auto" etc.
    df.repartition(n, col(keyCol))
  }

  /** Payload table with REAL PNG payloads built from document text
    * bytes (stands in for reading a binary image column off parquet). */
  def payloadsPng(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
    spreadForCodec(
        docs.select(col("doc_id"), col("text").cast(BinaryType).as("raw")),
        "doc_id")
      .mapPartitions { iter =>
        val codec = new PngCodec // encoder init, once per partition
        iter.map { r =>
          val bytes = r.getAs[Array[Byte]]("raw")
          Row(r.getAs[Long]("doc_id"), "image/png", bytes.length,
            codec.write(grayImage(bytes, 16)))
        }
      }(enc)
  }

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("decode_error", StringType, nullable = true)))

  /** Partition-batched REAL decode + feature extraction: ImageIO PNG
    * decode, then the 8-bin intensity histogram over the recovered
    * pixels. Corrupt payloads yield (features=null, decode_error=msg)
    * — a reject channel, never a task failure. ImageIO's disk cache is
    * disabled once per partition (codec init), keeping decode fully
    * in-memory on executors. */
  def extractImageFeatures(payloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    payloads.select("doc_id", "n_bytes", "payload").mapPartitions { iter =>
      val codec = new PngCodec // decoder init, once per partition
      iter.map { r =>
        val docId = r.getAs[Long]("doc_id")
        val n = r.getAs[Int]("n_bytes")
        decodePng(codec, r.getAs[Array[Byte]]("payload"), n) match {
          case Right(pixels) => Row(docId, n, histogram8(pixels).toIndexedSeq, null)
          case Left(err)     => Row(docId, n, null, err)
        }
      }
    }(enc)
  }

  /** Payload metadata pass (no decode): pure column expressions. */
  def payloadMeta(payloads: DataFrame): DataFrame =
    payloads.select(col("doc_id"), col("media_type"),
      length(col("payload")).as("n_bytes"))

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("out_w", IntegerType, nullable = true),
    StructField("out_h", IntegerType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("resize_error", StringType, nullable = true)))

  /** Real decode → scale → re-encode for one PNG payload: ImageIO
    * decode, `java.awt.Graphics2D` bilinear scaled redraw to `outW`
    * wide (height follows the aspect ratio, ceil so no row of source
    * pixels maps below one output row), PNG re-encode. */
  private def resizePng(codec: PngCodec,
                        png: Array[Byte], outW: Int): Either[String, (Int, Int, Array[Byte])] =
    try {
      val img = codec.read(png)
      val outH = math.max(1,
        math.ceil(img.getHeight.toDouble * outW / img.getWidth).toInt)
      val dst = new java.awt.image.BufferedImage(
        outW, outH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, outW, outH, null)
      g.dispose()
      Right((outW, outH, codec.write(dst)))
    } catch { case e: Exception =>
      codec.resetAfterError()
      Left(s"resize failed: ${e.getMessage}")
    }

  /** REAL image resize over PNG payloads (no more byte-cap stand-in):
    * per-partition batched decode → Graphics2D bilinear redraw at
    * `outWidth` (aspect-preserving height) → PNG re-encode. Corrupt or
    * non-image payloads land in the `resize_error` reject channel,
    * never fail the task — same contract as [[extractImageFeatures]].
    * Output dims are closed-form from input dims (out_h =
    * ceil(h·outWidth/w)), which is what lets the mm04 oracle verify
    * the resized geometry over every row cross-engine. */
  def resizeImages(payloads: DataFrame, outWidth: Int): DataFrame = {
    require(outWidth > 0)
    val enc = org.apache.spark.sql.Encoders.row(resizedSchema)
    payloads.select("doc_id", "payload").mapPartitions { iter =>
      val codec = new PngCodec // codec init, once per partition
      iter.map { r =>
        val docId = r.getAs[Long]("doc_id")
        resizePng(codec, r.getAs[Array[Byte]]("payload"), outWidth) match {
          case Right((w, h, png)) => Row(docId, w, h, png, null)
          case Left(err)          => Row(docId, null, null, null, err)
        }
      }
    }(enc)
  }

  /** Read (out_w, out_h) back OUT of PNG payloads by a REAL second
    * decode (partition-scoped reader) — the mm05 verification path:
    * dims come from the re-encoded bytes, not the resize operator's
    * own metadata. Throws on undecodable payloads (this runs on the
    * operator's accepted channel, where a decode failure is a bug,
    * not data). */
  def decodedDims(payloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("out_w", LongType, nullable = false),
      StructField("out_h", LongType, nullable = false))))
    payloads.select("doc_id", "payload").mapPartitions { iter =>
      val codec = new PngCodec
      iter.map { r =>
        val img = codec.read(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), img.getWidth.toLong, img.getHeight.toLong)
      }
    }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** UNIFORM (strided) frame sampling for video-shaped payloads: every
    * `stride`-th fixed-size chunk becomes a frame row (doc_id,
    * frame_idx, bytes) — the "1 fps thumbnail" path that needs no
    * decode at all. For CONTENT-AWARE selection (scene changes) see
    * [[selectKeyframes]], which decodes real PNG frames and picks by
    * inter-frame histogram delta. Frames fan out BEFORE feature
    * extraction so downstream operators parallelize per frame, not per
    * video. */
  def sampleFrames(payloads: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    payloads.select("doc_id", "payload").mapPartitions { iter =>
      iter.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          val from = i * frameBytes
          val until = math.min(from + frameBytes, bytes.length)
          Row(r.getAs[Long]("doc_id"), i, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }(enc)
  }

  // ---------------------------------------------------------------
  // Content-aware keyframe selection (real decode, histogram deltas)
  // ---------------------------------------------------------------

  val videoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frames", ArrayType(BinaryType, containsNull = false), nullable = false)))

  /** Video-shaped payload table: each document's bytes become a
    * sequence of REAL PNG frames (consecutive `frameBytes`-sized
    * chunks, each encoded as a 1-row grayscale PNG whose width is the
    * exact chunk length — no padding, so decode recovers the chunk
    * byte-for-byte). Stands in for reading a container format; the
    * array<binary> column is the storage shape a frame-extracted video
    * table has at rest. */
  def videoFromDocuments(docs: DataFrame, frameBytes: Int): DataFrame = {
    require(frameBytes > 0)
    val enc = org.apache.spark.sql.Encoders.row(videoSchema)
    spreadForCodec(
        docs.select(col("doc_id"), col("text").cast(BinaryType).as("raw")),
        "doc_id")
      .mapPartitions { iter =>
        val codec = new PngCodec // encoder init, once per partition
        iter.map { r =>
          val bytes = r.getAs[Array[Byte]]("raw")
          val n = (bytes.length + frameBytes - 1) / frameBytes
          val frames = (0 until n).map { i =>
            val from = i * frameBytes
            val until = math.min(from + frameBytes, bytes.length)
            codec.write(grayImage(
              java.util.Arrays.copyOfRange(bytes, from, until),
              width = until - from))
          }
          Row(r.getAs[Long]("doc_id"), n, frames)
        }
      }(enc)
  }

  /** Decode a PNG to ALL its pixel bytes (row-major). */
  private def decodePngAll(codec: PngCodec,
                           png: Array[Byte]): Either[String, Array[Byte]] =
    try {
      val img = codec.read(png)
      val w = img.getWidth
      val raster = img.getRaster
      val out = new Array[Byte](w * img.getHeight)
      var i = 0
      while (i < out.length) {
        out(i) = raster.getSample(i % w, i / w, 0).toByte
        i += 1
      }
      Right(out)
    } catch { case e: Exception =>
      codec.resetAfterError()
      Left(s"decode failed: ${e.getMessage}")
    }

  val keyframeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("delta", DoubleType, nullable = true),
    StructField("frame", BinaryType, nullable = true),
    StructField("decode_error", StringType, nullable = true)))

  /** REAL keyframe selection (no more fixed-stride stand-in): decode
    * each PNG frame, compute the 8-bin intensity histogram over the
    * DECODED pixels, and keep a frame iff its L1 histogram delta to
    * the PREVIOUS frame (rounded to 6dp, left-to-right bin
    * accumulation — both pinned so the mm04 oracle replays the exact
    * doubles) clears `threshold`. The first decodable frame of every
    * video is always a keyframe (delta = null). Undecodable frames
    * land in the `decode_error` reject channel and do not advance the
    * comparison baseline — selection resumes against the last GOOD
    * frame, and if none was seen yet the next good frame is a
    * keyframe.
    *
    * Scale shape: one sequential pass per video row inside
    * mapPartitions (frame order is intrinsic to the semantics), videos
    * parallelize across partitions, selected frames fan out as rows
    * for downstream per-frame operators. Decoder init amortizes per
    * partition. */
  def selectKeyframes(videos: DataFrame, threshold: Double): DataFrame = {
    require(threshold >= 0)
    val enc = org.apache.spark.sql.Encoders.row(keyframeSchema)
    videos.select("doc_id", "frames").mapPartitions { iter =>
      val codec = new PngCodec // decoder init, once per partition
      iter.flatMap { r =>
        val docId = r.getLong(0)
        val frames = r.getSeq[Array[Byte]](1)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var prev: Array[Double] = null
        var i = 0
        frames.foreach { png =>
          decodePngAll(codec, png) match {
            case Left(err) => out += Row(docId, i, null, null, err)
            case Right(pixels) =>
              val h = histogram8(pixels)
              if (prev == null) out += Row(docId, i, null, png, null)
              else {
                var d = 0.0
                var j = 0
                while (j < 8) { d += math.abs(h(j) - prev(j)); j += 1 }
                // same rounding Spark's round(col, 6) applies, so the
                // kept set is reproducible from the SQL replay
                val dr = BigDecimal(d)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (dr >= threshold) out += Row(docId, i, dr, png, null)
              }
              prev = h
          }
          i += 1
        }
        out.iterator
      }
    }(enc)
  }
}
