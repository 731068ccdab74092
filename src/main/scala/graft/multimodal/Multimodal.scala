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

  /** Deterministic PNG encode: `bytes` become the row-major pixels of
    * an 8-bit grayscale image, width 16, last row zero-padded. The
    * true byte count travels as metadata (n_bytes) so decode can drop
    * the padding. A real PNG — CRC-checked chunks, zlib-compressed
    * scanlines — not a byte-copy. */
  def encodePng(bytes: Array[Byte], width: Int = 16): Array[Byte] = {
    val h = math.max(1, (bytes.length + width - 1) / width)
    val img = new java.awt.image.BufferedImage(
      width, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < bytes.length) {
      raster.setSample(i % width, i / width, 0, bytes(i) & 0xff)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decode a PNG payload back to its leading `nBytes` pixel bytes
    * (row-major), or an error message for corrupt/non-image payloads. */
  private def decodePng(png: Array[Byte], nBytes: Int): Either[String, Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      if (img == null) Left("not a decodable image")
      else {
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
      }
    } catch { case e: Exception => Left(s"decode failed: ${e.getMessage}") }

  /** Payload table with REAL PNG payloads built from document text
    * bytes (stands in for reading a binary image column off parquet). */
  def payloadsPng(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("raw"))
      .mapPartitions { iter =>
        javax.imageio.ImageIO.setUseCache(false) // encoder init, once per partition
        iter.map { r =>
          val bytes = r.getAs[Array[Byte]]("raw")
          Row(r.getAs[Long]("doc_id"), "image/png", bytes.length, encodePng(bytes))
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
      javax.imageio.ImageIO.setUseCache(false) // decoder init, once per partition
      iter.map { r =>
        val docId = r.getAs[Long]("doc_id")
        val n = r.getAs[Int]("n_bytes")
        decodePng(r.getAs[Array[Byte]]("payload"), n) match {
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

  /** Resize stub: cap payloads at maxBytes (stands in for image
    * downscaling — a real implementation replaces the byte-truncation
    * with a decoder+scaler, same signature). Pure column expression:
    * fuses into the scan, no shuffle. */
  def resizePayload(payloads: DataFrame, maxBytes: Int): DataFrame = {
    require(maxBytes > 0)
    payloads.withColumn("payload",
      expr(s"substring(payload, 1, $maxBytes)").cast(BinaryType))
      .withColumn("resized", length(col("payload")) === maxBytes)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame sampling for video-shaped payloads: every `stride`-th
    * fixed-size chunk becomes a frame row (doc_id, frame_idx, bytes).
    * The DECODE (chunk boundaries from a container format) is the
    * stubbed part — fixed-size chunking stands in for keyframe
    * extraction; the one-payload-row → many-frame-rows explosion with
    * per-partition batching is the real multimodal pipeline shape.
    * Frames fan out BEFORE feature extraction so downstream operators
    * parallelize per frame, not per video. */
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
}
