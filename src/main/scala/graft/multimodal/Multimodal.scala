package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * runs per-partition in batches.
  *
  * The DECODE step is a clearly-marked deterministic stub (no image/
  * audio codecs in this environment); everything around it — the
  * schema, the partition-batched execution shape, the feature-vector
  * contract — is real and tested. Swapping `decodeStub` for a JNI/
  * native decoder changes no plumbing.
  *
  * Scale notes: mapPartitions is the right boundary for codec work —
  * per-partition batching amortizes decoder init (model load, JNI
  * handles), exactly like mapInPandas batches in PySpark. Binary
  * payloads stay columnar (parquet binary) at rest; repartition by size
  * class before decode when payload sizes are skewed.
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

  /** DECODE STUB — deterministic fake "image decode + feature extract":
    * an 8-bin byte histogram normalized by length. A real implementation
    * replaces ONLY this function (signature: bytes → fixed-size numeric
    * vector). Counts and the final division are exact in double, which
    * is what lets mm02's oracle replay the histogram in SQL. */
  private def decodeStub(bytes: Array[Byte]): Array[Double] = {
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

  /** Per-partition batched decode: the multimodal execution shape.
    * One decoder context per partition (the `iter =>` scope), rows
    * streamed through it. */
  def extractFeatures(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    payloads.select("doc_id", "payload").mapPartitions { iter =>
      // decoder init would happen here, once per partition
      iter.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        Row(r.getAs[Long]("doc_id"), bytes.length,
          decodeStub(bytes).toIndexedSeq)
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
