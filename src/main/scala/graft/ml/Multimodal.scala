package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / frame-sample /
  * feature-extract operators.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (`fakeDecode*`): it derives metadata
  * from the bytes via hashing. Everything around the stub — the binary
  * column representation, schema, partitioning, batch shape, frame
  * slicing, feature vectors — is real Spark plumbing and is what a
  * production pipeline would keep while swapping the stub for a codec
  * UDF (mapInPandas/mapInArrow on PySpark, or a JNI codec here).
  */
object Multimodal {

  /** Synthesize an asset table from documents: bytes = UTF-8 payload,
    * modality round-robins image/audio/video. Stands in for a real
    * `binaryFile` / blob-store read. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("bytes"))

  /** STUB decode: deterministic pseudo-metadata from the payload hash.
    * Real implementation would decode the container header here. */
  def fakeDecodeMeta(assetsDf: DataFrame): DataFrame =
    assetsDf
      .withColumn("byte_len", length(col("bytes")))
      .withColumn("content_md5", md5(col("bytes")))
      .withColumn("width", pmod(xxhash64(col("bytes")), lit(1920)).cast("int") + 1)
      .withColumn("height", pmod(xxhash64(col("bytes"), lit(1)), lit(1080)).cast("int") + 1)
      .withColumn("sample_rate",
        when(col("modality") === "audio",
          element_at(array(lit(16000), lit(44100), lit(48000)),
            (pmod(xxhash64(col("bytes"), lit(2)), lit(3)) + 1).cast("int"))))

  /** Frame sampling: fixed-stride byte windows of the payload — the real
    * slicing/batching shape; a codec would decode each window. */
  def frameSample(assetsDf: DataFrame, frameLen: Int, nFrames: Int): DataFrame =
    assetsDf
      .select(col("asset_id"), col("modality"), col("bytes"),
        posexplode(expr(
          s"transform(sequence(0, least($nFrames - 1, " +
            s"cast(floor((length(bytes) - 1) / $frameLen) as int))), " +
            s"i -> substring(bytes, i * $frameLen + 1, $frameLen))"))
          .as(Seq("frame_idx", "frame_bytes")))
      .select(col("asset_id"), col("modality"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"),
        md5(col("frame_bytes")).as("frame_md5"))

  /** Feature extraction stub: 16-bin byte histogram as array<float>.
    * The UDF boundary here is exactly where a real embedding model or
    * DSP feature extractor plugs in; signature (binary → array<float>)
    * and the downstream schema are the production shape. */
  val byteHistogram: Array[Byte] => Array[Float] = { bytes =>
    val bins = new Array[Float](16)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { bins((bytes(i) & 0xFF) / 16) += 1f; i += 1 }
      if (bytes.length > 0) {
        var b = 0
        while (b < 16) { bins(b) /= bytes.length; b += 1 }
      }
    }
    bins
  }

  def featureExtract(assetsDf: DataFrame): DataFrame = {
    val histo = udf(byteHistogram)
    assetsDf.select(col("asset_id"), col("modality"),
      histo(col("bytes")).as("features"))
  }

  /** Resize stub: deterministic stride downsample of the payload to at
    * most `targetLen` bytes — the byte-level stand-in for an image/audio
    * resample. The (binary, target) → binary signature, re-derived
    * metadata, and map-side execution are the production shape; a codec-
    * aware scaler replaces the stride loop. */
  val strideDownsample: (Array[Byte], Int) => Array[Byte] = { (bytes, target) =>
    if (bytes == null || bytes.length <= target) bytes
    else {
      val stride = math.ceil(bytes.length.toDouble / target).toInt
      val out = new Array[Byte]((bytes.length + stride - 1) / stride)
      var i = 0
      var j = 0
      while (i < bytes.length) { out(j) = bytes(i); j += 1; i += stride }
      out
    }
  }

  def resizeAssets(assetsDf: DataFrame, targetLen: Int): DataFrame = {
    val resize = udf((b: Array[Byte]) => strideDownsample(b, targetLen))
    assetsDf
      .withColumn("resized", resize(col("bytes")))
      .select(col("asset_id"), col("modality"),
        length(col("bytes")).as("orig_len"),
        length(col("resized")).as("resized_len"),
        md5(col("resized")).as("resized_md5"))
  }
}
