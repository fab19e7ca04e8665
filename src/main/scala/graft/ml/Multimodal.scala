package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / frame-sample /
  * feature-extract operators.
  *
  * ALL THREE modalities decode REAL metadata with pure-JVM parsers:
  * `javax.imageio` ships PNG/BMP/GIF/JPEG readers in every JRE
  * ([[decodeImageMeta]]: width/height/channels + exact per-channel
  * means), `javax.sound.sampled` ships WAV/AIFF/AU readers
  * ([[decodeAudioMeta]]: rate/channels/depth/frames + exact PCM
  * amplitude stats), and [[decodeVideoMeta]] parses the ISO-BMFF
  * (MP4/QuickTime) box tree directly — brand, movie
  * timescale/duration, track dimensions, per-handler track counts —
  * since the container structure needs no codec at all. MlSpec asserts
  * each against fixtures whose expected values derive from the
  * generating formula or hand-assembled box layout, independent of the
  * parsers. The one step that genuinely needs an external codec
  * (ffmpeg/JNI) is video FRAME decode — pixels out of avc1/hev1 sample
  * data — which is absent from this container and slots in downstream
  * of the container metadata, where [[frameSample]]/[[fakeDecodeMeta]]
  * stand in. Everything around the decode boundary — the binary column
  * representation, schema, partitioning, batch shape, frame slicing,
  * feature vectors — is the production shape either way.
  */
object Multimodal {

  /** Exact decoded-image metadata: dimensions, raster band count, and
    * per-channel pixel means over the full image (doubles of exact
    * integer sums, so cross-run equality is byte-for-byte). */
  case class ImageMeta(width: Int, height: Int, channels: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL image decode (pure JVM, no native deps): `javax.imageio`
    * parses the container + pixel data; undecodable/empty payloads map
    * to null (the asset keeps flowing with null metadata, the pipeline
    * convention for corrupt blobs). Runs map-side per partition —
    * exactly the shape a 100 TB decode fan-out needs (no shuffle, CPU
    * scales with executors). */
  val decodeImage: Array[Byte] => ImageMeta = { bytes =>
    if (bytes == null || bytes.isEmpty) null
    else
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) null
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageMeta(w, h, img.getRaster.getNumBands,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
        // NonFatal, not just IOException: the JDK readers throw
        // RuntimeExceptions on real-world corrupt payloads (CMMException
        // on broken ICC profiles, ArrayIndexOutOfBounds on truncated
        // BMP/GIF) — any of them escaping would fail the task and, after
        // retries, the whole job, instead of the contracted null row
      } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Decode metadata for image assets: (asset_id, modality, byte_len,
    * width, height, channels, mean_r/g/b) — null metadata columns for
    * payloads ImageIO cannot parse. */
  def decodeImageMeta(assetsDf: DataFrame): DataFrame = {
    val dec = udf(decodeImage)
    assetsDf
      .withColumn("img", dec(col("bytes")))
      .select(col("asset_id"), col("modality"),
        length(col("bytes")).as("byte_len"),
        col("img.width").as("width"), col("img.height").as("height"),
        col("img.channels").as("channels"), col("img.mean_r").as("mean_r"),
        col("img.mean_g").as("mean_g"), col("img.mean_b").as("mean_b"))
  }

  /** Exact decoded-audio metadata: container format parameters plus PCM
    * sample statistics (peak and mean absolute amplitude over every
    * sample of every channel — doubles of exact integer sums, so
    * cross-run equality is byte-for-byte, same contract as
    * [[ImageMeta]]). */
  case class AudioMeta(sample_rate: Int, channels: Int, bits_per_sample: Int,
      n_frames: Long, duration_sec: Double, peak_amp: Int, mean_abs: Double)

  /** REAL audio decode (pure JVM, no native deps): `javax.sound.sampled`
    * ships WAV/AIFF/AU readers in every JRE — the same trick that made
    * image decode real via javax.imageio. Parses the container header
    * (sample rate, channels, bit depth, frame count) AND the PCM frame
    * data (peak + mean |amplitude|, honoring the format's endianness and
    * 8-bit-unsigned convention). Undecodable payloads and non-PCM or
    * >16-bit encodings map to null — the asset keeps flowing with null
    * metadata, the corrupt-blob convention shared with [[decodeImage]].
    * Runs map-side per partition; a compressed-codec (MP3/AAC) SPI would
    * slot in through the same AudioSystem call. */
  val decodeAudio: Array[Byte] => AudioMeta = { bytes =>
    if (bytes == null || bytes.isEmpty) null
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = fmt.getSampleSizeInBits
          val nFrames = in.getFrameLength
          // 16-bit UNSIGNED is rejected, not accepted-and-misdecoded:
          // decodePcmStats honors unsignedness only in its 8-bit branch
          // and would sign-extend 16-bit unsigned samples (digital
          // silence at midpoint 0x8000 reading as peak -32768). Only
          // reachable via a third-party AudioSystem SPI, but the
          // contract is null for unsupported encodings, not garbage
          // stats (r13 review).
          if (!(signed || (unsigned && bits == 8)) ||
              (bits != 8 && bits != 16) ||
              nFrames < 0 || fmt.getChannels < 1) null
          else {
            val data = in.readAllBytes()
            // a payload truncated mid-frame-data parses a healthy header
            // but delivers fewer bytes than the header promises — that is
            // a corrupt blob (null), not a shorter recording: partial
            // stats would silently differ between the truncation points
            // of the same logical asset
            if (data.length < nFrames * fmt.getFrameSize) null
            else decodePcmStats(fmt, bits, nFrames, data)
          }
        } finally in.close()
        // NonFatal for the same reason as decodeImage: corrupt payloads
        // surface as UnsupportedAudioFileException, EOF, or reader
        // RuntimeExceptions — all must become the contracted null row
      } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def decodePcmStats(fmt: javax.sound.sampled.AudioFormat,
      bits: Int, nFrames: Long, data: Array[Byte]): AudioMeta = {
    val unsigned = fmt.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
    val bytesPerSample = bits / 8
    val nSamples = data.length / bytesPerSample
    val big = fmt.isBigEndian
    var sumAbs = 0L
    var peak = 0
    var i = 0
    while (i < nSamples) {
      val off = i * bytesPerSample
      // WAV convention: 8-bit is unsigned (0..255, midpoint 128);
      // 16-bit is signed. AIFF is signed big-endian at both depths.
      val v =
        if (bits == 8) {
          if (unsigned) (data(off) & 0xFF) - 128 else data(off).toInt
        } else {
          val (b0, b1) = if (big) (data(off), data(off + 1))
                         else (data(off + 1), data(off))
          (b0 << 8) | (b1 & 0xFF) // b0 carries the sign
        }
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      i += 1
    }
    AudioMeta(fmt.getSampleRate.toInt, fmt.getChannels, bits,
      nFrames, nFrames.toDouble / fmt.getSampleRate,
      peak, if (nSamples == 0) 0.0 else sumAbs.toDouble / nSamples)
  }

  /** Decode metadata for audio assets: (asset_id, modality, byte_len,
    * sample_rate, channels, bits_per_sample, n_frames, duration_sec,
    * peak_amp, mean_abs) — null metadata columns for payloads
    * javax.sound.sampled cannot parse. */
  def decodeAudioMeta(assetsDf: DataFrame): DataFrame = {
    val dec = udf(decodeAudio)
    assetsDf
      .withColumn("au", dec(col("bytes")))
      .select(col("asset_id"), col("modality"),
        length(col("bytes")).as("byte_len"),
        col("au.sample_rate").as("sample_rate"),
        col("au.channels").as("channels"),
        col("au.bits_per_sample").as("bits_per_sample"),
        col("au.n_frames").as("n_frames"),
        col("au.duration_sec").as("duration_sec"),
        col("au.peak_amp").as("peak_amp"),
        col("au.mean_abs").as("mean_abs"))
  }

  /** Exact video CONTAINER metadata: brand, movie timescale/duration,
    * presentation dimensions of the first video track, and per-handler
    * track counts — everything the ISO-BMFF (MP4/QuickTime `moov` tree)
    * structure carries without touching a codec. */
  case class VideoMeta(major_brand: String, timescale: Long,
      duration_units: Long, duration_sec: Double,
      width: Double, height: Double,
      n_tracks: Int, n_video_tracks: Int, n_audio_tracks: Int)

  /** REAL video container decode (pure JVM, no native deps): a direct
    * ISO 14496-12 box parse — MP4 and QuickTime files are a tree of
    * `[size][type][payload]` boxes, and the movie header (`moov/mvhd`),
    * track headers (`trak/tkhd`), and handler declarations
    * (`trak/mdia/hdlr`) fully describe duration, dimensions, and track
    * layout without any codec. This closes the container level of video
    * decode the way javax.imageio/javax.sound.sampled closed image and
    * audio; FRAME decode (pixels out of avc1/hev1 sample data) is the
    * one step that genuinely needs an external codec (ffmpeg/JNI),
    * which slots in downstream of this metadata exactly where
    * [[frameSample]] stands in. Corrupt payloads — truncated boxes, a
    * box overrunning its parent, no `moov/mvhd`, a zero timescale — map
    * to null, the shared corrupt-blob contract. */
  val decodeVideo: Array[Byte] => VideoMeta = { bytes =>
    if (bytes == null || bytes.length < 16) null
    else
      try decodeIsoBmff(bytes)
      catch { case scala.util.control.NonFatal(_) => null }
  }

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
      ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)

  private def be64(b: Array[Byte], p: Int): Long =
    (be32(b, p) << 32) | be32(b, p + 4)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** The direct children of byte range [start, end): (type, contentStart,
    * contentEnd) per box. Malformed structure (header past the range, a
    * box shorter than its own header or overrunning the range) throws —
    * truncation must surface as the null row, never as partial metadata
    * (same contract as [[decodeAudio]]'s frame-length check). */
  private def boxChildren(b: Array[Byte], start: Int, end: Int)
      : List[(String, Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Int, Int)]
    var p = start
    while (p < end) {
      if (p + 8 > end) throw new IllegalArgumentException("truncated box header")
      val s32 = be32(b, p)
      val typ = fourcc(b, p + 4)
      var hdr = 8
      val size: Long =
        if (s32 == 1L) { // 64-bit largesize form
          if (p + 16 > end) throw new IllegalArgumentException("truncated largesize")
          hdr = 16
          be64(b, p + 8)
        } else if (s32 == 0L) (end - p).toLong // box extends to end of range
        else s32
      if (size < hdr || p + size > end)
        throw new IllegalArgumentException(s"box $typ overruns container")
      out += ((typ, p + hdr, (p + size).toInt))
      p = (p + size).toInt
    }
    out.toList
  }

  private def decodeIsoBmff(b: Array[Byte]): VideoMeta = {
    val top = boxChildren(b, 0, b.length)
    val brand = top.collectFirst { case ("ftyp", s, e) if e - s >= 4 =>
      fourcc(b, s) }.orNull
    val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
    if (moov.isEmpty) return null // not an ISO-BMFF movie
    val kids = boxChildren(b, moov.get._1, moov.get._2)
    // mvhd: version(1) flags(3), then v0 = 4+4 byte times, 4-byte
    // timescale/duration; v1 = 8+8 byte times, 4-byte timescale, 8-byte
    // duration (ISO 14496-12 §8.2.2)
    val mvhd = kids.collectFirst { case ("mvhd", s, e) if e - s >= 20 =>
      val v = b(s) & 0xFF
      if (v == 1) {
        if (e - s < 32) throw new IllegalArgumentException("truncated mvhd v1")
        (be32(b, s + 20), be64(b, s + 24))
      } else (be32(b, s + 12), be32(b, s + 16))
    }
    if (mvhd.isEmpty || mvhd.get._1 <= 0) return null
    val (timescale, duration) = mvhd.get
    var (nTracks, nVideo, nAudio) = (0, 0, 0)
    var (width, height) = (0.0, 0.0)
    var haveDims = false // explicit flag: 0x0 is a legal first-track size
    kids.foreach {
      case ("trak", ts, te) =>
        nTracks += 1
        val tk = boxChildren(b, ts, te)
        // handler type lives at mdia/hdlr content offset 8 (§8.4.3)
        val handler = tk.collectFirst { case ("mdia", ms, me) =>
          boxChildren(b, ms, me).collectFirst {
            case ("hdlr", hs, he) if he - hs >= 12 => fourcc(b, hs + 8) }
        }.flatten.getOrElse("")
        if (handler == "vide") nVideo += 1
        if (handler == "soun") nAudio += 1
        // tkhd: fixed-width field block then 16.16 fixed-point
        // presentation width/height at content offset 76/80 (v0) or
        // 88/92 (v1) (§8.3.2); a vide tkhd too short for those fields is
        // a truncation and must null the row, never yield partial
        // metadata (another track's dims posing as the first's)
        if (handler == "vide" && !haveDims) {
          val tkhd = tk.collectFirst { case ("tkhd", hs, he) => (hs, he) }
          tkhd match {
            case Some((hs, he)) =>
              if (he - hs < 4) throw new IllegalArgumentException("truncated tkhd")
              val off = if ((b(hs) & 0xFF) == 1) hs + 88 else hs + 76
              if (he - off < 8)
                throw new IllegalArgumentException("tkhd too short for dimensions")
              width = be32(b, off) / 65536.0
              height = be32(b, off + 4) / 65536.0
              haveDims = true
            case None =>
              // a vide trak with NO tkhd at all is the same malformation
              // as a truncated one: proceeding would let the NEXT video
              // track's dimensions pose as the first's (exactly the
              // partial-metadata case the comment above contracts
              // against; r13 review)
              throw new IllegalArgumentException(
                "vide trak missing its mandatory tkhd box")
          }
        }
      case _ => ()
    }
    VideoMeta(brand, timescale, duration,
      duration.toDouble / timescale, width, height, nTracks, nVideo, nAudio)
  }

  /** Decode metadata for video assets: (asset_id, modality, byte_len,
    * major_brand, timescale, duration_units, duration_sec, width,
    * height, n_tracks, n_video_tracks, n_audio_tracks) — null metadata
    * columns for payloads that are not well-formed ISO-BMFF movies. */
  def decodeVideoMeta(assetsDf: DataFrame): DataFrame = {
    val dec = udf(decodeVideo)
    assetsDf
      .withColumn("vid", dec(col("bytes")))
      .select(col("asset_id"), col("modality"),
        length(col("bytes")).as("byte_len"),
        col("vid.major_brand").as("major_brand"),
        col("vid.timescale").as("timescale"),
        col("vid.duration_units").as("duration_units"),
        col("vid.duration_sec").as("duration_sec"),
        col("vid.width").as("width"), col("vid.height").as("height"),
        col("vid.n_tracks").as("n_tracks"),
        col("vid.n_video_tracks").as("n_video_tracks"),
        col("vid.n_audio_tracks").as("n_audio_tracks"))
  }

  /** Synthesize an asset table from documents: bytes = UTF-8 payload,
    * modality round-robins image/audio/video. Stands in for a
    * [[binaryAssets]] blob-store read where the testdata has no real
    * media files. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("bytes"))

  /** The REAL blob-store read: Spark's `binaryFile` source over a
    * directory tree, mapped to the same (asset_id, modality, bytes)
    * schema every decode operator downstream consumes — so the decode
    * pipeline runs unchanged over synthesized tables (tests) and real
    * media directories (production). Modality derives from the file
    * extension; asset_id is a 64-bit content-path hash (stable across
    * re-listings, collision odds n²/2⁶⁴). The source reads each file as
    * ONE row map-side — at 100 TB the parallelism unit is the file,
    * exactly right for per-asset decode, and
    * `spark.sql.files.maxPartitionBytes` groups small files per task.
    * `pathGlobFilter`/`recursiveFileLookup` push down to the listing, so
    * a modality-filtered read never stats the other modalities' files. */
  def binaryAssets(spark: SparkSession, dir: String,
      glob: Option[String] = None): DataFrame = {
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(dir)
      .select(
        xxhash64(col("path")).as("asset_id"),
        when(ext.isin("png", "bmp", "gif", "jpg", "jpeg"), "image")
          .when(ext.isin("wav", "aiff", "aif", "au", "mp3", "flac"), "audio")
          .when(ext.isin("mp4", "mov", "m4v", "webm", "mkv"), "video")
          .otherwise("binary").as("modality"),
        col("content").as("bytes"),
        col("path").as("source_path"),
        col("length").as("byte_len"),
        col("modificationTime").as("modified_at"))
  }

  /** STUB decode — the SAMPLE-DATA level only, as of the container
    * parser landing: image metadata is real ([[decodeImageMeta]],
    * javax.imageio), audio is real ([[decodeAudioMeta]],
    * javax.sound.sampled), video container metadata is real
    * ([[decodeVideoMeta]], direct ISO-BMFF parse). What remains
    * codec-bound is decoding compressed SAMPLE data (video frames,
    * MP3/AAC audio) into pixels or PCM; this deterministic
    * pseudo-metadata generator (payload-hash derived) keeps that
    * plumbing shape testable end-to-end. The REAL decode exists behind
    * a capability probe — [[FfmpegDecode.decodeFrameMeta]] slots in
    * exactly here wherever an ffmpeg binary is present (it is absent
    * from this build container, so its spec gates on the probe). */
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
      // empty payloads sample ZERO frames: without the filter,
      // floor((0-1)/frameLen) = -1 makes sequence(0, -1) count DOWN to
      // [0, -1] (Spark infers step -1 when start > stop), emitting two
      // phantom zero-length frames — violating the frame_len > 0
      // invariant MlSpec pins (r13 review)
      .filter(length(col("bytes")) > 0)
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
