package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ffmpeg-gated COMPRESSED-SAMPLE decode — closes the one boundary the
  * pure-JVM multimodal tier stubs (pixels from video frames; the
  * container metadata itself is parsed natively by
  * [[Multimodal.decodeVideoMeta]]). Everything here is CAPABILITY
  * PROBED: `available` shells `ffmpeg -version` exactly once per JVM;
  * when ffmpeg is absent (as in the build container) callers and the
  * gated spec skip cleanly and [[Multimodal.fakeDecodeMeta]] remains
  * the documented stand-in — no behavior silently degrades.
  *
  * Scale shape: the decoder is executor-local (a plain byte-array
  * function usable inside any map stage), so frame extraction
  * distributes like every other decode in [[Multimodal]] — no shuffle,
  * no driver involvement; the ffmpeg process is per-call and
  * short-lived (a production deployment batches calls per partition to
  * amortize process startup, which composes with `mapPartitions`
  * without changing this function). */
object FfmpegDecode {

  /** Is an ffmpeg binary on PATH? Probed once, never throws. */
  lazy val available: Boolean =
    try {
      val p = new ProcessBuilder("ffmpeg", "-version")
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  /** Decode the FIRST video frame of `container` to packed RGB24 at
    * `width`×`height` (scaled — fixed output dims make the raw byte
    * length deterministic: width*height*3). Input goes through a temp
    * file because ISO-BMFF with a trailing moov is unseekable on a
    * pipe. None: ffmpeg absent, no video stream, or decode failure. */
  def decodeFirstFrame(container: Array[Byte], width: Int,
      height: Int): Option[Array[Byte]] = {
    if (!available) return None
    val tmp = java.nio.file.Files.createTempFile("graft_ff", ".bin")
    var p: Process = null
    try {
      java.nio.file.Files.write(tmp, container)
      // stderr is DISCARDED at the OS level, not read after stdout:
      // error-chatty input can emit more than a pipe buffer of
      // diagnostics while frame bytes are pending — reading stdout to
      // EOF first would deadlock ffmpeg (blocked on stderr) against the
      // JVM (blocked on stdout), wedging the Spark task
      p = new ProcessBuilder("ffmpeg", "-v", "error",
        "-i", tmp.toString, "-frames:v", "1",
        "-vf", s"scale=$width:$height", "-f", "rawvideo",
        "-pix_fmt", "rgb24", "pipe:1")
        .redirectError(ProcessBuilder.Redirect.DISCARD).start()
      val out = p.getInputStream.readAllBytes()
      val ok = p.waitFor() == 0 && out.length == width * height * 3
      if (ok) Some(out) else None
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally {
      if (p != null) p.destroyForcibly() // no-op if already exited
      java.nio.file.Files.delete(tmp)
    }
  }

  /** Frame-decode metadata over an asset frame table: per-channel pixel
    * means of the first frame, NULL row when undecodable — the REAL
    * version of the pixel half of [[Multimodal.fakeDecodeMeta]],
    * slotting exactly where its scaladoc points. Map-side only. */
  def decodeFrameMeta(assetsDf: DataFrame, width: Int = 32,
      height: Int = 24): DataFrame = {
    val dec = udf { bytes: Array[Byte] =>
      decodeFirstFrame(bytes, width, height).map { rgb =>
        val sums = new Array[Long](3)
        var i = 0
        while (i < rgb.length) { sums(i % 3) += rgb(i) & 0xff; i += 1 }
        val n = rgb.length / 3.0
        (width, height, sums(0) / n, sums(1) / n, sums(2) / n)
      }
    }
    assetsDf
      .withColumn("frame", dec(col("bytes")))
      .select(col("asset_id"), col("modality"),
        length(col("bytes")).as("byte_len"),
        col("frame._1").as("frame_width"),
        col("frame._2").as("frame_height"),
        col("frame._3").as("mean_r"),
        col("frame._4").as("mean_g"),
        col("frame._5").as("mean_b"))
  }
}
