package graft.ingest

import graft.SparkSpecBase

/** Pins the one shared overwrite-publish primitive (r14): on a local
  * root the swap must be the POSIX atomic rename path — tmp gone,
  * destination flipped whole — through BOTH filesystem flavors that
  * reach it (LocalFileSystem from the pointer chassis,
  * RawLocalFileSystem from the control-file writer, which notably does
  * NOT implement getScheme). */
class AtomicOverwriteSpec extends SparkSpecBase {

  private def write(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def read(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")

  test("atomic overwrite-rename flips whole and removes tmp on both local fs flavors") {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = java.nio.file.Files.createTempDirectory("atomic_ow").toString
    val checksummed = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf)
    val raw = checksummed match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    for ((fs, tag) <- Seq((checksummed, "local"), (raw, "rawlocal"))) {
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/ptr-$tag.tmp")
      val dst = new org.apache.hadoop.fs.Path(s"$dir/ptr-$tag")
      write(fs, dst, "old")
      write(fs, tmp, "new")
      AtomicOverwrite.rename(conf, fs, tmp, dst) // must not throw (getScheme!)
      assert(read(java.nio.file.Paths.get(dst.toUri.getPath)) == "new",
        s"$tag: destination not flipped")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(tmp.toUri.getPath)), s"$tag: tmp residue")
    }
  }
}
