package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-versioned table: a commit log + read-at-version over
  * the same immutable-generation machinery the ledgered sinks use — the
  * lightweight form of what a transactional table format (Delta/Iceberg)
  * provides, without importing one.
  *
  * Layout:
  * {{{
  *   root/
  *     _commits/v00000001.json   // {"version":1,"dirs":["gen-ab12cd34"]}
  *     _commits/v00000002.json   // {"version":2,"dirs":["gen-ab12cd34","gen-99ff0011"]}
  *     gen-ab12cd34/  ...parquet...
  *     gen-99ff0011/  ...parquet...
  * }}}
  *
  * Invariants that make this safe:
  *  - Generation directories are IMMUTABLE once a commit references them
  *    and are written BEFORE their commit file: an in-flight write is
  *    invisible (its gen dir exists but no commit lists it), so readers
  *    are isolated from writers for free.
  *  - A commit file is the ATOMIC publication point: written to a
  *    unique temp name, then atomically claimed WITHOUT overwrite —
  *    rename on HDFS (NameNode-atomic), hard link on the local
  *    filesystem (where Hadoop's no-overwrite rename is a non-atomic
  *    exists-check + rename(2); see [[claimVersionFile]]). Losing a
  *    race for version N surfaces as FileAlreadyExistsException and the
  *    writer retries at N+1 — optimistic concurrency, never a torn or
  *    clobbered commit. On object stores (S3A) front the commit log
  *    with a consistent metadata layer instead of pointing it at the
  *    bucket.
  *  - A reader materializes its file listing when the DataFrame is
  *    created, and generations are never mutated — so a frame read at
  *    version N keeps returning version N even after later commits
  *    (snapshot isolation) until [[vacuum]] drops generations older
  *    than the retention horizon.
  *
  * Append commits reference the previous snapshot's directories plus the
  * new generation — O(1) data movement per append, like a table format's
  * manifest reuse; overwrite commits reference only the new generation.
  * Schemas may evolve across appends (mergeSchema read, as SpecLake).
  */
object SnapshotLake {
  /** Changefeed meta columns and the per-generation CDF directory name
    * (`_`-prefixed: invisible to the generation's data reads). */
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CdfDirName = "_cdf"

  /** Max distinct source key tuples collected for merge's bloom-tier
    * scoping — a bounded METADATA collect (≤ cap+1 narrow rows), never
    * data-path; bigger sources skip the bloom tier and scope by
    * envelopes alone. */
  val BloomScopeCap = 1024

  /** (root, generation) → total bytes. Generations are immutable, so an
    * entry never invalidates; vacuumed generations merely strand a Long
    * (per-process, bounded by generations ever measured). Keeps the
    * per-commit auto-compact check from re-walking the whole big body. */
  private[ingest] val genSizes =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Long]()

  /** Reentrancy guard: a fold's own publishRewrite fires the
    * auto-compact hook again; the guard no-ops that inner call. */
  private[ingest] val inAutoCompact =
    new ThreadLocal[java.lang.Boolean] {
      override def initialValue(): java.lang.Boolean = false
    }
}

class SnapshotLake(root: String) {

  private val commitsDir = s"$root/_commits"

  private def hadoopFs(spark: SparkSession) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed versions, ascending (empty for a fresh root). */
  def versions(spark: SparkSession): Seq[Long] = {
    val fs = hadoopFs(spark)
    val dir = new org.apache.hadoop.fs.Path(commitsDir)
    if (!fs.exists(dir)) Seq.empty
    // \d{8,}, not \d{8}: the writer's %08d pads to AT LEAST 8 digits,
    // so version 100,000,000 writes a 9-digit filename — an exact-8
    // match would publish the commit yet leave it invisible, wedging
    // every later claim on the same "next" version forever (the sort
    // below is numeric, so longer filenames order correctly; r13 review)
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d{8,}\\.json"))
      .map(_.drop(1).dropRight(5).toLong).sorted
  }

  def latestVersion(spark: SparkSession): Option[Long] =
    versions(spark).lastOption

  private def commitJson(spark: SparkSession, version: Long): String = {
    val fs = hadoopFs(spark)
    val p = new org.apache.hadoop.fs.Path(f"$commitsDir/v$version%08d.json")
    require(fs.exists(p), s"no commit for version $version under $root")
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** One regex for generation-directory names in commit JSON — shared by
    * [[dirsAt]] and [[history]] so the manifest shape has one spelling. */
  private val GenDirPattern = "\"(gen-[0-9a-f]+)\"".r

  /** Generation directories of a committed version (names relative to
    * root, in commit order). */
  def dirsAt(spark: SparkSession, version: Long): Seq[String] =
    // commit JSON is written by this class only; a regex parse keeps the
    // manifest dependency-free (same trade as Bench.loadFloor)
    GenDirPattern
      .findAllMatchIn(commitJson(spark, version)).map(_.group(1)).toSeq

  /** Manifest dirs PLUS whether the commit was a RESTORE, in one JSON
    * read. The streaming source needs both for every version it walks
    * (a restore is the one commit kind that re-references generations
    * the stream may have already emitted — see
    * [[graft.sources.SnapLakeStreamSource]]), and reading the commit
    * file twice per version would double the batch's control-plane I/O
    * at object-store latencies. */
  private[graft] def dirsAndRestoreAt(spark: SparkSession,
      version: Long): (Seq[String], Boolean) = {
    val txt = commitJson(spark, version)
    (GenDirPattern.findAllMatchIn(txt).map(_.group(1)).toSeq,
      txt.contains("\"op\":\"restore\""))
  }

  /** Was `version` published by a mutation that MATERIALIZED its
    * changefeed (merge/delete/optimize/compact)? Only those commits may
    * read a generation's `_cdf/` as the version's changes: a RESTORE
    * re-references an old rewrite generation — `_cdf/` and all — and
    * its changefeed must be the manifest restatement, not the original
    * mutation's stale rows. */
  private[graft] def commitIsRewrite(spark: SparkSession, version: Long): Boolean =
    commitJson(spark, version).contains("\"rewrite\":true")

  /** Latest version whose commit file was published at or before
    * `tsMillis` — timestamp-based time travel. The commit file's
    * modification time IS the publication instant (it is written once,
    * atomically, and never touched again), so no extra bookkeeping is
    * needed; like any table format's timestampAsOf, granularity is the
    * store's mtime resolution. */
  def versionAt(spark: SparkSession, tsMillis: Long): Option[Long] = {
    val fs = hadoopFs(spark)
    versions(spark).reverseIterator.find { v =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(
        f"$commitsDir/v$v%08d.json")).getModificationTime <= tsMillis
    }
  }

  /** Operation HISTORY — the audit surface a table format exposes as
    * DESCRIBE HISTORY: one row per surviving commit with the operation
    * that published it (`create`/`append`/`overwrite`/`merge`/`delete`/
    * `optimize`/`zorder`/`compact`/`restore`; commits from writers
    * predating the tag read as `unknown`), the generation count, and
    * the publication instant ([[versionAt]]'s clock). Metadata-only:
    * one commit-file read per version, no data touched. Built with an
    * explicit schema (the createDataFrame/REPL-classloader contract
    * every frozen-table helper here follows). */
  def history(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fs = hadoopFs(spark)
    val rows = versions(spark).map { v =>
      val txt = commitJson(spark, v)
      val op = """"op":"(\w+)"""".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse("unknown")
      val nDirs = GenDirPattern.findAllMatchIn(txt).length
      val ts = fs.getFileStatus(new org.apache.hadoop.fs.Path(
        f"$commitsDir/v$v%08d.json")).getModificationTime
      Row(v, op, nDirs, ts)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("version", LongType),
        StructField("op", StringType),
        StructField("n_dirs", IntegerType),
        StructField("ts_millis", LongType))))
  }

  /** TIME TRAVEL: the table exactly as committed at `version`. */
  def readAt(spark: SparkSession, version: Long): DataFrame = {
    val dirs = dirsAt(spark, version)
    require(dirs.nonEmpty, s"version $version lists no data directories")
    spark.read.option("mergeSchema", "true")
      .parquet(dirs.map(d => s"$root/$d"): _*)
  }

  /** The latest committed snapshot. */
  def read(spark: SparkSession): DataFrame = {
    val v = latestVersion(spark).getOrElse(
      sys.error(s"no committed version under $root"))
    readAt(spark, v)
  }

  /** Land `df` as a new commit; returns the published version.
    * `overwrite = true` replaces the table; `false` appends to the
    * current snapshot. Safe under concurrent committers (optimistic
    * retry on the commit-file rename). */
  def commit(df: DataFrame, overwrite: Boolean = false): Long =
    commitTagged(df, overwrite, None)

  /** Newest streaming batch id recorded in the commit log, scanning
    * newest→oldest past any untagged (batch-API) commits in between —
    * the replay watermark for [[graft.sources.SnapLakeSink]].
    *
    * `queryId` scopes the watermark to ONE streaming query (the stable
    * checkpoint identity): a NEW query writing the same table starts
    * its batch ids at 0 again, and comparing against another query's
    * watermark would silently swallow its first batches — the reason
    * table formats key stream transactions on (appId, version), not the
    * bare batch id. Passing None matches any marker (monitoring use).
    * The scan normally stops within a few commits: a live stream
    * writer's marker is always near the log tail. */
  def lastStreamBatchId(spark: SparkSession,
      queryId: Option[String] = None): Option[Long] =
    newestBatchMarker(spark) { txt =>
      queryId.forall(q => txt.contains(s""""queryId":"$q""""))
    }

  /** Newest→oldest commit-log scan shared by the two watermark lookups:
    * the first commit whose JSON both satisfies `eligible` and carries a
    * batch marker wins. */
  private def newestBatchMarker(spark: SparkSession)(
      eligible: String => Boolean): Option[Long] = {
    val fs = hadoopFs(spark)
    versions(spark).reverseIterator.map { v =>
      val p = new org.apache.hadoop.fs.Path(f"$commitsDir/v$v%08d.json")
      val in = fs.open(p)
      val txt =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      if (!eligible(txt)) None
      else """"batchId":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    }.collectFirst { case Some(b) => b }
  }

  /** Replay watermark for a writer WITHOUT a streaming query id: the
    * newest batch marker among commits that ALSO lack one. The sinks
    * use this (not [[lastStreamBatchId]](spark, None), which matches
    * ANY query's marker) when the queryId local property is absent
    * (direct addBatch invocation): an anonymous writer replaying its
    * own batch is still suppressed, but a fresh anonymous writer whose
    * batch ids start at 0 against a lake previously streamed by a REAL
    * query is never silently swallowed by that query's watermark —
    * that was silent data loss, not replay protection. Two DIFFERENT
    * anonymous writers interleaving on one lake remain
    * indistinguishable by construction; callers needing that must run
    * as real queries (or set the local property themselves). */
  private[graft] def lastAnonymousStreamBatchId(
      spark: SparkSession): Option[Long] =
    newestBatchMarker(spark)(txt => !txt.contains(""""queryId":"""))

  /** The (queryId, replay watermark) pair for a streaming writer into
    * this lake — THE one implementation of the replay-guard scoping
    * rule, shared by [[graft.sources]]' SnapLakeSink and
    * [[graft.streaming.EventStreams.snaplakeUpsertSink]] (r13 review:
    * it had drifted into two verbatim copies, and the r12
    * watermark-scoping fix had to be applied to both).
    *
    * queryId is the stable streaming-query id (checkpoint identity),
    * set as a local property on the stream's driver thread — scoping
    * the watermark to THIS query so a fresh query (new checkpoint,
    * batch ids restarting at 0) is not mistaken for a replay of the
    * previous writer. Absent (direct addBatch calls), only ANONYMOUS
    * markers are consulted: an unscoped watermark would let a real
    * query's old marker silently swallow a new anonymous writer's
    * whole batches — data loss dressed as replay protection.
    * A batch whose id is <= the returned watermark is a replay of this
    * same writer and must no-op. */
  def streamWriterScope(
      spark: SparkSession): (Option[String], Option[Long]) = {
    val queryId = Option(spark.sparkContext.getLocalProperty(
      "sql.streaming.queryId"))
    val watermark = queryId match {
      case some @ Some(_) => lastStreamBatchId(spark, some)
      case None => lastAnonymousStreamBatchId(spark)
    }
    (queryId, watermark)
  }

  /** [[commit]] plus an optional streaming (queryId, batchId) marker
    * persisted in the commit JSON — the exactly-once handshake for the
    * streaming sink (a replayed micro-batch is detected by
    * [[lastStreamBatchId]] >= its id UNDER THE SAME QUERY ID and
    * skipped whole). */
  private[graft] def commitTagged(df: DataFrame, overwrite: Boolean,
      batchId: Option[Long], queryId: Option[String] = None): Long = {
    val spark = df.sparkSession
    val fs = hadoopFs(spark)
    // data first, under a writer-unique UNCOMMITTED generation — readers
    // cannot see it until the commit file below publishes it
    val gen = s"gen-${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
    df.write.parquet(s"$root/$gen")
    validateGen(spark, gen)
    // footer-harvested file stats land inside the still-unpublished
    // generation, so they are immutable alongside the data they describe
    GenStats.write(spark.sparkContext.hadoopConfiguration, s"$root/$gen")
    maybeAutoBlooms(spark, gen)
    val tag = s""""op":"${if (overwrite) "overwrite" else "append"}",""" +
      batchId.map(b => s""""batchId":$b,""").getOrElse("") +
      queryId.map(q => s""""queryId":"$q",""").getOrElse("")
    // losing the claim race retries against the re-read latest — an
    // append retry re-bases on the winner's snapshot, exactly the
    // optimistic-concurrency contract
    val v = retryClaim(spark, fs, tag) { next =>
      if (overwrite || next == 1) Seq(gen)
      else dirsAt(spark, next - 1) :+ gen
    }
    // post-publish, best-effort: the commit above is durable regardless
    maybeAutoCompact(spark)
    v
  }

  /** Commit `df` only as the TABLE-CREATING version 1; returns None if
    * any version already exists (including one published by a racing
    * creator — the loser of the atomic v1 claim cleans up its generation
    * and reports the table as pre-existing instead of retrying). This is
    * the atomic primitive behind SaveMode.ErrorIfExists/Ignore: a bare
    * exists-check before [[commit]] would be check-then-act, letting a
    * racing save silently overwrite a just-created table. */
  def commitInitial(df: DataFrame): Option[Long] = {
    val spark = df.sparkSession
    val fs = hadoopFs(spark)
    if (latestVersion(spark).isDefined) return None // cheap pre-check only
    val gen = s"gen-${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
    df.write.parquet(s"$root/$gen")
    validateGen(spark, gen)
    GenStats.write(spark.sparkContext.hadoopConfiguration, s"$root/$gen")
    maybeAutoBlooms(spark, gen)
    fs.mkdirs(new org.apache.hadoop.fs.Path(commitsDir))
    val json = s"""{"version":1,"op":"create","dirs":["$gen"]}"""
    val tmp = new org.apache.hadoop.fs.Path(s"$commitsDir/.tmp-$gen-1")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    try {
      claimVersionFile(spark, fs, tmp,
        new org.apache.hadoop.fs.Path(f"$commitsDir/v${1L}%08d.json"))
      Some(1L)
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        fs.delete(tmp, false)
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/$gen"), true)
        None
    }
  }

  /** Atomically claim `dst` with `tmp`'s content, throwing Hadoop's
    * FileAlreadyExistsException when another committer won the version.
    *
    * On HDFS, rename-without-overwrite is the primitive: the NameNode
    * checks-and-renames under one namespace lock. On the LOCAL
    * filesystem that same FileContext.rename is a client-side
    * exists-check followed by POSIX rename(2) — which REPLACES an
    * existing destination — so two racing committers could both
    * "win" and one commit would be silently clobbered (TOCTOU). The
    * POSIX primitive that atomically fails on an existing destination
    * is link(2), so local roots claim via Files.createLink instead. */
  private def claimVersionFile(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit = {
    if (fs.getScheme == "file") {
      try java.nio.file.Files.createLink(
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(dst.toString)
      }
      fs.delete(tmp, false)
    } else {
      org.apache.hadoop.fs.FileContext.getFileContext(
        tmp.toUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, dst)
    }
  }

  /** Test seam: invoked after a mutation (merge/delete) has written its
    * rewrite generation but before it claims the commit — the window a
    * concurrent commit would race into. No-op in production. */
  protected def onBeforePublish(): Unit = ()

  // ------------------------------------------------ auto bloom tier

  private def bloomColsPath = new org.apache.hadoop.fs.Path(
    s"$root/_bloomcols.json")

  /** Table-level bloom freshness: once enabled, EVERY write path
    * (append/overwrite commits, merge/delete rewrites, optimize) builds
    * `_blooms.json` for its new generation before publishing, so
    * point-lookup skipping and merge/delete bloom scoping never decay
    * to envelope-only as the table accretes commits. [[computeBlooms]]
    * remains the one-shot backfill for generations that predate the
    * setting. Administrative, like constraints: applies from the moment
    * it is set. */
  def enableAutoBlooms(spark: SparkSession, cols: Seq[String],
      expectedNdvPerFile: Int = 100000): Unit = {
    require(cols.nonEmpty, "enableAutoBlooms needs at least one column")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    val arr = node.putArray("cols")
    cols.foreach(arr.add)
    node.put("ndv", expectedNdvPerFile)
    writeControlFile(spark, bloomColsPath, "._bloomcols.tmp",
      mapper.writeValueAsString(node))
  }

  def disableAutoBlooms(spark: SparkSession): Unit = {
    val raw = rawFs(spark)
    raw.delete(bloomColsPath, false)
  }

  /** The enabled auto-bloom setting, if any: (columns, expectedNdv). */
  def autoBloomConfig(spark: SparkSession): Option[(Seq[String], Int)] =
    readControlJson(spark, bloomColsPath).flatMap { m =>
      import scala.jdk.CollectionConverters._
      val cols = m.path("cols").elements().asScala.map(_.asText()).toSeq
      if (cols.isEmpty) None else Some((cols, m.path("ndv").asInt(100000)))
    }

  /** Raw-fs read+parse of an administrative control file; None when
    * absent. The read-side twin of [[writeControlFile]] — every control
    * file goes through this pair so the ChecksumFileSystem hygiene
    * lives in exactly one place. */
  private def readControlJson(spark: SparkSession,
      p: org.apache.hadoop.fs.Path)
      : Option[com.fasterxml.jackson.databind.JsonNode] = {
    val raw = rawFs(spark)
    if (!raw.exists(p)) return None
    val in = raw.open(p)
    val txt =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    Some(new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt))
  }

  /** Best-effort per-generation bloom build for the auto tier — called
    * on the still-UNPUBLISHED generation (immutable alongside its data,
    * like `_stats.json`). Never fails the commit: an absent sidecar
    * only costs pruning ("maybe"), never correctness, and an ingest
    * must not die because an index build did. Lenient column matching
    * (schema evolution may drop a configured column from one commit). */
  private def maybeAutoBlooms(spark: SparkSession, gen: String): Unit =
    try autoBloomConfig(spark).foreach { case (cols, ndv) =>
      GenBlooms.write(spark, s"$root/$gen", cols, ndv, strict = false)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"snaplake: auto-bloom build failed for $root/$gen " +
            s"(generation stays sidecar-less, never pruned): $e")
    }

  // ---------------------------------------------- auto compaction

  private def autoCompactPath = new org.apache.hadoop.fs.Path(
    s"$root/_autocompact.json")

  /** Table-level AUTO-compaction — the write-path companion of
    * [[enableAutoBlooms]] and the generalized form of the streaming
    * ledgers' every-N-batches compaction: once enabled, EVERY
    * publishing path — append/overwrite commits, streamed
    * micro-batches, and the merge/delete/optimize rewrites — checks
    * the small-generation tail and runs [[compactSmall]] when it has
    * accumulated `maxSmallGens` generations under `smallBytes` each.
    * (commitInitial is exempt: a one-generation table has no tail.)
    * A stream-written table then holds a bounded generation count with
    * no external maintenance job. The compaction publishes its own
    * commit AFTER the triggering one (the ingested data is durable
    * either way); losing a race to a concurrent writer just skips the
    * cycle — the next commit re-checks. Old versions still need
    * [[vacuum]] for space, as ever. */
  /** `sortCols`: carried into every auto-fold so a table maintained
    * with `optimize(sortCols)` keeps its clustering — without it the
    * folded tail would be rewritten UNSORTED, silently degrading
    * skipping effectiveness until the next full optimize. */
  def enableAutoCompact(spark: SparkSession, maxSmallGens: Int = 8,
      smallBytes: Long = 32L << 20, sortCols: Seq[String] = Seq.empty): Unit = {
    require(maxSmallGens >= 2, "auto-compact needs maxSmallGens >= 2")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("maxSmallGens", maxSmallGens)
    node.put("smallBytes", smallBytes)
    if (sortCols.nonEmpty) {
      val arr = node.putArray("sortCols")
      sortCols.foreach(arr.add)
    }
    writeControlFile(spark, autoCompactPath, "._autocompact.tmp",
      mapper.writeValueAsString(node))
  }

  def disableAutoCompact(spark: SparkSession): Unit =
    rawFs(spark).delete(autoCompactPath, false)

  /** The enabled auto-compact setting:
    * (maxSmallGens, smallBytes, sortCols). */
  def autoCompactConfig(spark: SparkSession): Option[(Int, Long, Seq[String])] =
    readControlJson(spark, autoCompactPath).flatMap { m =>
      val n = m.path("maxSmallGens").asInt(0)
      if (n < 2) None else {
        import scala.jdk.CollectionConverters._
        val sortCols = Option(m.get("sortCols")).toSeq
          .flatMap(_.elements().asScala.map(_.asText()))
        Some((n, m.path("smallBytes").asLong(32L << 20), sortCols))
      }
    }

  /** Best-effort post-commit compaction check for the auto tier. Never
    * fails the commit that triggered it: a compaction abort (racing
    * writer) or any other failure only defers folding to a later
    * commit. Called AFTER the triggering commit publishes — no commit
    * depends on it. Hot-path cost control: the config read is one
    * metadata probe; sizing only starts once the MANIFEST has at least
    * `maxSmallGens` generations (fewer total can't hold that many
    * smalls), and per-generation sizes come from the immutability cache
    * so steady state walks only the generations the last commit added.
    * Reentrancy guard: the fold's own publishRewrite fires this hook
    * again — the guard turns that inner call into a no-op instead of a
    * (terminating but wasteful) re-check. */
  private def maybeAutoCompact(spark: SparkSession): Unit = {
    if (SnapshotLake.inAutoCompact.get()) return
    try autoCompactConfig(spark).foreach { case (n, bytes, sortCols) =>
      val enoughGens = latestVersion(spark)
        .exists(v => dirsAt(spark, v).size >= math.max(2, n))
      if (enoughGens) {
        SnapshotLake.inAutoCompact.set(true)
        try compactSmall(spark, bytes,
          sortCols.map(org.apache.spark.sql.functions.col), minSmallGens = n)
        finally SnapshotLake.inAutoCompact.set(false)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"snaplake: auto-compact skipped this cycle for $root: $e")
    }
  }

  private def rawFs(spark: SparkSession): org.apache.hadoop.fs.FileSystem =
    hadoopFs(spark) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  // ------------------------------------------------ CHECK constraints

  private def constraintsPath = new org.apache.hadoop.fs.Path(
    s"$root/_constraints.json")

  /** Write-time CHECK constraints: named SQL boolean expressions every
    * committed row must satisfy (standard CHECK semantics — a row where
    * the expression is NULL passes). Administrative, not versioned:
    * they gate writes from the moment they are set. */
  def constraints(spark: SparkSession): Map[String, String] = {
    // control-file read goes through readControlJson — the shared pair
    // that owns the raw-filesystem (.crc hygiene) rationale; this method
    // had kept a hand-rolled copy of it (r13 review)
    import scala.jdk.CollectionConverters._
    readControlJson(spark, constraintsPath)
      .map(_.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)
  }

  def addConstraint(spark: SparkSession, name: String, sqlExpr: String): Unit =
    writeConstraints(spark, constraints(spark) + (name -> sqlExpr))

  def dropConstraint(spark: SparkSession, name: String): Unit =
    writeConstraints(spark, constraints(spark) - name)

  private def writeConstraints(spark: SparkSession,
      cs: Map[String, String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    cs.toSeq.sortBy(_._1).foreach { case (n, e) => node.put(n, e) }
    writeControlFile(spark, constraintsPath, "._constraints.tmp",
      mapper.writeValueAsString(node))
  }

  /** Atomic OVERWRITING publish of an administrative control file
    * (constraints, auto-bloom config), through the RAW filesystem (no
    * .crc sidecar — see the [[constraints]] read-side note).
    * Delete-then-rename would open a window where a concurrent commit's
    * validateGen sees NO file and validates against nothing — readers
    * must always observe either the old or the new file. FileContext's
    * OVERWRITE rename is atomic on HDFS but falls back to delete+rename
    * on the local fs, so local takes the POSIX ATOMIC_MOVE directly. */
  private def writeControlFile(spark: SparkSession,
      dst: org.apache.hadoop.fs.Path, tmpName: String,
      content: String): Unit = {
    val fsAll = hadoopFs(spark)
    val raw = rawFs(spark)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/$tmpName")
    val out = raw.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // the scheme-branched atomic move lives in AtomicOverwrite (r14) —
    // it was duplicated into GenPointer.swapPtr WITHOUT the local-fs
    // branch, which is exactly the drift a single implementation stops
    AtomicOverwrite.rename(
      spark.sparkContext.hadoopConfiguration, raw, tmp, dst)
    // a pre-raw writer may have left a checksum sidecar describing the
    // OLD content; it would poison any checksummed read of the new file
    fsAll match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem =>
        raw.delete(c.getChecksumFile(dst), false)
      case _ => ()
    }
  }

  /** Validate a freshly-written, still-unpublished generation against
    * the table's constraints by READING IT BACK (column-pruned to the
    * constraint columns): validating on disk rather than on the input
    * plan means the input executes exactly once (a streaming sink's
    * re-wrapped batch must not re-run its incremental plan) and what is
    * checked is literally what a reader would see. On violation the
    * generation is deleted and the commit never happens — constraint
    * enforcement and atomicity compose. */
  private def validateGen(spark: SparkSession, gen: String): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not, sum, when}
    val cs = constraints(spark)
    if (cs.isEmpty) return
    // a fileless generation (empty batch/delete-all) has nothing to
    // check — and schema inference over it would fail
    val hasFiles = hadoopFs(spark)
      .listStatus(new org.apache.hadoop.fs.Path(s"$root/$gen"))
      .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (!hasFiles) return
    // ANY failure from here on (violation, malformed constraint, parse
    // or analysis error) must clean up the unpublished generation —
    // nothing sweeps orphans later
    try {
      val raw = spark.read.parquet(s"$root/$gen")
      // A constraint referencing a column this generation lacks must be
      // evaluated under evolved-read semantics: such a column reads as
      // NULL everywhere, so the missing attributes are ADDED as NULL
      // literals and the constraint runs. "CHECK passes NULL" makes this
      // a vacuous pass ONLY for null-propagating expressions — `id IS
      // NOT NULL` over a missing `id` yields FALSE, and skipping it
      // would let a column-dropping append commit rows every reader sees
      // as violations. Only single-part names are materializable this
      // way (a NULL literal has no fields to extract); constraints over
      // missing STRUCT roots keep the documented vacuous pass.
      val cols = raw.columns.map(_.toLowerCase).toSet
      // one parse per constraint — refs are consulted several times below
      val refsByName: Map[String,
          Seq[org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute]] =
        cs.map { case (n, sql) =>
          n -> spark.sessionState.sqlParser.parseExpression(sql).collect {
            case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a
          }.toSeq
        }
      def refs(n: String) = refsByName(n)
      def missingStructRoots(n: String): Seq[String] = refs(n).collect {
        case a if a.nameParts.size > 1 &&
            !cols.contains(a.nameParts.head.toLowerCase) => a.nameParts.head
      }.distinct
      def missingSimple(n: String): Seq[String] = refs(n).collect {
        case a if a.nameParts.size == 1 &&
            !cols.contains(a.nameParts.head.toLowerCase) => a.nameParts.head
      }.distinct
      // a constraint whose only missing references are STRUCT roots keeps
      // the documented vacuous pass (a NULL literal has no fields to
      // extract, so evolved-read evaluation is impossible). But MIXING a
      // missing struct root with a missing single-part column must not
      // silently skip the whole constraint — that would bypass the very
      // IS-NOT-NULL gate evolved-read evaluation exists for. Refuse:
      // safer than a vacuous pass, and the error names the gap.
      cs.keys.toSeq.sorted.foreach { n =>
        if (missingStructRoots(n).nonEmpty && missingSimple(n).nonEmpty)
          throw new IllegalStateException(
            s"CHECK constraint '$n' (${cs(n)}) mixes missing nested " +
              s"columns (${missingStructRoots(n).mkString(",")}) with " +
              s"missing top-level columns (${missingSimple(n).mkString(",")})" +
              " — cannot be validated under evolved-read semantics; " +
              s"commit to $root refused")
      }
      val names = cs.keys.toSeq.sorted.filter(n => missingStructRoots(n).isEmpty)
      if (names.isEmpty) return
      val missing = names.flatMap(missingSimple).distinct
      val gdf = missing.foldLeft(raw)((df, c) => df.withColumn(c, lit(null)))
      // one aggregate pass counts violations of every constraint at
      // once; CHECK passes NULL: a violation is coalesce(expr, true) =
      // false
      val aggs = names.map(n => sum(when(
        not(coalesce(expr(cs(n)), lit(true))), 1L).otherwise(0L)).as(n))
      val row = gdf.agg(aggs.head, aggs.tail: _*).head()
      val broken = names.map(n => n -> row.getAs[Long](n)).filter(_._2 > 0)
      if (broken.nonEmpty)
        throw new IllegalStateException(
          broken.map { case (n, c) =>
            s"CHECK constraint '$n' (${cs(n)}) violated by $c row(s)"
          }.mkString("; ") + s" — commit to $root aborted")
    } catch {
      case scala.util.control.NonFatal(t) =>
        hadoopFs(spark).delete(
          new org.apache.hadoop.fs.Path(s"$root/$gen"), true)
        throw t
    }
  }

  /** Copy-on-write UPSERT: target rows whose key equals a source row's
    * key are replaced by that source row; source rows matching nothing
    * insert. The rewrite is scoped by the manifest stats: a generation
    * none of whose files' key envelopes intersect the source's key
    * envelope provably contains no match and CARRIES FORWARD into the
    * new commit untouched — on a 100 TB table where upserts land in the
    * recent key range, the rewrite touches the tail generations and the
    * commit re-references the rest, which is exactly a table format's
    * file-level MERGE scoping one level up. Generations without stats
    * (older writers) rewrite conservatively.
    *
    * Contract: source keys should be unique (a duplicated source key
    * inserts duplicates, same as repeated appends); null source keys
    * never match a target row and insert as-is. Publication is
    * optimistic WITHOUT rebase: a commit racing in between the snapshot
    * read and the claim makes the rewrite stale, so the merge aborts
    * with ConcurrentModificationException (cleaning up its generation)
    * instead of silently dropping the winner's rows — rerun to rebase.
    */
  def merge(source: DataFrame, keyCols: Seq[String]): Long =
    mergeTagged(source, keyCols, None, None)

  /** [[merge]] plus the optional streaming (queryId, batchId) marker in
    * the commit JSON — the same exactly-once handshake [[commitTagged]]
    * gives the append sink, extended to the MUTATING commit: a replayed
    * micro-batch upsert is detected by [[lastStreamBatchId]] >= its id
    * under the same query id and skipped whole by the sink
    * ([[graft.streaming.EventStreams.snaplakeUpsertSink]]). The marker
    * rides the one atomic commit-file claim, so "merged" and "recorded
    * as batch N" cannot come apart. */
  def mergeTagged(source: DataFrame, keyCols: Seq[String],
      batchId: Option[Long], queryId: Option[String]): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val mergeTag = batchId.map(b => s""""batchId":$b,""").getOrElse("") +
      queryId.map(q => s""""queryId":"$q",""").getOrElse("")
    val spark = source.sparkSession
    import org.apache.spark.sql.functions.{col, min, max}
    val base = latestVersion(spark).getOrElse(
      sys.error(s"merge into a never-committed lake: $root"))
    val dirs = dirsAt(spark, base)
    // the source plan is consumed by the envelope agg, both key joins,
    // the rewrite, and the changefeed — cache it so an expensive or
    // non-deterministic source executes ONCE and the committed table
    // cannot disagree with its own materialized changes
    val src = source.persist()
    try {
      // source key envelope: one tiny agg job, 2·|keys| scalars
      val aggs = keyCols.flatMap(k => Seq(min(col(k)).as(s"mn_$k"), max(col(k)).as(s"mx_$k")))
      val env = src.agg(aggs.head, aggs.tail: _*).collect()(0)
      val srcEnv: Map[String, (Any, Any)] = keyCols.flatMap { k =>
        (normScalar(env.getAs[Any](s"mn_$k")), normScalar(env.getAs[Any](s"mx_$k"))) match {
          case (Some(mn), Some(mx)) => Some(k -> (mn, mx))
          case _ => None // non-primitive key type or all-null: no envelope
        }
      }.toMap
      val srcKeys = src.select(keyCols.map(col): _*).distinct()
      // BLOOM tier of the scoping: when the distinct source key set is
      // small (bounded metadata collect, like every other collect here),
      // a generation whose every file's blooms reject every source key
      // tuple provably holds no match and carries forward even when its
      // ENVELOPE intersects — the case that matters on unsorted layouts,
      // where every file's envelope spans the whole key domain and the
      // envelope tier alone would rewrite everything for a 3-row upsert.
      // Tuples containing NULL match no target row and are dropped.
      // LAZY: the collect job runs only if some generation actually has
      // a sidecar (blooms are opt-in — most tables never pay this), and
      // the sidecar parse runs only if the key set turned out small
      lazy val keyTuples: Option[Seq[Seq[Any]]] = {
        val head = srcKeys.limit(SnapshotLake.BloomScopeCap + 1).collect()
        if (head.length > SnapshotLake.BloomScopeCap) None
        else Some(head.toSeq
          .map(r => keyCols.indices.map(i => r.get(i)).toSeq)
          .filterNot(_.contains(null)))
      }
      val conf = spark.sparkContext.hadoopConfiguration
      def bloomMayContain(gen: String): Boolean =
        // load FIRST (it answers absent AND version-stale sidecars with
        // one exists + parse), so the keyTuples collect job is forced
        // only when a usable sidecar actually exists
        GenBlooms.load(conf, s"$root/$gen") match {
          case None => true // no usable sidecar: no proof
          case Some(byFile) => keyTuples match {
            case None => true
            case Some(tuples) =>
              byFile.isEmpty || byFile.values.exists { colBlooms =>
                tuples.exists(t => keyCols.zip(t).forall { case (c, v) =>
                  // sidecar keys are lowercased — match Spark's
                  // case-insensitive resolution (GenBlooms.write)
                  colBlooms.get(c.toLowerCase) match {
                    case None => true // column not bloomed: unconstrained
                    case Some(b) => normScalar(v) match {
                      case None => true
                      case Some(n) => b.mightContain(n)
                    }
                  }
                })
              }
          }
        }
      // A key tuple containing NULL matches no target row (equi-join
      // semantics), so a source with NO fully-non-null key tuple —
      // empty frame, or every key null — provably touches nothing:
      // scope to zero generations and the merge degrades to a plain
      // append of the source. Without this, srcEnv comes back empty,
      // genMayContainKeys answers a conservative true for EVERY
      // generation, and an empty upstream frame triggers a silent
      // 100%-of-table rewrite to apply zero changes (r13 review). The
      // probe job only runs when the envelope is already empty (the
      // common path pays nothing: a non-empty envelope implies
      // non-null keys exist).
      val hasMatchableKey = srcEnv.size == keyCols.size || srcKeys
        .filter(keyCols.map(k => col(k).isNotNull)
          .reduce((a, b) => a && b))
        .limit(1).count() > 0
      def genInScope(gen: String): Boolean =
        hasMatchableKey &&
          genMayContainKeys(spark, gen, keyCols, srcEnv) &&
          bloomMayContain(gen)
      val (affected, untouched) = dirs.partition(genInScope)
      import org.apache.spark.sql.functions.lit
      // affected generations read under the SNAPSHOT's full schema
      // (missing columns null-filled), not bare mergeSchema over the
      // affected subset: under schema evolution the subset can predate
      // a key column entirely, and the key joins below would fail
      // analysis on an unresolved column — null-filled, such rows
      // simply match no source key, which is the correct semantics
      // (r13 review)
      val affectedDf = if (affected.isEmpty) None
        else Some(spark.read.schema(readAt(spark, base).schema)
          .parquet(affected.map(d => s"$root/$d"): _*))
      val keep = affectedDf.map(_.join(srcKeys, keyCols, "left_anti"))
      val rewritten = keep match {
        case Some(k) => k.unionByName(src, allowMissingColumns = true)
        case None => src
      }
      // row-level changefeed, materialized while we still know exactly
      // what changed: pre-images of replaced target rows as deletes,
      // every source row as an insert (an update is its pair)
      val deletes = affectedDf.map(
        _.join(srcKeys, keyCols, "left_semi")
          .withColumn(SnapshotLake.ChangeTypeCol, lit("delete")))
      val inserts = src.withColumn(SnapshotLake.ChangeTypeCol, lit("insert"))
      val changes = deletes match {
        case Some(d) => d.unionByName(inserts, allowMissingColumns = true)
        case None => inserts
      }
      // rebase-across check = the scoping check (envelope AND bloom
      // tiers): a racing commit's new generation is safe to carry
      // forward iff it provably holds none of this merge's keys
      publishRewrite(spark, base, untouched, rewritten, Some(changes),
        mayOverlapScope = genInScope, op = "merge", tag = mergeTag)
    } finally src.unpersist()
  }

  /** Copy-on-write DELETE of rows matching `predicate`, scoped the same
    * way as [[merge]]: a generation none of whose files' envelopes can
    * satisfy the predicate ([[graft.sources.StatsPruning]] — the same
    * evaluator the read path prunes with) carries forward untouched;
    * the rest rewrite keeping only non-matching rows. Returns the new
    * version, or the current one unchanged when stats prove nothing
    * matches anywhere (a free no-op). Same optimistic-abort publication
    * contract as merge. */
  def delete(spark: SparkSession, predicate: org.apache.spark.sql.Column): Long = {
    val base = latestVersion(spark).getOrElse(
      sys.error(s"delete from a never-committed lake: $root"))
    val dirs = dirsAt(spark, base)
    // resolve the predicate against the snapshot's schema so the stats
    // evaluator sees bound AttributeReferences — from the OPTIMIZED plan,
    // where implicit casts on literals have been constant-folded (the
    // analyzed plan's Cast(lit) wrappers would read as "unknown shape"
    // and defeat scoping). A predicate the optimizer eliminates entirely
    // (folds to true/false) leaves no Filter node; fall back to
    // rewriting everything, which is correct just not scoped.
    val snapshot = readAt(spark, base)
    val cond = snapshot.filter(predicate).queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.headOption
    val conf = spark.sparkContext.hadoopConfiguration
    def genMayMatch(gen: String): Boolean = cond match {
      case None => true
      case Some(c) =>
        val envMay = GenStats.load(conf, s"$root/$gen") match {
          case Some(stats) =>
            stats.isEmpty || stats.values.exists(fileSt =>
              graft.sources.StatsPruning.mayMatch(c, fileSt))
          case None => true // statless: rewrite conservatively
        }
        // bloom tier, same evaluator AND the same equality gate the read
        // path uses: only a predicate containing an equality shape can
        // ever produce a bloom proof, so a pure range delete must not
        // parse the file-sized sidecars at all
        val hasEq = graft.sources.BloomPruning.hasEqualityShape(c)
        envMay && (!hasEq || (GenBlooms.load(conf, s"$root/$gen") match {
          case None => true
          case Some(byFile) => byFile.isEmpty || byFile.values.exists(
            bs => graft.sources.BloomPruning.mayMatch(c, bs))
        }))
    }
    val affected = dirs.filter(genMayMatch)
    if (affected.isEmpty) return base
    val untouched = dirs.filterNot(affected.contains)
    // SQL DELETE removes rows where the predicate is TRUE; NULL keeps
    // the row — so the keep-filter is NOT(coalesce(p, false)), not !p.
    // Read under the snapshot's full schema (missing columns
    // null-filled): under schema evolution the affected subset can
    // predate a predicate column, and mergeSchema over the subset alone
    // would make the filter fail analysis; null-filled, the predicate
    // evaluates NULL there and the rows are kept — correct (r13 review)
    val affectedDf = spark.read.schema(snapshot.schema)
      .parquet(affected.map(d => s"$root/$d"): _*)
    val hit = org.apache.spark.sql.functions.coalesce(predicate,
      org.apache.spark.sql.functions.lit(false))
    val changes = affectedDf.filter(hit).withColumn(
      SnapshotLake.ChangeTypeCol, org.apache.spark.sql.functions.lit("delete"))
    // same evaluator scopes the rewrite AND gates rebase-across
    publishRewrite(spark, base, untouched, affectedDf.filter(!hit),
      Some(changes), mayOverlapScope = genMayMatch, op = "delete")
  }

  /** Could generation `gen` hold a row whose every key column falls in
    * the source envelope? Missing stats at any level answer yes. */
  private def genMayContainKeys(spark: SparkSession, gen: String,
      keyCols: Seq[String], srcEnv: Map[String, (Any, Any)]): Boolean = {
    if (srcEnv.isEmpty) return true
    GenStats.load(spark.sparkContext.hadoopConfiguration, s"$root/$gen") match {
      case None => true
      case Some(stats) if stats.isEmpty => true
      case Some(stats) => stats.values.exists { fileSt =>
        keyCols.forall { k =>
          srcEnv.get(k) match {
            case None => true
            case Some((mn, mx)) => fileSt.cols.get(k) match {
              case Some(cs) => (cs.min, cs.max) match {
                case (Some(a), Some(b)) if sameKind(a, mn) =>
                  val ord = GenStats.ordering(cs.tag)
                  ord.lteq(a, mx) && ord.gteq(b, mn)
                // absent min/max only proves non-match when the column
                // is provably all-NULL (nulls == rows): parquet omits
                // min/max for NaN-containing and oversized values while
                // still writing counts, and those files may hold real
                // matching keys
                case (None, None) =>
                  !cs.nulls.exists(n => fileSt.rows >= 0 && n == fileSt.rows)
                case _ => true
              }
              case None => true
            }
          }
        }
      }
    }
  }

  private def sameKind(a: Any, b: Any): Boolean = (a, b) match {
    case (_: Long, _: Long) | (_: Double, _: Double) |
         (_: String, _: String) | (_: Boolean, _: Boolean) => true
    case _ => false
  }

  /** External row value → the stats value space (None: unsupported).
    * Doubles fold -0.0 → 0.0 like every other boundary into that space
    * ([[GenStats.foldZero]]). */
  private def normScalar(v: Any): Option[Any] = v match {
    case null => None
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case f: Float => Some(GenStats.foldZero(f.toDouble))
    case d: Double => Some(GenStats.foldZero(d))
    case b: Boolean => Some(b)
    case s: String => Some(s)
    case _ => None
  }

  /** OPTIMIZE: rewrite the whole current snapshot as ONE clustered
    * generation — range-partitioned and sorted on `sortCols` into
    * `numFiles` files — and commit it. Clustering is what turns the
    * manifest stats from bookkeeping into skipping: after appends land
    * rows in arrival order, every file's envelope spans the whole key
    * domain and nothing prunes; after optimize, envelopes are disjoint
    * and a range predicate schedules only its slice. Also the
    * small-file compaction pass for a stream-written table (one commit
    * per micro-batch accumulates O(batches) generations; optimize
    * collapses them and a following [[vacuum]] reclaims the space).
    *
    * The table content is unchanged — but a commit racing into the
    * publish window would be erased by the full rewrite, so optimize
    * carries the same abort contract as [[merge]]. */
  def optimize(spark: SparkSession, numFiles: Int,
      sortCols: Seq[org.apache.spark.sql.Column]): Long = {
    val base = latestVersion(spark).getOrElse(
      sys.error(s"optimize of a never-committed lake: $root"))
    val snap = readAt(spark, base)
    val clustered =
      if (sortCols.isEmpty) snap.repartition(numFiles)
      else snap.repartitionByRange(numFiles, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
    // optimize changes the layout, not the table: materialize an EMPTY
    // changefeed so CDF readers see "no rows changed", not the
    // file-level restatement the manifest delta would imply.
    // mayOverlapScope=false: a layout rewrite claims nothing about row
    // content, so racing APPEND generations always carry forward
    // (rewrites of the consumed snapshot still abort via the consumed
    // check)
    publishRewrite(spark, base, Seq.empty, clustered,
      Some(emptyChanges(snap)), mayOverlapScope = _ => false,
      op = "optimize")
  }

  /** [[optimize]] on the z-order curve of two numeric keys
    * ([[graft.ops.Layout.zOrderCluster]]): every rewritten file gets a
    * tight envelope on BOTH keys, so single-column predicates on either
    * prune — the OPTIMIZE ZORDER maintenance pass. */
  def optimizeZOrder(spark: SparkSession,
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      numFiles: Int, bitsPerKey: Int = 21): Long =
    optimizeZOrderN(spark, Seq(a, b), numFiles, bitsPerKey)

  /** [[optimizeZOrder]] at arbitrary arity
    * ([[graft.ops.Layout.zOrderClusterN]]): n keys share the curve,
    * n·bitsPerKey ≤ 63. */
  def optimizeZOrderN(spark: SparkSession,
      keys: Seq[org.apache.spark.sql.Column],
      numFiles: Int, bitsPerKey: Int = 21): Long = {
    val base = latestVersion(spark).getOrElse(
      sys.error(s"optimize of a never-committed lake: $root"))
    val snap = readAt(spark, base)
    publishRewrite(spark, base, Seq.empty,
      graft.ops.Layout.zOrderClusterN(snap, keys, numFiles, bitsPerKey),
      Some(emptyChanges(snap)), mayOverlapScope = _ => false,
      op = "zorder")
  }

  /** INCREMENTAL compaction: collapse only generations smaller than
    * `maxBytes` into one sorted generation, carrying larger ones
    * forward by reference. This is the steady-state maintenance loop
    * for a stream-written table — each micro-batch commit adds one
    * small generation, and periodic compactSmall folds the accumulated
    * tail WITHOUT rewriting the big compacted body the way a full
    * [[optimize]] would (on a 100 TB table, rewriting everything per
    * maintenance pass is the difference between minutes and a day).
    * Returns the current version unchanged while fewer than
    * `max(2, minSmallGens)` small generations exist (the auto tier
    * passes its threshold through `minSmallGens`). Same abort-on-race
    * and empty-changefeed contract as optimize. */
  def compactSmall(spark: SparkSession, maxBytes: Long,
      sortCols: Seq[org.apache.spark.sql.Column],
      minSmallGens: Int = 2): Long = {
    val base = latestVersion(spark).getOrElse(
      sys.error(s"compact of a never-committed lake: $root"))
    val fs = hadoopFs(spark)
    val dirs = dirsAt(spark, base)
    // one recursive listing per generation, MEMOIZED on (root, gen):
    // generations are immutable, so a size never changes once measured
    // — with auto-compact checking per commit, the steady state walks
    // only the generations the last commit added, not the whole (ever-
    // growing) big body
    val sizes = dirs.map(d => d -> SnapshotLake.genSizes.computeIfAbsent(
      (root, d), _ => fs.getContentSummary(
        new org.apache.hadoop.fs.Path(s"$root/$d")).getLength)).toMap
    val (small, big) = dirs.partition(d => sizes(d) < maxBytes)
    if (small.size < math.max(2, minSmallGens)) return base
    val tailBytes = small.map(sizes).sum
    // target file count keeps outputs at ~maxBytes so a later pass sees
    // them as "big" and stops re-rewriting the same rows
    val numFiles = math.max(1L, (tailBytes + maxBytes - 1) / maxBytes).toInt
    val tail = spark.read.option("mergeSchema", "true")
      .parquet(small.map(d => s"$root/$d"): _*)
    val clustered =
      if (sortCols.isEmpty) tail.coalesce(numFiles)
      else tail.repartitionByRange(numFiles, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
    publishRewrite(spark, base, big, clustered, Some(emptyChanges(tail)),
      mayOverlapScope = _ => false, op = "compact")
  }

  private def emptyChanges(snap: DataFrame): DataFrame =
    snap.limit(0).withColumn(SnapshotLake.ChangeTypeCol,
      org.apache.spark.sql.functions.lit("insert"))

  /** Write `rewritten` as a new generation and claim the next version
    * referencing `untouched ++ newGen`. Loses a race → REBASE when the
    * winner's commits are provably disjoint from this mutation's scope,
    * abort otherwise (cleanup, ConcurrentModificationException) — the
    * Delta-style conflict check one level up, at generation granularity:
    *
    *  - every generation this rewrite CONSUMED (`base` manifest minus
    *    `untouched`) must still be referenced by the new head — a winner
    *    that rewrote or dropped one has invalidated our rewrite;
    *  - every generation the winners ADDED must satisfy
    *    `!mayOverlapScope(gen)` — its stats envelope provably holds no
    *    row this mutation's key envelope / predicate could touch (the
    *    SAME evaluator that scoped the rewrite, so "carried forward
    *    untouched" and "safe to rebase across" cannot drift).
    *
    * A valid rebase re-claims with manifest = (head's dirs minus the
    * consumed generations) + our generation: winners' disjoint work is
    * carried forward BY REFERENCE, and both writers land — without this,
    * every concurrent pair of disjoint merges serializes through abort
    * and rerun, which at 100 TB (many independent upsert streams over
    * disjoint key ranges) serializes the whole write path. Bounded
    * retries; the materialized `_cdf` stays correct under rebase because
    * the carried generations provably contain no scoped rows. */
  private def publishRewrite(spark: SparkSession, base: Long,
      untouched: Seq[String], rewritten: DataFrame,
      changes: Option[DataFrame] = None,
      mayOverlapScope: String => Boolean = _ => true,
      op: String = "rewrite",
      tag: String = ""): Long = {
    val fs = hadoopFs(spark)
    val baseDirs = dirsAt(spark, base)
    val consumed = baseDirs.filterNot(untouched.contains).toSet
    val gen = s"gen-${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
    rewritten.write.parquet(s"$root/$gen")
    validateGen(spark, gen) // a merge source can violate like any ingest
    // the changefeed rides INSIDE the writer-unique generation (a
    // `_`-prefixed subdir, invisible to data reads), so it publishes
    // atomically with the commit that references the generation and is
    // cleaned up with it on abort — no separate claim to race
    changes.foreach(_.write.parquet(s"$root/$gen/${SnapshotLake.CdfDirName}"))
    GenStats.write(spark.sparkContext.hadoopConfiguration, s"$root/$gen")
    maybeAutoBlooms(spark, gen)
    fs.mkdirs(new org.apache.hadoop.fs.Path(commitsDir))
    onBeforePublish()
    def abort(detail: String): Nothing = {
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$gen"), true)
      throw new java.util.ConcurrentModificationException(
        s"lake $root advanced past version $base during the rewrite " +
          s"($detail); rerun the merge/delete to rebase on the new snapshot")
    }
    var attemptBase = base
    var carried = untouched
    var attempts = 0
    while (true) {
      val next = attemptBase + 1
      // "rewrite":true marks this commit as the mutation that OWNS its
      // generation's _cdf — the changefeed walker only reads _cdf under
      // this flag (a restore re-referencing the generation stays a
      // restatement)
      val json = (carried :+ gen).map("\"" + _ + "\"")
        .mkString(
          s"""{"version":$next,"op":"$op",$tag"rewrite":true,"dirs":[""",
          ",", "]}")
      val tmp = new org.apache.hadoop.fs.Path(s"$commitsDir/.tmp-$gen-$next")
      val out = fs.create(tmp, true)
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      try {
        claimVersionFile(spark, fs, tmp,
          new org.apache.hadoop.fs.Path(f"$commitsDir/v$next%08d.json"))
        // merge/delete/optimize commits can also grow the small tail —
        // the auto tier covers EVERY publishing path, not just appends
        // (the reentrancy guard no-ops this inside a fold's own publish)
        maybeAutoCompact(spark)
        return next
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          fs.delete(tmp, false)
          attempts += 1
          if (attempts >= 5) abort("rebase retries exhausted")
          val head = latestVersion(spark).getOrElse(0L)
          val headDirs = dirsAt(spark, head)
          if (!consumed.forall(headDirs.contains))
            abort("a racing commit rewrote a generation this mutation read")
          val added = headDirs.filterNot(baseDirs.contains)
          if (added.exists(mayOverlapScope))
            abort("a racing commit added rows inside this mutation's scope")
          attemptBase = head
          carried = headDirs.filterNot(consumed.contains)
      }
    }
    sys.error("unreachable")
  }

  /** RESTORE: make the table's next version identical to `version` by
    * publishing a manifest that references that version's generations —
    * a metadata-only commit, no data moves (generations are immutable,
    * so re-referencing them is free). History is preserved: the bad
    * versions stay time-travelable until vacuumed, and because the new
    * head references the restored generations, vacuum keeps them live.
    * The changefeed across a restore surfaces as the file-level
    * restatement the manifest diff implies. Optimistic retry like any
    * append: losing the race re-reads the target version (unchanged)
    * and re-claims the next number. */
  def restore(spark: SparkSession, version: Long): Long = {
    val fs = hadoopFs(spark)
    val dirs = dirsAt(spark, version) // throws if vacuumed
    retryClaim(spark, fs, extraTag = "\"op\":\"restore\",") { _ =>
      // restore uniquely re-references generations the current head may
      // NOT reference, which vacuum could be deleting concurrently —
      // the one writer/maintenance race the generation-immutability
      // protocol doesn't cover. Re-checking just before each claim
      // shrinks the window to the claim itself; like other table
      // formats, restore and vacuum are a single-maintainer pair and
      // must not run concurrently.
      dirs.foreach { d =>
        require(fs.exists(new org.apache.hadoop.fs.Path(s"$root/$d")),
          s"generation $d of version $version was vacuumed mid-restore")
      }
      dirs
    }
  }

  /** The optimistic write-tmp → claim → retry loop shared by every
    * versioned publication that re-bases on the winner: `dirsFor(next)`
    * recomputes the manifest against the re-read latest version, the
    * tmp name embeds a writer-unique token (two writers colliding on a
    * tmp path would turn the loser's retryable claim race into a
    * spurious failure), and losing the claim deletes the tmp and goes
    * again. `extraTag` carries optional commit-JSON fields (batch/query
    * markers, the rewrite flag), already comma-terminated. */
  private def retryClaim(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, extraTag: String)(
      dirsFor: Long => Seq[String]): Long = {
    val writer = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    fs.mkdirs(new org.apache.hadoop.fs.Path(commitsDir))
    var published = -1L
    while (published < 0) {
      val next = latestVersion(spark).getOrElse(0L) + 1
      val json = dirsFor(next).map("\"" + _ + "\"")
        .mkString(s"""{"version":$next,$extraTag"dirs":[""", ",", "]}")
      val tmp = new org.apache.hadoop.fs.Path(s"$commitsDir/.tmp-$writer-$next")
      val out = fs.create(tmp, true)
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      try {
        claimVersionFile(spark, fs, tmp,
          new org.apache.hadoop.fs.Path(f"$commitsDir/v$next%08d.json"))
        published = next
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          fs.delete(tmp, false)
      }
    }
    published
  }

  /** Row-level changes between two committed versions: what v2 inserted
    * (rows in v2 not in v1) and deleted (the reverse), with EXCEPT ALL
    * multiplicity — an update surfaces as its delete+insert pair, and a
    * row duplicated twice in v2 but once in v1 diffs as one insert.
    *
    * This is the AUDIT form of change data (compare any two retained
    * versions, at the cost of shuffling both snapshots on all columns);
    * the INCREMENTAL form — following appends as they commit, reading
    * only each commit's delta — is the streaming source
    * ([[graft.sources.SnapLakeStreamSource]]). At 100 TB you tail the
    * stream for the changefeed and reach for diff to reconcile or
    * repair, same division of labor as a table format's CDF vs a
    * snapshot compare. */
  def diff(spark: SparkSession, v1: Long, v2: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // align both snapshots on the UNION schema (null-filled) before
    // exceptAll: the lake's headline feature is schema-evolving appends,
    // and exceptAll demands identical column counts — unaligned, the
    // audit tool threw exactly when an evolved table needed reconciling
    // (r13 review). Null-filling is also the honest diff semantics: a
    // pre-evolution row equals its post-evolution null-extended self.
    val (sa, sb) = (readAt(spark, v1).schema, readAt(spark, v2).schema)
    val names = (sa.fieldNames ++
      sb.fieldNames.filterNot(sa.fieldNames.contains)).toSeq
    def aligned(df: DataFrame): DataFrame = {
      val have = df.schema.fieldNames.toSet
      val all = names.map { n =>
        if (have.contains(n)) col(n)
        else {
          val f = sb.fields.find(_.name == n)
            .getOrElse(sa.fields.find(_.name == n).get)
          lit(null).cast(f.dataType).as(n)
        }
      }
      df.select(all: _*)
    }
    val a = aligned(readAt(spark, v1))
    val b = aligned(readAt(spark, v2))
    b.exceptAll(a).withColumn("op", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("op", lit("delete")))
  }

  /** Row-level CHANGEFEED for versions (fromV, toV]: every change row
    * tagged `_change_type` (insert/delete; an update is its pair) and
    * `_commit_version`. Three cost tiers, cheapest wins per version:
    *
    *  - APPEND commits emit their new generations' rows as inserts —
    *    pure manifest arithmetic, no extra storage, no diffing.
    *  - MERGE/DELETE rewrites read the row-level changes the mutation
    *    MATERIALIZED while it still knew them (`_cdf/` inside the
    *    rewrite generation — atomic with the commit, sized by the rows
    *    actually changed, never by the table). OPTIMIZE materializes an
    *    empty feed: layout changed, content did not.
    *  - Blind OVERWRITE commits have no change knowledge to materialize;
    *    they surface as the file-level restatement the manifest implies
    *    (all previous rows delete, all new rows insert) — the honest
    *    semantics of a table rewritten wholesale.
    *
    * Contrast [[diff]]: that SHUFFLES both snapshots to reconstruct
    * changes after the fact (audit tool); the changefeed only ever reads
    * change-sized data (pipeline tool). Vacuumed manifests inside the
    * range fail fast, like any table-format CDF read past retention. */
  def changesBetween(spark: SparkSession, fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(fromV < toV, s"need fromV < toV, got ($fromV, $toV]")
    val baseSchema = readAt(spark, toV).schema
    val withChange = org.apache.spark.sql.types.StructType(
      baseSchema.fields :+ org.apache.spark.sql.types.StructField(
        SnapshotLake.ChangeTypeCol, org.apache.spark.sql.types.StringType))
    def ordered(df: DataFrame, v: Long): DataFrame =
      df.select(baseSchema.fieldNames.map(col).toSeq :+
        col(SnapshotLake.ChangeTypeCol): _*)
        .withColumn(SnapshotLake.CommitVersionCol, lit(v))
    val frames = walkChanges(spark, fromV, toV,
      manifestAt = v => dirsAt(spark, v), // throws once vacuumed: fail fast
      readRows = paths => spark.read.schema(baseSchema).parquet(paths: _*),
      readCdfRows = p => spark.read.schema(withChange).parquet(p))
      .map { case (v, df) => ordered(df, v) }
    frames.reduceOption(_.unionByName(_)).getOrElse(
      ordered(readAt(spark, toV).limit(0)
        .withColumn(SnapshotLake.ChangeTypeCol, lit("")), toV).limit(0))
  }

  /** The changefeed's per-version walk, shared by the batch reader
    * ([[changesBetween]]) and the streaming source's `readChangeFeed`
    * mode so the tier logic cannot drift between them. For each version
    * in (fromV, toV] it classifies the manifest delta — materialized
    * `_cdf/` (rewrites), new directories as inserts, dropped directories
    * as deletes — and delegates frame construction (batch vs streaming
    * relations) and missing-manifest policy to the caller. Returned
    * frames carry [[SnapshotLake.ChangeTypeCol]]; version tagging and
    * projection stay caller-side. */
  private[graft] def walkChanges(spark: SparkSession, fromV: Long, toV: Long,
      manifestAt: Long => Seq[String],
      readRows: Seq[String] => DataFrame,
      readCdfRows: String => DataFrame): Seq[(Long, DataFrame)] = {
    import org.apache.spark.sql.functions.lit
    val fs = hadoopFs(spark)
    ((fromV + 1) to toV).flatMap { v =>
      // version 0 is the empty pre-table
      val prev = if (v == 1) Set.empty[String] else manifestAt(v - 1).toSet
      val cur = manifestAt(v)
      val newDirs = cur.filterNot(prev)
      val dropped = (prev -- cur.toSet).toSeq.sorted
      // the `_cdf/` read is gated on the COMMIT being a rewrite, not
      // just on the directory carrying `_cdf/`: a restore re-references
      // an old rewrite generation, and reading its stale change rows
      // here would feed CDC consumers the original mutation's changes
      // (or optimize's empty feed) instead of the restore's restatement
      val materialized = newDirs match {
        case Seq(g) if commitIsRewrite(spark, v) && fs.exists(
            new org.apache.hadoop.fs.Path(
              s"$root/$g/${SnapshotLake.CdfDirName}")) =>
          Some(readCdfRows(s"$root/$g/${SnapshotLake.CdfDirName}"))
        case _ => None
      }
      materialized match {
        case Some(c) => Seq(v -> c)
        case None =>
          val ins = if (newDirs.isEmpty) None else Some(
            readRows(newDirs.map(d => s"$root/$d"))
              .withColumn(SnapshotLake.ChangeTypeCol, lit("insert")))
          val del = if (dropped.isEmpty) None else Some(
            readRows(dropped.map(d => s"$root/$d"))
              .withColumn(SnapshotLake.ChangeTypeCol, lit("delete")))
          (ins.toSeq ++ del.toSeq).map(v -> _)
      }
    }
  }

  /** Drop generation directories not referenced by the newest
    * `retainLast` commits, then drop the older commit files — bounded
    * time travel, like a table format's VACUUM/expire-snapshots.
    * Readers of vacuumed versions fail fast on their next listing. */
  def vacuum(spark: SparkSession, retainLast: Int): Unit = {
    require(retainLast >= 1, "must retain at least the latest snapshot")
    val fs = hadoopFs(spark)
    val all = versions(spark)
    val (drop, keep) = all.splitAt(math.max(0, all.size - retainLast))
    vacuumSplit(spark, fs, drop, keep)
  }

  /** [[vacuum]] by AGE: drop versions whose commit published before
    * `cutoffMillis` (the commit file's mtime — same clock
    * [[versionAt]] travels by, so "vacuum older than X" and
    * "timestampAsOf X" stay consistent). The newest version always
    * survives regardless of age: a table never vacuums itself empty. */
  def vacuumOlderThan(spark: SparkSession, cutoffMillis: Long): Unit = {
    val fs = hadoopFs(spark)
    val all = versions(spark)
    if (all.isEmpty) return
    val old = all.dropRight(1).filter { v =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(
        f"$commitsDir/v$v%08d.json")).getModificationTime < cutoffMillis
    }
    // age-expired versions must form a prefix: a young commit below an
    // old one would leave a manifest hole readers can't distinguish
    // from corruption, so stop at the first survivor
    val drop = all.takeWhile(old.contains)
    vacuumSplit(spark, fs, drop, all.drop(drop.size))
  }

  private def vacuumSplit(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      drop: Seq[Long], keep: Seq[Long]): Unit = {
    if (drop.nonEmpty) {
      val live = keep.flatMap(v => dirsAt(spark, v)).toSet
      // delete only generations the DROPPED commits reference and no kept
      // commit does — never sweep unreferenced gen dirs wholesale: an
      // unreferenced dir may be a concurrent committer's in-flight
      // generation that simply has not published its commit file yet
      val dead = drop.flatMap(v => dirsAt(spark, v)).toSet -- live
      // commit files BEFORE data: a crash between the two loops then
      // leaves only orphaned (unreferenced, never-swept) gen dirs — the
      // class's documented harmless state. The reverse order would leave
      // listed commits whose data is gone, so readAt(v) passes its
      // commit-exists require and then fails at evaluation (or silently
      // reads a partial snapshot if some of v's dirs survived).
      drop.foreach(v => fs.delete(
        new org.apache.hadoop.fs.Path(f"$commitsDir/v$v%08d.json"), false))
      dead.foreach(d => fs.delete(
        new org.apache.hadoop.fs.Path(s"$root/$d"), true))
    }
  }

  /** Build `_blooms.json` bloom sidecars for `cols` in every generation
    * of the LATEST snapshot that lacks one — the opt-in point-lookup
    * skipping tier ([[GenBlooms]]): min/max envelopes cannot prune
    * `key = x` on a high-cardinality unsorted key (every file's
    * envelope spans the domain), a bloom prunes it to zero files.
    * Costs one columnar scan per uncovered generation; generations are
    * immutable, so a sidecar never goes stale and incremental calls
    * only touch generations newer appends created. Sizing:
    * ~10·`expectedNdvPerFile` bits per (file, column) for ~1% false
    * positives — a false positive only costs an extra file read, never
    * correctness. */
  def computeBlooms(spark: SparkSession, cols: Seq[String],
      expectedNdvPerFile: Int = 100000): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    latestVersion(spark).foreach { v =>
      dirsAt(spark, v).foreach { gen =>
        val genPath = s"$root/$gen"
        val hasFiles = hadoopFs(spark)
          .listStatus(new org.apache.hadoop.fs.Path(genPath))
          .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        if (hasFiles && GenBlooms.load(conf, genPath).isEmpty)
          GenBlooms.write(spark, genPath, cols, expectedNdvPerFile)
      }
    }
  }

  /** Backfill `_stats.json` for every generation of the LATEST snapshot
    * whose sidecar is absent or format-stale (pre-v2 sidecars read as
    * absent under the [[GenStats.FormatVersion]] gate) — the stats
    * counterpart of [[computeBlooms]], recovering envelope pruning on
    * historical generations after an upgrade without rewriting any
    * data. Pure footer I/O: min/max/null-count already live in the
    * parquet footers, so cost is a few KB of metadata per file. */
  def computeStats(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    latestVersion(spark).foreach { v =>
      dirsAt(spark, v).foreach { gen =>
        val genPath = s"$root/$gen"
        val hasFiles = hadoopFs(spark)
          .listStatus(new org.apache.hadoop.fs.Path(genPath))
          .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        if (hasFiles && GenStats.load(conf, genPath).isEmpty)
          GenStats.write(conf, genPath)
      }
    }
  }

  /** Sweep ORPHANED generations: `gen-*` directories no surviving commit
    * references AND whose mtime is before the ABSOLUTE instant
    * `cutoffMillis` (epoch millis — the same clock and convention as
    * [[vacuumOlderThan]]; pass `System.currentTimeMillis() - retention`,
    * NEVER a bare retention duration, which would silently sweep
    * nothing — and never a raw `currentTimeMillis()`, which would sweep
    * a concurrent writer's seconds-old unpublished generation).
    * [[vacuum]] deliberately deletes only generations the dropped
    * commits referenced, so a crash between a data write and its commit
    * claim (or a failed _cdf/_stats publish) strands a directory
    * forever — an unbounded storage leak on a long-lived table. The age
    * guard (directory mtime vs a cutoff a sane retention puts hours in
    * the past) is what keeps this safe against the race vacuum's
    * comment warns about: an in-flight writer's unpublished generation
    * is by construction younger than any sane retention horizon, while
    * a crash orphan only ages. Same single-maintainer contract as
    * vacuum/restore. */
  def vacuumOrphans(spark: SparkSession, cutoffMillis: Long): Unit = {
    val fs = hadoopFs(spark)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) return
    val live = versions(spark).flatMap(v => dirsAt(spark, v)).toSet
    fs.listStatus(rootPath).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("gen-") && !live.contains(name)
          && st.getModificationTime < cutoffMillis)
        fs.delete(st.getPath, true)
    }
  }
}
