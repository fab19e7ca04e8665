package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The landing zone: schema-evolving parquet data + saved-URL ledger +
  * resume diff — the reference's crawl lifecycle (S9/S10/T1/T2,
  * app.js:333-482) upgraded from at-least-once to effectively-once.
  *
  * Reference mechanism → here:
  *  - ALTER TABLE ADD COLUMN per new spec key (app.js:365-375) →
  *    parquet `mergeSchema` union at read time; writes just append.
  *  - `_pN` 150-column part tables (app.js:333-363) → gone (columnar).
  *  - `_saved_list` ledger appended AFTER data lands (app.js:448-453,
  *    duplicate-row risk on crash) → same write order, but reads dedup on
  *    `srcUrl` keep-first, making replays invisible (effectively-once).
  *  - resume diff `source \ saved` (app.js:457-482, O(n·m) nested loop) →
  *    hash left-anti join.
  */
class SpecLake(root: String) {
  private val dataPath = s"$root/records"
  private val ledgerPath = s"$root/saved_list"

  /** Land a batch of normalized records, then append its URLs to the
    * ledger (same data-then-ledger order as the reference; the read-side
    * dedup makes the crash window harmless). Each row is stamped with
    * its landing time — the arrival order [[read]]'s keep-FIRST
    * resolution needs (without it, dropDuplicates picked an arbitrary
    * row per srcUrl, so a crash-window re-crawl that landed DIFFERENT
    * page content made successive reads nondeterministic; r13 review). */
  def append(records: DataFrame): Unit = {
    records.withColumn("_landed_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(dataPath)
    records.select(col("srcUrl").as("url"))
      .write.mode(SaveMode.Append).parquet(ledgerPath)
  }

  /** Read back with schemas merged across appends and replay-duplicates
    * collapsed — first write per srcUrl wins, like the ledger intends,
    * DETERMINISTICALLY: earliest `_landed_at` (rows from before the
    * stamp upgrade read as null = oldest), same-instant ties broken on
    * the row's content hash. Window groups are per-srcUrl (a handful of
    * replay rows at most — bounded, never Zipf-hot). */
  def read(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read.option("mergeSchema", "true").parquet(dataPath)
    val all =
      if (raw.columns.contains("_landed_at")) raw
      else raw.withColumn("_landed_at", lit(null).cast("timestamp"))
    val payload = all.columns.filterNot(Set("_landed_at")).sorted
    val w = Window.partitionBy(col("srcUrl"))
      .orderBy(col("_landed_at").asc_nulls_first,
        xxhash64(to_json(struct(payload.map(col): _*))))
    all.withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
      .drop("_rk", "_landed_at")
  }

  /** The ledger probe goes through the Hadoop FileSystem API so the lake
    * root can live on any supported store (local, HDFS, s3a, ...) —
    * `java.io.File` would silently report "missing" for every non-local
    * root and make pending() re-crawl the world. */
  def savedUrls(spark: SparkSession): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.parquet(ledgerPath).distinct()
    else
      spark.emptyDataFrame.select(lit("").as("url")).limit(0)
  }

  /** Resume diff: frontier URLs not yet saved (J1; anti-join replaces the
    * reference's quadratic `includes` scan, app.js:479). */
  def pending(frontier: DataFrame): DataFrame = {
    val saved = savedUrls(frontier.sparkSession)
    frontier
      .filter(col("url").isNotNull && col("url") =!= "")
      .distinct()
      .join(saved, Seq("url"), "left_anti")
  }
}

object SpecLake {

  /** Physical compat WRITER for the reference's `_pN` chunked layout
    * (app.js:333-363: MySQL's column cap forces the crawler to shard
    * wide spec tables into 150-column part tables `name`, `name_p1`,
    * `name_p2`, ...). SURVEY §2.1 calls that chunking an
    * anti-optimization to DELETE under a columnar store — parquet
    * prunes columns natively, so the lake keeps ONE wide table — but a
    * migration needs to hand the legacy layout back to consumers that
    * still expect it. This materializes exactly that: part directories
    * `p0..pN` of at most `width` value columns each, every part
    * carrying the join key, split points identical to the reference via
    * [[graft.functions.Normalize.chunkKeys]] (the ported math). Returns
    * the part count. */
  def writeChunked(df: DataFrame, keyCol: String, root: String,
      width: Int = 150): Int = {
    val valueCols = df.columns.filter(_ != keyCol).toSeq
    // a key-only frame still writes p0 (just the key column): zero
    // parts would skip every write yet still run the stale-part sweep
    // below, silently wiping an existing layout while persisting
    // nothing — and readChunked would then find no parts at all
    // (r13 review)
    val parts = graft.functions.Normalize.chunkKeys(valueCols, width) match {
      case Seq() => Seq(Seq.empty[String])
      case ps => ps
    }
    parts.zipWithIndex.foreach { case (cols, i) =>
      df.select((keyCol +: cols).map(col(_)): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$root/p$i")
    }
    // a narrower re-write must not leave higher-numbered stale parts:
    // readChunked discovers parts by listing, and an orphaned pN would
    // resurrect old columns AND drop keys absent from it (inner join)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // a key-only frame writes zero parts and never creates the root —
    // listStatus on the absent path would throw
    if (fs.exists(rootPath)) fs.listStatus(rootPath).foreach { st =>
      val name = st.getPath.getName
      if (name.matches("p\\d+") && name.drop(1).toInt >= parts.length)
        fs.delete(st.getPath, true)
    }
    parts.length
  }

  /** The J2 reassembly (`j2_reassembly`) over the PHYSICAL layout:
    * discover the part directories and equi-join them back on the key
    * into the original wide frame. */
  def readChunked(spark: SparkSession, root: String,
      keyCol: String): DataFrame = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(rootPath).map(_.getPath.getName)
      .filter(_.matches("p\\d+")).sortBy(_.drop(1).toInt)
    require(parts.nonEmpty, s"no p<N> part directories under $root")
    parts.map(p => spark.read.parquet(s"$root/$p"))
      .reduce((a, b) => a.join(b, Seq(keyCol)))
  }
}
