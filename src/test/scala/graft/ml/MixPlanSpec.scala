package graft.ml

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** Library-level invariants for the r15 mixture-plan operators — the
  * properties the hash oracle implies but does not STATE, pinned here so
  * a refactor that preserves some other fixed point cannot drift them:
  *
  *  - [[Corpus.shardManifest]]: per-source conservation (tokens_kept =
  *    min(available, alloc) EXACTLY), truncation-vs-dry accounting (at
  *    most ONE partial doc, only when the cap bit), ceil-division and
  *    prefix-sum arithmetic, and composability with a hand-written
  *    allocation (the operator's contract is ANY (source, alloc_tokens)
  *    plan, not just the divergence apportionment).
  *  - [[Corpus.curriculumOrder]]: the phases PARTITION the corpus into
  *    rank-tertiles (every doc exactly once, sizes within 1), scores
  *    are monotone across phases (max of phase p+1 ≤ min of phase p —
  *    the curriculum property), per-(phase, shard) positions are
  *    contiguous from 1, and the rank-exact envelope guard FIRES when
  *    accuracy is driven below the corpus size (the QualitySpec
  *    guard-not-dead-code discipline).
  */
class MixPlanSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sf0001)

  test("shardManifest: exact conservation, boundary accounting, prefix arithmetic") {
    import spark.implicits._
    val alloc = TextAnalysis.divergenceBudgetAlloc(docs, budget = 40000L)
    val m = Corpus.shardManifest(docs, alloc, seqBudget = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // (source, alloc, used, full, kept, shortfall, nseq, seqStart)
    val avail = docs.groupBy(col("source"))
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("t"),
        count(lit(1)).as("nd"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m.map(_._1).toSeq == m.map(_._1).toSeq.sorted, "not source-ordered")
    var expectedStart = 0L
    m.foreach { case (src, al, used, full, kept, short, nseq, start) =>
      val (av, nd) = avail(src)
      assert(kept == math.min(av, al),
        s"$src: kept $kept != min(available $av, alloc $al) — conservation broke")
      assert(short == al - kept && short >= 0, s"$src: shortfall arithmetic")
      assert(nseq == (kept + 511) / 512, s"$src: ceil division")
      assert(start == expectedStart, s"$src: seq_start prefix broke")
      expectedStart += nseq
      assert(full <= used && used <= nd, s"$src: doc accounting")
      // at most one partial (the boundary doc), and only when truncating
      assert(used - full <= 1, s"$src: more than one partial doc")
      if (av <= al) assert(used == full && used == nd,
        s"$src: dry source must keep every doc whole")
      else assert(used - full == 1,
        s"$src: truncating source must split exactly the boundary doc")
    }
  }

  test("shardManifest composes with ANY allocation plan (uniform hand alloc)") {
    import spark.implicits._
    val sources = docs.select(col("source")).distinct()
      .as[String].collect().sorted
    val uniform = spark.createDataFrame(sources.map(s => (s, 700L)).toSeq)
      .toDF("source", "alloc_tokens")
    val m = Corpus.shardManifest(docs, uniform, seqBudget = 100)
      .collect()
    assert(m.length == sources.length)
    m.foreach { r =>
      assert(r.getLong(1) == 700L)
      // 700 < every source's ~1.2k+ available tokens: all truncate
      assert(r.getLong(4) == 700L,
        s"${r.getString(0)}: uniform cap did not bite exactly")
      assert(r.getLong(6) == 7L, "ceil(700/100)")
    }
  }

  test("curriculumOrder: rank-tertile partition, monotone phases, contiguous positions") {
    val out = Corpus.curriculumOrder(docs, seed = 42, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))
    val n = docs.count()
    assert(out.length == n && out.map(_._1).distinct.length == n,
      "phases must PARTITION the corpus — every doc exactly once")
    val byPhase = out.groupBy(_._3)
    assert(byPhase.keySet == Set(1, 2, 3))
    // rank-tertiles: sizes within 1 of n/3 (ceil-rank cutpoints)
    byPhase.values.foreach(g =>
      assert(math.abs(g.length - n / 3.0) <= 1.0, s"tertile size ${g.length}"))
    // curriculum property: phase 1 holds the HIGHEST scores
    val mins = byPhase.map { case (p, g) => p -> g.map(_._2).min }
    val maxs = byPhase.map { case (p, g) => p -> g.map(_._2).max }
    assert(maxs(2) <= mins(1) && maxs(3) <= mins(2),
      s"phases not score-monotone: ${mins}, ${maxs}")
    // per-(phase, shard) positions contiguous from 1
    out.groupBy(t => (t._3, t._4)).foreach { case (ps, g) =>
      assert(g.map(_._5).sorted.toSeq == (1 to g.length),
        s"positions not contiguous in $ps")
    }
    // determinism: identical on a second invocation
    val again = Corpus.curriculumOrder(docs, seed = 42, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(again.toSet == out.map(t => (t._1, t._3, t._4, t._5)).toSet,
      "curriculum order not deterministic")
  }

  test("curriculumOrder: the rank-exact envelope guard fires past accuracy/2") {
    val e = intercept[Throwable] {
      Corpus.curriculumOrder(docs, seed = 42, nShards = 4, accuracy = 10L)
        .collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .take(10).toSeq
    assert(chain.exists(t => Option(t.getMessage)
        .exists(_.contains("curriculumOrder: rank-exact envelope exceeded"))),
      s"guard did not fire; got ${e.toString.take(300)}")
  }

  test("shardManifest: seqBudget must be positive (loud, at construction)") {
    val alloc = TextAnalysis.divergenceBudgetAlloc(docs, budget = 1000L)
    val e = intercept[IllegalArgumentException] {
      Corpus.shardManifest(docs, alloc, seqBudget = 0)
    }
    assert(e.getMessage.contains("seqBudget"))
  }

  test("seqFill: every non-final sequence exactly full; reconciles with " +
      "the manifest (r16)") {
    val alloc = TextAnalysis.divergenceBudgetAlloc(docs, budget = 40000L)
    val fill = Corpus.seqFill(docs, alloc, seqBudget = 512).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val m = Corpus.shardManifest(docs, alloc, seqBudget = 512).collect()
      .map(r => r.getString(r.fieldIndex("source")) -> r).toMap
    assert(fill.nonEmpty)
    val bySource = fill.groupBy(_._2)
    assert(bySource.keySet == m.filter(_._2.getAs[Long]("tokens_kept") > 0)
      .keySet, "fill sources != manifest sources with kept tokens")
    bySource.foreach { case (src, rows) =>
      val mf = m(src)
      val s0 = mf.getAs[Long]("seq_start")
      val ns = mf.getAs[Long]("n_sequences")
      // the shard covers exactly its manifest range, contiguously
      assert(rows.map(_._1).sorted.toSeq == (s0 until s0 + ns).toSeq,
        s"$src: sequence ids not contiguous over the manifest range")
      // token conservation per shard
      assert(rows.map(_._4).sum == mf.getAs[Long]("tokens_kept"),
        s"$src: per-sequence tokens do not sum to tokens_kept")
      // THE dataloader invariant: every sequence but the shard's LAST
      // is exactly full; the last carries the remainder
      val last = s0 + ns - 1
      rows.foreach { case (sid, _, nd, nt) =>
        assert(nd >= 1)
        if (sid != last) assert(nt == 512L,
          s"$src: sequence $sid holds $nt != 512 tokens (not full)")
        else assert(nt >= 1L && nt <= 512L,
          s"$src: final sequence $sid out of range with $nt tokens")
      }
    }
    // every doc the plan uses contributes to >= 1 sequence: doc counts
    // sum to n_docs_used plus the cross-boundary double-counts
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._3).sum >= m(src).getAs[Long]("n_docs_used"),
        s"$src: fewer doc contributions than docs used")
    }
  }

  test("curriculumMix reconciles with curriculumOrder and the corpus " +
      "totals (r16)") {
    val mix = Corpus.curriculumMix(docs).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // same phase derivation as the schedule: per-phase doc counts match
    val order = Corpus.curriculumOrder(docs, seed = 42, nShards = 4)
      .groupBy(col("phase")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mixByPhase = mix.groupBy(_._1._1).view
      .mapValues(_.values.map(_._1).sum).toMap
    assert(mixByPhase == order,
      s"mix phase totals $mixByPhase != schedule tertiles $order")
    // (phase, source) cells partition the corpus: per-source sums equal
    // the corpus per-source doc/token totals exactly
    val totals = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("nd"),
        sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("nt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val mixBySource = mix.groupBy(_._1._2).view.mapValues(cells =>
      (cells.values.map(_._1).sum, cells.values.map(_._2).sum)).toMap
    assert(mixBySource == totals,
      "per-source mix sums do not reconcile with corpus totals")
    // non-trivial interaction: at least one source is unevenly
    // distributed across phases (the starvation signal exists to catch)
    assert(mix.keySet.map(_._1) == Set(1, 2, 3))
  }

  test("writeShards materializes the plan: manifest↔files conservation, " +
      "source-clustered layout, CDF append (r16 verdict #5)") {
    import spark.implicits._
    import graft.ingest.SnapshotLake
    val root = java.nio.file.Files
      .createTempDirectory("graft_shards").toString + "/lake"
    val lake = new SnapshotLake(root)
    val alloc = TextAnalysis.divergenceBudgetAlloc(docs, budget = 40000L)
    val (v1, manifest) = Corpus.writeShards(lake, docs, alloc, seqBudget = 512)
    val m = manifest.collect()
      .map(r => r.getString(r.fieldIndex("source")) -> r).toMap
    val files = lake.read(spark)
    assert(files.columns.toSeq ==
      Seq("source", "doc_id", "n_tokens_kept", "seq_id", "seq_offset"))
    // per-shard conservation, FILES vs manifest: kept tokens, doc count,
    // and every sequence id inside [seq_start, seq_start + n_sequences)
    // with the first doc landing exactly at seq_start
    val per = files.withColumn("fname", input_file_name())
      .groupBy($"source").agg(
      sum($"n_tokens_kept").as("kept"), count(lit(1)).as("used"),
      min($"seq_id").as("min_seq"), max($"seq_id").as("max_seq"),
      min($"seq_offset").as("min_off"), max($"seq_offset").as("max_off"),
      countDistinct($"fname").as("n_files")).collect()
    assert(per.length ==
      m.values.count(_.getAs[Long]("tokens_kept") > 0))
    per.foreach { r =>
      val src = r.getString(0)
      val mf = m(src)
      assert(r.getLong(1) == mf.getAs[Long]("tokens_kept"),
        s"$src: files carry ${r.getLong(1)} tokens, manifest says " +
          s"${mf.getAs[Long]("tokens_kept")}")
      assert(r.getLong(2) == mf.getAs[Long]("n_docs_used"),
        s"$src: doc count diverged from manifest")
      val s0 = mf.getAs[Long]("seq_start")
      val ns = mf.getAs[Long]("n_sequences")
      assert(r.getLong(3) == s0,
        s"$src: first doc lands at ${r.getLong(3)}, shard starts at $s0")
      assert(r.getLong(4) < s0 + ns,
        s"$src: seq_id ${r.getLong(4)} beyond the shard's $ns sequences")
      assert(r.getLong(5) >= 0L && r.getLong(6) < 512L,
        s"$src: seq_offset outside [0, seqBudget)")
      // source-clustered: repartition(source) puts each shard's rows in
      // exactly ONE file — the layout a per-shard worker mounts
      assert(r.getLong(7) == 1L, s"$src: shard split across ${r.getLong(7)} files")
    }
    // global sequence ids never collide across shards (disjoint ranges
    // by the prefix sum — asserted on the DATA, not just the plan)
    assert(files.groupBy($"seq_id")
      .agg(countDistinct($"source").as("ns")).filter($"ns" > 1).count() == 0L,
      "a global sequence id is claimed by two shards")
    // the commit's changefeed shows the append: inserts only, one per row
    val cdf = lake.changesBetween(spark, v1 - 1, v1)
    assert(cdf.filter(col(SnapshotLake.ChangeTypeCol) =!= "insert")
      .count() == 0L, "append surfaced non-insert changes")
    assert(cdf.count() == files.count(), "changefeed row count != files")
    // a SECOND plan (hand alloc) appends as its own commit: CDF between
    // the versions carries exactly the new rows; earlier shards untouched
    val sources = docs.select(col("source")).distinct()
      .as[String].collect().sorted
    val uniform = spark.createDataFrame(sources.map(s => (s, 700L)).toSeq)
      .toDF("source", "alloc_tokens")
    val (v2, m2) = Corpus.writeShards(lake, docs, uniform, seqBudget = 100)
    assert(v2 == v1 + 1)
    val cdf2 = lake.changesBetween(spark, v1, v2)
    assert(cdf2.count() ==
      lake.read(spark).count() - files.count())
    assert(m2.collect().forall(_.getAs[Long]("tokens_kept") == 700L))
  }
}
