package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The corpus storage-layout lifecycle (CorpusIO): q_corpus_layout
  * proves layout-INVARIANCE of results through the oracle; this spec
  * proves the layout actually BUYS the scan reduction it exists for —
  * partition pruning visible in the plan AND in the files-read metric,
  * footer-stats pushdown on the sort column, exact round-trip of every
  * row, and the V8 no-clobber contract. */
class CorpusIOSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("corpus-io")
    .getOrCreate()
  import spark.implicits._

  private def tmpBase(): String = {
    val d = java.nio.file.Files.createTempDirectory("corpus_io_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // 8 langs × uneven sizes, n_chars spread wide enough that the range
  // clustering produces multiple files per hot directory
  private def corpus: DataFrame =
    (0 until 4000).map { i =>
      (i.toLong, s"doc text $i", s"l${i % 8}", s"s${i % 5}", 50L + (i * 37) % 900)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case o => o.children.flatMap(scans)
  }
  private def filesRead(df: DataFrame): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("round trip preserves every row exactly (partition cols reconstructed)") {
    val path = s"${tmpBase()}/layout"
    CorpusIO.writeLayout(corpus, path, Seq("lang"), Seq("n_chars"), fileTargets = 6)
    val back = CorpusIO.readLayout(spark, path)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.collect().map(_.toSeq).toSet === corpus.collect().map(_.toSeq).toSet)
    assert(back.schema("lang").dataType.typeName === "string",
      "partition-column type inference must not re-type a plain-string lang")
  }

  test("selective read prunes directories at planning time and files at read time") {
    val path = s"${tmpBase()}/layout"
    CorpusIO.writeLayout(corpus, path, Seq("lang"), Seq("n_chars"), fileTargets = 6)
    val all = CorpusIO.readLayout(spark, path)
    val total = filesRead(all.select("doc_id"))
    val sel = CorpusIO.readLayout(spark, path)
      .filter(col("lang") === "l3" && col("n_chars") >= 700)
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang predicate must prune at planning time, got:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(n_chars,700)"),
      s"n_chars range must reach the parquet footer (PushedFilters), got:\n$plan")
    val selFiles = filesRead(sel)
    assert(selFiles < total,
      s"selective scan read $selFiles of $total files — no pruning happened")
    // correctness of the pruned answer vs the in-memory truth
    assert(sel.count() ===
      corpus.filter(col("lang") === "l3" && col("n_chars") >= 700).count())
  }

  test("z-order: range predicates on EITHER z column skip row groups; answers exact") {
    // two independent-ish uniform columns — a single-key sort would
    // give y-queries nothing; the z-curve must serve both
    val df = (0 until 4000).map { i =>
      (i.toLong, (i * 2654435761L) % 4096, (i * 40503L) % 4096)
    }.toDF("id", "x", "y")
    val path = s"${tmpBase()}/zlayout"
    CorpusIO.writeLayoutZordered(df, path, Nil, Seq("x", "y"), bits = 3, fileTargets = 8)
    val total = CorpusIO.readLayout(spark, path).count()
    assert(total === 4000L)
    Seq("x", "y").foreach { c =>
      val sel = CorpusIO.readLayout(spark, path).filter(col(c) >= 3584)
      val got = sel.count()
      val want = df.filter(col(c) >= 3584).count()
      assert(got === want, s"z-order changed the $c answer")
      sel.collect()
      val scanned = scans(sel.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
      assert(scanned < (total * 6) / 10,
        s"$c-only predicate scanned $scanned of $total rows — no multi-column skipping")
    }
  }

  test("z-order: an all-NULL z column stops contributing bits instead of crashing the write") {
    val df = (0 until 100).map(i => (i.toLong, (i * 7L) % 64))
      .toDF("id", "x").withColumn("y", lit(null).cast("double"))
    val path = s"${tmpBase()}/znull"
    CorpusIO.writeLayoutZordered(df, path, Nil, Seq("x", "y"), bits = 3, fileTargets = 2)
    assert(CorpusIO.readLayout(spark, path).count() === 100L)
  }

  test("append lands the batch as new files on the stored spec; compact restores the layout") {
    val path = s"${tmpBase()}/layout"
    val even = corpus.filter(col("doc_id") % 2 === 0)
    val odd = corpus.filter(col("doc_id") % 2 === 1)
    CorpusIO.writeLayout(even, path, Seq("lang"), Seq("n_chars"), fileTargets = 6)
    val filesBefore = filesRead(CorpusIO.readLayout(spark, path).select("doc_id"))
    CorpusIO.appendLayout(odd, path, fileTargets = 6)
    val appended = CorpusIO.readLayout(spark, path)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(appended.collect().map(_.toSeq).toSet === corpus.collect().map(_.toSeq).toSet,
      "write + append must reproduce the full corpus exactly")
    val filesAfter = filesRead(CorpusIO.readLayout(spark, path).select("doc_id"))
    assert(filesAfter > filesBefore, "append must add new files, not rewrite")
    // compact to a fresh snapshot: rows untouched, file count restored
    val dest = s"${tmpBase()}/compacted"
    CorpusIO.compactLayout(spark, path, dest)
    val compacted = CorpusIO.readLayout(spark, dest)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(compacted.collect().map(_.toSeq).toSet === corpus.collect().map(_.toSeq).toSet,
      "compaction must be exactly row-preserving")
    val filesCompacted = filesRead(CorpusIO.readLayout(spark, dest).select("doc_id"))
    assert(filesCompacted < filesAfter,
      s"compaction must shrink the file count ($filesAfter -> $filesCompacted)")
    // and the compacted selective scan reads no more files than the appended one
    def selFiles(p: String) = filesRead(CorpusIO.readLayout(spark, p)
      .filter(col("lang") === "l3" && col("n_chars") >= 700))
    assert(selFiles(dest) <= selFiles(path))
  }

  test("append visibility is atomic: mid-append readers see none of the batch; publish flips to all of it") {
    val path = s"${tmpBase()}/layout"
    CorpusIO.writeLayout(corpus, path, Seq("lang"), Seq("n_chars"), fileTargets = 6)
    val n0 = CorpusIO.readLayout(spark, path).count()
    val batch = (4000 until 4400).map { i =>
      (i.toLong, s"doc text $i", s"l${i % 8}", s"s${i % 5}", 50L + (i * 37) % 900)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // replay appendLayout's internals, pausing inside the crash window:
    // batch files MOVED into the live tree, manifest NOT yet published
    val keys = Seq(col("lang"), col("n_chars"))
    val rels = CorpusIO.stageAppend(
      batch.repartitionByRange(4, keys: _*).sortWithinPartitions(keys: _*),
      path, Seq("lang"))
    assert(rels.nonEmpty)
    // the files physically exist (a raw directory listing sees them) …
    assert(spark.read.parquet(path).count() === n0 + 400L)
    // … but a snapshot reader resolves manifests only — a concurrent
    // reader mid-append sees NONE of the batch
    assert(CorpusIO.readLayout(spark, path).count() === n0,
      "staged-but-unpublished files must be invisible to readers")
    // the manifest publish is the commit point: now ALL of it
    CorpusIO.publishManifest(spark, path, rels)
    val after = CorpusIO.readLayout(spark, path)
    assert(after.count() === n0 + 400L)
    assert(after.filter(col("doc_id") >= 4000).count() === 400L)
  }

  test("an interrupted append leaves only invisible orphans; the retry commits once; vacuumOrphans reclaims") {
    val path = s"${tmpBase()}/layout"
    CorpusIO.writeLayout(corpus, path, Seq("lang"), Seq("n_chars"), fileTargets = 6)
    val n0 = CorpusIO.readLayout(spark, path).count()
    val batch = (4000 until 4300).map { i =>
      (i.toLong, s"doc text $i", s"l${i % 8}", s"s${i % 5}", 50L + (i * 37) % 900)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // the append dies after moving files, before its manifest lands
    val keys = Seq(col("lang"), col("n_chars"))
    CorpusIO.stageAppend(
      batch.repartitionByRange(4, keys: _*).sortWithinPartitions(keys: _*),
      path, Seq("lang"))
    assert(CorpusIO.readLayout(spark, path).count() === n0)
    // the clean retry is just appendLayout again — the orphans never
    // double-count because no manifest references them
    CorpusIO.appendLayout(batch, path)
    val after = CorpusIO.readLayout(spark, path)
    assert(after.count() === n0 + 300L)
    assert(after.filter(col("doc_id") >= 4000).count() === 300L,
      "retry must commit the batch exactly once")
    // vacuum deletes exactly the orphaned first attempt; results and
    // the raw directory listing now agree again (graceMs = 0: the
    // snapshot is quiescent here — the retention-window behavior has
    // its own spec below)
    val removed = CorpusIO.vacuumOrphans(spark, path, graceMs = 0)
    assert(removed.nonEmpty, "the crashed attempt's files must be reclaimed")
    assert(CorpusIO.readLayout(spark, path).count() === n0 + 300L)
    assert(spark.read.parquet(path).count() === n0 + 300L)
    // second vacuum is a no-op
    assert(CorpusIO.vacuumOrphans(spark, path, graceMs = 0).isEmpty)
  }

  test("vacuum honors the retention window: a stalled-but-alive append loses nothing (r12 verdict #2)") {
    val path = s"${tmpBase()}/layout"
    CorpusIO.writeLayout(corpus, path, Seq("lang"), Seq("n_chars"), fileTargets = 6)
    val n0 = CorpusIO.readLayout(spark, path).count()
    val batch = (4000 until 4300).map { i =>
      (i.toLong, s"doc text $i", s"l${i % 8}", s"s${i % 5}", 50L + (i * 37) % 900)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val keys = Seq(col("lang"), col("n_chars"))
    // an append that has MOVED its files but not yet published — from
    // the filesystem alone indistinguishable from a crash, which is
    // exactly why vacuum must not trust "unreferenced" without age
    val rels = CorpusIO.stageAppend(
      batch.repartitionByRange(4, keys: _*).sortWithinPartitions(keys: _*),
      path, Seq("lang"))
    // a default-grace vacuum racing the append deletes NOTHING …
    assert(CorpusIO.vacuumOrphans(spark, path).isEmpty,
      "files younger than the retention window must survive vacuum")
    // … so the append's commit still lands intact
    CorpusIO.publishManifest(spark, path, rels)
    val after = CorpusIO.readLayout(spark, path)
    assert(after.count() === n0 + 300L)
    assert(after.filter(col("doc_id") >= 4000).count() === 300L)
    // and a LIVE staging attempt (not yet moved) likewise survives —
    // per-attempt age gating, never a wholesale staging-root delete
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val attempt = new org.apache.hadoop.fs.Path(s"$path/_graft_staging/liveattempt")
    fs.mkdirs(attempt)
    val f = fs.create(new org.apache.hadoop.fs.Path(attempt, "part-0"), true)
    f.write("x".getBytes); f.close()
    assert(CorpusIO.vacuumOrphans(spark, path).isEmpty)
    assert(fs.exists(attempt), "a fresh staging attempt must survive a default-grace vacuum")
    // once aged past the window (grace 0 = everything is old), reclaimed
    CorpusIO.vacuumOrphans(spark, path, graceMs = 0)
    assert(!fs.exists(attempt), "an aged-out staging attempt is reclaimed")
    assert(CorpusIO.readLayout(spark, path).count() === n0 + 300L,
      "committed data is never touched by vacuum at any grace")
  }

  test("an empty initial write reads back as the committed (empty) cut with its schema, not a directory listing") {
    val path = s"${tmpBase()}/empty_layout"
    CorpusIO.writeLayout(corpus.filter(col("doc_id") < 0), path,
      Seq("lang"), Seq("n_chars"), fileTargets = 2)
    val back = CorpusIO.readLayout(spark, path)
    assert(back.count() === 0L)
    assert(back.columns.toSet === Set("doc_id", "text", "lang", "source", "n_chars"),
      "the stored write schema must survive an empty snapshot")
    // staged-but-unpublished files must stay invisible even here — the
    // corner where a directory-listing fallback would break atomicity
    val batch = (0 until 50).map { i =>
      (i.toLong, s"doc text $i", s"l${i % 8}", s"s${i % 5}", 50L + (i * 37) % 900)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val keys = Seq(col("lang"), col("n_chars"))
    val rels = CorpusIO.stageAppend(
      batch.repartitionByRange(2, keys: _*).sortWithinPartitions(keys: _*),
      path, Seq("lang"))
    assert(CorpusIO.readLayout(spark, path).count() === 0L,
      "an empty manifest-bearing snapshot must NOT fall back to listing the tree")
    CorpusIO.publishManifest(spark, path, rels)
    assert(CorpusIO.readLayout(spark, path).count() === 50L)
  }

  test("z-order append ranks the batch against the STORED boundaries") {
    val df = (0 until 4000).map { i =>
      (i.toLong, (i * 2654435761L) % 4096, (i * 40503L) % 4096)
    }.toDF("id", "x", "y")
    val path = s"${tmpBase()}/zlayout"
    CorpusIO.writeLayoutZordered(df.filter(col("id") < 3000), path, Nil,
      Seq("x", "y"), bits = 3, fileTargets = 8)
    // boundaries were learned from the first 3000 rows only —
    // stored-boundary staging must still reproduce the full relation
    // and keep both columns selective after compaction
    CorpusIO.appendLayout(df.filter(col("id") >= 3000), path, fileTargets = 2)
    val back = CorpusIO.readLayout(spark, path).select("id", "x", "y")
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
    val dest = s"${tmpBase()}/zcompacted"
    CorpusIO.compactLayout(spark, path, dest)
    val total = CorpusIO.readLayout(spark, dest).count()
    Seq("x", "y").foreach { c =>
      val sel = CorpusIO.readLayout(spark, dest).filter(col(c) >= 3584)
      assert(sel.count() === df.filter(col(c) >= 3584).count())
      sel.collect()
      val scanned = scans(sel.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
      assert(scanned < (total * 6) / 10,
        s"$c-only predicate scanned $scanned of $total rows after append+compact")
    }
  }

  test("append refuses a path that is not a complete layout") {
    val raw = s"${tmpBase()}/raw"
    corpus.write.parquet(raw)
    val e = intercept[IllegalStateException] {
      CorpusIO.appendLayout(corpus, raw)
    }
    assert(e.getMessage.contains("_layout_meta"))
  }

  test("a crashed partial write (claim sentinel, no meta) is cleared on retry") {
    val path = s"${tmpBase()}/crashed"
    // simulate: a CorpusIO write died after planting its claim and
    // some data files, before _layout_meta landed
    corpus.limit(10).write.parquet(path)
    val claim = new org.apache.hadoop.fs.Path(path, "_graft_claim")
    claim.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(claim, true).close()
    CorpusIO.writeLayout(corpus, path, Seq("lang"), Seq("n_chars"), fileTargets = 2)
    assert(CorpusIO.readLayout(spark, path).count() === corpus.count())
  }

  test("a non-empty directory that CorpusIO never claimed is refused, its data untouched (r10 advice)") {
    val raw = s"${tmpBase()}/raw_corpus"
    // pre-existing data this module didn't write — e.g. a path typo
    // pointing the writer at the raw corpus itself
    corpus.write.parquet(raw)
    Seq(
      () => CorpusIO.writeLayout(corpus, raw, Seq("lang"), Seq("n_chars")),
      () => CorpusIO.writeLayoutZordered(corpus, raw, Nil, Seq("doc_id", "n_chars"))
    ).foreach { w =>
      val e = intercept[IllegalStateException](w())
      assert(e.getMessage.contains("refusing to clear"), e.getMessage)
    }
    // nothing was deleted
    assert(spark.read.parquet(raw).count() === corpus.count())
  }

  test("no-clobber: a second write to the same snapshot path refuses") {
    val path = s"${tmpBase()}/layout"
    CorpusIO.writeLayout(corpus, path, Seq("lang"), Seq("n_chars"), fileTargets = 2)
    val e = intercept[IllegalStateException] {
      CorpusIO.writeLayout(corpus, path, Seq("lang"), Seq("n_chars"), fileTargets = 2)
    }
    assert(e.getMessage.contains("already exists"))
  }
}
