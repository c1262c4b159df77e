package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the corpus itself — the G9 persist-once
  * discipline (reference `frontend.py:264-280`: build the expensive
  * artifact once, every later consumer reads it cheaply) applied to
  * the 100 TB document store rather than to a derived summary.
  *
  * At 100 TB the dominant cost of every downstream job is the scan,
  * and most jobs are SELECTIVE: one language, one source, one length
  * band, one ingest day. A corpus written as an unordered pile of
  * Parquet files makes every such job read all of it. Two layout
  * decisions at WRITE time make the selective read cheap forever:
  *
  *  - hive-style directory partitioning on the low-cardinality
  *    predicate columns (`partitionBy`) → Catalyst partition pruning
  *    eliminates whole directories at PLANNING time (the scan's
  *    `PartitionFilters`; zero I/O for pruned values);
  *  - range-clustering + in-file ordering on the high-cardinality
  *    predicate columns (`repartitionByRange` + `sortWithinPartitions`)
  *    → each file covers a narrow, non-overlapping slice of the sort
  *    key, so Parquet min/max footer stats let pushed-down range
  *    predicates (`PushedFilters`) skip whole files and row groups at
  *    READ time.
  *
  * Both prunings are visible in the plan and measured in
  * `PipelineScaleProbe` (section `layout`): the selective read touches
  * only the matching directory's files, the full-pile read touches all
  * of them. Range partitioning SAMPLES the combined key, so a skewed
  * partition value (one dominant language) spreads over proportionally
  * many tasks instead of wedging one writer — the layout write itself
  * survives skew. Results are layout-invariant (hash-gated by
  * `q_corpus_layout`, which answers through a round-trip).
  */
object CorpusIO {

  /** The layout spec a snapshot was written with, persisted INSIDE the
    * snapshot (`_layout_meta`, an underscore directory Parquet readers
    * skip) so append/compact can never disagree with it — the AnnIO
    * meta discipline. For z-order layouts the equal-frequency bucket
    * BOUNDARIES travel too: an appended batch must rank against the
    * original corpus's boundaries or its files land on a different
    * curve. Meta is written LAST, so its presence marks a COMPLETE
    * snapshot; a data directory without it is a crashed write and is
    * cleared on retry instead of wedging the no-clobber check forever. */
  private case class LayoutMeta(kind: String, partitionCols: Seq[String],
                                sortCols: Seq[String], zCols: Seq[String],
                                bits: Int, bounds: Seq[Seq[Double]],
                                fileTargets: Int)

  private def metaPath(path: String) = s"$path/_layout_meta"

  private def hfs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaExists(spark: SparkSession, path: String): Boolean =
    hfs(spark, path).exists(
      new org.apache.hadoop.fs.Path(s"${metaPath(path)}/_SUCCESS"))

  private def writeMeta(spark: SparkSession, path: String, m: LayoutMeta): Unit = {
    import spark.implicits._
    Seq((m.kind, m.partitionCols, m.sortCols, m.zCols, m.bits, m.bounds, m.fileTargets))
      .toDF("kind", "partition_cols", "sort_cols", "z_cols", "bits",
        "bounds", "file_targets")
      .coalesce(1).write.parquet(metaPath(path))
  }

  private def readMeta(spark: SparkSession, path: String): LayoutMeta = {
    if (!metaExists(spark, path))
      throw new IllegalStateException(
        s"$path is not a complete CorpusIO layout (no _layout_meta) — " +
          "only snapshots written by writeLayout/writeLayoutZordered can be " +
          "appended to or compacted")
    val r = spark.read.parquet(metaPath(path)).head()
    // getSeq hands back mutable ArraySeq, which the tuple ENCODER in
    // writeMeta (compact re-writes the meta) refuses — immutabilize
    LayoutMeta(r.getString(0), r.getSeq[String](1).toVector,
      r.getSeq[String](2).toVector, r.getSeq[String](3).toVector,
      r.getInt(4),
      r.getSeq[scala.collection.Seq[Double]](5).map(_.toVector).toVector,
      r.getInt(6))
  }

  // ---- atomic snapshot visibility (r11 verdict #2) -----------------
  //
  // Data files alone cannot give readers a consistent cut: a reader
  // listing the directory tree mid-append would see a partial batch.
  // Since r12 every snapshot carries a MANIFEST LOG under
  // `_graft_manifests/` (underscore dir — plain Parquet readers skip
  // it): one immutable list file per committed batch, each naming the
  // batch's data files relative to the snapshot root. Readers resolve
  // the file set from manifests ONLY, so a batch becomes visible
  // all-or-nothing when its manifest lands — and the manifest write
  // itself is atomic (temp file + rename). Appenders stage their
  // files under `_graft_staging/<uuid>` (invisible), move them into
  // the live tree (still invisible — no manifest yet), and publish
  // the manifest LAST; a crash anywhere earlier leaves orphan data
  // files no reader ever sees ([[vacuumOrphans]] reclaims them), and
  // two concurrent appenders commit independently (unique staging
  // dirs, unique manifest names — no shared mutable file). This is
  // the meta-written-last idiom (AnnIO) applied per-batch. Legacy
  // snapshots (no manifest dir) read as before.

  private val manifestDirName = "_graft_manifests"
  private val stagingDirName = "_graft_staging"

  private def manifestDir(path: String) =
    new org.apache.hadoop.fs.Path(path, manifestDirName)

  /** All committed data files of the snapshot (manifest union),
    * relative to the snapshot root; None when the snapshot predates
    * manifests. */
  private def manifestFiles(spark: SparkSession, path: String): Option[Seq[String]] = {
    val fs = hfs(spark, path)
    val md = manifestDir(path)
    if (!fs.exists(md)) return None
    val lists = fs.listStatus(md).map(_.getPath)
      .filter(_.getName.matches("m-.*\\.list")).sortBy(_.getName)
    Some(lists.flatMap { p =>
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(buf) finally in.close()
      new String(buf, "UTF-8").split("\n").filter(_.nonEmpty).toSeq
    }.toSeq)
  }

  /** Atomically publish one batch's manifest: temp write + rename, so
    * a reader lists either the complete manifest or none of it.
    * Package-visible so the spec can exercise the
    * stage-then-crash-then-publish window deterministically. */
  private[pipeline] def publishManifest(spark: SparkSession, path: String,
                                        rels: Seq[String]): Unit = {
    val fs = hfs(spark, path)
    val md = manifestDir(path)
    fs.mkdirs(md)
    val name = s"m-${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val tmp = new org.apache.hadoop.fs.Path(md, s"$name.tmp")
    val fin = new org.apache.hadoop.fs.Path(md, s"$name.list")
    val out = fs.create(tmp, true)
    try out.write(rels.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, fin))
      throw new IllegalStateException(s"could not publish manifest $fin")
  }

  /** Data files (non-hidden, recursive) under `root`, relative paths. */
  private def listDataFiles(spark: SparkSession, root: String): Seq[String] = {
    val fs = hfs(spark, root)
    val base = new org.apache.hadoop.fs.Path(root)
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath)
      }
    if (!fs.exists(base)) Nil
    else {
      // string prefix, not URI.relativize — relativize silently returns
      // the ABSOLUTE uri when the base lacks a trailing slash
      val prefix = fs.makeQualified(base).toString.stripSuffix("/") + "/"
      walk(base).map { f =>
        val s = fs.makeQualified(f).toString
        require(s.startsWith(prefix), s"$s is not under $prefix")
        s.stripPrefix(prefix)
      }
    }
  }

  /** The snapshot's write schema, stored beside the manifest log so an
    * EMPTY committed snapshot (zero data files — e.g. an initial write
    * of an empty frame, which `partitionBy` lands as no files at all)
    * still reads back with its schema instead of falling through to a
    * directory listing (r12 advice #3). Temp-write + rename like the
    * manifests. */
  private val schemaName = "_schema.ddl"

  private def writeSchemaDdl(spark: SparkSession, path: String,
                             schema: org.apache.spark.sql.types.StructType): Unit = {
    val fs = hfs(spark, path)
    val md = manifestDir(path)
    fs.mkdirs(md)
    val tmp = new org.apache.hadoop.fs.Path(md, s"$schemaName.tmp")
    val fin = new org.apache.hadoop.fs.Path(md, schemaName)
    val out = fs.create(tmp, true)
    try out.write(schema.toDDL.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, fin))
      throw new IllegalStateException(s"could not publish schema $fin")
  }

  private def readSchemaDdl(spark: SparkSession, path: String)
      : Option[org.apache.spark.sql.types.StructType] = {
    val fs = hfs(spark, path)
    val p = new org.apache.hadoop.fs.Path(manifestDir(path), schemaName)
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(buf) finally in.close()
      Some(org.apache.spark.sql.types.StructType.fromDDL(new String(buf, "UTF-8")))
    }
  }

  /** Publish the INITIAL manifest of a fresh snapshot: everything the
    * writer just landed is the first committed batch. Called by the
    * writers between the data write and the meta write; also stores
    * the write schema (see [[schemaName]]). */
  private def publishInitial(spark: SparkSession, path: String,
                             schema: org.apache.spark.sql.types.StructType): Unit = {
    writeSchemaDdl(spark, path, schema)
    publishManifest(spark, path, listDataFiles(spark, path))
  }

  /** Stage an append batch (already clustered/sorted by the caller)
    * and MOVE its files into the live tree WITHOUT publishing them:
    * after this returns the files exist but no reader resolves them.
    * Returns the relative paths for [[publishManifest]]. Exposed to
    * the spec so the crash-between-move-and-publish window is testable
    * deterministically. */
  private[pipeline] def stageAppend(staged: DataFrame, path: String,
                                    partitionCols: Seq[String]): Seq[String] = {
    val spark = staged.sparkSession
    val fs = hfs(spark, path)
    val stage = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path, stagingDirName),
      java.util.UUID.randomUUID().toString.replace("-", ""))
    staged.write.partitionBy(partitionCols: _*).parquet(stage.toString)
    val rels = listDataFiles(spark, stage.toString)
    rels.foreach { rel =>
      val src = new org.apache.hadoop.fs.Path(stage, rel)
      val dst = new org.apache.hadoop.fs.Path(path, rel)
      fs.mkdirs(dst.getParent)
      if (!fs.rename(src, dst))
        throw new IllegalStateException(s"could not move staged file $src -> $dst")
    }
    fs.delete(stage, true)
    rels
  }

  /** Default orphan-retention window (24 h) — see [[vacuumOrphans]].
    * Long enough that no sane append is still in flight when its files
    * become reclaimable (the Iceberg/Delta orphan-file discipline). */
  val defaultVacuumGraceMs: Long = 24L * 3600 * 1000

  /** Delete data files no manifest references — the leftovers of
    * appends that crashed between staging and publish (plus abandoned
    * staging attempts). Never touches committed files, the manifest
    * log, meta, or claim sentinels; no-op (returns Nil) on legacy
    * snapshots, whose readers still list the directory tree. Returns
    * the deleted paths (relative).
    *
    * SAFE UNDER CONCURRENT APPENDS via `graceMs` (r12 verdict #2): an
    * in-flight [[stageAppend]] moves its files into the live tree
    * BEFORE its manifest publishes, so for that window they look
    * exactly like crash orphans. Only files (and staging attempts)
    * whose newest modification is older than `graceMs` are reclaimed —
    * a live append's files are by construction younger than any sane
    * retention window, while a genuinely crashed attempt ages past it
    * and is swept by the next vacuum. Pass `graceMs = 0` ONLY when the
    * snapshot is known quiescent (single-writer maintenance,
    * test/probe teardown) to reclaim immediately. */
  /** The orphan data files [[vacuumOrphans]] would reclaim at
    * `graceMs`, without deleting anything — the GC's dry-run view
    * (staging attempts are not listed; they are reclaimed as whole
    * directories by the vacuum itself). */
  def listOrphans(spark: SparkSession, path: String,
                  graceMs: Long = defaultVacuumGraceMs): Seq[String] =
    manifestFiles(spark, path) match {
      case None => Nil
      case Some(committed) =>
        val fs = hfs(spark, path)
        val cutoff = System.currentTimeMillis() - graceMs
        val live = committed.toSet
        listDataFiles(spark, path).filterNot(live).filter(rel =>
          fs.getFileStatus(new org.apache.hadoop.fs.Path(path, rel))
            .getModificationTime <= cutoff)
    }

  def vacuumOrphans(spark: SparkSession, path: String,
                    graceMs: Long = defaultVacuumGraceMs): Seq[String] = {
    manifestFiles(spark, path) match {
      case None => Nil
      case Some(_) =>
        val fs = hfs(spark, path)
        val cutoff = System.currentTimeMillis() - graceMs
        val orphans = listOrphans(spark, path, graceMs)
        orphans.foreach(rel =>
          fs.delete(new org.apache.hadoop.fs.Path(path, rel), false))
        // staging attempts are reclaimed per-attempt, gated on the
        // NEWEST entry under each (an attempt still writing keeps
        // refreshing it) — never the whole staging root
        val stage = new org.apache.hadoop.fs.Path(path, stagingDirName)
        if (fs.exists(stage)) {
          def newest(p: org.apache.hadoop.fs.Path): Long = {
            val st = fs.getFileStatus(p)
            if (!st.isDirectory) st.getModificationTime
            else (st.getModificationTime +:
              fs.listStatus(p).toSeq.map(c => newest(c.getPath))).max
          }
          fs.listStatus(stage).foreach { st =>
            if (newest(st.getPath) <= cutoff) fs.delete(st.getPath, true)
          }
          if (fs.listStatus(stage).isEmpty) fs.delete(stage, false)
        }
        orphans
    }
  }

  /** Claim sentinel: the FIRST thing a writer puts under its target
    * directory, before any data. Its presence marks "a CorpusIO write
    * started here and its meta never landed" — the only directories
    * [[claimPath]] is allowed to clear. Underscore-prefixed, so
    * Parquet readers skip it; it stays behind in complete snapshots
    * as write provenance. */
  private val claimName = "_graft_claim"

  /** No-clobber gate shared by both writers: a COMPLETE snapshot (meta
    * present) refuses; a crashed partial CorpusIO write (claim
    * sentinel present, no meta) is cleared so the retry succeeds; any
    * OTHER non-empty directory refuses LOUDLY — pre-existing data that
    * this module didn't write (a path typo pointing at the raw corpus)
    * must never be deleted (r10 advice #2). The claim is re-planted
    * after clearing, and the data writes land in `append` mode under
    * it. */
  private def claimPath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = hfs(spark, path)
    if (metaExists(spark, path))
      throw new IllegalStateException(
        s"Corpus layout $path already exists! Write a new snapshot directory " +
          "(no-clobber, reference backend.py:269-272)")
    if (fs.exists(p)) {
      val claimed = fs.exists(new org.apache.hadoop.fs.Path(p, claimName))
      val entries = fs.listStatus(p)
      if (!claimed && entries.nonEmpty)
        throw new IllegalStateException(
          s"refusing to clear $path: it holds data but no CorpusIO claim " +
            "sentinel — this is not a crashed writeLayout/writeLayoutZordered " +
            "attempt (wrong path? point the writer at a fresh snapshot " +
            "directory, or remove the data yourself)")
      fs.delete(p, true) // crashed previous CorpusIO write (or empty dir)
    }
    fs.mkdirs(p)
    fs.create(new org.apache.hadoop.fs.Path(p, claimName), true).close()
  }

  /** Write `docs` under `path` partitioned by `partitionCols`
    * (hive-style directories) and range-clustered + sorted on
    * `partitionCols ++ sortCols`. `fileTargets` is the shuffle width
    * of the clustering (≈ output file count before directory
    * boundaries); 0 = the session's shuffle partitions. No-clobber
    * (V8, reference `backend.py:269-272`): a corpus snapshot is
    * immutable history — new data gets a new snapshot directory.
    *
    * The combined range key `(partitionCols, sortCols)` keeps each
    * writer task inside one (or few) hive directories — total file
    * count stays ≈ `fileTargets`, not `fileTargets × |partitions|` —
    * while giving non-overlapping sort ranges per file WITHIN each
    * directory, which is what makes the footer-stats skipping
    * effective. */
  def writeLayout(docs: DataFrame, path: String, partitionCols: Seq[String],
                  sortCols: Seq[String], fileTargets: Int = 0): Unit = {
    require(partitionCols.nonEmpty, "writeLayout needs >= 1 partition column")
    val spark = docs.sparkSession
    claimPath(spark, path)
    val n = if (fileTargets > 0) fileTargets
      else spark.sessionState.conf.numShufflePartitions
    val keys = (partitionCols ++ sortCols).map(col)
    docs.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      // append: the claim sentinel already sits under `path`, which
      // ErrorIfExists would refuse — claimPath guarantees emptiness
      .write.mode("append").partitionBy(partitionCols: _*).parquet(path)
    // manifest before meta: a complete snapshot always has its initial
    // batch committed; a crash between leaves a metaless partial that
    // claimPath clears on retry, same as before
    publishInitial(spark, path, docs.schema)
    writeMeta(spark, path,
      LayoutMeta("sorted", partitionCols, sortCols, Nil, 0, Nil, n))
  }

  /** Z-order (Morton) variant of [[writeLayout]]: clusters on the
    * bit-interleaving of equal-frequency bucket ranks of `zCols`, so
    * range predicates on ANY of the z columns — not just a leading
    * sort key — skip files and row groups via the parquet footer
    * stats. The trade a single-key sort cannot make: sorting on
    * `(x, y)` gives perfect locality on `x` and NONE on `y`; the
    * z-curve gives ~|files|^(1/k) locality on each of the k columns.
    *
    * Scale shape: one `approx_percentile` aggregate over the corpus
    * (map-side combinable; 2^bits−1 boundaries per column come back
    * to the driver and re-enter the plan as literals — bounded by the
    * parameters, never the corpus), then a literal-array rank +
    * bit-interleave projection per row (O(bits·k) bit ops) feeding the
    * same range-cluster + in-file sort as [[writeLayout]]. Equal-
    * FREQUENCY buckets (not equal-width) keep the curve balanced under
    * skewed value distributions. `partitionCols` may be empty (pure
    * z-file layout). The helper z columns are dropped before the
    * write; the projection after `sortWithinPartitions` is narrow, so
    * in-file order is preserved. */
  def writeLayoutZordered(docs: DataFrame, path: String,
                          partitionCols: Seq[String], zCols: Seq[String],
                          bits: Int = 8, fileTargets: Int = 0): Unit = {
    val k = zCols.size
    require(k >= 2, s"z-ordering needs >= 2 columns, got $zCols")
    require(bits >= 1 && bits * k <= 63, s"bits * |zCols| must fit a BIGINT, got $bits * $k")
    val spark = docs.sparkSession
    claimPath(spark, path)
    val nB = 1 << bits
    val probs = (1 until nB).map(i => i.toDouble / nB)
    val row = docs.select(zCols.map(c => expr(
        s"approx_percentile(CAST(`$c` AS DOUBLE), array(${probs.mkString(",")}), 10000)")): _*)
      .head()
    // an all-NULL (or empty-corpus) column has no percentiles — every
    // row ranks 0 and the column simply stops contributing bits
    val bounds = zCols.indices.map(j =>
      if (row.isNullAt(j)) Seq(0.0) else row.getSeq[Double](j))
    val n = if (fileTargets > 0) fileTargets
      else spark.sessionState.conf.numShufflePartitions
    clusterZ(docs, partitionCols, zCols, bits, bounds, n)
      .write.mode("append").partitionBy(partitionCols: _*).parquet(path)
    publishInitial(spark, path, docs.schema)
    writeMeta(spark, path,
      LayoutMeta("zorder", partitionCols, Nil, zCols, bits, bounds, n))
  }

  /** Rank each z column against its literal boundary array (one
    * codegen'd loop, 2^bits comparisons per row; NULLs rank 0), Morton-
    * interleave the ranks, range-cluster + sort on (partitionCols, z),
    * and drop the helpers — the projection after `sortWithinPartitions`
    * is narrow, so in-file order is preserved. Shared by the fresh
    * write, the append (which MUST reuse the stored boundaries), and
    * the compactor. */
  private def clusterZ(docs: DataFrame, partitionCols: Seq[String],
                       zCols: Seq[String], bits: Int,
                       bounds: Seq[Seq[Double]], n: Int): DataFrame = {
    val k = zCols.size
    val staged = zCols.zipWithIndex.foldLeft(docs) { case (d, (c, j)) =>
      d.withColumn(s"__zb$j", expr(
        s"size(filter(array(${bounds(j).mkString(",")}), b -> b <= CAST(`$c` AS DOUBLE)))"))
    }
    val terms = for (j <- 0 until k; i <- 0 until bits)
      yield s"shiftleft(CAST((__zb$j >> $i) & 1 AS BIGINT), ${i * k + j})"
    val withZ = staged.withColumn("__z", expr(terms.mkString(" + ")))
    val keys = partitionCols.map(col) :+ col("__z")
    withZ.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop("__z" +: (0 until k).map(j => s"__zb$j"): _*)
  }

  /** Append an ingest batch to an existing COMPLETE layout snapshot —
    * the daily-ingest half of the lifecycle (the AnnIO `appendCodes`
    * discipline). The batch is staged exactly as the original write
    * was — same partition directories, same sort keys, and for z-order
    * layouts the ranks come from the STORED boundaries, so new files
    * land on the same curve — then lands as NEW files only (existing
    * files untouched; O(batch), the old corpus is never rewritten or
    * re-scanned), with ATOMIC visibility: files stage invisibly and
    * the batch's manifest publishes LAST, so a concurrent reader sees
    * either none of the batch or all of it, and an interrupted append
    * leaves only never-visible orphans ([[vacuumOrphans]]) — never a
    * partial batch (r11 verdict #2). What appends trade: each batch's
    * files have narrow
    * min/max ranges of their own, but ranges OVERLAP across batches
    * within a directory, so footer-stats skipping degrades gradually
    * with batch count — [[compactLayout]] restores the fresh-write
    * layout. `fileTargets` sizes THIS batch's files (default: the
    * session's shuffle width; pick ≈ originalTargets × |batch|/|corpus|
    * to keep file sizes uniform). */
  def appendLayout(batch: DataFrame, path: String, fileTargets: Int = 0): Unit = {
    val spark = batch.sparkSession
    val m = readMeta(spark, path)
    val n = if (fileTargets > 0) fileTargets
      else spark.sessionState.conf.numShufflePartitions
    val staged = m.kind match {
      case "sorted" =>
        val keys = (m.partitionCols ++ m.sortCols).map(col)
        batch.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
      case "zorder" =>
        clusterZ(batch, m.partitionCols, m.zCols, m.bits, m.bounds, n)
    }
    // legacy snapshots (pre-manifest) keep the direct append — their
    // readers list the directory, so staged-but-unpublished files
    // would be INVISIBLE forever rather than atomic
    if (manifestFiles(spark, path).isEmpty)
      staged.write.mode("append").partitionBy(m.partitionCols: _*).parquet(path)
    else
      publishManifest(spark, path, stageAppend(staged, path, m.partitionCols))
  }

  /** Rewrite an appended-to layout as a FRESH snapshot at `destPath` —
    * same spec (from the stored meta; z boundaries reused, so
    * compaction never re-aggregates percentiles and the curve is
    * stable across compactions), results untouched, file count and
    * non-overlapping per-file ranges restored. The old snapshot is
    * left in place (immutable history; retire it once readers have
    * moved). `fileTargets` 0 = the spec's original width. */
  def compactLayout(spark: SparkSession, path: String, destPath: String,
                    fileTargets: Int = 0): Unit = {
    val m = readMeta(spark, path)
    claimPath(spark, destPath)
    val n = if (fileTargets > 0) fileTargets else m.fileTargets
    val docs = readLayout(spark, path)
    val staged = m.kind match {
      case "sorted" =>
        val keys = (m.partitionCols ++ m.sortCols).map(col)
        docs.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
      case "zorder" =>
        clusterZ(docs, m.partitionCols, m.zCols, m.bits, m.bounds, n)
    }
    staged.write.mode("append").partitionBy(m.partitionCols: _*).parquet(destPath)
    publishInitial(spark, destPath, docs.schema)
    writeMeta(spark, destPath, m.copy(fileTargets = n))
  }

  /** Read a layout back. Partition columns are reconstructed from the
    * directory names (they come LAST in the read schema — select by
    * name, not position). String partition values round-trip exactly
    * (URL-escaped in the path); numeric-LOOKING strings would be
    * re-typed by partition-column type inference, so callers with such
    * values should disable
    * `spark.sql.sources.partitionColumnTypeInference.enabled`.
    *
    * Manifest-bearing snapshots resolve their file set from the
    * manifest log ONLY (`basePath` keeps the hive partition columns
    * and their planning-time pruning): files an in-flight or crashed
    * append has landed but not published are invisible, so every read
    * is a consistent committed cut (r11 verdict #2). A manifest-bearing
    * snapshot whose committed file set is EMPTY (an initial write of an
    * empty / fully-pruned frame) honors the same cut: an empty frame
    * with the stored write schema — never a directory listing, which
    * would surface staged-but-unpublished orphans in exactly this
    * corner (r12 advice #3; appendLayout already treats the snapshot as
    * manifest-bearing, so the two paths now agree). Only a snapshot
    * with NO manifest log at all (true legacy) lists the directory as
    * before. */
  def readLayout(spark: SparkSession, path: String): DataFrame =
    manifestFiles(spark, path) match {
      case Some(rels) if rels.nonEmpty =>
        spark.read.option("basePath", path)
          .parquet(rels.map(r => s"$path/$r"): _*)
      case Some(_) =>
        val schema = readSchemaDdl(spark, path).getOrElse(
          throw new IllegalStateException(
            s"$path has a manifest log but zero committed files and no " +
              "stored schema — incomplete snapshot (written by a pre-r13 " +
              "CorpusIO?); re-write or compact it"))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case None => spark.read.parquet(path)
    }
}
