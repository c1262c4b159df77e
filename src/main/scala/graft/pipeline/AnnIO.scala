package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ index persistence — the serving half of the ANN family and
  * the weights-Parquet analog of [[graft.regrid.WeightsIO]]: train
  * once ([[Clustering.trainPqIndex]], m + 1 Lloyd chains over the
  * corpus), persist, and every later query batch loads the index and
  * hits [[Clustering.pqQueryTopK]] without re-training — the
  * `reuse_weights` discipline (reference `frontend.py:144-146`) for
  * embeddings instead of regrid weights.
  *
  * On-disk layout under one index directory:
  *  - `meta.parquet` — one row of hyperparameters `(m, codebook_k,
  *    dim, coarse_cells)`; its existence IS the reuse check;
  *  - `codebooks.parquet` — `(sub, code, cv)`, m·k tiny rows;
  *  - `coarse.parquet` — `(cell, cv)` coarse centroids (when IVF-on);
  *  - the CODE RELATION — the only corpus-sized piece — as a Parquet
  *    table BUCKETED on `cell` (G9's `writeBucketed` discipline,
  *    [[graft.regrid.WeightsIO.writeBucketed]]): the contract plan
  *    broadcasts the per-cell LUT onto the codes, but when a query
  *    BATCH is too large to broadcast (the bulk-serving regime) the
  *    probe join becomes a shuffled join on `cell` — a bucketed code
  *    relation is read pre-partitioned and the index side never
  *    shuffles, only the (small) probe side moves. Without coarse
  *    cells there is no join key to bucket; codes land as plain
  *    Parquet (`codes.parquet`) and every LUT join stays broadcast.
  *
  * No-clobber (V8, `backend.py:269-272`): an index is immutable
  * history; retrain to a NEW path. [[loadOrTrain]] is the
  * `reuse_weights=True` entry point.
  */
object AnnIO {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The reuse check: a complete index was saved here. */
  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(s"$path/meta.parquet"))

  /** Content fingerprint of an index's MODEL (codebooks + coarse
    * centroids) — the identity [[appendCodes]] checks so a batch
    * encoded against a DIFFERENT index (other codebooks ⇒ other code
    * meanings, other centroids ⇒ other cells) can never land in this
    * one and silently poison served neighbors (r10 verdict #1).
    * Bit-exact and order-canonical: doubles hash by their IEEE bit
    * pattern after sorting by (sub, code) / cell, so the fingerprint
    * is stable across partitionings, JVMs, and load round-trips. */
  def fingerprint(codebooks: Seq[(Int, Array[(Int, Array[Double])])],
                  coarse: Option[Array[(Int, Array[Double])]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(8)
    def putLong(l: Long): Unit = { buf.clear(); buf.putLong(l); md.update(buf.array()) }
    codebooks.sortBy(_._1).foreach { case (s0, cs) =>
      putLong(s0.toLong)
      cs.sortBy(_._1).foreach { case (code, cv) =>
        putLong(code.toLong)
        cv.foreach(d => putLong(java.lang.Double.doubleToLongBits(d)))
      }
    }
    coarse.toSeq.flatMap(_.sortBy(_._1)).foreach { case (cell, cv) =>
      putLong(0x636f617273654c6cL) // section tag: coarse rows vs codebook rows
      putLong(cell.toLong)
      cv.foreach(d => putLong(java.lang.Double.doubleToLongBits(d)))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def fingerprint(index: Clustering.PqIndex): String =
    fingerprint(index.codebooks, index.coarse)

  /** Schema-metadata key [[Clustering.encodePqBatch]] stamps its
    * output's `vec_id` field with (the model fingerprint it encoded
    * against) — a plan-level mark, zero data and zero jobs, surviving
    * projections and repartitions on the way to [[appendCodes]]. */
  val encStampKey = "graft_enc_fp"

  private def stampOf(df: DataFrame): Option[String] =
    df.schema.fields.find(_.name == "vec_id")
      .filter(_.metadata.contains(encStampKey))
      .map(_.metadata.getString(encStampKey))

  /** Marker file sealed into a code relation's warehouse directory
    * once its index's meta is complete. [[claimTable]] refuses to drop
    * a sealed table: some COMPLETE index's meta points at it, and
    * re-using its name for a new index would silently destroy that
    * index's code relation while its meta still resolves (r10 advice
    * #1). Underscore-prefixed, so Parquet readers skip it. */
  private val sealName = "_graft_ann_complete"

  private[graft] def tableDir(spark: SparkSession, table: String) = {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
  }

  /** The owner path recorded in `table`'s seal, if its warehouse dir
    * is sealed at all — the classification input for [[claimTable]]
    * and for the warehouse GC (`graft.tools.Vacuum`): a seal whose
    * owner still holds a complete meta marks a LIVE index's table; a
    * seal whose owner is gone is stale and the table reclaimable. */
  private[graft] def sealOwner(spark: SparkSession, table: String): Option[String] = {
    val dir = tableDir(spark, table)
    val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seal = new org.apache.hadoop.fs.Path(dir, sealName)
    if (!hfs.exists(seal)) None
    else {
      val buf = new Array[Byte](hfs.getFileStatus(seal).getLen.toInt)
      val in = hfs.open(seal)
      try in.readFully(buf) finally in.close()
      Some(new String(buf, "UTF-8"))
    }
  }

  /** Take ownership of `table` for a fresh save: refuse if a LIVE
    * complete index owns it — the seal records its owner's path, and
    * the seal is live while that path still holds a complete meta
    * (the owner being deleted/retired makes the seal stale and the
    * name reclaimable). Otherwise clear the crashed-partial leftovers
    * (a previous save that died before its meta write, or a dead
    * JVM's catalog-forgotten location). */
  private def claimTable(spark: SparkSession, table: String): Unit = {
    val dir = tableDir(spark, table)
    val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    sealOwner(spark, table).foreach { owner =>
      if (owner.nonEmpty && exists(spark, owner))
        throw new IllegalStateException(
          s"table '$table' is the code relation of the COMPLETE ANN index " +
            s"at $owner — re-using its name would destroy that index (an " +
            "index is immutable history; pick a new table name, reference " +
            "backend.py:269-272)")
      // owner index gone (retired/deleted) — the seal is stale
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    hfs.delete(dir, true)
  }

  /** Seal `table` as owned by the complete index at `path` (see
    * [[claimTable]]); called AFTER the meta write, so a crash anywhere
    * earlier leaves an unsealed (reclaimable) partial, never a wedged
    * one. */
  private def sealTable(spark: SparkSession, table: String, path: String): Unit = {
    val dir = tableDir(spark, table)
    val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(new org.apache.hadoop.fs.Path(dir, sealName), true)
    try out.write(path.getBytes("UTF-8")) finally out.close()
  }

  /** Backfill the ownership seal for a LEGACY index (saved before the
    * seal existed) at load time: the meta at `path` is complete and
    * names `table`, so the table IS a live index's code relation —
    * without the seal, re-using its name would still silently destroy
    * this index (r11 advice #3: the exact scenario the seal was added
    * for, just for pre-seal saves). Idempotent; never downgrades an
    * existing seal. */
  private def backfillSeal(spark: SparkSession, table: String, path: String): Unit = {
    val dir = tableDir(spark, table)
    val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hfs.exists(dir) && !hfs.exists(new org.apache.hadoop.fs.Path(dir, sealName)))
      sealTable(spark, table, path)
  }

  /** Persist a trained [[Clustering.PqIndex]]. `table` names the
    * bucketed code relation in the session catalog (bucketing needs
    * `saveAsTable`); it is recorded in `meta.parquet` so [[load]]
    * finds it from the path alone.
    *
    * `metaCols` names metadata columns of `index.codes` (joined in by
    * the caller, e.g. a label/lang/source per vec_id) to DENORMALIZE
    * into the stored code relation — the filtered-serving design:
    * [[Clustering.pqQueryTopK]]'s `indexFilter` then answers inside
    * the bucketed code scan, no side join against a corpus-sized
    * attribute table at query time. Recorded in meta so
    * [[appendCodes]] keeps the schema (an append missing them fails
    * loudly instead of writing NULL metadata). */
  def save(index: Clustering.PqIndex, path: String, table: String,
           buckets: Int = 16, metaCols: Seq[String] = Nil): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    if (exists(spark, path))
      throw new IllegalStateException(
        s"ANN index $path already exists! Delete it or load it " +
          "(no-clobber, reference backend.py:269-272)")
    // No COMPLETE index here (meta is written last and absent) — but a
    // crashed previous save, or a previous JVM whose in-memory catalog
    // forgot the managed table while its warehouse directory survived,
    // can leave the codes table/location behind; saveAsTable would then
    // refuse with LOCATION_ALREADY_EXISTS forever. claimTable clears
    // such partials but REFUSES to take a table a live complete index
    // sealed (r10 advice #1): the no-clobber contract protects complete
    // indexes on BOTH identities, path and table name.
    claimTable(spark, table)
    val codeCols = (0 until index.m).map(s0 => col(s"code_$s0")) ++
      metaCols.map(col)
    if (index.coarse.isDefined) {
      // one file per bucket, sorted — same reasoning as writeBucketed:
      // multiple files per bucket would drop the sortedness guarantee
      index.codes.select((col("vec_id") +: col("cell") +: codeCols): _*)
        .repartition(buckets, col("cell"))
        .write.mode("overwrite")
        .bucketBy(buckets, "cell").sortBy("cell")
        .format("parquet").saveAsTable(table)
      index.coarse.get.toSeq.map { case (cell, cv) => (cell, cv) }
        .toDF("cell", "cv").coalesce(1).write.parquet(s"$path/coarse.parquet")
    } else {
      index.codes.select((col("vec_id") +: codeCols): _*)
        .write.parquet(s"$path/codes.parquet")
    }
    index.codebooks.flatMap { case (s0, cs) =>
      cs.map { case (code, cv) => (s0, code, cv) }
    }.toDF("sub", "code", "cv").coalesce(1).write.parquet(s"$path/codebooks.parquet")
    // meta LAST: its existence asserts the other pieces are complete,
    // so a crashed half-written save never passes the reuse check.
    // `buckets` is part of the index's identity — appendCodes/compact
    // must reuse it (a mismatched append would fail or, worse, change
    // the table's bucket spec), so it travels in meta, never as a
    // caller-remembered parameter. `meta_cols` is an ARRAY column
    // (comma-joining would corrupt a column name containing a comma —
    // r10 verdict #4); `fingerprint` is the model identity appendCodes
    // checks. The table seal goes on AFTER meta — a crash between
    // leaves a complete, loadable index whose table is merely
    // unclaimed-looking, and the next claim of that name is refused by
    // nothing... which is exactly the pre-seal status quo, never worse.
    Seq((index.m, index.codebookK, index.dim,
        index.coarse.map(_.length).getOrElse(0),
        if (index.coarse.isDefined) table else "", buckets,
        metaCols, fingerprint(index)))
      .toDF("m", "codebook_k", "dim", "coarse_cells", "codes_table",
        "buckets", "meta_cols", "fingerprint")
      .coalesce(1).write.parquet(s"$path/meta.parquet")
    if (index.coarse.isDefined) sealTable(spark, table, path)
  }

  /** Load a persisted index. The corpus-sized code relation comes back
    * as the bucketed catalog table (pre-partitioned on `cell` — no
    * index-side Exchange in a shuffled probe join) or the plain Parquet
    * file; codebooks and coarse centroids collect to driver arrays
    * (m·k and `cells` rows — parameters, not data). */
  def load(spark: SparkSession, path: String): Clustering.PqIndex = {
    val meta = spark.read.parquet(s"$path/meta.parquet").collect()(0)
    val m = meta.getAs[Int]("m")
    val codebookK = meta.getAs[Int]("codebook_k")
    val dim = meta.getAs[Int]("dim")
    val coarseCells = meta.getAs[Int]("coarse_cells")
    val table = meta.getAs[String]("codes_table")
    val cbRows = spark.read.parquet(s"$path/codebooks.parquet").collect()
    val codebooks = (0 until m).map { s0 =>
      (s0, cbRows.filter(_.getAs[Int]("sub") == s0)
        .map(r => (r.getAs[Int]("code"), r.getAs[Seq[Double]]("cv").toArray))
        .sortBy(_._1))
    }
    val loaded = if (coarseCells > 0) {
      val coarse = spark.read.parquet(s"$path/coarse.parquet").collect()
        .map(r => (r.getAs[Int]("cell"), r.getAs[Seq[Double]]("cv").toArray))
        .sortBy(_._1)
      Clustering.PqIndex(spark.table(table), None, codebooks, Some(coarse),
        m, codebookK, dim)
    } else {
      Clustering.PqIndex(spark.read.parquet(s"$path/codes.parquet"), None,
        codebooks, None, m, codebookK, dim)
    }
    // integrity: the model that comes back must hash to the identity
    // the save recorded — catches a corrupted/partially-replaced
    // codebooks or coarse file before it serves a single neighbor
    // (pre-fingerprint indexes carry no column — nothing to check)
    if (meta.schema.fieldNames.contains("fingerprint")) {
      val want = meta.getAs[String]("fingerprint")
      val got = fingerprint(loaded)
      if (got != want) throw new IllegalStateException(
        s"ANN index $path failed its integrity check: model fingerprint " +
          s"$got != saved $want (codebooks/coarse.parquet corrupted or " +
          "replaced)")
    }
    // legacy-seal backfill (r11 advice #3): a pre-seal index that loads
    // cleanly gains the same table-ownership protection new saves get
    if (coarseCells > 0 && table.nonEmpty) backfillSeal(spark, table, path)
    loaded
  }

  /** Append a [[Clustering.encodePqBatch]] batch to a persisted
    * index's code relation — the O(batch) daily-ingest path: new
    * vectors join the serving index without touching the existing
    * codes or re-training anything. The append lands bucketed on the
    * same key, so bucket-wise distribution (the no-index-side-shuffle
    * property) survives; what an append DOES trade away is the
    * one-file-per-bucket sortedness guarantee (now ≥ 2 files per
    * bucket — Spark may re-sort within tasks where it previously
    * didn't). Periodic compaction — rewrite the table once via
    * [[save]]'s discipline — restores it; the same trade G9's
    * bucketed-weights append would make. Plain-Parquet (no-coarse)
    * indexes append as additional files. */
  def appendCodes(index: Clustering.PqIndex, newCodes: DataFrame,
                  path: String): Unit = {
    val spark = newCodes.sparkSession
    require(exists(spark, path), s"no ANN index at $path to append to")
    val meta = spark.read.parquet(s"$path/meta.parquet").collect()(0)
    val m = meta.getAs[Int]("m")
    val table = meta.getAs[String]("codes_table")
    val buckets = meta.getAs[Int]("buckets")
    // identity check (r10 verdict #1): the index handle AND the batch
    // must both have been produced against THIS persisted model —
    // codes from another index's codebooks would land with wrong cells
    // and meanings, silently poisoning every served neighbor. The
    // handle hashes directly; the batch carries encodePqBatch's
    // enc_fp stamp (un-stamped caller-built batches skip that half —
    // pre-fingerprint indexes have nothing to check against).
    if (meta.schema.fieldNames.contains("fingerprint")) {
      val want = meta.getAs[String]("fingerprint")
      val got = fingerprint(index)
      require(got == want,
        s"appendCodes: the index handle's model fingerprint $got does not " +
          s"match the index at $path ($want) — it was trained/loaded " +
          "against a different index")
      stampOf(newCodes).foreach(sf => require(sf == want,
        s"appendCodes: the batch was encoded against a different index " +
          s"(enc_fp $sf != $want) — re-encode with encodePqBatch against " +
          "THIS index"))
    }
    // metadata columns recorded at save time must travel with every
    // append, or filtered serving would silently see NULLs for the new
    // vectors. Array column since r11; the comma-joined string form
    // (r10 saves) and column-less meta (r9) read back compatibly.
    val metaCols =
      if (meta.schema.fieldNames.contains("meta_cols"))
        meta.get(meta.fieldIndex("meta_cols")) match {
          case s: String => s.split(",").filter(_.nonEmpty).toSeq
          case a: scala.collection.Seq[_] => a.map(_.toString).toSeq
          case null => Seq.empty[String]
        }
      else Seq.empty[String]
    metaCols.foreach(c => require(newCodes.columns.contains(c),
      s"append batch is missing the index's metadata column '$c' " +
        s"(saved with metaCols=${metaCols.mkString(",")})"))
    val codeCols = (0 until m).map(s0 => col(s"code_$s0")) ++ metaCols.map(col)
    if (meta.getAs[Int]("coarse_cells") > 0)
      newCodes.select((col("vec_id") +: col("cell") +: codeCols): _*)
        .repartition(buckets, col("cell"))
        .write.mode("append")
        .bucketBy(buckets, "cell").sortBy("cell")
        .format("parquet").saveAsTable(table)
    else
      newCodes.select((col("vec_id") +: codeCols): _*)
        .write.mode("append").parquet(s"$path/codes.parquet")
  }

  /** Compact an appended code relation back to one file per bucket —
    * the periodic maintenance pass that restores [[save]]'s sortedness
    * guarantee after a run of [[appendCodes]] batches (each append
    * adds a file per bucket; reads stay correct but within-task sorts
    * creep back in). Rewrites the SAME rows through the same
    * repartition-then-bucketed write; results are untouched
    * (spec-pinned), only the file layout changes. */
  def compactCodes(spark: SparkSession, path: String): Unit = {
    require(exists(spark, path), s"no ANN index at $path to compact")
    val meta = spark.read.parquet(s"$path/meta.parquet").collect()(0)
    val table = meta.getAs[String]("codes_table")
    val buckets = meta.getAs[Int]("buckets")
    if (meta.getAs[Int]("coarse_cells") > 0) {
      // materialize off the table before overwriting it
      val rows = spark.table(table).localCheckpoint()
      rows.repartition(buckets, col("cell"))
        .write.mode("overwrite")
        .bucketBy(buckets, "cell").sortBy("cell")
        .format("parquet").saveAsTable(table)
      // the overwrite recreated the table directory — restore the
      // ownership seal (the index is still the same complete index)
      sealTable(spark, table, path)
    }
    // plain-Parquet (no-coarse) indexes have no bucket layout to restore
  }

  /** Persist a trained [[Clustering.IvfIndex]] — the learned-IVF
    * sibling of [[save]]: centroids as tiny Parquet, the cell
    * assignment (the only corpus-sized piece) as a table BUCKETED on
    * `vec_id`, the key [[Similarity.topKWithinGroups]] joins it to the
    * embedding table on — co-bucketed with a `vec_id`-bucketed
    * embedding table (the G9 co-bucketed-field discipline) that join
    * needs no Exchange on either side. Meta written last; same
    * no-clobber + stale-location rules as [[save]]. */
  def saveIvf(index: Clustering.IvfIndex, path: String, table: String,
              buckets: Int = 16): Unit = {
    val spark = index.asg.sparkSession
    import spark.implicits._
    if (exists(spark, path))
      throw new IllegalStateException(
        s"ANN index $path already exists! Delete it or load it " +
          "(no-clobber, reference backend.py:269-272)")
    claimTable(spark, table)
    index.asg.select(col("vec_id").cast("long"), col("g").cast("int"))
      .repartition(buckets, col("vec_id"))
      .write.mode("overwrite")
      .bucketBy(buckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(table)
    index.cents.toSeq.map { case (cl, cv) => (cl, cv) }
      .toDF("cl", "cv").coalesce(1).write.parquet(s"$path/cents.parquet")
    Seq((index.cents.length, index.dim, table, buckets,
        fingerprint(Nil, Some(index.cents))))
      .toDF("cells", "dim", "asg_table", "buckets", "fingerprint")
      .coalesce(1).write.parquet(s"$path/meta.parquet")
    sealTable(spark, table, path)
  }

  /** Load a persisted learned-IVF index (see [[saveIvf]]). */
  def loadIvf(spark: SparkSession, path: String): Clustering.IvfIndex = {
    val meta = spark.read.parquet(s"$path/meta.parquet").collect()(0)
    val cents = spark.read.parquet(s"$path/cents.parquet").collect()
      .map(r => (r.getAs[Int]("cl"), r.getAs[Seq[Double]]("cv").toArray))
      .sortBy(_._1)
    if (meta.schema.fieldNames.contains("fingerprint")) {
      val want = meta.getAs[String]("fingerprint")
      val got = fingerprint(Nil, Some(cents))
      if (got != want) throw new IllegalStateException(
        s"IVF index $path failed its integrity check: centroid " +
          s"fingerprint $got != saved $want (cents.parquet corrupted or " +
          "replaced)")
    }
    backfillSeal(spark, meta.getAs[String]("asg_table"), path)
    Clustering.IvfIndex(spark.table(meta.getAs[String]("asg_table")),
      cents, meta.getAs[Int]("dim"))
  }

  /** Retire an index: delete its directory (the meta goes with it, so
    * [[exists]] turns false, [[load]] refuses, and the table-ownership
    * seal goes STALE — the name becomes reclaimable), then drop its
    * code-relation table and directory. The meta-bearing directory is
    * removed FIRST, so a crash mid-retire leaves a non-loadable
    * partial (reclaimable leftovers), never a loadable index whose
    * table is gone. No-op when no complete index lives at `path`. */
  def retire(spark: SparkSession, path: String): Unit = {
    if (!exists(spark, path)) return
    val meta = spark.read.parquet(s"$path/meta.parquet").collect()(0)
    val table =
      if (meta.schema.fieldNames.contains("codes_table"))
        meta.getAs[String]("codes_table")
      else meta.getAs[String]("asg_table")
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true)
    if (table != null && table.nonEmpty) {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val dir = tableDir(spark, table)
      dir.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(dir, true)
    }
  }

  /** Promote a [[Clustering.refreshCentroids]] output into a SERVING
    * index — the workflow half of the model-drift story (r11 verdict
    * #1: the fingerprint machinery REFUSES appends across models; this
    * is the supported way to move serving onto the refreshed model):
    *
    *  1. the index at `oldPath` is loaded (integrity-checked) and its
    *     coarse centroids replaced by `refreshedCoarse` — the codebooks
    *     are untouched (a coarse refresh moves CELL boundaries, not
    *     code meanings), so the new model's fingerprint differs and
    *     every cross-model append refuses by construction;
    *  2. the code relation is RE-CELLED in one corpus pass: `emb` is
    *     assigned to the refreshed centroids ([[Clustering
    *     .assignToCentroids]] — broadcast scan, no shuffle) and
    *     equi-joined to the existing codes on `vec_id`, so the m code
    *     columns (and any `metaCols`) are reused, never re-trained —
    *     O(corpus) once, the cheapest correct re-encode (codes depend
    *     only on the unchanged codebooks);
    *  3. the result is SAVED as a new immutable index version at
    *     `newPath`/`newTable` (meta-last, fresh fingerprint, same
    *     buckets and metaCols as the old meta records);
    *  4. the OLD index is retired LAST ([[retire]]): its seals go
    *     stale and its table drops — a crash anywhere earlier leaves
    *     both versions complete and loadable, never neither.
    *
    * `newTable` must be a fresh name — claiming the live old index's
    * table refuses (no-clobber on both identities). Loud guard: every
    * code-relation row must find its vector in `emb` (an inner join
    * silently dropping indexed vectors would shrink the served corpus).
    * Reference discipline: `frontend.py:144-146` reuse semantics
    * applied to model drift. Returns the loaded new index. */
  def rollover(spark: SparkSession, oldPath: String, emb: DataFrame,
               refreshedCoarse: Array[(Int, Array[Double])],
               newPath: String, newTable: String): Clustering.PqIndex = {
    val old = load(spark, oldPath)
    require(old.coarse.isDefined,
      "rollover refreshes the coarse IVF model; the index at " +
        s"$oldPath has no coarse cells (exhaustive-ADC indexes have no " +
        "cell boundaries to refresh)")
    require(refreshedCoarse.map(_._1).sorted.sameElements(old.coarse.get.map(_._1).sorted),
      "rollover: refreshedCoarse must carry the SAME centroid ids as " +
        "the old model (refreshCentroids preserves ids; a different id " +
        "set is a different model family, not a refresh)")
    val meta = spark.read.parquet(s"$oldPath/meta.parquet").collect()(0)
    val buckets = meta.getAs[Int]("buckets")
    val metaCols: Seq[String] =
      if (meta.schema.fieldNames.contains("meta_cols"))
        meta.get(meta.fieldIndex("meta_cols")) match {
          case s: String => s.split(",").filter(_.nonEmpty).toSeq
          case a: scala.collection.Seq[_] => a.map(_.toString).toSeq
          case null => Seq.empty[String]
        }
      else Seq.empty[String]
    val nOld = old.codes.count()
    val newCells = Clustering.assignToCentroids(emb, refreshedCoarse)
      .select(col("vec_id"), col("cluster").as("cell"))
    val newCodes = old.codes.drop("cell").join(newCells, "vec_id")
      .localCheckpoint() // the save below reads it twice (codes + seal path)
    val nNew = newCodes.count()
    if (nNew != nOld) throw new IllegalStateException(
      s"rollover: re-celling matched $nNew of $nOld indexed vectors — " +
        "`emb` must cover every vec_id in the code relation (missing " +
        "vectors would silently vanish from the served corpus)")
    val newIdx = old.copy(codes = newCodes, cellAsg = None,
      coarse = Some(refreshedCoarse))
    save(newIdx, newPath, newTable, buckets, metaCols)
    retire(spark, oldPath)
    load(spark, newPath)
  }

  /** `reuse_weights=True` (`frontend.py:144-146`): load the index at
    * `path` when one exists, else train on `emb`, save, and return the
    * trained index. */
  def loadOrTrain(spark: SparkSession, emb: => DataFrame, path: String,
                  table: String, m: Int, codebookK: Int, iters: Int,
                  dim: Int = 64, coarseCells: Int = 0, coarseIters: Int = 2,
                  buckets: Int = 16): Clustering.PqIndex =
    if (exists(spark, path)) load(spark, path)
    else {
      val idx = Clustering.trainPqIndex(emb, m, codebookK, iters, dim,
        coarseCells, coarseIters)
      save(idx, path, table, buckets)
      idx
    }
}
