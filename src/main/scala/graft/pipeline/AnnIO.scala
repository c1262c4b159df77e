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
    // refuse with LOCATION_ALREADY_EXISTS forever. Clearing a partial
    // artifact is correct — the no-clobber contract protects complete
    // indexes, which the meta check above already did.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    locally {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
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
    // caller-remembered parameter.
    Seq((index.m, index.codebookK, index.dim,
        index.coarse.map(_.length).getOrElse(0),
        if (index.coarse.isDefined) table else "", buckets,
        metaCols.mkString(",")))
      .toDF("m", "codebook_k", "dim", "coarse_cells", "codes_table",
        "buckets", "meta_cols")
      .coalesce(1).write.parquet(s"$path/meta.parquet")
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
    if (coarseCells > 0) {
      val coarse = spark.read.parquet(s"$path/coarse.parquet").collect()
        .map(r => (r.getAs[Int]("cell"), r.getAs[Seq[Double]]("cv").toArray))
        .sortBy(_._1)
      Clustering.PqIndex(spark.table(table), None, codebooks, Some(coarse),
        m, codebookK, dim)
    } else {
      Clustering.PqIndex(spark.read.parquet(s"$path/codes.parquet"), None,
        codebooks, None, m, codebookK, dim)
    }
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
    // metadata columns recorded at save time must travel with every
    // append, or filtered serving would silently see NULLs for the new
    // vectors (pre-meta_cols indexes have no such column — treat as
    // none)
    val metaCols =
      if (meta.schema.fieldNames.contains("meta_cols"))
        meta.getAs[String]("meta_cols").split(",").filter(_.nonEmpty).toSeq
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
    spark.sql(s"DROP TABLE IF EXISTS $table")
    locally {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    index.asg.select(col("vec_id").cast("long"), col("g").cast("int"))
      .repartition(buckets, col("vec_id"))
      .write.mode("overwrite")
      .bucketBy(buckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(table)
    index.cents.toSeq.map { case (cl, cv) => (cl, cv) }
      .toDF("cl", "cv").coalesce(1).write.parquet(s"$path/cents.parquet")
    Seq((index.cents.length, index.dim, table, buckets))
      .toDF("cells", "dim", "asg_table", "buckets")
      .coalesce(1).write.parquet(s"$path/meta.parquet")
  }

  /** Load a persisted learned-IVF index (see [[saveIvf]]). */
  def loadIvf(spark: SparkSession, path: String): Clustering.IvfIndex = {
    val meta = spark.read.parquet(s"$path/meta.parquet").collect()(0)
    val cents = spark.read.parquet(s"$path/cents.parquet").collect()
      .map(r => (r.getAs[Int]("cl"), r.getAs[Seq[Double]]("cv").toArray))
      .sortBy(_._1)
    Clustering.IvfIndex(spark.table(meta.getAs[String]("asg_table")),
      cents, meta.getAs[Int]("dim"))
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
