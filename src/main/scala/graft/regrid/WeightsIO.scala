package graft.regrid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weight-file interop with the reference's on-disk convention.
  *
  * ESMF weight files are COO triplet tables with variables
  * `(col, row, S)` in **1-based** indexing; the reference shifts them to
  * 0-based on read (`xesmf/smm.py:10-41`: `col = ds['col'].values - 1`)
  * and persists files in that convention (`frontend.py:264-280`). Two
  * physical carriers, one convention: the reference's actual NetCDF-3
  * format via the in-repo [[NetCDF3]] codec (`readEsmfNc`/
  * `writeEsmfNc` — real `.nc` interop with existing xESMF weight
  * files), and Parquet (`readEsmf`/`writeEsmf`) for engine-native and
  * cluster-scale persistence. Both ingest 1-based `(col, row, S)` and
  * return the engine-native 0-based `(row, col, s)`.
  */
object WeightsIO {

  /** Read a weight file in ESMF convention (1-based `col`/`row`,
    * capital `S`) → native 0-based `(row, col, s)`. */
  def readEsmf(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(
      (col("row") - 1).cast("long").as("row"),
      (col("col") - 1).cast("long").as("col"),
      col("S").cast("double").as("s"))

  /** Persist weights BUCKETED on the source-cell key `col` — the
    * huge-W scale path. When W is too large to broadcast, the
    * relational apply becomes a shuffled join on `col`; a W persisted
    * with matching buckets is read pre-partitioned, so EVERY
    * subsequent apply skips the weights-side shuffle entirely (the
    * plan shows no Exchange above the weights scan — asserted in
    * RegridSpec) and only the field side moves. Precompute-once /
    * apply-many is the reference's whole design (`frontend.py:144-146`
    * weight reuse); bucketing is its cluster-scale form. Sorted within
    * buckets so the sort-merge join needs no per-task sort on W. */
  def writeBucketed(weights: DataFrame, table: String, buckets: Int = 64): Unit =
    weights.select(col("row").cast("long"), col("col").cast("long"), col("s"))
      // co-partition on the bucket key before writing: each bucket then
      // lands in ONE file. With several files per bucket Spark drops the
      // sortedness guarantee and re-Sorts the whole of W above the scan
      // on every apply — the exact cost bucketing is meant to remove.
      .repartition(buckets, col("col"))
      .write.mode("overwrite")
      .bucketBy(buckets, "col").sortBy("col")
      .format("parquet").saveAsTable(table)

  /** Read a bucketed weights table (see [[writeBucketed]]). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Land a FIELD co-bucketed with a [[writeBucketed]] weights table:
    * same bucket count, bucketed on `cell_id` (the join key against
    * W's `col`), one file per bucket, sorted. A field written this way
    * joins bucketed W with NO Exchange on either side — the apply's
    * only remaining shuffle is the output aggregation's (`row` is a
    * different key; irreducible). The removed field-side Exchange is
    * proportional to FIELD size, which in the 100 TB
    * standing-W/incoming-field regime is the data itself — measured in
    * PLANS.md (executed plan 3 → 1 Exchanges across the plain /
    * bucketed-W / co-bucketed variants, results row-identical).
    * `extraCols` keeps value/dimension columns alongside
    * (`value`, `time`, `lev`, …). */
  def writeBucketedField(field: DataFrame, table: String,
                         buckets: Int = 64,
                         extraCols: Seq[String] = Seq("value")): Unit =
    field.select((col("cell_id").cast("long") +: extraCols.map(col)): _*)
      .repartition(buckets, col("cell_id"))
      .write.mode("overwrite")
      .bucketBy(buckets, "cell_id").sortBy("cell_id")
      .format("parquet").saveAsTable(table)

  /** Read an ESMF/xESMF NetCDF weight file (the reference's actual
    * on-disk format, `frontend.py:264-280` / `smm.py:10-41`): classic
    * NetCDF-3 parsed by the in-repo [[NetCDF3]] codec, 1-based
    * `col`/`row` shifted to the native 0-based relation. Weight files
    * are driver-RAM-sized by the reference's own design (it loads the
    * scipy COO in full); cluster-scale weights live in (bucketed)
    * Parquet instead. */
  def readEsmfNc(spark: SparkSession, path: String): DataFrame = {
    val (c, r, s) = NetCDF3.readTriplets(path)
    import spark.implicits._
    spark.sparkContext
      .parallelize(r.indices.map(i => (r(i) - 1, c(i) - 1, s(i))).toSeq,
        math.max(1, math.min(32, r.length / 65536)))
      .toDF("row", "col", "s")
  }

  /** Write a native weights relation as an ESMF-convention NetCDF-3
    * file readable by xESMF/scipy (1-based `col`/`row`, capital `S`,
    * dimension `n_s`). Same no-clobber contract as [[writeEsmf]]. */
  def writeEsmfNc(weights: DataFrame, path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists())
      throw new IllegalStateException(
        s"Weight file $path already exists! Please delete it or pass reuse semantics " +
          "(reference backend.py:269-272)")
    val spark = weights.sparkSession
    import spark.implicits._
    // deterministic triplet order: the same weight relation must emit
    // byte-identical files under any partitioning/parallelism
    val rows = weights.select(col("row").cast("long"), col("col").cast("long"), col("s"))
      .orderBy("row", "col").as[(Long, Long, Double)].collect()
    require(rows.length.toLong <= SlabApplier.defaultMaxTriplets,
      s"${rows.length} triplets exceed the driver-side weight-file ceiling; " +
        "persist cluster-scale weights as Parquet (writeBucketed) instead")
    rows.foreach { case (r, c, _) =>
      require(r >= 0 && r < Int.MaxValue && c >= 0 && c < Int.MaxValue,
        s"cell ids ($r, $c) do not fit the NetCDF int col/row convention") }
    Option(f.getParentFile).foreach(_.mkdirs())
    NetCDF3.writeTriplets(path,
      rows.map(t => (t._2 + 1).toInt), rows.map(t => (t._1 + 1).toInt),
      rows.map(_._3))
  }

  /** Write a native weights relation as an ESMF-convention file
    * (1-based, capital `S`). Refuses to clobber an existing file — the
    * reference's V8 contract (`backend.py:269-272`). */
  def writeEsmf(weights: DataFrame, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(weights.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      throw new IllegalStateException(
        s"Weight file $path already exists! Please delete it or pass reuse semantics " +
          "(reference backend.py:269-272)")
    weights.select(
      (col("row") + 1).as("row"),
      (col("col") + 1).as("col"),
      col("s").as("S"))
      .write.parquet(path)
  }
}
