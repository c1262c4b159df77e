package graft.regrid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weight-file interop with the reference's on-disk convention.
  *
  * ESMF weight files are COO triplet tables with variables
  * `(col, row, S)` in **1-based** indexing; the reference shifts them to
  * 0-based on read (`xesmf/smm.py:10-41`: `col = ds['col'].values - 1`)
  * and persists files in that convention (`frontend.py:264-280`). The
  * container has no NetCDF codec, so the same triplet relation is
  * carried as Parquet — the format hop changes nothing about the
  * convention: `readEsmf` ingests 1-based `(col, row, S)` and returns
  * the engine-native 0-based `(row, col, s)`.
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
      .write.mode("overwrite")
      .bucketBy(buckets, "col").sortBy("col")
      .format("parquet").saveAsTable(table)

  /** Read a bucketed weights table (see [[writeBucketed]]). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

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
