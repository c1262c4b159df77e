package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence + merge lifecycle for the sketch family — the G9
  * weights discipline (persist once, reuse many; reference
  * `frontend.py:264-280`) applied to the distinct / frequency /
  * membership summaries of [[Sketches]].
  *
  * The 100 TB workflow this enables: sketch each day's (or each
  * split's) corpus ONCE, persist the tiny summary relation, and answer
  * cross-snapshot questions — "distinct shingles across the whole
  * corpus", "frequency of x over all of history", "was this n-gram ever
  * ingested" — from the persisted files alone, never re-scanning old
  * data. All three relations are closed under their merge:
  *
  *  - HLL register file `(group, bucket, r)`: elementwise MAX — the
  *    max-merge of two register files IS the union's register file,
  *    exactly (not approximately), so merged estimates equal
  *    full-corpus estimates bit-for-bit and hash-gate (`q_hll_merge`);
  *  - Count-Min counters `(r, c, cnt)`: elementwise SUM (counters are
  *    linear in the input multiset);
  *  - Bloom set-bit positions `(pos)`: distinct UNION (it's a set).
  *
  * Merges are pure relational algebra over files whose size is bounded
  * by the sketch parameters (2^p / depth·width / mBits rows), not the
  * corpus — a year of daily 100 TB snapshots merges in milliseconds.
  * Writes follow the V8 no-clobber contract the weight files follow
  * (reference `backend.py:269-272`): refusing to overwrite is what
  * makes "append a new snapshot" safe to automate.
  */
object SketchIO {

  /** Persist a sketch relation as Parquet. No-clobber (V8): a snapshot
    * file is immutable history — new data gets a NEW file, questions
    * get a merge. */
  def writeSketch(sketch: DataFrame, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sketch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      throw new IllegalStateException(
        s"Sketch file $path already exists! Delete it or write a new snapshot " +
          "and merge (no-clobber, reference backend.py:269-272)")
    sketch.write.parquet(path)
  }

  /** Read a persisted sketch relation (any of the three shapes). */
  def readSketch(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Merge HLL register files: elementwise max per (group, bucket).
    * EXACT — the result is the register file of the union of the
    * sketched multisets (spec-pinned in SketchPropertySpec, oracle-
    * proven through q_hll_merge). Inputs at different precisions must
    * not be mixed; callers keep one `p` per sketch family. */
  def mergeHll(sketches: Seq[DataFrame], groupCol: String): DataFrame = {
    require(sketches.nonEmpty, "mergeHll needs at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy(col(groupCol), col("bucket")).agg(max("r").as("r"))
  }

  /** Merge Count-Min sketches: elementwise counter sum per (r, c).
    * EXACT for the same (depth, width): CM counters are linear, so the
    * merged sketch equals the sketch of the concatenated corpora. */
  def mergeCm(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "mergeCm needs at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
  }

  /** Merge Bloom bit relations: distinct union of set positions.
    * EXACT for the same (mBits, kHashes): the filter of a union is the
    * union of the filters. */
  def mergeBloom(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "mergeBloom needs at least one sketch")
    sketches.reduce(_.unionByName(_)).distinct()
  }
}
