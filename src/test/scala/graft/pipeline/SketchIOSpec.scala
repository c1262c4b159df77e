package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch PERSISTENCE lifecycle (SketchIO): the merge laws
  * SketchPropertySpec pins in-memory must survive a round trip through
  * Parquet files — write each snapshot's sketch, read it back, merge,
  * and get BIT-FOR-BIT the direct full-corpus sketch. This is the
  * per-day 100 TB workflow (persist tiny summaries, never re-scan old
  * corpora); q_hll_merge proves the HLL leg through the DuckDB oracle,
  * this spec covers all three relation shapes plus the V8 no-clobber
  * contract. */
class SketchIOSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("sketch-io")
    .getOrCreate()
  import spark.implicits._

  private def tmpBase(): String = {
    val d = java.nio.file.Files.createTempDirectory("sketch_io_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val vals: Seq[(String, String)] =
    (0 until 900).map(i => (if (i % 3 == 0) "ga" else "gb", s"v${i % 700}"))
  private def full: DataFrame = vals.toDF("g", "v")
  private def snapA: DataFrame = full.filter(length(col("v")) % 2 === 0)
  private def snapB: DataFrame = full.filter(length(col("v")) % 2 =!= 0)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("HLL register file: write two snapshots, read, max-merge == direct full sketch") {
    val base = tmpBase()
    SketchIO.writeSketch(Sketches.hllSketch(snapA, "g", col("v"), 8), s"$base/a.parquet")
    SketchIO.writeSketch(Sketches.hllSketch(snapB, "g", col("v"), 8), s"$base/b.parquet")
    val merged = SketchIO.mergeHll(Seq(
      SketchIO.readSketch(spark, s"$base/a.parquet"),
      SketchIO.readSketch(spark, s"$base/b.parquet")), "g")
    assert(rows(merged) === rows(Sketches.hllSketch(full, "g", col("v"), 8)))
    // and the estimates over the merged file match the direct estimates
    assert(rows(Sketches.hllEstimate(merged, "g", 8)) ===
      rows(Sketches.hllEstimate(Sketches.hllSketch(full, "g", col("v"), 8), "g", 8)))
  }

  test("CM counters: write two snapshots, read, sum-merge == direct full sketch") {
    val base = tmpBase()
    SketchIO.writeSketch(Sketches.cmSketch(snapA, col("v"), 4, 64), s"$base/a.parquet")
    SketchIO.writeSketch(Sketches.cmSketch(snapB, col("v"), 4, 64), s"$base/b.parquet")
    val merged = SketchIO.mergeCm(Seq(
      SketchIO.readSketch(spark, s"$base/a.parquet"),
      SketchIO.readSketch(spark, s"$base/b.parquet")))
    assert(rows(merged) === rows(Sketches.cmSketch(full, col("v"), 4, 64)))
  }

  test("Bloom bits: write two snapshots, read, distinct-union == direct full filter") {
    val base = tmpBase()
    SketchIO.writeSketch(Sketches.bloomBits(snapA, col("v"), 4096, 3), s"$base/a.parquet")
    SketchIO.writeSketch(Sketches.bloomBits(snapB, col("v"), 4096, 3), s"$base/b.parquet")
    val merged = SketchIO.mergeBloom(Seq(
      SketchIO.readSketch(spark, s"$base/a.parquet"),
      SketchIO.readSketch(spark, s"$base/b.parquet")))
    assert(rows(merged) === rows(Sketches.bloomBits(full, col("v"), 4096, 3)))
  }

  test("writeSketch refuses to clobber an existing snapshot (V8)") {
    val base = tmpBase()
    val sk = Sketches.hllSketch(snapA, "g", col("v"), 8)
    SketchIO.writeSketch(sk, s"$base/a.parquet")
    val e = intercept[IllegalStateException] {
      SketchIO.writeSketch(sk, s"$base/a.parquet")
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("hllSketch drops NULL values instead of emitting a NULL-bucket register (ADVICE r9)") {
    val withNulls = Seq(Some("x"), None, Some("y"), None).map(v => ("g1", v))
      .toDF("g", "v").select(col("g"), col("v").as("v"))
    val sk = Sketches.hllSketch(withNulls, "g", col("v"), 8)
    assert(sk.filter(col("bucket").isNull || col("r").isNull).count() === 0)
    // estimate over {x, y} alone, unbiased by the dropped NULLs
    val expected = Sketches.hllEstimate(
      Sketches.hllSketch(Seq(("g1", "x"), ("g1", "y")).toDF("g", "v"), "g", col("v"), 8), "g", 8)
    assert(rows(Sketches.hllEstimate(sk, "g", 8)) === rows(expected))
  }
}
