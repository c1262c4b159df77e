package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.regrid._

/** Benchmark main: one JSON line with per-query wall times.
  *
  * Two groups:
  *  - every driver-contract query at `SPARK_GRAFT_SF_DIR` scale;
  *  - the reference's own benchmark workload (BASELINE.md,
  *    `doc/notebooks/Backend.ipynb` cells 17/24/33): bilinear weight
  *    build 400×600 → 300×400 (baseline 7.57 s) and the 4-D apply of
  *    (time=10, lev=50, 400, 600) ≈ 120 M values (baseline 0.62 s).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // bench contract runs at local[32] (builder prompt); allow override
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/Spark warm-up so the first measured query doesn't absorb
    // classloading + codegen compilation
    spark.range(1000000).selectExpr("sum(id)").collect()

    val contract = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> time {
        try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      }
    }

    // reference-benchmark workload (grids from BASELINE.md)
    val gridIn = RectGrid.of(-120, 120, 0.4, -60, 60, 0.3)    // 400 x 600
    val gridOut = RectGrid.of(-120, 120, 0.6, -60, 60, 0.4)   // 300 x 400
    val tBuild = time {
      Weights.bilinear(gridIn, Grids.cells(spark, gridOut), periodic = false).count()
    }
    val weights = Weights.bilinear(gridIn, Grids.cells(spark, gridOut), periodic = false)
      .cache()
    weights.count()
    // 4-D field (time=10, lev=50) over 240k cells = 120M values,
    // generated once and cached so the apply measurement is pure SpMM
    val field = Grids.cells(spark, gridIn)
      .select(col("cell_id"), TestFields.waveSmooth(col("lon"), col("lat")).as("v0"))
      .crossJoin(spark.range(1, 11).toDF("time"))
      .crossJoin(spark.range(1, 51).toDF("lev"))
      .select(col("cell_id"), col("time"), col("lev"),
        (col("time") * col("lev") * col("v0")).as("value"))
      .cache()
    field.count()
    val tApply = time {
      Apply.regrid(weights, field, Grids.cells(spark, gridOut),
        extraDims = Seq("time", "lev"), roundDigits = 0).count()
    }
    val tApply2d = time {
      Apply.regrid(weights,
        Grids.cells(spark, gridIn).select(col("cell_id"),
          TestFields.waveSmooth(col("lon"), col("lat")).as("value")),
        Grids.cells(spark, gridOut), roundDigits = 0).count()
    }

    val all = contract ++ Seq(
      "bench_weight_build_bilinear_400x600_300x400" -> tBuild,
      "bench_apply_4d_120M" -> tApply,
      "bench_apply_2d_240k" -> tApply2d)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
