package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.regrid._

/** Micro-benchmark: isolate the SpMM apply formulations at the
  * BASELINE workload scale (400×600 → 300×400, 4-D ≈ 120 M values). */
object ApplyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val gridIn = RectGrid.of(-120, 120, 0.4, -60, 60, 0.3)
    val gridOut = RectGrid.of(-120, 120, 0.6, -60, 60, 0.4)
    val weights = Weights.bilinear(gridIn, Grids.cells(spark, gridOut), periodic = false).cache()
    println(s"weights rows=${weights.count()}")
    val field = Grids.cells(spark, gridIn)
      .select(col("cell_id"), TestFields.waveSmooth(col("lon"), col("lat")).as("v0"))
      .crossJoin(spark.range(1, 11).toDF("time"))
      .crossJoin(spark.range(1, 51).toDF("lev"))
      .select(col("cell_id"), col("time"), col("lev"),
        (col("time") * col("lev") * col("v0")).as("value"))
      .cache()
    println(s"field rows=${field.count()}")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // Interleaved best-of-3 with a GC pass per run: the two plans under
    // test differ by the 4a95c08 slab-locality repartition, and single
    // runs at this scale swing ±3 s from collector pauses alone.
    def noRepart(): Long =
      field.join(broadcast(weights), field("cell_id") === weights("col"))
        .groupBy("row", "time", "lev")
        .agg(sum(col("s") * col("value")).as("value")).count()
    def withRepart(): Long =
      field.repartition(col("time"), col("lev"))
        .join(broadcast(weights), field("cell_id") === weights("col"))
        .groupBy("row", "time", "lev")
        .agg(sum(col("s") * col("value")).as("value")).count()
    def best(tag: String, f: () => Long, runs: Int = 3): Double = {
      val ts = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s best ${ts.min}%6.2f s  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
      ts.min
    }
    best("join-agg no-repart", () => noRepart())
    best("join-agg repart", () => withRepart())
    // current Apply.regrid (padded weights)
    time("Apply.regrid padded") {
      Apply.regrid(weights, field, Grids.cells(spark, gridOut),
        extraDims = Seq("time", "lev"), roundDigits = 0).count()
    }
    // padded + rounding
    time("Apply.regrid padded+r9") {
      Apply.regrid(weights, field, Grids.cells(spark, gridOut),
        extraDims = Seq("time", "lev")).count()
    }
    // slab-major conversion (one-time data prep, cached like scipy's
    // in-RAM input array)
    val slabs = Apply.toSlabs(field, gridIn.nCells.toInt, Seq("time", "lev"))
      .select(expr("time * 64 + lev").as("slab_id"), col("values")).cache()
    time("toSlabs (prep, cached)") { slabs.count() }
    // slab-vectorized kernel (scipy-equivalent dense layout)
    time("regridSlabbed dense") {
      Apply.regridSlabbed(weights, slabs, gridOut.nCells.toInt).count()
    }
    time("regridSlabbed dense (2nd)") {
      Apply.regridSlabbed(weights, slabs, gridOut.nCells.toInt).count()
    }
    // slabbed + explode back to relational rows
    time("regridSlabbed + explode") {
      Apply.regridSlabbed(weights, slabs, gridOut.nCells.toInt)
        .select((col("slab_id") / 64).cast("long").as("time"),
          pmod(col("slab_id"), lit(64)).as("lev"),
          posexplode(col("values")).as(Seq("cell_id", "value")))
        .count()
    }
    spark.stop()
  }
}
