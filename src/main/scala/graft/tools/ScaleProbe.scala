package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.regrid._

/** Scale probe: run the weight builders on grids 100-1000× the contract
  * fixtures (0.5° global source = 259 200 cells → 1° destination =
  * 64 800 cells; bilinear also at 0.1° = 6.48 M cells) to demonstrate
  * the banded equi-join plans hold their shape as the grids grow —
  * the local[32] stand-in for the 1000-executor question.
  *
  * Not part of Bench (keeps BENCH totals comparable round to round);
  * run manually: runMain graft.tools.ScaleProbe
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val gHalf = RectGrid.of(-180, 180, 0.5, -90, 90, 0.5)   // 720x360 = 259k
    val gOne = RectGrid.of(-180, 180, 1.0, -90, 90, 1.0)    // 360x180 = 65k
    val gTenth = RectGrid.of(-180, 180, 0.1, -90, 90, 0.1)  // 3600x1800 = 6.48M

    // same codegen/JIT warmup as Bench: the first timed probe otherwise
    // absorbs several seconds of one-time compilation
    locally {
      val wg = RectGrid.of(-40, 40, 10, -40, 40, 10)
      val wd = RectGrid.of(-30, 30, 15, -30, 30, 15)
      Weights.conservative(Grids.cells(spark, wg, withBounds = true),
        Grids.cells(spark, wd, withBounds = true)).count()
      Weights.nearestS2D(Grids.cells(spark, wg), Grids.cells(spark, wd)).count()
      ()
    }

    time("conservative 0.5deg->1deg (259k->65k)") {
      Weights.conservative(
        Grids.cells(spark, gHalf, withBounds = true),
        Grids.cells(spark, gOne, withBounds = true)).count()
    }
    time("nearest_s2d 0.5deg->1deg") {
      // auto radius (density-derived ≈ 1.0° here)
      Weights.nearestS2D(Grids.cells(spark, gHalf), Grids.cells(spark, gOne)).count()
    }
    time("bilinear peri 0.1deg->0.5deg (6.5M->259k)") {
      Weights.bilinear(gTenth, Grids.cells(spark, gHalf), periodic = true).count()
    }
    time("bilinear nonuniform 0.5deg->1deg (banded interval join)") {
      val ax = CoordAxis.fromUniform(gHalf.lonAxis)
      val ay = CoordAxis.fromUniform(gHalf.latAxis)
      Weights.bilinearIrregular(CoordGrid(ax, ay), Grids.cells(spark, gOne)).count()
    }
    time("curvilinear bilinear rot 1deg mesh (64k quads -> 65k dst)") {
      val rot = RectGrid.of(2, 62, 0.25, -30, 30, 0.25)     // 240x240 = 57.6k cells
      val dst = RectGrid.of(-25, 0, 0.1, 5, 30, 0.1)        // 250x250 = 62.5k
      Weights.bilinearCurvilinear(
        Curvilinear.rotatedCells(spark, rot, 70.0, -165.0),
        Grids.cells(spark, dst)).count()
    }
    time("curvilinear conservative clip (57.6k x 62.5k polys)") {
      val rot = RectGrid.of(2, 62, 0.25, -30, 30, 0.25)
      val dst = RectGrid.of(-25, 0, 0.1, 5, 30, 0.1)
      Weights.conservativeCurvilinear(
        Curvilinear.rotatedCorners(spark, rot, 70.0, -165.0),
        Curvilinear.boundsToPolys(Grids.cells(spark, dst, withBounds = true)),
        bandDeg = 2.0).count()
    }
    spark.stop()
  }
}
