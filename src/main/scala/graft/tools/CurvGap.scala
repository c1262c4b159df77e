package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.regrid._
import graft.RegridQueries

/** Measures the cross-engine agreement headroom of the
  * identity-rotation curvilinear conservative fixture
  * (q_w_conservative_curv): dumps the polygon-clip kernel's UNROUNDED
  * weights so scripts/curv_gap.py can diff them against the analytic
  * DuckDB oracle and report (a) the max |Δ| and (b) the closest
  * approach of any weight to a 10^-d rounding boundary — the two
  * numbers that decide how many digits the hash oracle can check.
  * Run: sbt "runMain graft.tools.CurvGap"
  */
object CurvGap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = Weights.conservativeCurvilinear(
      Curvilinear.rotatedCorners(spark, RegridQueries.rotGrid,
        RegridQueries.idPoleLat, RegridQueries.idPoleLon),
      Curvilinear.boundsToPolys(
        Grids.cells(spark, RegridQueries.dstCurv, withBounds = true)))
    w.coalesce(1).write.mode("overwrite")
      .parquet("/root/repo/target/curvgap/spark_unrounded")
    println(s"=== dumped ${w.count()} unrounded weights")
    spark.stop()
  }
}
