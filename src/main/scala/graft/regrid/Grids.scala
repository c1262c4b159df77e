package graft.regrid

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uniform 1-D grid axis: `n` cells spanning `[start, start + n*step]`.
  *
  * Mirrors the semantics of the reference's `_grid_1d`
  * (reference `xesmf/util.py:6-28`): `bounds[i] = start + i*step`,
  * `centers[i] = start + (i + 0.5)*step` (midpoints of bounds).
  *
  * All arithmetic is plain double so that an external SQL oracle using the
  * textually identical formula produces bit-identical values.
  */
final case class UniformAxis(start: Double, step: Double, n: Int) {
  require(n > 0, s"axis needs at least one cell, got $n")
  require(step > 0, s"axis step must be positive, got $step")

  def end: Double = start + n * step
  def firstCenter: Double = start + 0.5 * step
  def lastCenter: Double = start + (n - 0.5) * step

  /** Center of cell `i` as a Column (i is an integer column). */
  def center(i: Column): Column =
    lit(start) + (i.cast("double") + lit(0.5)) * lit(step)
  /** Lower bound of cell `i`. */
  def boundLo(i: Column): Column = lit(start) + i.cast("double") * lit(step)
  /** Upper bound of cell `i`. */
  def boundHi(i: Column): Column =
    lit(start) + (i.cast("double") + lit(1.0)) * lit(step)
}

/** 2-D rectilinear grid = Cartesian product of two uniform axes.
  * Row-major cell numbering: `cell_id = y*nx + x`
  * (matches the flatten in reference `xesmf/smm.py:89`). */
final case class RectGrid(lonAxis: UniformAxis, latAxis: UniformAxis) {
  def nx: Int = lonAxis.n
  def ny: Int = latAxis.n
  def nCells: Long = nx.toLong * ny
  def shape: (Int, Int) = (ny, nx)
}

object RectGrid {

  /** `grid_2d(lon0_b, lon1_b, d_lon, lat0_b, lat1_b, d_lat)`
    * (reference `xesmf/util.py:31-69`). */
  def of(lon0B: Double, lon1B: Double, dLon: Double,
         lat0B: Double, lat1B: Double, dLat: Double): RectGrid = {
    val nx = math.round((lon1B - lon0B) / dLon).toInt
    val ny = math.round((lat1B - lat0B) / dLat).toInt
    RectGrid(UniformAxis(lon0B, dLon, nx), UniformAxis(lat0B, dLat, ny))
  }

  /** `grid_global(d_lon, d_lat)` — global `[-180,180] x [-90,90]`
    * (reference `xesmf/util.py:72-98`). Returns the grid plus the two
    * divisibility warnings the reference emits. */
  def global(dLon: Double, dLat: Double): RectGrid = {
    globalWarnings(dLon, dLat).foreach(w => System.err.println(s"[graft.regrid] WARN: $w"))
    of(-180.0, 180.0, dLon, -90.0, 90.0, dLat)
  }

  def globalWarnings(dLon: Double, dLat: Double): Seq[String] = {
    val w1 =
      if (math.abs(360.0 / dLon - math.floor(360.0 / dLon)) > 1e-9)
        Seq(s"360 cannot be divided by d_lon = $dLon, might not cover the globe uniformally")
      else Nil
    val w2 =
      if (math.abs(180.0 / dLat - math.floor(180.0 / dLat)) > 1e-9)
        Seq(s"180 cannot be divided by d_lat = $dLat, might not cover the globe uniformally")
      else Nil
    w1 ++ w2
  }
}

/** Builders for the tidy cell relation of a grid.
  *
  * Schema (FIXTURES.md §1): `grid_cells(cell_id BIGINT, y INT, x INT,
  * lon DOUBLE, lat DOUBLE [, lon_w, lon_e, lat_s, lat_n DOUBLE])`.
  *
  * Generation is a single narrow projection over `spark.range` — no
  * shuffle, fully parallel, O(cells/partition) memory: the shape that
  * still works when the grid has 10^10 cells.
  */
object Grids {

  /** Cell-center relation (+ optional bounds) for a rectilinear grid. */
  def cells(spark: SparkSession, g: RectGrid, withBounds: Boolean = false): DataFrame = {
    val nx = g.nx
    val base = spark.range(g.nCells).toDF("cell_id")
      .withColumn("y", expr(s"CAST(cell_id DIV $nx AS INT)"))
      .withColumn("x", expr(s"CAST(cell_id % $nx AS INT)"))
      .withColumn("lon", g.lonAxis.center(col("x")))
      .withColumn("lat", g.latAxis.center(col("y")))
    if (!withBounds) base
    else base
      .withColumn("lon_w", g.lonAxis.boundLo(col("x")))
      .withColumn("lon_e", g.lonAxis.boundHi(col("x")))
      .withColumn("lat_s", g.latAxis.boundLo(col("y")))
      .withColumn("lat_n", g.latAxis.boundHi(col("y")))
  }

  /** 1-D axis relation `(i, center, bound_lo, bound_hi)` — the relational
    * form of `_grid_1d` (reference `xesmf/util.py:6-28`). */
  def axis1d(spark: SparkSession, a: UniformAxis): DataFrame =
    spark.range(a.n.toLong).toDF("i")
      .select(
        col("i"),
        a.center(col("i")).as("center"),
        a.boundLo(col("i")).as("bound_lo"),
        a.boundHi(col("i")).as("bound_hi"))

  /** LocStream: unordered point list (reference `xesmf/frontend.py:75-102`).
    * Schema `(cell_id BIGINT, lon DOUBLE, lat DOUBLE)` — uses `cell_id`
    * so locstreams compose with the same weight/apply kernels as grids. */
  def locstream(spark: SparkSession, points: Seq[(Double, Double)]): DataFrame = {
    import spark.implicits._
    points.zipWithIndex
      .map { case ((lon, lat), i) => (i.toLong, lon, lat) }
      .toDF("cell_id", "lon", "lat")
  }
}
