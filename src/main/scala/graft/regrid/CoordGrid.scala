package graft.regrid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Non-uniform rectilinear axis given by explicit coordinate arrays —
  * the ingestion path the reference exposes for arbitrary user
  * coordinates (reference `xesmf/frontend.py:59-69` accepts any
  * dataset/dict of `lon/lat/lon_b/lat_b` arrays; Gaussian-latitude
  * grids are the norm in climate data).
  *
  * `bounds` must have `n + 1` entries (the reference's V3 shape
  * contract, `backend.py:175-180`) and every center must lie inside its
  * cell — violations fail here, at the contract boundary, instead of
  * deep inside a plan.
  */
final case class CoordAxis(centers: Array[Double], bounds: Array[Double]) {
  def n: Int = centers.length
  require(n >= 1, "axis needs at least one center")
  // V3: bounds shape = N+1 (reference backend.py:175-180)
  require(bounds.length == n + 1,
    s"bounds must have n+1 = ${n + 1} entries, got ${bounds.length}")
  require((1 until n).forall(i => centers(i - 1) < centers(i)),
    "centers must be strictly increasing")
  require((1 until bounds.length).forall(i => bounds(i - 1) < bounds(i)),
    "bounds must be strictly increasing")
  require(centers.indices.forall(i => bounds(i) <= centers(i) && centers(i) <= bounds(i + 1)),
    "each center must lie within its cell bounds")

  /** Widest gap between adjacent centers — the band width that makes
    * every inter-center segment span at most two bands. */
  def maxSegmentWidth: Double =
    if (n < 2) bounds(n) - bounds(0)
    else (1 until n).map(i => centers(i) - centers(i - 1)).max
}

object CoordAxis {
  /** Centers as midpoints of user-supplied bounds — the reference's
    * `_grid_1d` convention (`util.py:6-28`) generalized to non-uniform
    * spacing. */
  def fromBounds(bounds: Array[Double]): CoordAxis =
    CoordAxis(bounds.sliding(2).map(p => 0.5 * (p(0) + p(1))).toArray, bounds)

  /** A uniform axis as coordinate arrays (for equivalence testing). */
  def fromUniform(a: UniformAxis): CoordAxis =
    CoordAxis(
      Array.tabulate(a.n)(i => a.start + (i + 0.5) * a.step),
      Array.tabulate(a.n + 1)(i => a.start + i * a.step))
}

/** 2-D rectilinear grid with arbitrary (non-uniform) axes.
  * Same row-major `cell_id = y*nx + x` numbering as [[RectGrid]]. */
final case class CoordGrid(lonAxis: CoordAxis, latAxis: CoordAxis) {
  def nx: Int = lonAxis.n
  def ny: Int = latAxis.n
  def nCells: Long = nx.toLong * ny
  def shape: (Int, Int) = (ny, nx)
}

object CoordGrid {

  /** Tidy cell relation `(cell_id, y, x, lon, lat[, bounds])` — the
    * meshgrid crossJoin of the two axis relations (G2 pattern). The
    * axis relations are driver-side arrays (same as the reference's
    * in-memory coordinate arrays); the crossJoin output is distributed,
    * so a 10^5 × 10^5 grid still materializes in parallel. */
  def cells(spark: SparkSession, g: CoordGrid, withBounds: Boolean = false): DataFrame = {
    import spark.implicits._
    val lonDF = g.lonAxis.centers.indices
      .map(i => (i, g.lonAxis.centers(i), g.lonAxis.bounds(i), g.lonAxis.bounds(i + 1)))
      .toDF("x", "lon", "lon_w", "lon_e")
    val latDF = g.latAxis.centers.indices
      .map(j => (j, g.latAxis.centers(j), g.latAxis.bounds(j), g.latAxis.bounds(j + 1)))
      .toDF("y", "lat", "lat_s", "lat_n")
    val base = latDF.crossJoin(lonDF)
      .withColumn("cell_id", (col("y").cast("long") * g.nx + col("x")).cast("long"))
    val cols = Seq("cell_id", "y", "x", "lon", "lat") ++
      (if (withBounds) Seq("lon_w", "lon_e", "lat_s", "lat_n") else Nil)
    base.select(cols.map(col): _*)
  }
}
