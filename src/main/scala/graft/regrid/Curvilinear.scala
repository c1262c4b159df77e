package graft.regrid

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curvilinear (2-D lon/lat mesh) grid support — the reference's
  * headline ingestion capability: `as_2d_mesh` accepts 2-D `(n_y, n_x)`
  * coordinate arrays everywhere (reference `xesmf/frontend.py:21-30`,
  * `backend.py:55-114`); rotated-pole and ocean model grids are the
  * canonical instances.
  *
  * Representation: the same tidy cell relation as rectilinear grids —
  * `(cell_id, y, x, lon, lat)` with `cell_id = y*nx + x` — the 2-D mesh
  * is just data, not structure. What changes is weight GENERATION:
  * bilinear needs point-in-quad location + inverse bilinear coordinates
  * ([[Weights.bilinearCurvilinear]]), conservative needs polygon
  * clipping ([[Weights.conservativeCurvilinear]]).
  */
object Curvilinear {

  /** Rotated-pole transform: rotated coords (lamr, thr in degrees) →
    * geographic (lon, lat), pole parameters in degrees. The standard
    * COSMO/CORDEX rotation; expressed as Column formulas so an external
    * SQL oracle can evaluate the identical text. */
  def rotLat(lamr: Column, thr: Column, poleLat: Double): Column =
    degrees(asin(
      sin(radians(thr)) * sin(radians(lit(poleLat))) +
        cos(radians(thr)) * cos(radians(lamr)) * cos(radians(lit(poleLat)))))

  def rotLon(lamr: Column, thr: Column, poleLat: Double, poleLon: Double): Column =
    lit(poleLon) + degrees(atan2(
      cos(radians(thr)) * sin(radians(lamr)),
      sin(radians(thr)) * cos(radians(lit(poleLat))) -
        cos(radians(thr)) * cos(radians(lamr)) * sin(radians(lit(poleLat)))))

  /** Same transforms as DuckDB SQL text (oracle generation). */
  def sqlRotLat(lamr: String, thr: String, poleLat: Double): String =
    s"degrees(asin(sin(radians($thr)) * sin(radians($poleLat)) + " +
      s"cos(radians($thr)) * cos(radians($lamr)) * cos(radians($poleLat))))"

  def sqlRotLon(lamr: String, thr: String, poleLat: Double, poleLon: Double): String =
    s"$poleLon + degrees(atan2(cos(radians($thr)) * sin(radians($lamr)), " +
      s"sin(radians($thr)) * cos(radians($poleLat)) - " +
      s"cos(radians($thr)) * cos(radians($lamr)) * sin(radians($poleLat))))"

  /** Center-mesh cell relation of a rotated-pole grid: a uniform grid
    * in rotated coordinates, curvilinear in geographic coordinates.
    * Cheap narrow projection over `spark.range` (same shape as
    * [[Grids.cells]]). */
  def rotatedCells(spark: SparkSession, rot: RectGrid,
                   poleLat: Double, poleLon: Double): DataFrame = {
    val nx = rot.nx
    spark.range(rot.nCells).toDF("cell_id")
      .withColumn("y", expr(s"CAST(cell_id DIV $nx AS INT)"))
      .withColumn("x", expr(s"CAST(cell_id % $nx AS INT)"))
      .withColumn("lamr", rot.lonAxis.center(col("x")))
      .withColumn("thr", rot.latAxis.center(col("y")))
      .withColumn("lon", rotLon(col("lamr"), col("thr"), poleLat, poleLon))
      .withColumn("lat", rotLat(col("lamr"), col("thr"), poleLat))
      .drop("lamr", "thr")
  }

  /** Corner polygons of a rotated-pole grid: per cell the 4 geographic
    * corner coordinates (counter-clockwise in rotated space), for the
    * curvilinear conservative kernel. */
  def rotatedCorners(spark: SparkSession, rot: RectGrid,
                     poleLat: Double, poleLon: Double): DataFrame = {
    val nx = rot.nx
    def corner(ix: Column, iy: Column, which: String): Seq[Column] = {
      val lamr = rot.lonAxis.boundLo(ix)
      val thr = rot.latAxis.boundLo(iy)
      Seq(rotLon(lamr, thr, poleLat, poleLon).as(s"lon_$which"),
        rotLat(lamr, thr, poleLat).as(s"lat_$which"))
    }
    spark.range(rot.nCells).toDF("cell_id")
      .withColumn("y", expr(s"CAST(cell_id DIV $nx AS INT)"))
      .withColumn("x", expr(s"CAST(cell_id % $nx AS INT)"))
      .select(Seq(col("cell_id"), col("y"), col("x")) ++
        corner(col("x"), col("y"), "c0") ++
        corner(col("x") + 1, col("y"), "c1") ++
        corner(col("x") + 1, col("y") + 1, "c2") ++
        corner(col("x"), col("y") + 1, "c3"): _*)
  }

  /** Corner polygons of a rectilinear bounds relation (for mixing a
    * rectilinear side into the curvilinear conservative kernel):
    * `(cell_id, lon_c0..lat_c3)`, counter-clockwise. */
  def boundsToPolys(cells: DataFrame): DataFrame = cells.select(col("cell_id"),
    col("lon_w").as("lon_c0"), col("lat_s").as("lat_c0"),
    col("lon_e").as("lon_c1"), col("lat_s").as("lat_c1"),
    col("lon_e").as("lon_c2"), col("lat_n").as("lat_c2"),
    col("lon_w").as("lon_c3"), col("lat_n").as("lat_c3"))

  /** Corner polygons of a GNOMONIC lattice mesh: a uniform planar
    * lattice on the tangent plane at `(tanLon, tanLat)` (unit sphere,
    * plane at distance 1), centrally projected onto the sphere. Every
    * cell edge is a segment of a great circle by construction (straight
    * lines in a gnomonic chart ↔ great circles) — the cubed-sphere-face
    * mesh family, and the natural fixture for great-circle-exact
    * conservative remapping ([[Weights.conservativeCurvilinear]] with
    * `exactEdges = true`): cell intersections are then plane rectangles
    * whose spherical area has the rectangle-solid-angle closed form
    * `Ω = Σ± atan(xy / √(1+x²+y²))`, giving a fully independent SQL
    * oracle.
    *
    * Lattice: `nx × ny` cells, corner `(i, j)` at plane coordinates
    * `(x0 + i·step, y0 + j·step)`, `cell_id = j·nx + i`, corners
    * counter-clockwise `c0=(i,j) c1=(i+1,j) c2=(i+1,j+1) c3=(i,j+1)`.
    * Same cheap `spark.range` + trig-expression shape as
    * [[rotatedCorners]]. */
  def gnomonicCorners(spark: SparkSession, nx: Int, ny: Int,
                      x0: Double, y0: Double, step: Double,
                      tanLon: Double, tanLat: Double): DataFrame = {
    val lonR = math.toRadians(tanLon); val latR = math.toRadians(tanLat)
    // tangent point c and chart basis (e1 east, e2 north), Scala-side
    // constants embedded as literals
    val (cx, cy, cz) = (math.cos(latR) * math.cos(lonR), math.cos(latR) * math.sin(lonR), math.sin(latR))
    val (e1x, e1y) = (-math.sin(lonR), math.cos(lonR))
    val (e2x, e2y, e2z) = (-math.sin(latR) * math.cos(lonR), -math.sin(latR) * math.sin(lonR), math.cos(latR))
    def corner(ix: Column, iy: Column, which: String): Seq[Column] = {
      val u = lit(x0) + ix.cast("double") * lit(step)
      val v = lit(y0) + iy.cast("double") * lit(step)
      val px = lit(cx) + u * lit(e1x) + v * lit(e2x)
      val py = lit(cy) + u * lit(e1y) + v * lit(e2y)
      val pz = lit(cz) + v * lit(e2z)
      val n = sqrt(px * px + py * py + pz * pz)
      Seq(degrees(atan2(py, px)).as(s"lon_$which"),
        degrees(asin(pz / n)).as(s"lat_$which"))
    }
    spark.range(nx.toLong * ny).toDF("cell_id")
      .withColumn("y", expr(s"CAST(cell_id DIV $nx AS INT)"))
      .withColumn("x", expr(s"CAST(cell_id % $nx AS INT)"))
      .select(Seq(col("cell_id")) ++
        corner(col("x"), col("y"), "c0") ++
        corner(col("x") + 1, col("y"), "c1") ++
        corner(col("x") + 1, col("y") + 1, "c2") ++
        corner(col("x"), col("y") + 1, "c3"): _*)
  }

  /** Center relation of a gnomonic lattice mesh (`(cell_id, lon, lat)`
    * — the [[gnomonicCorners]] cells' midpoints projected the same
    * way): the field-side fixture for applying through great-circle
    * conservative weights. Expression structure mirrors
    * [[graft.RegridQueries.gnomonicCellsSql]] term for term so both
    * engines run identical IEEE arithmetic up to the final trig. */
  def gnomonicCells(spark: SparkSession, nx: Int, ny: Int,
                    x0: Double, y0: Double, step: Double,
                    tanLon: Double, tanLat: Double): DataFrame = {
    val lonR = math.toRadians(tanLon); val latR = math.toRadians(tanLat)
    val (cx, cy, cz) = (math.cos(latR) * math.cos(lonR), math.cos(latR) * math.sin(lonR), math.sin(latR))
    val (e1x, e1y) = (-math.sin(lonR), math.cos(lonR))
    val (e2x, e2y, e2z) = (-math.sin(latR) * math.cos(lonR), -math.sin(latR) * math.sin(lonR), math.cos(latR))
    val base = spark.range(nx.toLong * ny).toDF("cell_id")
      .withColumn("y", expr(s"CAST(cell_id DIV $nx AS INT)"))
      .withColumn("x", expr(s"CAST(cell_id % $nx AS INT)"))
      .withColumn("u", lit(x0) + (col("x").cast("double") + lit(0.5)) * lit(step))
      .withColumn("v", lit(y0) + (col("y").cast("double") + lit(0.5)) * lit(step))
    val px = lit(cx) + col("u") * lit(e1x) + col("v") * lit(e2x)
    val py = lit(cy) + col("u") * lit(e1y) + col("v") * lit(e2y)
    val pz = lit(cz) + col("v") * lit(e2z)
    base.select(col("cell_id"),
      degrees(atan2(py, px)).as("lon"),
      degrees(asin(pz / sqrt(px * px + py * py + pz * pz))).as("lat"))
  }

  /** Quad relation of an arbitrary center mesh: one row per mesh cell
    * (j, i) with the 4 surrounding CENTERS as vertices — the bilinear
    * interpolation quads. Built from the tidy cell relation with three
    * shifted equi-joins on (y, x); runs as hash joins, weight-build-once
    * cost.
    *
    * P4 for curvilinear meshes (reference `backend.py:92-95` applies
    * `num_peri_dims=1` to any grid): with `periodicNx = Some(nx)` the
    * x+1 neighbor wraps modulo nx, adding one seam-quad column that
    * joins x = nx−1 back to x = 0 — the quads a global ocean mesh needs
    * so destinations between the last and first mesh columns are
    * mapped. The wrapped neighbors' longitudes are brought into the
    * quad's local frame downstream (see
    * [[Weights.bilinearCurvilinear]]'s unwrap step). */
  def centerQuads(cells: DataFrame, periodicNx: Option[Int] = None): DataFrame = {
    def c(as: String) = cells.select(
      col("y").as(s"${as}_y"), col("x").as(s"${as}_x"),
      col("cell_id").as(s"id$as"), col("lon").as(s"lon$as"), col("lat").as(s"lat$as"))
    def xp1: Column = periodicNx match {
      case Some(nx) => pmod(col("00_x") + 1, lit(nx))
      case None => col("00_x") + 1
    }
    c("00")
      .join(c("10"), col("10_y") === col("00_y") && col("10_x") === xp1)
      .join(c("01"), col("01_y") === col("00_y") + 1 && col("01_x") === col("00_x"))
      .join(c("11"), col("11_y") === col("00_y") + 1 && col("11_x") === xp1)
      .select(
        col("00_y").as("qy"), col("00_x").as("qx"),
        col("id00"), col("lon00"), col("lat00"),
        col("id10"), col("lon10"), col("lat10"),
        col("id01"), col("lon01"), col("lat01"),
        col("id11"), col("lon11"), col("lat11"))
  }
}
