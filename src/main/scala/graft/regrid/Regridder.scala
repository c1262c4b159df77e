package graft.regrid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interpolation method (reference `xesmf/backend.py:241-246`). */
sealed abstract class RegridMethod(val name: String, val needBounds: Boolean)
object RegridMethod {
  case object Bilinear extends RegridMethod("bilinear", false)
  case object Conservative extends RegridMethod("conservative", true)
  case object NearestS2D extends RegridMethod("nearest_s2d", false)
  case object NearestD2S extends RegridMethod("nearest_d2s", false)
  case object Patch extends RegridMethod("patch", false)

  val all: Seq[RegridMethod] = Seq(Bilinear, Conservative, NearestS2D, NearestD2S, Patch)

  /** V7 method-name validation (reference `backend.py:247-251`). */
  def parse(s: String): RegridMethod =
    all.find(_.name == s).getOrElse(throw new IllegalArgumentException(
      s"method should be chosen from ${all.map(_.name).mkString("[", ", ", "]")}, got '$s'"))
}

/** A source/destination geometry: a structured grid or a point list. */
sealed trait GridDef {
  def isLocstream: Boolean
  def nCells: Long
  def shapeStr: String
  def hasBounds: Boolean
  def cells(spark: SparkSession, withBounds: Boolean): DataFrame
}

final case class RectDef(g: RectGrid, bounds: Boolean = true) extends GridDef {
  def isLocstream = false
  def nCells: Long = g.nCells
  def shapeStr = s"(${g.ny}, ${g.nx})"
  def hasBounds: Boolean = bounds
  def cells(spark: SparkSession, withBounds: Boolean): DataFrame = {
    if (withBounds && !bounds)
      // V5: conservative without corner bounds is an error
      // (reference `backend.py:254-260`, `test_frontend.py:100-102`)
      throw new NoSuchElementException("grid has no bounds (lon_b/lat_b) but method requires them")
    Grids.cells(spark, g, withBounds)
  }
}

final case class LocDef(points: Seq[(Double, Double)]) extends GridDef {
  def isLocstream = true
  def nCells: Long = points.size.toLong
  def shapeStr = s"(1, ${points.size})"
  def hasBounds = false
  def cells(spark: SparkSession, withBounds: Boolean): DataFrame = {
    if (withBounds)
      throw new NoSuchElementException("locstream has no cell bounds")
    Grids.locstream(spark, points)
  }
}

/** The user-facing regridder — the analog of `xesmf.Regridder`
  * (reference `xesmf/frontend.py:105-236`): precompute a sparse weights
  * relation once, apply it to any number of fields.
  *
  * Weight persistence/reuse (reference O1, `frontend.py:144-146`,
  * `:264-280`): weights can be written to / reloaded from Parquet under
  * `weightsDir` using the reference's deterministic filename scheme
  * (`frontend.py:251-262`), so a rebuild with `reuseWeights = true`
  * costs one Parquet read.
  */
final class Regridder(
    val spark: SparkSession,
    val gridIn: GridDef,
    val gridOut: GridDef,
    val method: RegridMethod,
    val periodicRequested: Boolean = false,
    val weightsDir: Option[String] = None,
    val reuseWeights: Boolean = false,
    val nearestBandDeg: Double = 15.0) {

  // periodic is forced off for conservative (reference `frontend.py:164-176`)
  val periodic: Boolean = periodicRequested && method != RegridMethod.Conservative

  // locstream/method validity matrix (reference `frontend.py:178-184`,
  // tested `test_frontend.py:223-224,241-246`)
  if (gridIn.isLocstream &&
      !Set[RegridMethod](RegridMethod.NearestS2D, RegridMethod.NearestD2S).contains(method))
    throw new IllegalArgumentException(
      s"locstream input is only supported for nearest_s2d/nearest_d2s, got ${method.name}")
  if (gridOut.isLocstream && method == RegridMethod.Conservative)
    throw new IllegalArgumentException("conservative method does not support locstream output")

  /** Default cache key, mirroring reference `frontend.py:251-262`:
    * `{method}_{NyIn}x{NxIn}_{NyOut}x{NxOut}[_peri].parquet`. */
  def defaultFilename: String = {
    def dims(g: GridDef): String = g match {
      case RectDef(r, _) => s"${r.ny}x${r.nx}"
      case l: LocDef => s"1x${l.nCells}"
    }
    val peri = if (periodic) "_peri" else ""
    s"${method.name}_${dims(gridIn)}_${dims(gridOut)}$peri.parquet"
  }

  private def weightsPath: Option[String] = weightsDir.map(d => s"$d/$defaultFilename")

  private def build(): DataFrame = {
    val srcB = gridIn.cells(spark, method.needBounds)
    val dstB = gridOut.cells(spark, method.needBounds)
    method match {
      case RegridMethod.Bilinear =>
        val rect = gridIn match {
          case RectDef(r, _) => r
          case _ => throw new IllegalArgumentException("bilinear needs a rectilinear source grid")
        }
        Weights.bilinear(rect, dstB, periodic)
      case RegridMethod.Conservative => Weights.conservative(srcB, dstB)
      case RegridMethod.NearestS2D => Weights.nearestS2D(srcB, dstB, nearestBandDeg)
      case RegridMethod.NearestD2S => Weights.nearestD2S(srcB, dstB, nearestBandDeg)
      case RegridMethod.Patch =>
        throw new UnsupportedOperationException(
          "patch recovery is not implemented yet (reference itself skips it in tests, " +
            "test_frontend.py:49-50)")
    }
  }

  /** The weights relation (row, col, s). Built once and cached;
    * round-trips through Parquet when `weightsDir` is set. */
  lazy val weights: DataFrame = {
    val df = weightsPath match {
      case Some(p) =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (reuseWeights && fs.exists(path)) spark.read.parquet(p)
        else {
          build().write.mode("overwrite").parquet(p)
          spark.read.parquet(p)
        }
      case None => build()
    }
    df.cache()
  }

  /** Delete the persisted weight file (reference `frontend.py:282-293`). */
  def cleanWeightFile(): Unit = weightsPath.foreach { p =>
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) { fs.delete(path, true); () }
  }

  /** Regrid a field: `(cell_id, [extraDims...], [valueCols...])` in
    * source cell space → same relation in destination cell space. */
  def apply(field: DataFrame,
            extraDims: Seq[String] = Nil,
            valueCols: Seq[String] = Seq("value"),
            broadcastWeights: Boolean = true): DataFrame =
    Apply.regrid(weights, field, gridOut.cells(spark, withBounds = false),
      extraDims, valueCols, broadcastWeights)

  /** Regrid and attach output-grid coordinates + method metadata
    * (reference R5, `frontend.py:400-446`). */
  def applyWithCoords(field: DataFrame,
                      extraDims: Seq[String] = Nil,
                      valueCols: Seq[String] = Seq("value")): DataFrame = {
    val out = apply(field, extraDims, valueCols)
    val coords = gridOut.cells(spark, withBounds = false)
      .select(col("cell_id"), col("lon"), col("lat"))
    out.join(broadcast(coords), "cell_id")
      .withColumn("regrid_method", lit(method.name))
  }

  override def toString: String =
    s"""graft Regridder
       |  method:            ${method.name}
       |  input grid shape:  ${gridIn.shapeStr}
       |  output grid shape: ${gridOut.shapeStr}
       |  periodic:          $periodic
       |  weights file:      ${weightsPath.getOrElse("(in-memory)")}
       |  reuse weights:     $reuseWeights""".stripMargin
}
