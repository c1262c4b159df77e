package graft.regrid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema/value validation predicates (SURVEY §2.5, reference
  * `xesmf/backend.py:40-52`, `frontend.py:23-28`, `smm.py:77-86`). */
object Validate {

  /** V1: count of cells with |lat| > 90 (reference warns,
    * `backend.py:40-52`). */
  def latOutOfRange(cells: DataFrame): Long =
    cells.filter(abs(col("lat")) > 90.0).count()

  /** V1 as a warning side effect, mirroring the reference behavior. */
  def warnLatRange(cells: DataFrame, what: String = "grid"): Unit = {
    val n = latOutOfRange(cells)
    if (n > 0)
      Console.err.println(s"[graft.regrid] WARN: latitude outside [-90, 90] on $n cells of $what")
  }

  /** V1 for grids whose latitudes live on the driver (uniform/coord
    * axes, locstream point lists) — analytic, no Spark job, so wiring
    * the warning into every weight build costs nothing. */
  def warnLatRangeLocal(lats: Iterator[Double], what: String = "grid"): Unit = {
    val n = lats.count(l => l > 90.0 || l < -90.0)
    if (n > 0)
      Console.err.println(s"[graft.regrid] WARN: latitude outside [-90, 90] on $n cells of $what")
  }

  /** V4: weights/field shape contract before an apply
    * (reference `smm.py:77-86`): every weight col must reference an
    * existing source cell. Returns dangling-reference count. */
  def danglingWeightCols(weights: DataFrame, srcCells: DataFrame): Long =
    weights.join(srcCells.select(col("cell_id").as("col")), Seq("col"), "left_anti").count()
}
