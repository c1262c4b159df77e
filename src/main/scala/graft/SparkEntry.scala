package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.regrid._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def allDefs: Seq[QueryDef] = RegridQueries.defs ++ PipelineQueries.defs

  /** Flagship query: the reference's own end-to-end workload — build
    * conservative weights for `grid_global(20,12) → grid_global(15,9)`
    * and regrid the `wave_smooth` analytic field
    * (reference `xesmf/tests/test_frontend.py:11-18,186-187`). */
  def entry(spark: SparkSession): DataFrame = {
    val r = new Regridder(spark,
      RectDef(RegridQueries.gridIn), RectDef(RegridQueries.gridOut),
      RegridMethod.Conservative)
    r.applyWithCoords(RegridQueries.waveField(spark))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.sql.map(d.name -> _)).toMap
}
