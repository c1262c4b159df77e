package graft.regrid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The one dataflow kernel of the reference: sparse matrix–vector apply,
  * `out[d] = Σ_s W[d,s] · in[s]` (reference `xesmf/smm.py:44-95`, dot at
  * `:90`) — re-expressed as join + hash-aggregate.
  *
  * Relational form makes the reference's three kernel features free:
  *  - K2 unmapped→0: left join from the destination frame + coalesce
  *    (`unmapped_action=IGNORE`, reference `backend.py:275-280`);
  *  - K3 extra-dim broadcasting (time, lev, …): extra dims are just
  *    additional groupBy keys carried through (reference `smm.py:89-94`);
  *  - R6 multi-variable Datasets: one pass aggregating several value
  *    columns at once (reference `frontend.py:448-511`).
  *
  * Scale shape: the weights side is `broadcast()` when small (the exact
  * analog of the reference's dask strategy "replicate W to every chunk,
  * partition the field over extra dims", `frontend.py:375-389`); for
  * huge grids pass `broadcastWeights = false` and the plan becomes a
  * shuffled hash join keyed on source cell, with map-side partial
  * aggregation before the groupBy shuffle.
  */
object Apply {

  /** @param weights   (row, col, s)
    * @param field     (cell_id, [extraDims...], [valueCols...])
    * @param destCells destination relation with a `cell_id` column; one
    *                  output row per destination (× extra-dim combo)
    * @param extraDims names of extra dimension columns in `field`
    * @param valueCols names of value columns to regrid (≥ 1)
    * @param roundDigits decimals kept on output values (oracle parity);
    *                    pass 0 to disable rounding
    */
  def regrid(weights: DataFrame, field: DataFrame, destCells: DataFrame,
             extraDims: Seq[String] = Nil,
             valueCols: Seq[String] = Seq("value"),
             broadcastWeights: Boolean = true,
             roundDigits: Int = 9): DataFrame = {
    val w0 = weights.select(col("row"), col("col"), col("s"))
    val w = if (broadcastWeights) broadcast(w0) else w0

    val contrib = field
      .join(w, field("cell_id") === w("col"))
      .groupBy(col("row") +: extraDims.map(col): _*)
      .agg(
        sum(col("s") * col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(v => sum(col("s") * col(v)).as(v)): _*)

    // full destination frame: every dest cell × every extra-dim combo.
    // Frame columns are renamed to break lineage with `contrib` (both
    // derive from `field`, so same-name join conditions would resolve
    // to trivially-true self-comparisons).
    val destIds = destCells.select(col("cell_id"))
    val frame =
      if (extraDims.isEmpty) destIds
      else destIds.crossJoin(broadcast(
        field.select(extraDims.map(col): _*).distinct()
          .toDF(extraDims.map("__frame_" + _): _*)))

    val joinCond = (frame("cell_id") === contrib("row")) +: extraDims.map(dim =>
      frame("__frame_" + dim) === contrib(dim)) reduce (_ && _)

    def finish(c: Column): Column = {
      val r = if (roundDigits > 0) Rounding.roundN(c, roundDigits) else c
      coalesce(r, lit(0.0))
    }

    frame.join(contrib, joinCond, "left")
      .select(
        (frame("cell_id") +: extraDims.map(d => frame("__frame_" + d).as(d))) ++
          valueCols.map(v => finish(contrib(v)).as(v)): _*)
  }
}
