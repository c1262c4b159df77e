package graft.regrid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact great-circle nearest-neighbor join, built scale-first.
  *
  * Strategy: lat-band bucketed candidate equi-join with iterative radius
  * widening. Any point within great-circle angle `r` degrees of a probe
  * has `|Δlat| ≤ r`, so joining a probe in band `floor(lat/r)` against
  * points exploded into bands `{b-1, b, b+1}` covers every candidate
  * within angle `r`; a found minimum with distance ≤ r is therefore the
  * global minimum. Probes whose best candidate is farther (or missing)
  * are retried with 4× the radius. This keeps the join an equi-join
  * (shuffle on band id) — no cross join — so it survives grids with
  * 10^8+ cells where a broadcast nested-loop would not.
  *
  * Distance: squared half-chord ("haversine a" term), monotone in
  * great-circle angle and naturally periodic in longitude (no seam or
  * pole special-casing needed). Rounded to 9 decimals before the argmin
  * so an external oracle computing the same formula agrees on ties.
  */
object NearestJoin {

  /** Haversine `a = sin²(Δlat/2) + cos(lat1)cos(lat2)sin²(Δlon/2)`,
    * inputs in degrees. */
  def sqChord(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    pow(sin(radians((lat1 - lat2) / lit(2.0))), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) *
        pow(sin(radians((lon1 - lon2) / lit(2.0))), 2)

  /** Same formula as DuckDB SQL text (oracle generation). */
  def sqlSqChord(lon1: String, lat1: String, lon2: String, lat2: String): String =
    s"pow(sin(radians(($lat1 - $lat2) / 2.0e0)), 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * " +
      s"pow(sin(radians(($lon1 - $lon2) / 2.0e0)), 2)"

  /** For each row of `probes`, the nearest row of `points`.
    *
    * @param points  (id, lon, lat) — the searched set
    * @param probes  (id, lon, lat) — one output row per probe
    * @param initBandDeg starting search radius in degrees; pick ≳ the
    *                    max spacing of `points` to converge in 1 round
    * @return (probe_id, point_id, dist) with dist = rounded sq-half-chord
    */
  def nearest(points: DataFrame, probes: DataFrame,
              initBandDeg: Double = 15.0, maxRounds: Int = 5): DataFrame = {
    val pts = points.select(col("id").as("point_id"),
      col("lon").as("p_lon"), col("lat").as("p_lat"))

    var remaining = probes.select(col("id").as("probe_id"),
      col("lon").as("q_lon"), col("lat").as("q_lat"))
    var resolved: Option[DataFrame] = None
    var r = initBandDeg
    var round = 0

    while (round < maxRounds && !remaining.isEmpty) {
      // half-chord bound for angle r: a ≤ sin²(r/2) ⟺ angle ≤ r
      val bound = math.pow(math.sin(math.toRadians(r / 2.0)), 2)
      val ptsBanded = pts
        .withColumn("db", explode(array(lit(-1), lit(0), lit(1))))
        .withColumn("band", (floor(col("p_lat") / lit(r)) + col("db")).cast("long"))
        .drop("db")
      val probesBanded = remaining
        .withColumn("band", floor(col("q_lat") / lit(r)).cast("long"))

      val cand = probesBanded.join(ptsBanded, "band")
        .withColumn("dist",
          Rounding.r9(sqChord(col("q_lon"), col("q_lat"), col("p_lon"), col("p_lat"))))
      val w = Window.partitionBy(col("probe_id")).orderBy(col("dist"), col("point_id"))
      val best = cand
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("probe_id"), col("point_id"), col("dist"))

      // localCheckpoint truncates lineage so round k's `remaining.isEmpty`
      // action (and the caller's final action) does NOT recompute every
      // previous round's candidate join — at 10^8 probes with 2-3 rounds
      // the repeated join would multiply the dominant cost.
      val done = best.filter(col("dist") <= lit(bound)).localCheckpoint()
      resolved = Some(resolved.map(_.unionByName(done)).getOrElse(done))
      remaining = remaining.join(done.select("probe_id"), Seq("probe_id"), "left_anti")
        .localCheckpoint()
      r *= 4.0
      round += 1
    }

    if (!remaining.isEmpty) {
      // Escape hatch for pathological spacing: exact argmin over the
      // residual probes only (tiny by construction after widening).
      val cand = remaining.crossJoin(pts)
        .withColumn("dist",
          Rounding.r9(sqChord(col("q_lon"), col("q_lat"), col("p_lon"), col("p_lat"))))
      val w = Window.partitionBy(col("probe_id")).orderBy(col("dist"), col("point_id"))
      val rest = cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("probe_id"), col("point_id"), col("dist"))
      resolved = Some(resolved.map(_.unionByName(rest)).getOrElse(rest))
    }
    resolved.get
  }
}
