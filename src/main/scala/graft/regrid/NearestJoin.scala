package graft.regrid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact great-circle nearest-neighbor join, built scale-first.
  *
  * Strategy: 2-D tile (lat band × wrapped lon tile) candidate equi-join
  * with iterative radius widening. Any point within great-circle angle
  * `r` of a probe has `|Δlat| ≤ r` (adjacent lat band), and its wrapped
  * longitude difference is bounded by
  * `2·asin(sin(r/2)/cos(|lat|+r))` (from the haversine lon term, using
  * `√(cosφ₁cosφ₂) ≥ cos(max|φ|)` and `max|φ| ≤ |φ_point|+r`), so each
  * point explodes to its 3 lat bands × the lon tiles within that reach
  * (±1 tile at mid-latitudes, widening toward the poles, the whole
  * ring in the pole caps). Probes join on their single tile — a plain
  * hash equi-join whose candidate lists stay O(points per tile), not
  * O(points per lat band): the difference between 2 s and 50 s at
  * quarter-degree resolution, and the shape that survives 10^8 cells.
  * A found minimum with distance ≤ r is the global minimum; unresolved
  * probes retry with 4× the radius.
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
    *                    max spacing of `points` to converge in 1 round,
    *                    or pass ≤ 0 (the default) to derive it from the
    *                    point density. Candidate volume scales ~r², so
    *                    an over-wide radius is the main constant factor
    *                    (measured 16 s at r=2 vs 4.8 s at r=1 for the
    *                    0.5°→1° global probe); correctness never
    *                    depends on it — unresolved probes widen 4× per
    *                    round.
    * @return (probe_id, point_id, dist) with dist = rounded sq-half-chord
    */
  /** Searched sets at or below this size skip the tile machinery for
    * one exact argmin against the broadcast point set: per probe that
    * is ≤ 64 distance evaluations — comparable to a tile round's
    * candidate list — with NONE of the per-round job overhead
    * (auto-radius count, localCheckpoints, isEmpty actions, widening
    * retries). A 4-point locstream destination paid 2.5 s of that
    * overhead per build for a 270×4 problem (r7 verdict #2). Scale-safe
    * by the same bound: candidates = O(64 · n_probes), linear in the
    * probe side, and the broadcast side is at most 64 rows. */
  val smallPtsMax = 64L

  def nearest(points: DataFrame, probes: DataFrame,
              initBandDeg: Double = 0.0, maxRounds: Int = 5,
              nPtsHint: Long = -1L, nProbesHint: Long = -1L): DataFrame = {
    val pts = points.select(col("id").as("point_id"),
      col("lon").as("p_lon"), col("lat").as("p_lat"))
    // auto radius: ~2.5× the typical spacing of a uniform spread of n
    // points over the sphere's ~41253 sq-deg. Callers with statically
    // known geometry (GridDef.nCells — exact by construction, and the
    // CellsDef V2 check enforces declared == actual before the build)
    // pass the size as a hint so no count() job runs at build time;
    // clustered point sets under-estimate and simply take a second
    // widening round
    val nPts =
      if (initBandDeg > 0) -1L
      else if (nPtsHint >= 0L) math.max(1L, nPtsHint)
      else math.max(1L, pts.count())
    if (initBandDeg <= 0 && nPts <= smallPtsMax) {
      // tiny searched set: exact argmin over all pairs. Identical
      // result to a converged tile search (same rounded distance, same
      // (dist, point_id) tie-break), audited-benign BNLJ (≤64-row
      // broadcast side by construction). The tiny side is pulled with a
      // GUARDED bounded collect (limit cap+1 — r16 advice #3: a stale
      // nPtsHint must fail loudly here, never silently broadcast an
      // unbounded relation) and re-enters the plan as a local relation;
      // the broadcast build would have collected the same rows anyway,
      // so no extra evaluation of the searched-set subtree is paid.
      val ptRows = pts.limit(smallPtsMax.toInt + 1).collect()
      if (ptRows.length > smallPtsMax) throw new IllegalStateException(
        s"nearest: nPtsHint=$nPtsHint claims <= $smallPtsMax searched points " +
          "but the relation holds more — the hint must be exact " +
          "(GridDef.nCells discipline) or -1")
      val ptsLocal = points.sparkSession.createDataFrame(
        java.util.Arrays.asList(ptRows: _*), pts.schema)
      val cand = probes.select(col("id").as("probe_id"),
          col("lon").as("q_lon"), col("lat").as("q_lat"))
        .crossJoin(broadcast(ptsLocal))
        .withColumn("dist",
          Rounding.r9(sqChord(col("q_lon"), col("q_lat"), col("p_lon"), col("p_lat"))))
      return cand
        .groupBy(col("probe_id"))
        .agg(min(struct(col("dist"), col("point_id"))).as("m"))
        .select(col("probe_id"), col("m.point_id").as("point_id"), col("m.dist").as("dist"))
    }
    if (initBandDeg <= 0 && nProbesHint >= 0L && nProbesHint <= smallPtsMax) {
      // symmetric tiny-PROBES fast path (same bound, other side): a
      // handful of probes against an arbitrarily large point set is an
      // exact argmin streamed through one broadcast pass — candidates
      // = O(64 · n_points), linear in the searched set, aggregated
      // map-side into ≤ 64 groups, with NONE of the per-round job
      // overhead (localCheckpoints, isEmpty actions, widening). The
      // 4-point locstream destination of the s2d direction paid ~6
      // driver-coordinated jobs per build for a 480×4 problem.
      // Identical result to a converged tile search: same rounded
      // distance, same (dist, point_id) struct-min tie-break, global
      // minimum either way.
      // same guarded bounded collect as the tiny-points path above
      // (r16 advice #3): a stale nProbesHint fails loudly instead of
      // silently broadcasting an arbitrarily large probe relation
      val qs0 = probes.select(col("id").as("probe_id"),
        col("lon").as("q_lon"), col("lat").as("q_lat"))
      val qRows = qs0.limit(smallPtsMax.toInt + 1).collect()
      if (qRows.length > smallPtsMax) throw new IllegalStateException(
        s"nearest: nProbesHint=$nProbesHint claims <= $smallPtsMax probes " +
          "but the relation holds more — the hint must be exact " +
          "(GridDef.nCells discipline) or -1")
      val qs = probes.sparkSession.createDataFrame(
        java.util.Arrays.asList(qRows: _*), qs0.schema)
      val cand = pts.crossJoin(broadcast(qs))
        .withColumn("dist",
          Rounding.r9(sqChord(col("q_lon"), col("q_lat"), col("p_lon"), col("p_lat"))))
      return cand
        .groupBy(col("probe_id"))
        .agg(min(struct(col("dist"), col("point_id"))).as("m"))
        .select(col("probe_id"), col("m.point_id").as("point_id"), col("m.dist").as("dist"))
    }
    val r0 =
      if (initBandDeg > 0) initBandDeg
      else math.min(90.0, math.max(0.05, 2.5 * math.sqrt(41253.0 / nPts)))

    var remaining = probes.select(col("id").as("probe_id"),
      col("lon").as("q_lon"), col("lat").as("q_lat"))
    var resolved: Option[DataFrame] = None
    var r = r0
    var round = 0

    while (round < maxRounds && !remaining.isEmpty) {
      // half-chord bound for angle r: a ≤ sin²(r/2) ⟺ angle ≤ r
      val bound = math.pow(math.sin(math.toRadians(r / 2.0)), 2)
      // tile width ≈ 1.25·r: the mid-latitude lon reach is ~1.0003·r,
      // so tiles slightly wider than r keep the explosion at ±1 tile
      // instead of ±2 (the ceil would otherwise round 1.0003 up)
      val nLon = math.max(1, math.floor(360.0 / (1.25 * r)).toLong)
      val w = 360.0 / nLon
      val sinHalfR = math.sin(math.toRadians(r / 2.0))

      // Pole handling. Lat-lon tiles degenerate at the poles (a tiny
      // great-circle radius spans every longitude), so for r ≤ 15° the
      // caps switch to azimuthal-equidistant PLANAR tiles: project
      // (x, y) = ρ·(cos λ, sin λ) with ρ = colatitude in degrees.
      // Toponogov's comparison theorem (curvature > 0) gives
      // d_planar ≥ d_sphere, and the projection's tangential stretch
      // bounds d_planar ≤ d_sphere · ρmax/sin ρmax ≤ 1.112·d_sphere
      // for ρmax = 45°, so a probe exploding to its 3×3 planar tile
      // neighborhood (tile width 1.25·r) sees every point within
      // great-circle angle r. Membership: cap points ρ ≤ 3r, cap
      // probes ρ ≤ 2r — a cap probe's whole radius-r disk lies inside
      // the cap point set, so cap probes skip the lat-lon join
      // entirely, and points with ρ ≤ r exist only in the cap. The
      // remaining lat-lon reach is then evaluated against probes at
      // |lat| ≤ 90 − 2r, so its cosine never degenerates (≥ sin r) —
      // the former full-ring explode (441 copies/point at r = 2°) is
      // gone. For r > 15° the ring is ≤ 20 tiles and the old full-ring
      // fallback is cheaper than the cap machinery.
      val useCap = r <= 15.0
      val capW = 1.25 * r

      // shared lat-lon band/tile keying; branches differ only in the
      // point reach expression and an optional pre-filter
      def bandTiled(p: DataFrame, q: DataFrame, reach: Column) = {
        val pk = p
          .withColumn("k", reach)
          .withColumn("db", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("band", (floor(col("p_lat") / lit(r)) + col("db")).cast("long"))
          .withColumn("dl", explode(sequence(-col("k"), col("k"))))
          .withColumn("lonb", pmod(
            floor(pmod(col("p_lon"), lit(360.0)) / lit(w)).cast("long") + col("dl"),
            lit(nLon)))
          .drop("db", "dl", "k")
        val qk = q
          .withColumn("band", floor(col("q_lat") / lit(r)).cast("long"))
          .withColumn("lonb", floor(pmod(col("q_lon"), lit(360.0)) / lit(w)).cast("long"))
        (pk, qk)
      }

      val (ptsKeyed, probesKeyed) =
        if (!useCap) {
          val reach = least(
            when(abs(col("p_lat")) + lit(r) >= 89.99, lit((nLon / 2 + 1).toDouble))
              .otherwise(ceil(degrees(lit(2.0) * asin(least(lit(1.0),
                lit(sinHalfR) / cos(radians(abs(col("p_lat")) + lit(r)))))) / lit(w)))
              .cast("long"),
            lit(nLon / 2 + 1))
          bandTiled(pts, remaining, reach)
        } else {
          // ---- lat-lon part (probes with ρ > 2r on both poles) ----
          // reach bound: the served probes have |q_lat| ≤ 90 − 2r, so
          // max|φ| ≤ min(|p_lat| + r, max(|p_lat|, 90 − 2r)) ≤ 90 − r
          val maxPhi = least(abs(col("p_lat")) + lit(r),
            greatest(abs(col("p_lat")), lit(90.0 - 2.0 * r)))
          val reach = least(
            ceil(degrees(lit(2.0) * asin(least(lit(1.0),
              lit(sinHalfR) / cos(radians(maxPhi))))) / lit(w)).cast("long"),
            lit(nLon / 2 + 1))
          val (pNormal, qNormal) = bandTiled(
            pts.filter(abs(col("p_lat")) <= 90.0 - r),   // ρ ≤ r lives in the cap only
            remaining.filter(abs(col("q_lat")) < 90.0 - 2.0 * r),
            reach)
          // ---- planar cap tiles (band codes disjoint from lat-lon
          // bands, which stay within ±(90/r + 1) ≪ 10^9) ----
          def capSide(code: Long, north: Boolean) = {
            def rho(lat: Column) = if (north) lit(90.0) - lat else lit(90.0) + lat
            val pc = pts.filter(rho(col("p_lat")) <= 3.0 * r)
              .withColumn("cx", rho(col("p_lat")) * cos(radians(col("p_lon"))))
              .withColumn("cy", rho(col("p_lat")) * sin(radians(col("p_lon"))))
              .withColumn("band", lit(code) + floor(col("cy") / lit(capW)).cast("long"))
              .withColumn("lonb", floor(col("cx") / lit(capW)).cast("long"))
              .drop("cx", "cy")
            val qc = remaining.filter(rho(col("q_lat")) <= 2.0 * r)
              .withColumn("cx", rho(col("q_lat")) * cos(radians(col("q_lon"))))
              .withColumn("cy", rho(col("q_lat")) * sin(radians(col("q_lon"))))
              .withColumn("dbx", explode(array(lit(-1L), lit(0L), lit(1L))))
              .withColumn("dby", explode(array(lit(-1L), lit(0L), lit(1L))))
              .withColumn("band",
                lit(code) + floor(col("cy") / lit(capW)).cast("long") + col("dby"))
              .withColumn("lonb", floor(col("cx") / lit(capW)).cast("long") + col("dbx"))
              .drop("cx", "cy", "dbx", "dby")
            (pc, qc)
          }
          val (pN, qN) = capSide(1000000000L, north = true)
          val (pS, qS) = capSide(2000000000L, north = false)
          (pNormal.unionByName(pN).unionByName(pS),
            qNormal.unionByName(qN).unionByName(qS))
        }

      val cand = probesKeyed.join(ptsKeyed, Seq("band", "lonb"))
        .withColumn("dist",
          Rounding.r9(sqChord(col("q_lon"), col("q_lat"), col("p_lon"), col("p_lat"))))
      // argmin as a hash aggregate: lexicographic struct-min on
      // (dist, point_id) is exactly row_number's (dist, point_id)
      // ordering pick, but runs with map-side partial aggregation
      // instead of a full per-probe sort — the cheaper shape when
      // candidates ≫ probes
      val best = cand
        .groupBy(col("probe_id"))
        .agg(min(struct(col("dist"), col("point_id"))).as("m"))
        .select(col("probe_id"), col("m.point_id").as("point_id"), col("m.dist").as("dist"))

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
      val rest = cand
        .groupBy(col("probe_id"))
        .agg(min(struct(col("dist"), col("point_id"))).as("m"))
        .select(col("probe_id"), col("m.point_id").as("point_id"), col("m.dist").as("dist"))
      resolved = Some(resolved.map(_.unionByName(rest)).getOrElse(rest))
    }
    resolved.get
  }
}
