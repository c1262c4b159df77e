package graft.regrid

/** Small planar-polygon kernel for the curvilinear conservative remap.
  *
  * Cells are treated as polygons with straight edges in (lon°, lat°)
  * space — the documented deviation from ESMF, which clips along great
  * circles (SURVEY §7 "what's hard" (a)). The payoff: clipped pieces
  * tile their destination cell EXACTLY in the plane, and the spherical
  * area measure `∫∫ cos(lat) dlon dlat` has a closed form over straight
  * segments, so `Σ_s A(s∩d) = A(d)` holds to FP precision and the
  * conservation invariant survives (verified to 1e-10 in RegridSpec).
  *
  * Deviation bound, MEASURED against exact great-circle clipping
  * (gnomonic-projection clip + spherical-excess areas; see the
  * RegridSpec test "straight-edge deviation ... bounded"): on the 4°
  * rotated-pole fixture at |lat| ≤ 60 the max per-weight difference is
  * 0.0047 (asserted < 0.012). The deviation scales ~quadratically with
  * cell size (edge sagitta ∝ Δ²), so 1° cells sit near 3e-4. Note the
  * comparison itself is a modeling choice: for lat-lon cells the true
  * boundary is the parallel, which great-circle edges also only
  * approximate.
  *
  * Polygons are flat vertex arrays `[x0, y0, x1, y1, …]`.
  */
object Geometry {

  /** Shoelace signed area in the (lon, lat) plane — orientation only. */
  def planarSignedArea(p: Array[Double]): Double = {
    var a = 0.0
    val n = p.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      a += p(2 * i) * p(2 * j + 1) - p(2 * j) * p(2 * i + 1)
      i += 1
    }
    0.5 * a
  }

  /** Ensure counter-clockwise orientation (positive shoelace area). */
  def ccw(p: Array[Double]): Array[Double] =
    if (planarSignedArea(p) >= 0) p
    else {
      val n = p.length / 2
      val out = new Array[Double](p.length)
      var i = 0
      while (i < n) {
        out(2 * i) = p(2 * (n - 1 - i))
        out(2 * i + 1) = p(2 * (n - 1 - i) + 1)
        i += 1
      }
      out
    }

  /** Spherical area `∫∫ cos(lat)` over a CCW polygon with straight
    * edges in (lon°, lat°): Green's theorem with P = −sin(lat), i.e.
    * `−∮ sin(lat) dlon`, where the per-edge average of sin over a
    * linear lat ramp is `(cos φ1 − cos φ2)/(φ2 − φ1)` (radians).
    * Units: degrees·sin — identical to the rectilinear measure
    * `Δlon·(sin lat_n − sin lat_s)` used by [[Weights.conservative]]. */
  def sphericalArea(p: Array[Double]): Double = {
    var a = 0.0
    val n = p.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val dx = p(2 * j) - p(2 * i)
      val y1 = math.toRadians(p(2 * i + 1))
      val y2 = math.toRadians(p(2 * j + 1))
      val c =
        if (math.abs(y2 - y1) < 1e-12) math.sin(y1)
        else (math.cos(y1) - math.cos(y2)) / (y2 - y1)
      a -= dx * c
      i += 1
    }
    a
  }

  /** Convexity test (tolerance 1e-12): all consecutive edge cross
    * products share a sign. Degenerate (collinear) edges count as
    * convex — they clip to zero-area pieces harmlessly. */
  def isConvex(p: Array[Double]): Boolean = {
    val n = p.length / 2
    var pos = true
    var neg = true
    var i = 0
    while (i < n) {
      val j = (i + 1) % n; val k = (i + 2) % n
      val cr = (p(2 * j) - p(2 * i)) * (p(2 * k + 1) - p(2 * j + 1)) -
        (p(2 * j + 1) - p(2 * i + 1)) * (p(2 * k) - p(2 * j))
      if (cr < -1e-12) pos = false
      if (cr > 1e-12) neg = false
      i += 1
    }
    pos || neg
  }

  /** Sutherland–Hodgman: clip `subject` by the CONVEX CCW polygon
    * `clip`. Returns the intersection's vertices (possibly empty). */
  def clipConvex(subject: Array[Double], clip: Array[Double]): Array[Double] = {
    var out = subject
    val m = clip.length / 2
    var e = 0
    while (e < m && out.length >= 6) {
      val ax = clip(2 * e); val ay = clip(2 * e + 1)
      val b = (e + 1) % m
      val bx = clip(2 * b); val by = clip(2 * b + 1)
      val in = out
      val n = in.length / 2
      val buf = new scala.collection.mutable.ArrayBuffer[Double](2 * n + 4)
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val px = in(2 * i); val py = in(2 * i + 1)
        val qx = in(2 * j); val qy = in(2 * j + 1)
        val sp = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        val sq = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
        if (sp >= 0) { buf += px; buf += py }
        if ((sp > 0 && sq < 0) || (sp < 0 && sq > 0)) {
          val t = sp / (sp - sq)
          buf += px + t * (qx - px)
          buf += py + t * (qy - py)
        }
        i += 1
      }
      out = buf.toArray
      e += 1
    }
    if (out.length >= 6) out else Array.emptyDoubleArray
  }

  /** Overlap weight `A(subject ∩ clip) / A(clip)` in the spherical
    * measure; 0.0 when the intersection is empty or degenerate. */
  def overlapWeight(subject: Array[Double], clip: Array[Double]): Double = {
    val s = ccw(subject)
    val c = ccw(clip)
    val inter = clipConvex(s, c)
    if (inter.isEmpty) 0.0
    else {
      val aD = sphericalArea(c)
      if (aD == 0.0) 0.0 else sphericalArea(inter) / aD
    }
  }
}
