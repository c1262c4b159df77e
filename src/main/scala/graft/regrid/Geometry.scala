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

  /** Sutherland–Hodgman with an on-boundary tolerance, for polygons
    * whose coordinates carry FP noise (the great-circle kernel's
    * projected charts). A vertex within `epsDist` of a clip edge LINE
    * counts as inside and no crossing vertex is inserted for it: when a
    * subject edge is collinear with a clip edge (adjacent mesh cells
    * share an edge → the same great circle → the same chart line up to
    * noise), plain sign tests see noise-scale ±sp flips and insert
    * junk crossing vertices at noise-driven interpolation positions —
    * measured as a 3.5e-12 spurious area triangle on the gnomonic
    * lattice fixture, 1000× the closed-form gap. `epsDist` is an
    * absolute distance in chart units; [[gcOverlapWeight]] passes
    * ~1e-9 of the clip diameter (≈ sub-mm on Earth), far above
    * coordinate noise (~1e-15) and far below real cell geometry. */
  def clipConvexEps(subject: Array[Double], clip: Array[Double],
                    epsDist: Double): Array[Double] = {
    var out = subject
    val m = clip.length / 2
    var e = 0
    while (e < m && out.length >= 6) {
      val ax = clip(2 * e); val ay = clip(2 * e + 1)
      val b = (e + 1) % m
      val bx = clip(2 * b); val by = clip(2 * b + 1)
      val invL = 1.0 / math.max(math.hypot(bx - ax, by - ay), Double.MinPositiveValue)
      val in = out
      val n = in.length / 2
      val buf = new scala.collection.mutable.ArrayBuffer[Double](2 * n + 4)
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val px = in(2 * i); val py = in(2 * i + 1)
        val qx = in(2 * j); val qy = in(2 * j + 1)
        val dp = ((bx - ax) * (py - ay) - (by - ay) * (px - ax)) * invL
        val dq = ((bx - ax) * (qy - ay) - (by - ay) * (qx - ax)) * invL
        val inP = dp >= -epsDist; val inQ = dq >= -epsDist
        if (inP) { buf += px; buf += py }
        if (inP != inQ) {
          // clamp: with eps-inclusive classification, dp and dq can sit
          // on the SAME side of zero (both in [-eps, 0)), making the
          // raw t = dp/(dp-dq) unbounded — the inserted vertex would
          // lie on the clip line but far off the subject segment,
          // inflating the intersection. Clamped, it stays on segment.
          val t = math.min(1.0, math.max(0.0, dp / (dp - dq)))
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

  // ---- exact great-circle-edge kernel (ESMF CONSERVE semantics,
  // reference backend.py:241-246): cell edges are great circles, not
  // straight (lon°, lat°) segments. Great circles are straight lines in
  // ANY gnomonic (central) projection, so clipping the projected
  // polygons with the SAME Sutherland–Hodgman kernel IS exact
  // great-circle clipping; areas are then true spherical areas via
  // per-triangle spherical excess (l'Huilier). Promoted from the
  // RegridSpec deviation-measurement test (round-6 verdict ask #3).

  private type V3 = Array[Double]

  private[regrid] def xyz(lonDeg: Double, latDeg: Double): V3 = {
    val lon = math.toRadians(lonDeg); val lat = math.toRadians(latDeg)
    Array(math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon), math.sin(lat))
  }
  private def dot3(a: V3, b: V3) = a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
  private def cross3(a: V3, b: V3): V3 = Array(
    a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))
  private def unit3(a: V3): V3 = {
    val n = math.sqrt(dot3(a, a)); Array(a(0) / n, a(1) / n, a(2) / n)
  }

  /** Spherical-triangle area (steradians) via l'Huilier's theorem —
    * numerically stable for the small triangles grid cells produce. */
  private[regrid] def sphTriArea(a: V3, b: V3, c: V3): Double = {
    def side(u: V3, v: V3) = math.atan2(math.sqrt(dot3(cross3(u, v), cross3(u, v))), dot3(u, v))
    val sa = side(b, c); val sb = side(a, c); val sc = side(a, b)
    val s = (sa + sb + sc) / 2
    val t = math.tan(s / 2) * math.tan((s - sa) / 2) *
      math.tan((s - sb) / 2) * math.tan((s - sc) / 2)
    4.0 * math.atan(math.sqrt(math.max(0.0, t)))
  }

  /** Area (steradians) of a convex great-circle polygon given by unit
    * vectors, by fan triangulation from vertex 0. */
  private[regrid] def gcArea(vs: IndexedSeq[V3]): Double =
    (1 until vs.length - 1).map(i => sphTriArea(vs(0), vs(i), vs(i + 1))).sum

  /** Exact great-circle overlap weight
    * `A_sphere(subject ∩ clip) / A_sphere(clip)` for cells given as
    * flat `(lon°, lat°)` vertex arrays whose EDGES ARE GREAT CIRCLES.
    *
    * Method: project both polygons gnomonically about the clip cell's
    * vertex centroid (great circles ↔ straight lines in that chart, so
    * planar Sutherland–Hodgman there is exact gc clipping), unproject
    * the intersection's vertices, and take true spherical areas via
    * spherical-triangle excess. Subject vertices on the far side of the
    * horizon (≥ 90° from the clip cell) make overlap impossible for the
    * sub-hemisphere cells this kernel serves — such pairs return 0.
    *
    * Throws when the PROJECTED clip polygon is non-convex (same
    * Sutherland–Hodgman exactness contract as [[overlapWeight]];
    * convexity is chart-invariant within the hemisphere). */
  def gcOverlapWeight(subject: Array[Double], clip: Array[Double]): Double = {
    val cs = (0 until clip.length / 2).map(i => xyz(clip(2 * i), clip(2 * i + 1)))
    val ctr = unit3(Array(cs.map(_(0)).sum, cs.map(_(1)).sum, cs.map(_(2)).sum))
    // gnomonic basis at ctr (east, north). A pole-centred clip cell
    // makes cross(z, ctr) the zero vector (unit3 → NaN basis → every
    // comparison false → silent weight 0); fall back to the x-axis
    // reference there — any vector non-parallel to ctr yields a valid
    // orthonormal chart basis.
    val zRef: V3 =
      if (math.hypot(ctr(0), ctr(1)) < 1e-12) Array(1.0, 0.0, 0.0)
      else Array(0.0, 0.0, 1.0)
    val e1 = unit3(cross3(zRef, ctr))
    val e2 = cross3(ctr, e1)
    def proj(p: V3): (Double, Double) = {
      val d = dot3(p, ctr)
      if (d < 1e-9) throw new ArithmeticException("beyond horizon")
      (dot3(p, e1) / d, dot3(p, e2) / d)
    }
    def unproj(u: Double, v: Double): V3 =
      unit3(Array(ctr(0) + u * e1(0) + v * e2(0), ctr(1) + u * e1(1) + v * e2(1),
        ctr(2) + u * e1(2) + v * e2(2)))
    def flat(q: Array[Double]): Array[Double] = {
      val b = new Array[Double](q.length)
      var i = 0
      while (2 * i < q.length) {
        val (u, v) = proj(xyz(q(2 * i), q(2 * i + 1))); b(2 * i) = u; b(2 * i + 1) = v
        i += 1
      }
      b
    }
    val cFlat = ccw(flat(clip))
    if (!isConvex(cFlat))
      throw new IllegalArgumentException(
        "great-circle conservative kernel requires destination cells convex on the sphere")
    val sFlat =
      try ccw(flat(subject))
      catch { case _: ArithmeticException => return 0.0 } // subject beyond horizon
    // on-boundary tolerance ~1e-9 of the clip diameter: collinear
    // shared edges (same great circle on both cells) must not spawn
    // noise crossings (see clipConvexEps)
    var diam = 0.0
    var i = 0
    while (i < cFlat.length) {
      var j = i + 2
      while (j < cFlat.length) {
        diam = math.max(diam, math.hypot(cFlat(i) - cFlat(j), cFlat(i + 1) - cFlat(j + 1)))
        j += 2
      }
      i += 2
    }
    val inter = clipConvexEps(sFlat, cFlat, 1e-9 * diam)
    if (inter.isEmpty) 0.0
    else {
      val vs = (0 until inter.length / 2).map(i => unproj(inter(2 * i), inter(2 * i + 1)))
      val aD = gcArea(cs)
      if (aD == 0.0) 0.0 else gcArea(vs) / aD
    }
  }
}
