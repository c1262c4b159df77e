package graft.regrid

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weight-matrix generators — the five interpolation methods of the
  * reference (`xesmf/backend.py:241-246`), re-derived as relational
  * plans instead of calls into ESMF's Fortran core.
  *
  * Output schema everywhere: `weights(row BIGINT, col BIGINT, s DOUBLE)`
  * — the COO triplet relation of reference `xesmf/smm.py:34-41`.
  * `row` indexes destination cells, `col` source cells, both 0-based.
  * Zero weights are dropped (sparsity, reference `smm.py:40`).
  * Unmapped destinations simply have no rows — the apply kernel turns
  * that into 0.0 output (`unmapped_action=IGNORE`,
  * reference `xesmf/backend.py:275-280`).
  */
/** Candidate (destination point × enclosing-quad) row for the
  * curvilinear inverse-bilinear kernel. */
final case class QuadCand(
    row: Long, qy: Int, qx: Int,
    id00: Long, id10: Long, id01: Long, id11: Long,
    plon: Double, plat: Double,
    lon00: Double, lat00: Double, lon10: Double, lat10: Double,
    lon01: Double, lat01: Double, lon11: Double, lat11: Double)

/** Resolved quad coordinates per destination. */
final case class QuadUV(
    row: Long, qy: Int, qx: Int,
    id00: Long, id10: Long, id01: Long, id11: Long,
    u: Double, v: Double)

object Weights {

  import Rounding._

  /** `nearest_s2d`: each destination takes the value of the nearest
    * source point, weight 1 (reference `backend.py:241-246`, semantics
    * per `doc/notebooks/Compare_algorithms.ipynb`). */
  def nearestS2D(srcCells: DataFrame, dstCells: DataFrame,
                 initBandDeg: Double = 0.0,
                 nSrc: Long = -1L, nDst: Long = -1L): DataFrame = {
    val pts = srcCells.select(col("cell_id").as("id"), col("lon"), col("lat"))
    val probes = dstCells.select(col("cell_id").as("id"), col("lon"), col("lat"))
    NearestJoin.nearest(pts, probes, initBandDeg,
      nPtsHint = nSrc, nProbesHint = nDst)
      .select(col("probe_id").as("row"), col("point_id").as("col"), lit(1.0).as("s"))
  }

  /** `nearest_d2s`: each source is assigned to its nearest destination;
    * a destination receiving several sources SUMS them (non-monotone;
    * destinations receiving none stay unmapped → 0). */
  def nearestD2S(srcCells: DataFrame, dstCells: DataFrame,
                 initBandDeg: Double = 0.0,
                 nSrc: Long = -1L, nDst: Long = -1L): DataFrame = {
    val pts = dstCells.select(col("cell_id").as("id"), col("lon"), col("lat"))
    val probes = srcCells.select(col("cell_id").as("id"), col("lon"), col("lat"))
    NearestJoin.nearest(pts, probes, initBandDeg,
      nPtsHint = nDst, nProbesHint = nSrc)
      .select(col("point_id").as("row"), col("probe_id").as("col"), lit(1.0).as("s"))
  }

  /** `bilinear` on a uniform rectilinear source grid, destination = any
    * point set (grid centers or locstream).
    *
    * Closed form: the bracketing source columns/rows follow directly
    * from the uniform axis, so weight generation is a narrow projection
    * over the destination relation — zero shuffle, any scale.
    *
    * Periodic handling (reference P4, `backend.py:92-95`): longitude
    * index wraps modulo nx, and destinations poleward of the extreme
    * center rows interpolate against a synthetic pole point whose value
    * is the mean of that row (ESMF `ALLAVG` pole, the default the
    * reference inherits) — expressed as weight `t/nx` spread over the
    * whole extreme row. Non-periodic grids map nothing outside the
    * center hull (those destinations → 0, reproducing the rel-err == 1.0
    * behavior of `test_frontend.py:116-127`).
    */
  def bilinear(src: RectGrid, dstPoints: DataFrame, periodic: Boolean): DataFrame = {
    val nx = src.nx
    val ny = src.ny
    require(nx >= 2 && ny >= 2, s"bilinear needs at least 2x2 source centers, got ${ny}x$nx")
    val c0x = src.lonAxis.firstCenter
    val c0y = src.latAxis.firstCenter
    val cNy = src.latAxis.lastCenter

    val d = dstPoints.select(col("cell_id").as("row"), col("lon"), col("lat"))
      .withColumn("tx", (col("lon") - lit(c0x)) / lit(src.lonAxis.step))
      .withColumn("ty", (col("lat") - lit(c0y)) / lit(src.latAxis.step))

    def cellOf(iy: Column, ix: Column): Column = (iy * lit(nx.toLong) + ix).cast("long")

    val triplets: DataFrame =
      if (!periodic) {
        val mapped = col("tx") >= 0.0 && col("tx") <= lit((nx - 1).toDouble) &&
          col("ty") >= 0.0 && col("ty") <= lit((ny - 1).toDouble)
        val withIdx = d.filter(mapped)
          .withColumn("ix0", least(floor(col("tx")), lit((nx - 2).toDouble)).cast("long"))
          .withColumn("iy0", least(floor(col("ty")), lit((ny - 2).toDouble)).cast("long"))
          .withColumn("fx", col("tx") - col("ix0").cast("double"))
          .withColumn("fy", col("ty") - col("iy0").cast("double"))
        withIdx.select(col("row"), explode(array(
          struct(cellOf(col("iy0"), col("ix0")).as("col"),
            ((lit(1.0) - col("fx")) * (lit(1.0) - col("fy"))).as("s")),
          struct(cellOf(col("iy0"), col("ix0") + 1).as("col"),
            (col("fx") * (lit(1.0) - col("fy"))).as("s")),
          struct(cellOf(col("iy0") + 1, col("ix0")).as("col"),
            ((lit(1.0) - col("fx")) * col("fy")).as("s")),
          struct(cellOf(col("iy0") + 1, col("ix0") + 1).as("col"),
            (col("fx") * col("fy")).as("s")))).as("e"))
          .select(col("row"), col("e.col").as("col"), col("e.s").as("s"))
      } else {
        // wrapped fractional lon index in [0, nx)
        val base = d
          .withColumn("txw",
            ((col("tx") % lit(nx.toDouble)) + lit(nx.toDouble)) % lit(nx.toDouble))
          .withColumn("ix0", floor(col("txw")).cast("long"))
          .withColumn("ix1", (col("ix0") + 1) % lit(nx.toLong))
          .withColumn("fx", col("txw") - floor(col("txw")))

        val interior = base
          .filter(col("ty") >= 0.0 && col("ty") <= lit((ny - 1).toDouble))
          .withColumn("iy0", least(floor(col("ty")), lit((ny - 2).toDouble)).cast("long"))
          .withColumn("fy", col("ty") - col("iy0").cast("double"))
          .select(col("row"), explode(array(
            struct(cellOf(col("iy0"), col("ix0")).as("col"),
              ((lit(1.0) - col("fx")) * (lit(1.0) - col("fy"))).as("s")),
            struct(cellOf(col("iy0"), col("ix1")).as("col"),
              (col("fx") * (lit(1.0) - col("fy"))).as("s")),
            struct(cellOf(col("iy0") + 1, col("ix0")).as("col"),
              ((lit(1.0) - col("fx")) * col("fy")).as("s")),
            struct(cellOf(col("iy0") + 1, col("ix1")).as("col"),
              (col("fx") * col("fy")).as("s")))).as("e"))
          .select(col("row"), col("e.col").as("col"), col("e.s").as("s"))

        // poleward destinations: blend the extreme row with the pole mean
        val north = base
          .filter(col("ty") > lit((ny - 1).toDouble) && col("lat") <= 90.0)
          .withColumn("tp", (col("lat") - lit(cNy)) / (lit(90.0) - lit(cNy)))
        val south = base
          .filter(col("ty") < 0.0 && col("lat") >= -90.0)
          .withColumn("tp", (lit(c0y) - col("lat")) / (lit(c0y) - lit(-90.0)))

        def poleParts(pole: DataFrame, iy: Long): DataFrame = {
          val bilinearPart = pole.select(col("row"), explode(array(
            struct(cellOf(lit(iy), col("ix0")).as("col"),
              ((lit(1.0) - col("tp")) * (lit(1.0) - col("fx"))).as("s")),
            struct(cellOf(lit(iy), col("ix1")).as("col"),
              ((lit(1.0) - col("tp")) * col("fx")).as("s")))).as("e"))
            .select(col("row"), col("e.col").as("col"), col("e.s").as("s"))
          val spark = pole.sparkSession
          val allX = spark.range(nx.toLong).toDF("px")
          val meanPart = pole.select(col("row"), col("tp")).crossJoin(broadcast(allX))
            .select(col("row"), cellOf(lit(iy), col("px")).as("col"),
              (col("tp") / lit(nx.toDouble)).as("s"))
          bilinearPart.unionByName(meanPart)
        }

        interior
          .unionByName(poleParts(north, (ny - 1).toLong))
          .unionByName(poleParts(south, 0L))
      }

    triplets
      .groupBy(col("row"), col("col"))
      .agg(r12(sum(col("s"))).as("s"))
      .filter(col("s") =!= 0.0)
  }

  /** `patch` — best-effort stand-in for ESMF's patch recovery
    * (reference `backend.py:241-246`; the reference's own tests skip it
    * as too slow, `test_frontend.py:49-50`, and the exact
    * patch-recovery polynomial lives inside ESMF's Fortran core).
    *
    * Approximation, documented deviation: separable bicubic
    * convolution (Keys kernel, a = −1/2) over the 4×4 source-center
    * stencil around each destination — like ESMF patch it is a
    * higher-order, smoother-than-bilinear interpolant whose weights
    * sum to 1. Closed form over a uniform grid, so weight generation
    * is again a narrow projection over the destination relation (zero
    * shuffle). Stencil rows/cols are clamped at the grid edge
    * (longitude wraps instead when `periodic`); destinations outside
    * the source center hull stay unmapped → 0 like bilinear.
    */
  def patch(src: RectGrid, dstPoints: DataFrame, periodic: Boolean): DataFrame = {
    val nx = src.nx
    val ny = src.ny
    require(nx >= 4 && ny >= 4, s"patch needs at least 4x4 source centers, got ${ny}x$nx")

    val d = dstPoints.select(col("cell_id").as("row"), col("lon"), col("lat"))
      .withColumn("tx", (col("lon") - lit(src.lonAxis.firstCenter)) / lit(src.lonAxis.step))
      .withColumn("ty", (col("lat") - lit(src.latAxis.firstCenter)) / lit(src.latAxis.step))

    // Keys bicubic kernel, a = -1/2; Horner form reproduced textually in
    // the SQL oracle so both engines compute identical doubles
    def k(t: Column, off: Int): Column = off match {
      case -1 => ((lit(-0.5) * t + lit(1.0)) * t - lit(0.5)) * t
      case 0  => (lit(1.5) * t - lit(2.5)) * t * t + lit(1.0)
      case 1  => ((lit(-1.5) * t + lit(2.0)) * t + lit(0.5)) * t
      case 2  => (lit(0.5) * t - lit(0.5)) * t * t
    }

    val inHull =
      if (periodic) col("ty") >= 0.0 && col("ty") <= lit((ny - 1).toDouble)
      else col("tx") >= 0.0 && col("tx") <= lit((nx - 1).toDouble) &&
        col("ty") >= 0.0 && col("ty") <= lit((ny - 1).toDouble)

    // anchor clamped so the 4-point stencil stays on-grid (lat always;
    // lon only when not periodic); frac then ranges past [0,1) in the
    // outermost cells — the kernel extrapolates there, still sum-1
    val base = d.filter(inHull)
      .withColumn("ix0",
        if (periodic)
          floor(((col("tx") % lit(nx.toDouble)) + lit(nx.toDouble)) % lit(nx.toDouble)).cast("long")
        else least(greatest(floor(col("tx")), lit(1.0)), lit((nx - 3).toDouble)).cast("long"))
      .withColumn("iy0", least(greatest(floor(col("ty")), lit(1.0)), lit((ny - 3).toDouble)).cast("long"))
      .withColumn("fx",
        if (periodic)
          (((col("tx") % lit(nx.toDouble)) + lit(nx.toDouble)) % lit(nx.toDouble)) - col("ix0").cast("double")
        else col("tx") - col("ix0").cast("double"))
      .withColumn("fy", col("ty") - col("iy0").cast("double"))

    def colOf(dy: Int, dx: Int): Column = {
      val ix =
        if (periodic) pmod(col("ix0") + dx, lit(nx.toLong))
        else col("ix0") + dx
      ((col("iy0") + dy) * lit(nx.toLong) + ix).cast("long")
    }

    val stencil = for (dy <- -1 to 2; dx <- -1 to 2) yield
      struct(colOf(dy, dx).as("col"), (k(col("fx"), dx) * k(col("fy"), dy)).as("s"))

    base.select(col("row"), explode(array(stencil: _*)).as("e"))
      .select(col("row"), col("e.col").as("col"), col("e.s").as("s"))
      .groupBy(col("row"), col("col"))
      .agg(r12(sum(col("s"))).as("s"))
      .filter(col("s") =!= 0.0)
  }

  /** `patch` over an arbitrary NON-UNIFORM rectilinear source grid —
    * completes the reference's method matrix (`frontend.py:123-131`
    * allows patch wherever bilinear works).
    *
    * Kernel (documented deviation from ESMF's internal patch recovery,
    * like [[patch]]): separable CUBIC LAGRANGE on the actual 4×4
    * center positions around the destination — the natural
    * generalization of a 4-point stencil to non-uniform spacing
    * (normalizing Keys to a local t would silently assume uniform
    * spacing and lose the higher-order accuracy that is patch's whole
    * point; Lagrange is 4th-order on any spacing). The Lagrange basis
    * sums to 1 identically, so weights per destination sum to 1 like
    * every other method.
    *
    * Plan: the bracketing segment is located with the same banded
    * interval equi-join as [[bilinearIrregular]]; stencil indices and
    * node positions are precomputed driver-side per segment (edge
    * segments clamp the anchor to keep the stencil on-grid, the
    * Lagrange products extrapolate there). Destinations outside the
    * source center hull stay unmapped → 0.
    */
  def patchIrregular(src: CoordGrid, dstPoints: DataFrame,
                     periodic: Boolean = false): DataFrame = {
    require(src.nx >= 4 && src.ny >= 4,
      s"patch needs at least 4x4 source centers, got ${src.ny}x${src.nx}")
    if (periodic) {
      val span = src.lonAxis.bounds(src.nx) - src.lonAxis.bounds(0)
      require(math.abs(span - 360.0) < 1e-6,
        s"periodic longitude needs bounds spanning 360°, got $span")
    }
    val spark = dstPoints.sparkSession
    import spark.implicits._

    // per-axis: (row, coord, i0..i3 stencil indices, n0..n3 node
    // positions) — segments are driver-side arrays, the location join
    // is a banded hash equi-join (no theta join). With `wrap` the ring
    // closes: the seam segment [c(n−1), c(0)+360) joins the last
    // center to the first, stencil indices go modulo n, and node
    // positions use ±360-extended centers so the Lagrange products see
    // locally monotonic nodes.
    def axisStencil(ax: CoordAxis, d: DataFrame, coordCol: String,
                    ip: String, np: String, wrap: Boolean): DataFrame = {
      // centers extended one period either side for seam stencils
      def ext(j: Int): Double =
        if (j < 0) ax.centers(j + ax.n) - 360.0
        else if (j >= ax.n) ax.centers(j - ax.n) + 360.0
        else ax.centers(j)
      val segsSeq =
        if (wrap) (0 until ax.n).map { i =>
          def m(j: Int) = ((j % ax.n) + ax.n) % ax.n
          (m(i - 1).toLong, i.toLong, m(i + 1).toLong, m(i + 2).toLong,
            ext(i - 1), ext(i), ext(i + 1), ext(i + 2),
            ext(i), ext(i + 1), false)
        }
        else (0 until ax.n - 1).map { i =>
          val a = math.min(math.max(i, 1), ax.n - 3)
          (a.toLong - 1, a.toLong, a.toLong + 1, a.toLong + 2,
            ax.centers(a - 1), ax.centers(a), ax.centers(a + 1), ax.centers(a + 2),
            ax.centers(i), ax.centers(i + 1), i == ax.n - 2)
        }
      val maxW = math.max(segsSeq.map(s => s._10 - s._9).max, 1e-12)
      val segs = segsSeq
        .toDF(s"${ip}0", s"${ip}1", s"${ip}2", s"${ip}3",
          s"${np}0", s"${np}1", s"${np}2", s"${np}3", "c_lo", "c_hi", "is_last")
        .withColumn("band", explode(sequence(
          floor(col("c_lo") / lit(maxW)).cast("long"),
          floor(col("c_hi") / lit(maxW)).cast("long"))))
      val dIn =
        if (!wrap) d
        else {
          // wrap into [centers(0), centers(0)+360) — same op chain as
          // the SQL oracle text (and bilinearIrregular's)
          val c0 = ax.centers(0)
          d.withColumn(coordCol,
            ((col(coordCol) - lit(c0)) % lit(360.0) + lit(360.0)) % lit(360.0) + lit(c0))
        }
      dIn.withColumn("band", floor(col(coordCol) / lit(maxW)).cast("long"))
        .join(segs, Seq("band"))
        .filter(col(coordCol) >= col("c_lo") &&
          (col(coordCol) < col("c_hi") || (col("is_last") && col(coordCol) <= col("c_hi"))))
        .drop("band", "c_lo", "c_hi", "is_last")
    }

    // Lagrange basis L_j(x) over nodes n0..n3; multiplication order
    // (ascending other-node index) mirrored textually in the oracle
    def lag(x: Column, np: String, j: Int): Column = {
      val others = (0 to 3).filter(_ != j)
      val num = others.map(m => x - col(s"$np$m")).reduce(_ * _)
      val den = others.map(m => col(s"$np$j") - col(s"$np$m")).reduce(_ * _)
      num / den
    }

    val d = dstPoints.select(col("cell_id").as("row"), col("lon"), col("lat"))
    val dx = axisStencil(src.lonAxis, d.select("row", "lon"), "lon", "ix", "nx", periodic)
    val dy = axisStencil(src.latAxis, d.select("row", "lat"), "lat", "iy", "ny", wrap = false)
    val nCols = src.nx

    val stencil = for (oy <- 0 to 3; ox <- 0 to 3) yield
      struct((col(s"iy$oy") * lit(nCols.toLong) + col(s"ix$ox")).cast("long").as("col"),
        (lag(col("lon"), "nx", ox) * lag(col("lat"), "ny", oy)).as("s"))

    dx.join(dy, "row")
      .select(col("row"), explode(array(stencil: _*)).as("e"))
      .select(col("row"), col("e.col").as("col"), col("e.s").as("s"))
      .groupBy(col("row"), col("col"))
      .agg(r12(sum(col("s"))).as("s"))
      .filter(col("s") =!= 0.0)
  }

  /** `bilinear` over an arbitrary NON-UNIFORM rectilinear source grid
    * (Gaussian latitudes etc. — the coordinate-array ingestion path of
    * reference `frontend.py:59-69`, which the closed-form [[bilinear]]
    * cannot serve).
    *
    * The bracketing source centers per axis are located with a banded
    * interval EQUI-join: band width = the axis's widest center gap, so
    * every inter-center segment spans at most two bands and the
    * candidate join is a hash join keyed on band id — no nested-loop
    * theta join, same scale pattern as [[conservative]] and
    * [[NearestJoin]]. Fractional weights use the local segment width.
    * Destinations outside the source center hull stay unmapped → 0
    * (the reference's `unmapped_action=IGNORE` behavior).
    */
  def bilinearIrregular(src: CoordGrid, dstPoints: DataFrame,
                        periodic: Boolean = false): DataFrame = {
    // contract boundary: a single-center axis has no interior segment
    // to bracket with (and would crash below with an unhelpful
    // empty.max) — same style as CoordAxis's own shape validations
    require(src.nx >= 2 && src.ny >= 2,
      s"bilinear needs at least 2x2 source centers, got ${src.ny}x${src.nx}")
    val spark = dstPoints.sparkSession
    import spark.implicits._

    // per-axis bracketing: (row, iLo, iHi, frac) for the segment
    // [centers(iLo), centers(iHi)] containing the coordinate; points on
    // an interior center boundary belong to the right segment, the last
    // segment is upper-inclusive. When `wrapSpan` is set (periodic
    // longitude), a seam segment [centers(n-1), centers(0)+span] with
    // indices (n-1, 0) closes the ring, and coordinates are first
    // wrapped into [centers(0), centers(0)+span).
    def axisIndex(ax: CoordAxis, d: DataFrame, coordCol: String,
                  loName: String, hiName: String, fracName: String,
                  wrapSpan: Option[Double]): DataFrame = {
      val interior = (0 until ax.n - 1)
        .map(i => (i.toLong, (i + 1).toLong, ax.centers(i), ax.centers(i + 1),
          wrapSpan.isEmpty && i == ax.n - 2))
      val segsSeq = wrapSpan match {
        case Some(span) => interior :+
          ((ax.n - 1).toLong, 0L, ax.centers(ax.n - 1), ax.centers(0) + span, true)
        case None => interior
      }
      val maxW = math.max(segsSeq.map(s => s._4 - s._3).max, 1e-12)
      val segs = segsSeq.toDF("i_lo", "i_hi", "c_lo", "c_hi", "is_last")
        .withColumn("band", explode(sequence(
          floor(col("c_lo") / lit(maxW)).cast("long"),
          floor(col("c_hi") / lit(maxW)).cast("long"))))
      val dIn = wrapSpan match {
        case Some(span) =>
          // same op chain as the SQL oracle text (pmod's internal
          // branch differs bit-wise near zero remainders)
          val c0 = ax.centers(0)
          d.withColumn(coordCol,
            ((col(coordCol) - lit(c0)) % lit(span) + lit(span)) % lit(span) + lit(c0))
        case None => d
      }
      dIn.withColumn("band", floor(col(coordCol) / lit(maxW)).cast("long"))
        .join(segs, Seq("band"))
        .filter(col(coordCol) >= col("c_lo") &&
          (col(coordCol) < col("c_hi") || (col("is_last") && col(coordCol) <= col("c_hi"))))
        .select(col("row"), col("i_lo").as(loName), col("i_hi").as(hiName),
          ((col(coordCol) - col("c_lo")) / (col("c_hi") - col("c_lo"))).as(fracName))
    }

    val wrap =
      if (!periodic) None
      else {
        val span = src.lonAxis.bounds(src.nx) - src.lonAxis.bounds(0)
        require(math.abs(span - 360.0) < 1e-6,
          s"periodic longitude needs bounds spanning 360°, got $span")
        Some(360.0)
      }

    val d = dstPoints.select(col("cell_id").as("row"), col("lon"), col("lat"))
    val dx = axisIndex(src.lonAxis, d.select("row", "lon"), "lon", "ix0", "ix1", "fx", wrap)
    val dy = axisIndex(src.latAxis, d.select("row", "lat"), "lat", "iy0", "iy1", "fy", None)
    val nx = src.nx

    def cellOf(iy: Column, ix: Column): Column = (iy * lit(nx.toLong) + ix).cast("long")

    dx.join(dy, "row")
      .select(col("row"), explode(array(
        struct(cellOf(col("iy0"), col("ix0")).as("col"),
          ((lit(1.0) - col("fx")) * (lit(1.0) - col("fy"))).as("s")),
        struct(cellOf(col("iy0"), col("ix1")).as("col"),
          (col("fx") * (lit(1.0) - col("fy"))).as("s")),
        struct(cellOf(col("iy1"), col("ix0")).as("col"),
          ((lit(1.0) - col("fx")) * col("fy")).as("s")),
        struct(cellOf(col("iy1"), col("ix1")).as("col"),
          (col("fx") * col("fy")).as("s")))).as("e"))
      .select(col("row"), col("e.col").as("col"), col("e.s").as("s"))
      .groupBy(col("row"), col("col"))
      .agg(r12(sum(col("s"))).as("s"))
      .filter(col("s") =!= 0.0)
  }

  /** `bilinear` over a CURVILINEAR source mesh (2-D lon/lat arrays —
    * reference `frontend.py:21-30` `as_2d_mesh`; rotated-pole/ocean
    * grids): locate the enclosing center-quad per destination, invert
    * the bilinear map inside it, weights from the (u, v) quad
    * coordinates.
    *
    * Plan shape: quads from three shifted equi-joins on (y, x)
    * ([[Curvilinear.centerQuads]]); candidate pairs from a lat-band
    * equi-join on the quad bounding box (no nested loop); the inverse
    * bilinear (a quadratic solve, iq's `invBilinear` formulation) runs
    * as codegen'd column arithmetic on candidates only. A destination
    * on a shared quad edge resolves to the lowest (qy, qx) quad on
    * both engines via a deterministic row_number.
    */
  /** Tolerances of the inverse-bilinear root selection — public so the
    * SQL oracle embeds the IDENTICAL double literals. */
  val linEps: Double = 1e-12
  val rootLo: Double = -1e-9
  val rootHi: Double = 1.0 + 1e-9

  /** Locate the enclosing center-quad per destination and solve the
    * inverse bilinear map: `(row, qy, qx, id00, id10, id01, id11, u, v)`
    * with (u, v) ∈ [0, 1]² the quad coordinates. Shared by
    * [[bilinearCurvilinear]] (weights directly from (u, v)) and
    * [[patchCurvilinear]] (4×4 stencil in mesh-index space around the
    * quad). Checkpointed: downstream plans reference it repeatedly. */
  def locateQuads(srcCells: DataFrame, dstPoints: DataFrame,
                  bandDeg: Double = 5.0,
                  periodicNx: Option[Int] = None): DataFrame = {
    // Longitude-frame handling (the conservative kernel's ±360 bridge,
    // adapted to quads): (1) UNWRAP — a quad whose vertices straddle
    // the antimeridian / the mesh's lon seam has vertex lons ~360°
    // apart; bring each vertex within ±180° of lon00 so the quad is
    // locally contiguous (a no-op, bit-for-bit, for seam-free quads —
    // the guard condition keeps the original value); (2) SHIFT — try
    // each quad at {−360, 0, +360} so destinations in any lon
    // convention ([0,360) vs [−180,180)) find it; the tile equi-join
    // discards copies that land outside the destination frame.
    def unwrap(c: Column): Column =
      when(c - col("lon00") > 180.0, c - lit(360.0))
        .when(c - col("lon00") < -180.0, c + lit(360.0))
        .otherwise(c)
    // dst lon hull: shifted quad copies that cannot contain any
    // destination are pruned before the tile explode (same
    // result-neutral pruning as the conservative builder). This is one
    // extra pass over dstPoints at plan time — build-once cost; pass a
    // cached dst relation if its pipeline is expensive.
    val hull = dstPoints.agg(min(col("lon")), max(col("lon"))).head()
    val (dLonMin, dLonMax) =
      if (hull.isNullAt(0)) (Double.NegativeInfinity, Double.PositiveInfinity)
      else (hull.getDouble(0), hull.getDouble(1))
    val quads = Curvilinear.centerQuads(srcCells, periodicNx)
      .withColumn("lon10", unwrap(col("lon10")))
      .withColumn("lon01", unwrap(col("lon01")))
      .withColumn("lon11", unwrap(col("lon11")))
      .withColumn("shift", explode(array(lit(-360.0), lit(0.0), lit(360.0))))
      .withColumn("lon00", col("lon00") + col("shift"))
      .withColumn("lon10", col("lon10") + col("shift"))
      .withColumn("lon01", col("lon01") + col("shift"))
      .withColumn("lon11", col("lon11") + col("shift"))
      .drop("shift")
      .withColumn("lat_min", least(col("lat00"), col("lat10"), col("lat01"), col("lat11")))
      .withColumn("lat_max", greatest(col("lat00"), col("lat10"), col("lat01"), col("lat11")))
      .withColumn("lon_min", least(col("lon00"), col("lon10"), col("lon01"), col("lon11")))
      .withColumn("lon_max", greatest(col("lon00"), col("lon10"), col("lon01"), col("lon11")))
      .filter(col("lon_max") >= dLonMin && col("lon_min") <= dLonMax)
      .withColumn("band", explode(sequence(
        floor(col("lat_min") / lit(bandDeg)).cast("long"),
        floor(col("lat_max") / lit(bandDeg)).cast("long"))))
      .withColumn("ltile", explode(sequence(
        floor(col("lon_min") / lit(bandDeg)).cast("long"),
        floor(col("lon_max") / lit(bandDeg)).cast("long"))))

    val d = dstPoints.select(col("cell_id").as("row"),
      col("lon").as("plon"), col("lat").as("plat"))
      .withColumn("band", floor(col("plat") / lit(bandDeg)).cast("long"))
      .withColumn("ltile", floor(col("plon") / lit(bandDeg)).cast("long"))

    val spark = dstPoints.sparkSession
    import spark.implicits._
    // The quadratic solve runs as a typed mapPartitions kernel rather
    // than column expressions: expressed as chained columns, Catalyst's
    // projection collapse re-expands the solve tree at every downstream
    // reference (u appears in all 4 weights, u's tree holds ~5 copies
    // of v's tree, …) — the generated method blows past Janino's limit
    // and falls back to interpreted evaluation of an exponentially
    // duplicated expression. The kernel performs the IDENTICAL IEEE
    // operations in the identical order (see bilinearCurvSql, whose
    // DuckDB oracle hash-matches this output), so parity is preserved.
    val cand = d.join(quads, Seq("band", "ltile"))
      .filter(col("plon") >= col("lon_min") && col("plon") <= col("lon_max") &&
        col("plat") >= col("lat_min") && col("plat") <= col("lat_max"))
      .select(col("row"), col("qy"), col("qx"),
        col("id00"), col("id10"), col("id01"), col("id11"),
        col("plon"), col("plat"),
        col("lon00"), col("lat00"), col("lon10"), col("lat10"),
        col("lon01"), col("lat01"), col("lon11"), col("lat11"))
      .as[QuadCand]
      .mapPartitions(_.flatMap { c =>
        // inverse bilinear: p(u,v) = p00 + u·e + v·f + uv·g
        val hx = c.plon - c.lon00; val hy = c.plat - c.lat00
        val ex = c.lon10 - c.lon00; val ey = c.lat10 - c.lat00
        val fx = c.lon01 - c.lon00; val fy = c.lat01 - c.lat00
        val gx = c.lon00 - c.lon10 - c.lon01 + c.lon11
        val gy = c.lat00 - c.lat10 - c.lat01 + c.lat11
        val k2 = gx * fy - gy * fx
        val k1 = (ex * fy - ey * fx) + (hx * gy - hy * gx)
        val k0 = hx * ey - hy * ex
        val disc = k1 * k1 - 4.0 * k0 * k2
        if (!(disc >= 0.0)) None    // no real solution (oracle: WHERE disc >= 0)
        else {
          val v0 =
            if (math.abs(k2) < linEps) -k0 / k1
            else {
              val sq = math.sqrt(disc)
              val vm = (-k1 - sq) / (2.0 * k2)
              if (vm >= rootLo && vm <= rootHi) vm else (-k1 + sq) / (2.0 * k2)
            }
          val v = math.floor(v0 * 1.0e9 + 0.5) / 1.0e9
          val dnx = ex + gx * v; val dny = ey + gy * v
          val u0 =
            if (math.abs(dnx) >= math.abs(dny)) (hx - fx * v) / dnx
            else (hy - fy * v) / dny
          val u = math.floor(u0 * 1.0e9 + 0.5) / 1.0e9
          if (u >= 0.0 && u <= 1.0 && v >= 0.0 && v <= 1.0)
            Some(QuadUV(c.row, c.qy, c.qx, c.id00, c.id10, c.id01, c.id11, u, v))
          else None
        }
      })
      .toDF()

    import org.apache.spark.sql.expressions.Window
    // one quad per destination, lowest (qy, qx) — deterministic on both
    // engines; checkpointed so downstream plans' repeated references
    // don't re-run the candidate join
    cand
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("row")).orderBy(col("qy"), col("qx"))))
      .filter(col("rn") === 1)
      .select("row", "qy", "qx", "id00", "id10", "id01", "id11", "u", "v")
      .localCheckpoint()
  }

  def bilinearCurvilinear(srcCells: DataFrame, dstPoints: DataFrame,
                          bandDeg: Double = 5.0,
                          periodicNx: Option[Int] = None): DataFrame =
    locateQuads(srcCells, dstPoints, bandDeg, periodicNx)
      .select(col("row"), explode(array(
        struct(col("id00").as("col"), ((lit(1.0) - col("u")) * (lit(1.0) - col("v"))).as("s")),
        struct(col("id10").as("col"), (col("u") * (lit(1.0) - col("v"))).as("s")),
        struct(col("id01").as("col"), ((lit(1.0) - col("u")) * col("v")).as("s")),
        struct(col("id11").as("col"), (col("u") * col("v")).as("s")))).as("e"))
      .select(col("row"), col("e.col").as("col"), col("e.s").as("s"))
      .groupBy(col("row"), col("col"))
      .agg(r12(sum(col("s"))).as("s"))
      .filter(col("s") =!= 0.0)

  /** `patch` over a CURVILINEAR mesh — the last cell of the reference's
    * method matrix (`frontend.py:123-131`: patch wherever bilinear
    * works). The located quad gives mesh-index coordinates
    * `(qx + u, qy + v)`; in index space the mesh is uniform by
    * construction, so the SAME Keys bicubic kernel as the uniform
    * [[patch]] applies over the 4×4 stencil of mesh cells around the
    * quad, with the anchor clamped at mesh edges exactly like the
    * uniform builder (x wraps instead when `periodicNx` is set).
    * Weights sum to 1; destinations outside the mesh stay unmapped. */
  def patchCurvilinear(srcCells: DataFrame, dstPoints: DataFrame,
                       ny: Int, nx: Int,
                       bandDeg: Double = 5.0,
                       periodicNx: Option[Int] = None): DataFrame = {
    require(nx >= 4 && ny >= 4, s"patch needs at least 4x4 mesh cells, got ${ny}x$nx")
    val q = locateQuads(srcCells, dstPoints, bandDeg, periodicNx)
      .withColumn("ax",
        periodicNx match {
          case Some(_) => col("qx").cast("long")
          case None => least(greatest(col("qx").cast("long"), lit(1L)), lit((nx - 3).toLong))
        })
      .withColumn("ay", least(greatest(col("qy").cast("long"), lit(1L)), lit((ny - 3).toLong)))
      .withColumn("fx", col("qx").cast("double") + col("u") - col("ax").cast("double"))
      .withColumn("fy", col("qy").cast("double") + col("v") - col("ay").cast("double"))

    // Keys bicubic kernel, a = -1/2 — Horner text identical to patchSql
    def k(t: Column, off: Int): Column = off match {
      case -1 => ((lit(-0.5) * t + lit(1.0)) * t - lit(0.5)) * t
      case 0  => (lit(1.5) * t - lit(2.5)) * t * t + lit(1.0)
      case 1  => ((lit(-1.5) * t + lit(2.0)) * t + lit(0.5)) * t
      case 2  => (lit(0.5) * t - lit(0.5)) * t * t
    }
    def colOf(dy: Int, dx: Int): Column = {
      val ix = periodicNx match {
        case Some(n) => pmod(col("ax") + dx, lit(n.toLong))
        case None => col("ax") + dx
      }
      ((col("ay") + dy) * lit(nx.toLong) + ix).cast("long")
    }
    val stencil = for (dy <- -1 to 2; dx <- -1 to 2) yield
      struct(colOf(dy, dx).as("col"), (k(col("fx"), dx) * k(col("fy"), dy)).as("s"))

    q.select(col("row"), explode(array(stencil: _*)).as("e"))
      .select(col("row"), col("e.col").as("col"), col("e.s").as("s"))
      .groupBy(col("row"), col("col"))
      .agg(r12(sum(col("s"))).as("s"))
      .filter(col("s") =!= 0.0)
  }

  /** First-order conservative remap over CURVILINEAR quads: exact
    * polygon clipping of source cells against destination cells.
    *
    * Documented deviation from ESMF: cell edges are straight in
    * (lon°, lat°) space instead of great circles (SURVEY §7 (a)); the
    * spherical measure `∫∫ cos(lat)` is evaluated in closed form per
    * clipped polygon ([[Geometry.sphericalArea]]), so source pieces
    * tile each destination exactly and conservation holds to FP
    * precision (RegridSpec asserts 1e-10).
    *
    * Plan shape: lat-band bbox equi-join for candidates (with the
    * ±360° longitude-frame bridge), then the clip kernel runs via
    * `mapPartitions` on candidate pairs only — geometry is the one
    * place where a local imperative kernel genuinely beats column
    * expressions. Input schema both sides:
    * `(cell_id, lon_c0, lat_c0, …, lon_c3, lat_c3)`
    * (see [[Curvilinear.rotatedCorners]] / [[Curvilinear.boundsToPolys]]).
    *
    * `exactEdges = true` selects ESMF's CONSERVE edge semantics
    * (reference `backend.py:241-246`): cell edges are great circles and
    * areas are true spherical areas ([[Geometry.gcOverlapWeight]] —
    * gnomonic-projection clip + spherical excess), instead of the
    * default straight-(lon°, lat°)-edge kernel whose deviation is
    * documented in [[Geometry]]'s scaladoc (max 0.0047 per weight on 4°
    * cells, ∝ cell size²). Same candidate join; the lat bbox is padded
    * by each cell's worst-case great-circle sagitta
    * (Δlon²_rad/8 · |sin 2·lat|max ≤ Δlon°² · π/720 degrees) because a
    * gc edge bulges poleward of its endpoints' parallel. */
  def conservativeCurvilinear(srcPolys: DataFrame, dstPolys: DataFrame,
                              bandDeg: Double = 5.0,
                              exactEdges: Boolean = false): DataFrame = {
    val spark = srcPolys.sparkSession
    import spark.implicits._

    def prep(df: DataFrame, role: String): DataFrame = {
      // Vertex unwrap (the quad-unwrap of bilinearCurvilinear, applied
      // to corner polygons): a cell whose corners straddle the stored-
      // longitude seam of a global mesh (lon jumping ~360° across the
      // atan2 branch) would otherwise clip as a garbage ~359°-wide
      // polygon. Bring each vertex within ±180° of vertex 0 — a
      // bit-exact no-op for seam-free cells — and let the ±360 shift
      // copies below handle frame matching.
      def uw(k: Int): Column = {
        val c = col(s"lon_c$k")
        when(c - col("lon_c0") > 180.0, c - lit(360.0))
          .when(c - col("lon_c0") < -180.0, c + lit(360.0))
          .otherwise(c)
      }
      val lons = col("lon_c0") +: (1 to 3).map(uw)
      val lats = (0 to 3).map(k => col(s"lat_c$k"))
      val base = df.select(col("cell_id").as(s"${role}_id"),
        array((0 to 3).flatMap(k =>
          Seq(if (k == 0) col("lon_c0") else uw(k), col(s"lat_c$k"))): _*).as(s"${role}_p"),
        least(lons: _*).as(s"${role}_lon_min"), greatest(lons: _*).as(s"${role}_lon_max"),
        least(lats: _*).as(s"${role}_lat_min"), greatest(lats: _*).as(s"${role}_lat_max"))
      // great-circle edges bulge poleward of the corner parallel by up
      // to the edge sagitta; pad the candidate lat bbox accordingly so
      // sliver overlaps between vertically adjacent cells aren't
      // missed. Applied as a TYPED map, not a Column expression:
      // Catalyst collapses a pad projection back into the prep
      // projection, and the squared greatest/least-of-unwrap trees it
      // duplicates there blew the fused join stage past janino's
      // limits (whole-stage-codegen fallback, observed 30 s vs 2 s on
      // the 57.6k-poly probe; a trivial typed map stays compiled).
      if (!exactEdges) base
      else {
        base.as[(Long, Seq[Double], Double, Double, Double, Double)]
          .map { case (id, p, lnMin, lnMax, ltMin, ltMax) =>
            val pad = (lnMax - lnMin) * (lnMax - lnMin) * (math.Pi / 720.0)
            (id, p, lnMin, lnMax, ltMin - pad, ltMax + pad)
          }
          .toDF(s"${role}_id", s"${role}_p", s"${role}_lon_min",
            s"${role}_lon_max", s"${role}_lat_min", s"${role}_lat_max")
      }
    }
    val s0 = prep(srcPolys, "s")
      .withColumn("shift", explode(array(lit(-360.0), lit(0.0), lit(360.0))))
      .withColumn("s_p", expr("transform(s_p, (v, i) -> IF(i % 2 = 0, v + shift, v))"))
      .withColumn("s_lon_min", col("s_lon_min") + col("shift"))
      .withColumn("s_lon_max", col("s_lon_max") + col("shift"))
      .drop("shift")
      .withColumn("band", explode(sequence(
        floor(col("s_lat_min") / lit(bandDeg)).cast("long"),
        floor(col("s_lat_max") / lit(bandDeg)).cast("long"))))
      .withColumn("ltile", explode(sequence(
        floor(col("s_lon_min") / lit(bandDeg)).cast("long"),
        floor(col("s_lon_max") / lit(bandDeg)).cast("long"))))
    val d0 = prep(dstPolys, "d")
      .withColumn("band", explode(sequence(
        floor(col("d_lat_min") / lit(bandDeg)).cast("long"),
        floor(col("d_lat_max") / lit(bandDeg)).cast("long"))))
      .withColumn("ltile", explode(sequence(
        floor(col("d_lon_min") / lit(bandDeg)).cast("long"),
        floor(col("d_lon_max") / lit(bandDeg)).cast("long"))))

    d0.join(s0,
      d0("band") === s0("band") && d0("ltile") === s0("ltile") &&
        col("s_lon_min") < col("d_lon_max") && col("s_lon_max") > col("d_lon_min") &&
        col("s_lat_min") < col("d_lat_max") && col("s_lat_max") > col("d_lat_min") &&
        // SW-corner tile of the bbox overlap: exactly one match per pair
        d0("band") === floor(greatest(col("s_lat_min"), col("d_lat_min")) / lit(bandDeg)).cast("long") &&
        d0("ltile") === floor(greatest(col("s_lon_min"), col("d_lon_min")) / lit(bandDeg)).cast("long"))
      .select(col("d_id"), col("s_id"), col("s_p"), col("d_p"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions(_.map { case (d, s, sp, dp) =>
        // Sutherland–Hodgman is only exact when the CLIP polygon (the
        // destination cell) is convex (subject cells may be any simple
        // quad). Checked here inside the kernel — ~20 flops per
        // candidate pair — rather than as an eager full dst scan at
        // plan-construction time, which broke laziness and charged a
        // full pass per (re)build. A non-convex cell that overlaps no
        // source goes unreported, but it also contributes no weights.
        // (The exact kernel checks convexity in its projected chart,
        // where it belongs, and throws its own message.)
        if (exactEdges) (d, s, Geometry.gcOverlapWeight(sp, dp))
        else {
          if (!Geometry.isConvex(dp))
            throw new IllegalArgumentException(
              s"destination cell $d is non-convex in (lon, lat) — the polygon-clip " +
                "conservative kernel requires convex destination cells")
          (d, s, Geometry.overlapWeight(sp, dp))
        }
      })
      .toDF("row", "col", "s")
      .filter(col("s") =!= 0.0)
  }

  /** First-order conservative remap (Jones 1999, cited reference
    * `xesmf/data.py:30-32`): `w(d,s) = A(s ∩ d) / A(d)` with spherical
    * patch area `Δlon · (sin lat_n − sin lat_s)`. Requires bounds
    * columns (reference errors without them, `backend.py:254-260`).
    *
    * Scale shape: the interval-overlap theta-join is rewritten as a 2-D
    * tile equi-join — both sides explode to the (lat band × lon tile)
    * grid cells their bounds span, pairs match in exactly the tile
    * containing the south-west corner of their overlap (no dedup
    * needed), then the precise overlap predicate refines. Shuffle key =
    * tile id, so candidate lists stay O(cells per tile) — a hash join
    * whose per-key work does not grow with grid resolution. Shifted
    * source copies carry real (±360) longitudes, so tile ids need no
    * wrap arithmetic.
    */
  def conservative(srcCells: DataFrame, dstCells: DataFrame,
                   bandDeg: Double = 0.0): DataFrame = {
    // Auto tile width (bandDeg ≤ 0): ~2.5× the coarser side's typical
    // cell spacing. Tile choice never affects RESULTS (the overlap
    // predicate is exact and the SW-corner rule dedups per tile) —
    // only the candidate volume, which scales with (tile/cell)² on the
    // finer side: the old fixed 15° default evaluated ~30× more pairs
    // than needed on a 0.5° grid. The dst count and lon hull share ONE
    // aggregate pass; the src count (auto band only) is a second.
    val dstStats = dstCells
      .agg(count(lit(1)), min(col("lon_w")), max(col("lon_e"))).head()
    val nDst = dstStats.getLong(0)
    val band =
      if (bandDeg > 0) bandDeg
      else {
        val n = math.max(1L, math.min(srcCells.count(), nDst))
        math.min(90.0, math.max(0.1, 2.5 * math.sqrt(41253.0 / n)))
      }
    // Longitude-convention bridge: a [0,360) source grid must still
    // overlap a [-180,180) destination (ESMF handles this natively in
    // spherical coords). Each source cell is tried at shifts
    // {-360, 0, +360}; the interval predicate below keeps exactly the
    // copy that actually overlaps. For grids sharing a frame the
    // shifted copies never match (strict inequalities), so existing
    // results are bit-identical. A cell can match the same destination
    // through two shifts only if the destination is wider than
    // 360° − src-width — not a meaningful grid.
    // Destination lon hull (from the same aggregate): shifted source
    // copies that cannot overlap it are pruned BEFORE the tile explode
    // — result-neutral (the join predicate would reject them anyway),
    // but it keeps the explode at ~1× instead of 3× when both grids
    // share a lon convention.
    val (dLonMin, dLonMax) =
      if (nDst == 0) (Double.NegativeInfinity, Double.PositiveInfinity)
      else (dstStats.getDouble(1), dstStats.getDouble(2))
    val s = srcCells.select(
      col("cell_id").as("s_id"), col("lon_w"), col("lon_e"),
      col("lat_s").as("s_lat_s"), col("lat_n").as("s_lat_n"))
      .withColumn("lon_shift", explode(array(lit(-360.0), lit(0.0), lit(360.0))))
      .select(col("s_id"),
        (col("lon_w") + col("lon_shift")).as("s_lon_w"),
        (col("lon_e") + col("lon_shift")).as("s_lon_e"),
        col("s_lat_s"), col("s_lat_n"))
      .filter(col("s_lon_e") > dLonMin && col("s_lon_w") < dLonMax)
      .withColumn("band", explode(sequence(
        floor(col("s_lat_s") / lit(band)).cast("long"),
        floor(col("s_lat_n") / lit(band)).cast("long"))))
      .withColumn("ltile", explode(sequence(
        floor(col("s_lon_w") / lit(band)).cast("long"),
        floor(col("s_lon_e") / lit(band)).cast("long"))))
    val d = dstCells.select(
      col("cell_id").as("d_id"), col("lon_w").as("d_lon_w"), col("lon_e").as("d_lon_e"),
      col("lat_s").as("d_lat_s"), col("lat_n").as("d_lat_n"))
      .withColumn("band", explode(sequence(
        floor(col("d_lat_s") / lit(band)).cast("long"),
        floor(col("d_lat_n") / lit(band)).cast("long"))))
      .withColumn("ltile", explode(sequence(
        floor(col("d_lon_w") / lit(band)).cast("long"),
        floor(col("d_lon_e") / lit(band)).cast("long"))))

    d.join(s,
      d("band") === s("band") && d("ltile") === s("ltile") &&
        col("s_lon_w") < col("d_lon_e") && col("s_lon_e") > col("d_lon_w") &&
        col("s_lat_s") < col("d_lat_n") && col("s_lat_n") > col("d_lat_s") &&
        // each overlapping pair matches in exactly one tile: the one
        // containing the overlap's south-west corner
        d("band") === floor(greatest(col("s_lat_s"), col("d_lat_s")) / lit(band)).cast("long") &&
        d("ltile") === floor(greatest(col("s_lon_w"), col("d_lon_w")) / lit(band)).cast("long"))
      .select(
        col("d_id").as("row"),
        col("s_id").as("col"),
        r12(
          ((least(col("s_lon_e"), col("d_lon_e")) - greatest(col("s_lon_w"), col("d_lon_w"))) *
            (sin(radians(least(col("s_lat_n"), col("d_lat_n")))) -
              sin(radians(greatest(col("s_lat_s"), col("d_lat_s")))))) /
            ((col("d_lon_e") - col("d_lon_w")) *
              (sin(radians(col("d_lat_n"))) - sin(radians(col("d_lat_s")))))
        ).as("s"))
      .filter(col("s") =!= 0.0)
  }
}
