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
object Weights {

  import Rounding._

  /** `nearest_s2d`: each destination takes the value of the nearest
    * source point, weight 1 (reference `backend.py:241-246`, semantics
    * per `doc/notebooks/Compare_algorithms.ipynb`). */
  def nearestS2D(srcCells: DataFrame, dstCells: DataFrame,
                 initBandDeg: Double = 15.0): DataFrame = {
    val pts = srcCells.select(col("cell_id").as("id"), col("lon"), col("lat"))
    val probes = dstCells.select(col("cell_id").as("id"), col("lon"), col("lat"))
    NearestJoin.nearest(pts, probes, initBandDeg)
      .select(col("probe_id").as("row"), col("point_id").as("col"), lit(1.0).as("s"))
  }

  /** `nearest_d2s`: each source is assigned to its nearest destination;
    * a destination receiving several sources SUMS them (non-monotone;
    * destinations receiving none stay unmapped → 0). */
  def nearestD2S(srcCells: DataFrame, dstCells: DataFrame,
                 initBandDeg: Double = 15.0): DataFrame = {
    val pts = dstCells.select(col("cell_id").as("id"), col("lon"), col("lat"))
    val probes = srcCells.select(col("cell_id").as("id"), col("lon"), col("lat"))
    NearestJoin.nearest(pts, probes, initBandDeg)
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

  /** First-order conservative remap (Jones 1999, cited reference
    * `xesmf/data.py:30-32`): `w(d,s) = A(s ∩ d) / A(d)` with spherical
    * patch area `Δlon · (sin lat_n − sin lat_s)`. Requires bounds
    * columns (reference errors without them, `backend.py:254-260`).
    *
    * Scale shape: the interval-overlap theta-join is rewritten as a
    * lat-band equi-join — both sides explode to the bands they span,
    * pairs match in exactly the band containing the south edge of their
    * overlap (no dedup needed), then the precise overlap predicate
    * refines. Shuffle key = band id, so this stays a hash join at any
    * grid size instead of a broadcast nested-loop cross join.
    */
  def conservative(srcCells: DataFrame, dstCells: DataFrame,
                   bandDeg: Double = 15.0): DataFrame = {
    val s = srcCells.select(
      col("cell_id").as("s_id"), col("lon_w").as("s_lon_w"), col("lon_e").as("s_lon_e"),
      col("lat_s").as("s_lat_s"), col("lat_n").as("s_lat_n"))
      .withColumn("band", explode(sequence(
        floor(col("s_lat_s") / lit(bandDeg)).cast("long"),
        floor(col("s_lat_n") / lit(bandDeg)).cast("long"))))
    val d = dstCells.select(
      col("cell_id").as("d_id"), col("lon_w").as("d_lon_w"), col("lon_e").as("d_lon_e"),
      col("lat_s").as("d_lat_s"), col("lat_n").as("d_lat_n"))
      .withColumn("band", explode(sequence(
        floor(col("d_lat_s") / lit(bandDeg)).cast("long"),
        floor(col("d_lat_n") / lit(bandDeg)).cast("long"))))

    d.join(s,
      d("band") === s("band") &&
        col("s_lon_w") < col("d_lon_e") && col("s_lon_e") > col("d_lon_w") &&
        col("s_lat_s") < col("d_lat_n") && col("s_lat_n") > col("d_lat_s") &&
        // each overlapping pair matches in exactly one band: the one
        // containing the overlap's south edge
        d("band") === floor(greatest(col("s_lat_s"), col("d_lat_s")) / lit(bandDeg)).cast("long"))
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
