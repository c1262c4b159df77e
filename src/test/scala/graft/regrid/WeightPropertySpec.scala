package graft.regrid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the weight-generation invariants promised in
  * SURVEY §5: partition-of-unity for interpolating methods, exact
  * area-fraction rows for conservative, argmin agreement for nearest —
  * across RANDOM grid geometries (fixed seeds, several cases per
  * property), not just the reference fixtures. */
class WeightPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("weight-props")
    .getOrCreate()

  private val cases = 6

  private def randGrids(seed: Int): (RectGrid, RectGrid) = {
    val r = new scala.util.Random(seed)
    def pick(lo: Int, hi: Int) = lo + r.nextInt(hi - lo + 1)
    (RectGrid.of(-180, 180, 360.0 / pick(4, 12), -90, 90, 180.0 / pick(4, 10)),
      RectGrid.of(-180, 180, 360.0 / pick(3, 14), -90, 90, 180.0 / pick(3, 12)))
  }

  private def rowSums(w: DataFrame): DataFrame =
    w.groupBy("row").agg(sum("s").as("t"))

  test("property: bilinear weights are a partition of unity on every mapped destination") {
    (1 to cases).foreach { seed =>
      val (gs, gd) = randGrids(seed)
      val w = Weights.bilinear(gs, Grids.cells(spark, gd), periodic = true)
      assert(rowSums(w).filter(abs(col("t") - 1.0) > 1e-9).count() === 0,
        s"seed $seed grids $gs $gd")
      // periodic global source maps every destination
      assert(w.select("row").distinct().count() === gd.nCells, s"seed $seed")
    }
  }

  test("property: conservative rows are exact area fractions summing to 1 on global tilings") {
    (1 to cases).foreach { seed =>
      val (gs, gd) = randGrids(100 + seed)
      val w = Weights.conservative(
        Grids.cells(spark, gs, withBounds = true),
        Grids.cells(spark, gd, withBounds = true))
      assert(rowSums(w).filter(abs(col("t") - 1.0) > 1e-9).count() === 0,
        s"seed $seed grids $gs $gd")
      assert(w.filter(col("s") < -1e-12 || col("s") > 1.0 + 1e-12).count() === 0,
        s"seed $seed")
    }
  }

  test("property: patch stencil weights sum to 1 wherever mapped") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(200 + seed)
      def pick(lo: Int, hi: Int) = lo + r.nextInt(hi - lo + 1)
      val gs = RectGrid.of(-180, 180, 360.0 / pick(4, 12), -90, 90, 180.0 / pick(4, 10))
      val gd = RectGrid.of(-180, 180, 360.0 / pick(3, 14), -90, 90, 180.0 / pick(3, 12))
      val w = Weights.patch(gs, Grids.cells(spark, gd), periodic = true)
      assert(rowSums(w).filter(abs(col("t") - 1.0) > 1e-9).count() === 0,
        s"seed $seed grids $gs $gd")
    }
  }

  // shared brute-force argmin oracle for the nearest-join properties
  private def bruteNearest(pts: DataFrame, probes: DataFrame): DataFrame =
    probes.select(col("id").as("probe_id"),
        col("lon").as("qlon"), col("lat").as("qlat"))
      .crossJoin(pts.select(col("id").as("pid"), col("lon").as("plon"), col("lat").as("plat")))
      .withColumn("dist", Rounding.r9(
        NearestJoin.sqChord(col("qlon"), col("qlat"), col("plon"), col("plat"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("probe_id").orderBy(col("dist"), col("pid"))))
      .filter(col("rn") === 1)
      .select(col("probe_id"), col("pid").as("want"), col("dist").as("wdist"))

  test("property: AUTO-radius nearest equals brute argmin on 10^4-point pole/antimeridian clusters") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(400 + seed)
      // adversarial density mix: both pole caps (exercises the planar
      // cap tiles — auto radius here is ~5°, well under the 15° cap
      // switch), an antimeridian band (seam-wrapped lon tiles), and a
      // uniform background; clustered sets also under-estimate the
      // density-derived radius, forcing the 4x widening round
      def cloud(k: Int, tag: Long): Seq[(Long, Double, Double)] =
        Seq.tabulate(k) { i =>
          val u = rnd.nextDouble()
          val (lon, lat) =
            if (u < 0.3) (rnd.nextDouble() * 360.0 - 180.0, 87.0 + rnd.nextDouble() * 3.0)
            else if (u < 0.5) (rnd.nextDouble() * 360.0 - 180.0, -90.0 + rnd.nextDouble() * 3.0)
            else if (u < 0.7) (175.0 + rnd.nextDouble() * 10.0 - (if (rnd.nextBoolean()) 360.0 else 0.0),
              rnd.nextDouble() * 170.0 - 85.0)
            else (rnd.nextDouble() * 360.0 - 180.0, rnd.nextDouble() * 180.0 - 90.0)
          (tag + i, lon, lat)
        }
      val pts = cloud(10000, 0L).toDF("id", "lon", "lat")
      val probes = cloud(500, 100000L).toDF("id", "lon", "lat")
      // initBandDeg = 0 → the density-derived auto radius under test
      val got = NearestJoin.nearest(pts, probes)
        .select(col("probe_id"), col("point_id").as("got"), col("dist"))
      val j = got.join(bruteNearest(pts, probes), "probe_id")
      assert(j.count() === 500, s"seed $seed: probe lost or duplicated")
      assert(j.filter(col("got") =!= col("want") || col("dist") =!= col("wdist"))
        .count() === 0, s"seed $seed: argmin mismatch vs brute force")
    }
  }

  test("property: escape-hatch residual path equals brute argmin (tight cluster, antipodal probes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // every point inside a 1-degree disk; half the probes antipodal, so
    // with maxRounds = 1 at a 0.5-degree radius most probes CANNOT
    // resolve in the tiled rounds and must take the residual exact path
    val pts = Seq.tabulate(200)(i =>
      (i.toLong, rnd.nextDouble() - 0.5, rnd.nextDouble() - 0.5)).toDF("id", "lon", "lat")
    val probes = Seq.tabulate(60) { i =>
      if (i % 2 == 0) (1000L + i, 179.0 + rnd.nextDouble(), rnd.nextDouble() * 20 - 10)
      else (1000L + i, rnd.nextDouble() * 4 - 2, rnd.nextDouble() * 4 - 2)
    }.toDF("id", "lon", "lat")
    val got = NearestJoin.nearest(pts, probes, initBandDeg = 0.5, maxRounds = 1)
      .select(col("probe_id"), col("point_id").as("got"), col("dist"))
    val j = got.join(bruteNearest(pts, probes), "probe_id")
    assert(j.count() === 60)
    assert(j.filter(col("got") =!= col("want") || col("dist") =!= col("wdist"))
      .count() === 0, "escape-hatch argmin mismatch vs brute force")
  }

  test("property: banded nearest join equals brute-force argmin on random point sets") {
    import spark.implicits._
    (1 to cases).foreach { seed =>
      val rnd = new scala.util.Random(300 + seed)
      val n = 5 + rnd.nextInt(36)
      val m = 3 + rnd.nextInt(23)
      def mk(k: Int) = Seq.tabulate(k)(i =>
        (i.toLong, rnd.nextDouble() * 360.0 - 180.0, rnd.nextDouble() * 170.0 - 85.0))
      val pts = mk(n).toDF("id", "lon", "lat")
      val probes = mk(m).toDF("id", "lon", "lat")
      val got = NearestJoin.nearest(pts, probes, initBandDeg = 10.0)
        .select(col("probe_id"), col("point_id").as("got"))
      val brute = probes.select(col("id").as("probe_id"),
          col("lon").as("qlon"), col("lat").as("qlat"))
        .crossJoin(pts.select(col("id").as("pid"), col("lon").as("plon"), col("lat").as("plat")))
        .withColumn("dist", Rounding.r9(
          NearestJoin.sqChord(col("qlon"), col("qlat"), col("plon"), col("plat"))))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("probe_id").orderBy(col("dist"), col("pid"))))
        .filter(col("rn") === 1)
        .select(col("probe_id"), col("pid").as("want"))
      assert(got.join(brute, "probe_id").filter(col("got") =!= col("want")).count() === 0,
        s"seed $seed n=$n m=$m")
      assert(got.count() === m, s"seed $seed")
    }
  }

  test("property: regrid of a constant field is that constant (bilinear + conservative, random grids)") {
    (1 to cases).foreach { seed =>
      val (gs, gd) = randGrids(300 + seed)
      val c = 3.25 // exactly representable, so w-sum error is the only noise
      val fld = Grids.cells(spark, gs).select(col("cell_id"), lit(c).as("value"))
      val wB = Weights.bilinear(gs, Grids.cells(spark, gd), periodic = true)
      val outB = Apply.regrid(wB, fld, Grids.cells(spark, gd))
      // periodic global source maps every destination, so no zero-pad rows
      assert(outB.filter(abs(col("value") - c) > 1e-6).count() === 0, s"seed $seed bilinear")
      val wC = Weights.conservative(
        Grids.cells(spark, gs, withBounds = true),
        Grids.cells(spark, gd, withBounds = true))
      val outC = Apply.regrid(wC, fld, Grids.cells(spark, gd))
      assert(outC.filter(abs(col("value") - c) > 1e-6).count() === 0, s"seed $seed conservative")
    }
  }

  test("property: conservative regrid preserves the global integral on random global tilings") {
    (1 to cases).foreach { seed =>
      val (gs, gd) = randGrids(400 + seed)
      // non-trivial smooth field — constant fields cannot see overlap mistakes
      val fld = Grids.cells(spark, gs)
        .select(col("cell_id"), TestFields.waveSmooth(col("lon"), col("lat")).as("value"))
      val w = Weights.conservative(
        Grids.cells(spark, gs, withBounds = true),
        Grids.cells(spark, gd, withBounds = true))
      val out = Apply.regrid(w, fld, Grids.cells(spark, gd), roundDigits = 12)
      // spherical rectangle area: dlon_rad * (sin lat1 - sin lat0) —
      // computed from bounds on BOTH sides, same formula
      def integral(df: org.apache.spark.sql.DataFrame): Double = df.selectExpr(
        """sum(value * radians(lon_e - lon_w)
           * (sin(radians(lat_n)) - sin(radians(lat_s)))) AS s""")
        .head().getDouble(0)
      val src = integral(fld.join(Grids.cells(spark, gs, withBounds = true)
        .select("cell_id", "lon_w", "lon_e", "lat_s", "lat_n"), "cell_id"))
      val dst = integral(out.join(Grids.cells(spark, gd, withBounds = true)
        .select("cell_id", "lon_w", "lon_e", "lat_s", "lat_n"), "cell_id"))
      assert(math.abs(dst - src) / math.abs(src) < 1e-6,
        s"seed $seed: integral $src -> $dst (${math.abs(dst - src) / math.abs(src)} rel)")
    }
  }
}
