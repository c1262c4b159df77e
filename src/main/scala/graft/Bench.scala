package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.regrid._

/** Benchmark main: one JSON line with per-query wall times.
  *
  * Three groups:
  *  - every driver-contract query at `SPARK_GRAFT_SF_DIR` scale,
  *    measured as INTERLEAVED best-of-3 (all queries round 1, then
  *    round 2, then 3; per-query min reported, per-round samples in
  *    `spread`) so single-run GC/JIT noise can't masquerade as a
  *    round-over-round regression; failures are reported explicitly in
  *    an `errors` map, never as a silent time-to-crash;
  *  - the reference's own benchmark workload (BASELINE.md,
  *    `doc/notebooks/Backend.ipynb` cells 17/24/33): bilinear weight
  *    build 400×600 → 300×400 (baseline 7.57 s) and the 4-D apply of
  *    (time=10, lev=50, 400, 600) ≈ 120 M values (baseline 0.62 s).
  *    The headline apply runs the dense slab kernel ([[SlabApplier]])
  *    under the same conditions as the baseline's `%timeit`: weights
  *    already in RAM (the reference loads scipy's COO at regridder
  *    init), input array already materialized, best of 5 runs;
  *  - the relational join-agg apply on the same workload, reported
  *    separately so regressions in either path stay visible.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    // bench contract runs at local[32] (builder prompt); allow override
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      // repo-local scratch: system /tmp reapers delete shuffle files
      // mid-job on long runs (observed as FileNotFoundException)
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Any): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // the baseline numbers are notebook `%timeit` results = best of
    // several warm runs; measure the kernels the same way. A GC pass
    // first keeps collector pauses from earlier cached workloads out of
    // the timing window (observed 0.3 s → 1.3 s swings without it).
    def timeBest(f: => Any, runs: Int = 5): Double = {
      System.gc()
      (1 to runs).map(_ => time(f)).min
    }

    // JVM/Spark warm-up so the first measured query doesn't absorb
    // classloading + codegen compilation
    spark.range(1000000).selectExpr("sum(id)").collect()
    // ... and the regrid code paths: the first conservative-weights
    // query otherwise pays several seconds of codegen/JIT that the
    // later ones don't (observed as q_attach_coords — alphabetically
    // the first such query — at 6.2 s for 480 rows). Deliberately
    // DIFFERENT grid sizes than any contract fixture and nothing
    // cached, so no contract result is precomputed.
    locally {
      val wg = RectGrid.of(-40, 40, 10, -40, 40, 10)
      val wd = RectGrid.of(-30, 30, 15, -30, 30, 15)
      val w = Weights.conservative(Grids.cells(spark, wg, withBounds = true),
        Grids.cells(spark, wd, withBounds = true))
      Apply.regrid(w, Grids.cells(spark, wg).select(col("cell_id"), lit(1.0).as("value")),
        Grids.cells(spark, wd)).count()
      ()
    }

    // Contract queries: INTERLEAVED best-of-3 — all queries run in
    // round 1, then round 2, then round 3, and each query reports the
    // min of its successful rounds. Interleaving (rather than 3
    // back-to-back runs per query) keeps a GC pause or JIT storm from
    // poisoning all of one query's samples, and the per-round spread is
    // emitted alongside so round-over-round deltas are attributable:
    // a real regression moves the MIN; measurement noise only widens
    // the spread (r4 recorded q_minhash_sig at 8.41 s single-run where
    // a clean same-binary run measured 1.10 s).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val contractRounds = 3
    val samples = Array.fill(names.size)(Vector.empty[Double])
    for (r <- 0 until contractRounds) {
      System.gc()
      names.zipWithIndex.foreach { case ((name, fn), i) =>
        if (!errors.contains(name)) {
          var ok = true
          val t = time {
            try fn(spark, sfDir).count()
            catch { case e: Throwable =>
              ok = false
              errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            }
          }
          // a crashed run still records its time-to-crash so a query
          // that never succeeds reports a number, not a silent 0
          if (ok || samples(i).isEmpty) samples(i) = samples(i) :+ t
        }
      }
    }
    val contract = names.zipWithIndex.map { case ((name, _), i) =>
      name -> samples(i).min
    }

    // ---- reference-benchmark workload (grids from BASELINE.md) ----
    val gridIn = RectGrid.of(-120, 120, 0.4, -60, 60, 0.3)    // 400 x 600
    val gridOut = RectGrid.of(-120, 120, 0.6, -60, 60, 0.4)   // 300 x 400
    // best-of-3 like the baseline's %timeit (single runs swing ±0.5 s
    // from collector pauses after the contract-query block)
    val tBuild = timeBest(
      Weights.bilinear(gridIn, Grids.cells(spark, gridOut), periodic = false).count(),
      runs = 3)
    val weights = Weights.bilinear(gridIn, Grids.cells(spark, gridOut), periodic = false)
      .cache()
    weights.count()

    // dense 4-D raster input in slab-major layout (one row per
    // (time, lev) slab, values index = cell_id) — the shape raster data
    // arrives in; generated analytically and cached so the apply
    // measurement is pure SpMM, exactly like the baseline's in-RAM array
    val nIn = gridIn.nCells.toInt
    val lonE = s"(${gridIn.lonAxis.start}e0 + (CAST(c % ${gridIn.nx} AS DOUBLE) + 0.5e0) * ${gridIn.lonAxis.step}e0)"
    val latE = s"(${gridIn.latAxis.start}e0 + (CAST(c DIV ${gridIn.nx} AS DOUBLE) + 0.5e0) * ${gridIn.latAxis.step}e0)"
    val waveE = s"2.0e0 + pow(cos(radians($latE)), 2) * cos(2.0e0 * radians($lonE))"
    val slabs = spark.range(1, 11).toDF("time")
      .crossJoin(spark.range(1, 51).toDF("lev"))
      .repartition(cpus.toInt)
      .selectExpr("time * 64 + lev AS slab_id",
        s"transform(sequence(0, ${nIn - 1}), c -> CAST(time * lev AS DOUBLE) * ($waveE)) AS values")
      .cache()
    slabs.count()
    // W collect + broadcast: once per regridder lifetime (the scipy
    // COO-load analog, smm.py:34-41) — reported separately as prep
    var applier: SlabApplier = null
    val tPrep = time { applier = new SlabApplier(weights, gridOut.nCells.toInt) }
    def runSlabs(in: org.apache.spark.sql.DataFrame): Unit = {
      applier.apply(in).select(sum(size(col("values")))).collect(); ()
    }
    val tApplySlab = timeBest(runSlabs(slabs))

    val slab2d = spark.range(0, 1).toDF("slab_id")
      .selectExpr("slab_id",
        s"transform(sequence(0, ${nIn - 1}), c -> CAST($waveE AS DOUBLE)) AS values")
      .cache()
    slab2d.count()
    val tApply2d = timeBest(runSlabs(slab2d))

    // relational join-agg on the same 4-D workload (regression guard
    // for the shuffled path — the one that serves W too big to
    // replicate)
    val field = Grids.cells(spark, gridIn)
      .select(col("cell_id"), TestFields.waveSmooth(col("lon"), col("lat")).as("v0"))
      .crossJoin(spark.range(1, 11).toDF("time"))
      .crossJoin(spark.range(1, 51).toDF("lev"))
      .select(col("cell_id"), col("time"), col("lev"),
        (col("time") * col("lev") * col("v0")).as("value"))
      .cache()
    field.count()
    val tApplyRel = timeBest(
      Apply.regrid(weights, field, Grids.cells(spark, gridOut),
        extraDims = Seq("time", "lev"), roundDigits = 0).count(),
      runs = 3)
    field.unpersist()

    val all = contract ++ Seq(
      "bench_weight_build_bilinear_400x600_300x400" -> tBuild,
      "bench_apply_4d_120M" -> tApplySlab,
      "bench_apply_2d_240k" -> tApply2d,
      "bench_apply_prep_collectW" -> tPrep,
      "bench_apply_4d_relational" -> tApplyRel)
    // full JSON string escape incl. control chars — Spark exception
    // messages carry newlines even after truncation, and a bare '\n'
    // would break the one-line JSON contract exactly when the error
    // report matters
    def jq(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = all.map { case (k, v) => jq(k) + ":" + v }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jq(k) + ":" + jq(v) }.mkString("{", ",", "}")
    // per-query spread evidence: every interleaved round's wall time,
    // so an outlier in "queries" (the min) is checkable in-artifact
    val spread = names.zipWithIndex.map { case ((name, _), i) =>
      jq(name) + ":" + samples(i).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$contractRounds,"spread":$spread,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
