package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.regrid._

/** Interleaved best-of-N measurement for bench attribution questions —
  * the discipline PLANS.md applies whenever two rounds' single-run
  * numbers disagree: run the competitors round-robin (so JIT state,
  * GC pressure and page cache are shared fairly) and report best-of-N
  * per competitor.
  *
  * Sections:
  *  - `regressions`: the four queries whose single-run times moved
  *    between rounds 2 and 3 (q_w_conservative, q_weights_read,
  *    q_minhash_sig, q_locstream_nearest), interleaved best-of-3 at
  *    the bench scale factor;
  *  - `relational`: the 4-D relational apply under config variants
  *    (shuffle partitions 32 vs 64, AQE partition coalescing on/off).
  *
  * Run: SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.BenchProbe [section]"
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sections = if (args.isEmpty) Set("regressions", "relational") else args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Any): Double = {
      System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // same non-contract warmup as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    locally {
      val wg = RectGrid.of(-40, 40, 10, -40, 40, 10)
      val wd = RectGrid.of(-30, 30, 15, -30, 30, 15)
      val w = Weights.conservative(Grids.cells(spark, wg, withBounds = true),
        Grids.cells(spark, wd, withBounds = true))
      Apply.regrid(w, Grids.cells(spark, wg).select(col("cell_id"), lit(1.0).as("value")),
        Grids.cells(spark, wd)).count()
      ()
    }

    if (sections("regressions")) {
      val qs = Seq("q_w_conservative", "q_weights_read", "q_minhash_sig",
        "q_locstream_nearest")
      val results = qs.map(_ -> scala.collection.mutable.ArrayBuffer[Double]()).toMap
      (1 to 3).foreach { round =>
        qs.foreach { name =>
          val t = time(graft.SparkEntry.queries(name)(spark, sfDir).count())
          results(name) += t
          println(f"round $round  $name%-24s $t%6.2f s")
        }
      }
      println("-- best of 3 (r2 / r3 single-run for reference):")
      val ref = Map("q_w_conservative" -> "0.20 / 0.55",
        "q_weights_read" -> "1.53 / 1.96", "q_minhash_sig" -> "1.17 / 1.68",
        "q_locstream_nearest" -> "1.45 / 1.74")
      qs.foreach { n =>
        println(f"$n%-24s best=${results(n).min}%5.2f s  all=${results(n).map(x => f"$x%.2f").mkString(",")}  (${ref(n)})")
      }
    }

    // generic form: `BenchProbe queries q_a q_b ...` — interleaved
    // best-of-3 over any contract-query list (the measurement to run
    // before/after a plan change on specific queries)
    if (sections("queries")) {
      val qs = args.dropWhile(_ != "queries").drop(1).toSeq
      require(qs.nonEmpty, "usage: BenchProbe queries <query names...>")
      val results = qs.map(_ -> scala.collection.mutable.ArrayBuffer[Double]()).toMap
      (1 to 3).foreach { round =>
        qs.foreach { name =>
          val t = time(graft.SparkEntry.queries(name)(spark, sfDir).count())
          results(name) += t
          println(f"round $round  $name%-28s $t%6.2f s")
        }
      }
      println("-- best of 3:")
      qs.foreach { n =>
        println(f"$n%-28s best=${results(n).min}%5.2f s  all=${results(n).map(x => f"$x%.2f").mkString(",")}")
      }
    }

    if (sections("relational")) {
      val gridIn = RectGrid.of(-120, 120, 0.4, -60, 60, 0.3)
      val gridOut = RectGrid.of(-120, 120, 0.6, -60, 60, 0.4)
      val weights = Weights.bilinear(gridIn, Grids.cells(spark, gridOut), periodic = false)
        .cache()
      weights.count()
      val field = Grids.cells(spark, gridIn)
        .select(col("cell_id"), TestFields.waveSmooth(col("lon"), col("lat")).as("v0"))
        .crossJoin(spark.range(1, 11).toDF("time"))
        .crossJoin(spark.range(1, 51).toDF("lev"))
        .select(col("cell_id"), col("time"), col("lev"),
          (col("time") * col("lev") * col("v0")).as("value"))
        .cache()
      field.count()
      def run(): Unit = {
        Apply.regrid(weights, field, Grids.cells(spark, gridOut),
          extraDims = Seq("time", "lev"), roundDigits = 0).count(); ()
      }
      val variants: Seq[(String, () => Unit)] = Seq(
        "sp=32 aqe-coalesce=on" -> (() => {
          spark.conf.set("spark.sql.shuffle.partitions", "32")
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        }),
        "sp=64 aqe-coalesce=on" -> (() => {
          spark.conf.set("spark.sql.shuffle.partitions", "64")
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        }),
        "sp=32 aqe-coalesce=off" -> (() => {
          spark.conf.set("spark.sql.shuffle.partitions", "32")
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        }),
        "sp=64 aqe-coalesce=off" -> (() => {
          spark.conf.set("spark.sql.shuffle.partitions", "64")
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        }),
        "sp=128 aqe-coalesce=off" -> (() => {
          spark.conf.set("spark.sql.shuffle.partitions", "128")
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        }))
      val results = variants.map(_._1 -> scala.collection.mutable.ArrayBuffer[Double]()).toMap
      (1 to 3).foreach { round =>
        variants.foreach { case (tag, setup) =>
          setup()
          val t = time(run())
          results(tag) += t
          println(f"round $round  relational $tag%-24s $t%6.2f s")
        }
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      println("-- best of 3:")
      variants.foreach { case (tag, _) =>
        println(f"relational $tag%-24s best=${results(tag).min}%5.2f s")
      }
    }
    spark.stop()
  }
}
