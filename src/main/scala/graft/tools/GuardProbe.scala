package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.regrid._

/** Standalone replica of Bench's `bench_apply_4d_relational` guard —
  * the 120M-value join-agg regrid — OUTSIDE the bench process, so a
  * slow guard reading can be attributed: if this probe (fresh JVM,
  * nothing else on the heap) sits in the 6–9 s band while the
  * in-bench guard reads 3×, the regression is heap/cache HISTORY from
  * the preceding contract phase (evicted fixture blocks recomputing
  * mid-round), not the guard plan; if this probe is slow too, the
  * machine or the plan changed. Prints per-round walls, JVM gc, and
  * the fixture cache's residency after each round.
  *
  * Usage: SPARK_DRIVER_MEM=31g sbt "runMain graft.tools.GuardProbe [rounds]"
  */
object GuardProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    // hypervisor-level contention is invisible to loadavg and to the
    // foreign-cores gate (both see only THIS guest's processes); on a
    // shared-host microVM the 'steal' column of /proc/stat is the only
    // in-guest witness. (busy, steal) jiffies across all cpus.
    def cpuJiffies(): (Long, Long) = {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val f = l.trim.split("\\s+").drop(1).map(_.toLong)
      (f.take(3).sum, if (f.length > 7) f(7) else 0L)
    }
    // this JVM's own utime+stime — busyCores counts the whole guest,
    // so (busy − self) ≈ foreign processes; a spike with selfCores
    // high and the others flat is genuine extra compute in OUR plan
    def selfJiffies(): Long = {
      val f = scala.io.Source.fromFile("/proc/self/stat").mkString.split("\\s+")
      f(13).toLong + f(14).toLong
    }

    val gridIn = RectGrid.of(-120, 120, 0.4, -60, 60, 0.3) // 400 x 600
    val gridOut = RectGrid.of(-120, 120, 0.6, -60, 60, 0.4) // 300 x 400
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
    val t0 = System.nanoTime()
    field.count()
    println(f"fixture build+cache: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    (1 to rounds).foreach { r =>
      val g0 = gcMillis(); val (b0, s0) = cpuJiffies(); val p0 = selfJiffies()
      val w0 = System.nanoTime()
      Apply.regrid(weights, field, Grids.cells(spark, gridOut),
        extraDims = Seq("time", "lev"), roundDigits = 0).count()
      val wall = (System.nanoTime() - w0) / 1e9
      val (b1, s1) = cpuJiffies(); val p1 = selfJiffies()
      val cached = spark.sparkContext.getRDDStorageInfo
        .map(i => s"${i.numCachedPartitions}/${i.numPartitions}").mkString(" ")
      // jiffies are 10 ms; busy-cores ≈ how much cpu THIS guest got,
      // steal-cores ≈ how much the hypervisor withheld
      println(f"round $r: $wall%6.2f s  gc=${(gcMillis() - g0) / 1000.0}%.2f s  " +
        f"busyCores=${(b1 - b0) / 100.0 / wall}%5.1f selfCores=${(p1 - p0) / 100.0 / wall}%5.1f " +
        f"stealCores=${(s1 - s0) / 100.0 / wall}%5.1f  " +
        s"cacheResidency=[$cached]")
    }
    spark.stop()
  }
}
