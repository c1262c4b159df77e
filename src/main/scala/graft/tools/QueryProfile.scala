package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-query execution-shape profile: wall (best of N), job count,
  * stage count, task count, shuffle-write bytes — the evidence that
  * separates overhead-bound queries (many tiny jobs/stages) from
  * compute-bound ones. Usage:
  *   runMain graft.tools.QueryProfile <sfDir> q1,q2,... [rounds]
  * Prints one TSV row per query: name, best wall s, jobs, stages,
  * tasks, shuffleWrite MB. Counts come from the SAME round as the
  * reported best wall, and each round drains the async listener bus by
  * polling the counters until stable (r16 advice #4: a fixed 300 ms
  * sleep could truncate counts under load or mis-attribute them to the
  * next round). */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).toSeq
    val rounds = if (args.length > 2) args(2).toInt else 3
    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
    // A/B hook: SPARK_GRAFT_PROFILE_CONF="k=v;k=v" layers extra confs
    val spark = sys.env.get("SPARK_GRAFT_PROFILE_CONF")
      .map(_.split(';').filter(_.contains("=")).foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }).getOrElse(b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        val m = sc.stageInfo.taskMetrics
        if (m != null) shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    // warm up codegen/classloading so round 1 isn't a JIT artifact
    spark.range(1000000).selectExpr("sum(id)").collect()
    // bounded poll-until-stable drain of the async listener bus (the
    // Bench shuffle-gate discipline): counters stable for 300 ms, or a
    // 5 s ceiling
    def drain(): Unit = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var prev = -1L
      var stableSince = System.nanoTime()
      var done = false
      while (!done && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val cur = jobs.get + stages.get + tasks.get + shuffleW.get
        if (cur != prev) { prev = cur; stableSince = System.nanoTime() }
        else if (System.nanoTime() - stableSince > 300L * 1000 * 1000) done = true
      }
    }
    println("query\twall_s\tjobs\tstages\ttasks\tshuffle_mb")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      var best = Double.MaxValue
      var counts: (Long, Long, Long, Long) = null
      (1 to rounds).foreach { _ =>
        jobs.set(0); stages.set(0); tasks.set(0); shuffleW.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        drain()
        // counts travel WITH the wall they were measured under
        if (w < best) { best = w; counts = (jobs.get, stages.get, tasks.get, shuffleW.get) }
      }
      println(f"$name\t$best%.3f\t${counts._1}\t${counts._2}\t${counts._3}\t${counts._4 / 1048576.0}%.2f")
    }
    spark.stop()
  }
}
