package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Per-query physical telemetry (r14 verdict #4): walls alone can
    * hide super-linear SHUFFLE growth behind parallelism, so every
    * Verify dump also records per-query shuffle read/write bytes,
    * spill, and input bytes. Attribution is by job group — queries are
    * tagged with their name via setJobGroup before running, jobs map
    * their stages to the group at submission, and stage-completion
    * events (which may arrive after the query returns — the listener
    * bus is async) fold into the right bucket regardless of timing. */
  private final class QueryMetricsListener extends SparkListener {
    final class Tot {
      var shuffleRead = 0L; var shuffleWrite = 0L
      var spillDisk = 0L; var spillMem = 0L; var input = 0L
    }
    private val stageToQuery = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val totals = new java.util.concurrent.ConcurrentHashMap[String, Tot]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val g = Option(j.properties).flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      g.foreach(q => j.stageInfos.foreach(si => stageToQuery.put(si.stageId, q)))
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      Option(stageToQuery.get(si.stageId)).foreach { q =>
        val t = totals.computeIfAbsent(q, _ => new Tot)
        val m = si.taskMetrics
        if (m != null) t.synchronized {
          t.shuffleRead += m.shuffleReadMetrics.totalBytesRead
          t.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          t.spillDisk += m.diskBytesSpilled
          t.spillMem += m.memoryBytesSpilled
          t.input += m.inputMetrics.bytesRead
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev only — the driver passes two): comma-
    // separated query names, restricting the dump + oracle json to
    // that subset for fast single-query gate iteration
    val only: Option[Set[String]] = args.lift(2).map(_.split(',').toSet)
    def keep(name: String) = only.forall(_.contains(name))
    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // repo-local scratch: system /tmp reapers delete shuffle files
      // mid-job on long runs (observed as FileNotFoundException)
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new QueryMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    new java.io.File(outDir).mkdirs()
    // Default dump is coalesce(1) — the driver's DuckDB compare reads
    // one file per query and the gate-scale results are tiny. For
    // SCALE rehearsals the single-task sink is a measurement artifact
    // (r13 verdict: per-doc-output queries at sf10 were write-bound —
    // q_quality_classifier 0.09 s compute vs 116.6 s wall), so
    // SPARK_GRAFT_DUMP_PARALLEL=1 writes with natural parallelism and
    // the multiset compare (scripts/compare_big.py) reads the
    // directory glob — correctness identical, walls honest.
    val singleFile = !sys.env.get("SPARK_GRAFT_DUMP_PARALLEL").contains("1")
    val wallsSec = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name))
        try {
          spark.sparkContext.setJobGroup(name, s"verify $name")
          val t0 = System.nanoTime()
          val res = fn(spark, sfDir)
          (if (singleFile) res.coalesce(1) else res)
            .write.mode("overwrite").parquet(s"$outDir/$name")
          wallsSec(name) = (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        } finally spark.sparkContext.clearJobGroup()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // drain the async listener bus before snapshotting the totals —
    // the last query's stage-completion events may still be in flight.
    // A fixed sleep under-reports on a loaded box (r15 advice #2), so
    // poll: done when the totals snapshot is unchanged for 500 ms,
    // bounded at 15 s; drain_complete marks a truncated snapshot as
    // distinguishable from a true zero.
    def snapshot(): Map[String, (Long, Long, Long, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      metrics.totals.asScala.map { case (k, t) =>
        t.synchronized { k -> (t.shuffleRead, t.shuffleWrite,
          t.spillDisk, t.spillMem, t.input) } }.toMap
    }
    val drainDeadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var prev = snapshot()
    var stableSince = System.nanoTime()
    var drainComplete = false
    while (!drainComplete && System.nanoTime() < drainDeadline) {
      Thread.sleep(100)
      val cur = snapshot()
      if (cur != prev) { prev = cur; stableSince = System.nanoTime() }
      else if (System.nanoTime() - stableSince > 500L * 1000 * 1000)
        drainComplete = true
    }
    val mj = (wallsSec.map { case (name, w) =>
      val t = Option(metrics.totals.get(name)).getOrElse(new metrics.Tot)
      s"${q(name)}: {" +
        f""""wall_s": $w%.3f, "shuffle_read_b": ${t.shuffleRead}, """ +
        s""""shuffle_write_b": ${t.shuffleWrite}, "spill_disk_b": ${t.spillDisk}, """ +
        s""""spill_mem_b": ${t.spillMem}, "input_b": ${t.input}}"""
    }.toSeq :+ s""""__meta__": {"drain_complete": $drainComplete}""")
      .mkString("{\n", ",\n", "\n}\n")
    Files.writeString(Paths.get(s"$outDir/metrics.json"), mj)
    spark.stop()
  }
}
