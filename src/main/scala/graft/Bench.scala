package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.regrid._

/** Benchmark main: one JSON line on stdout + full artifact file.
  *
  * The contract line is the LAST stdout line and carries the
  * per-query minima in its `queries` map (r16 verdict #2: the driver
  * parses that last line, and `parsed` was null in every BENCH_r1–r16
  * artifact because sbt's "[success]" epilogue trailed it and "[info] "
  * prefixed it — both fixed in build.sbt, see the comment at the
  * bottom of main). The driver ARCHIVES only the last 2000 chars as
  * `tail`, which cannot hold 151 query names (2402 chars bare), so the
  * line keeps its aggregate/telemetry fields at the END of the object
  * where the tail still shows them; the complete evidence (per-round
  * spread, telemetry, error detail) goes to `bench/BENCH_full.json`
  * in-repo, which the round commit preserves.
  *
  * Three measurement groups:
  *  - every driver-contract query at `SPARK_GRAFT_SF_DIR` scale,
  *    measured as INTERLEAVED best-of-3 (all queries round 1, then
  *    round 2, then 3; per-query min of its OK rounds) so single-run
  *    GC/JIT noise can't masquerade as a round-over-round regression.
  *    A query that crashes in some round keeps running in later
  *    rounds: `ok_rounds` < `runs` marks it flaky, min is over OK
  *    rounds only, and a query with zero OK rounds reports null (never
  *    a silent time-to-crash posing as a timing);
  *
  *    LOAD GATE (r6 verdict #2 — the r6 driver artifact ran under
  *    loadavg ~20 and its slowest query read 4.4× its committed
  *    value): loadavg can't separate OUR OWN local[32] load from a
  *    co-tenant's, so each round instead measures FOREIGN cpu —
  *    (/proc/stat busy-jiffies delta) − (this JVM's cpu delta),
  *    divided by the round wall — and a round whose foreign load
  *    exceeds [[loadGateCores]] sustained cores is CONTAMINATED. Up
  *    to 2 extra rounds run when any base round is contaminated; a
  *    query whose every OK sample comes from contaminated rounds
  *    reports the min but is listed in `load_contaminated` (full
  *    artifact) and counted in `n_load_contam` (compact line), so one
  *    noisy co-tenant can no longer silently own the artifact;
  *  - the reference's own benchmark workload (BASELINE.md,
  *    `doc/notebooks/Backend.ipynb` cells 17/24/33): bilinear weight
  *    build 400×600 → 300×400 (baseline 7.57 s) and the 4-D apply of
  *    (time=10, lev=50, 400, 600) ≈ 120 M values (baseline 0.62 s).
  *    The headline apply runs the dense slab kernel ([[SlabApplier]])
  *    under the same conditions as the baseline's `%timeit`: weights
  *    already in RAM (the reference loads scipy's COO at regridder
  *    init), input array already materialized;
  *  - the relational join-agg apply on the same workload, reported
  *    separately so regressions in either path stay visible.
  *
  *    SINCE r8 the five headline kernels run inside the SAME
  *    interleaved, foreign-cores-gated round structure as the contract
  *    queries (r7 verdict #1: they used to be bare `timeBest` loops, so
  *    when `bench_apply_4d_relational` read 12.2 s vs 8.6 s the
  *    artifact could not say whether that was a regression or the
  *    documented co-load sensitivity — PLANS.md measured the same
  *    kernel at 14.9 s vs 5.26 s under one concurrent JVM). Headline
  *    minima are now per-kernel best over CLEAN rounds, with spread,
  *    ok-round counts, per-round telemetry and contamination flags in
  *    the artifact (`headline_*` fields), and whole-JVM GC is split by
  *    phase (`gc_sec_phases`: warmup / contract / headline) so a
  *    heavy-GC run is diagnosable without a re-run.
  *
  * Artifact paths (r6 verdict #3): every run writes the full artifact
  * to `<benchDir>/BENCH_full_latest.json` — GITIGNORED, so a driver
  * bench run leaves the tree clean and never clobbers committed
  * evidence; the builder pins evidence by copying a run to
  * `<benchDir>/BENCH_full.json` and committing it. `benchDir` resolves
  * from `SPARK_GRAFT_BENCH_DIR`, else `<user.dir>/bench` (ADVICE r6:
  * no hardcoded /root/repo).
  *
  * Telemetry field semantics (r6 verdict #2 — the old names let one
  * run disagree with itself): `gc_sec_total_jvm` is whole-process GC
  * time including warmup + headline kernels; `round_telemetry[i]
  * .gc_sec` is that contract round only — the two legitimately differ
  * (r6: 23.4 vs Σ2.9 — the gap was the headline kernels' GC).
  * `loadavg_start`/`loadavg_end` bracket the WHOLE bench (headline
  * kernels inflate the end value — that is self-load, not co-tenant
  * load; foreign load is what `round_telemetry[i].foreign_cores`
  * measures).
  */
object Bench {

  /** Foreign sustained cores above which a round is load-contaminated.
    * 4 of 32 cores of non-JVM cpu ≈ the point where contract walls
    * measurably inflate (r6: a co-tenant at ~20 loadavg inflated the
    * heaviest query 4.4×). */
  val loadGateCores = 4.0

  /** Busy jiffies (all cpus, USER_HZ=100) from /proc/stat: fields
    * user..steal minus idle+iowait. Fields 9/10 (guest, guest_nice)
    * are EXCLUDED — the kernel already folds guest time into
    * user/nice, so summing them double-counts VM guests and can
    * falsely flag rounds contaminated (ADVICE r7). -1 when unreadable
    * (non-Linux). */
  def busyJiffies(): Long =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+").drop(1).map(_.toLong).take(8)
      f.sum - f(3) - (if (f.length > 4) f(4) else 0L)
    } catch { case _: Throwable => -1L }

  /** Box-wide cumulative iowait jiffies (/proc/stat field 5): time
    * cpus sat idle WITH outstanding disk I/O — the counter that names a
    * wall spike gc_sec can't (slow scratch disk, a co-tenant hammering
    * the same spindle). -1 when /proc is unreadable. */
  def iowaitJiffies(): Long =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+").drop(1).map(_.toLong)
      if (f.length > 4) f(4) else -1L
    } catch { case _: Throwable => -1L }

  /** Box-wide cumulative steal jiffies (/proc/stat field 8): time the
    * HYPERVISOR withheld cpu from this guest — the one wall-spike cause
    * invisible to gc (this JVM), iowait (this guest's disks), spill
    * (this app's memory) and foreign-cores (this guest's other
    * processes) alike. On a shared-host microVM this is the only
    * in-guest witness to a noisy co-tenant VM. -1 when unreadable. */
  def stealJiffies(): Long =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+").drop(1).map(_.toLong)
      if (f.length > 7) f(7) else -1L
    } catch { case _: Throwable => -1L }

  /** This JVM's cumulative cpu seconds (utime+stime from
    * /proc/self/stat; split after the last ')' guards against spaces
    * in the comm field). */
  def selfCpuSec(): Double =
    try {
      val s = scala.io.Source.fromFile("/proc/self/stat").mkString
      val rest = s.substring(s.lastIndexOf(')') + 2).split("\\s+")
      // rest(0) = state (field 3); utime = field 14 → rest(11), stime = field 15 → rest(12)
      (rest(11).toLong + rest(12).toLong) / 100.0
    } catch { case _: Throwable => -1.0 }

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
    // The "No Partition Defined for Window operation" warnings here are
    // all adjudicated-benign (post-agg / post-limit BOUNDED relations —
    // r8/r9 verdicts), but they print once per window per round and the
    // driver keeps only the LAST 2000 chars of output: enough of them
    // can push the compact JSON contract line out of the captured tail
    // (r9 verdict #5). Silence exactly that logger package; real scale
    // risk is the enforcing PlanAudit's job, not a log line's.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window", org.apache.logging.log4j.Level.ERROR)
    // r13 verdict #8: the committed artifact's 2000-char tail was all
    // "Broadcasting large task binary" (DAGScheduler — the unrolled
    // k-means/PQ plan literals serialize at ~1 MiB per stage; local
    // mode, no network, adjudicated-benign the same way as the window
    // warnings above) and "Asked to cache already cached data"
    // (CacheManager — deliberate re-persist of shared fixtures across
    // interleaved rounds). Both print per-stage per-round and can push
    // the compact JSON contract line out of the captured tail; real
    // regressions in either class are PlanAudit's / the budget gate's
    // job, not a log line's.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler", org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.CacheManager", org.apache.logging.log4j.Level.ERROR)

    // r9 verdict #2: one-round wall spikes with gc = 0 and low foreign
    // load (q_dupspan r3: 33.9 s vs 2.6 s min) had no in-artifact cause
    // left to name — track box-wide IOWAIT and this session's
    // shuffle/agg SPILL alongside GC in every per-kernel and per-round
    // bracket. Listener events are posted asynchronously, so a kernel's
    // spill delta can lag into the next bracket by a few tasks — fine
    // for attribution (the round totals are exact).
    val spillBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })
    def spillMbNow(): Double = spillBytes.get() / 1048576.0

    // r15 verdict #5: per-query SHUFFLE-WRITE bytes, gated. Walls can
    // hide a broadcast→shuffle flip behind parallelism (q_events_
    // retention at sf100 moved 34.8× in shuffle while its wall stayed
    // sub-linear); metrics.json made that observable in rehearsals,
    // but nothing FAILED on it. Here every kernel run is job-group
    // tagged "name@@round", stage completions fold into per-group
    // totals (same attribution as Verify's listener), the per-query
    // statistic is the MIN shuffle-write over OK rounds (bytes are a
    // plan property — round jitter is re-computation noise, and min
    // matches the wall gate's semantics), and SHUFFLE_BUDGETS.tsv pins
    // gate it: measured > 2× pin AND measured − pin > 4 MiB is a
    // violation, reported through the same n_slow/budget_violations
    // channel as the wall gate (name prefixed "shuffle:", values in
    // MB). SPARK_GRAFT_SHUFFLE_BUDGETS overrides the file path — the
    // gate's own fixture proof, like the wall gate's SLEEP hook.
    val shuffleByGroup =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    locally {
      val stageToGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val g = Option(j.properties).flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          g.filter(_.contains("@@")).foreach(gr =>
            j.stageInfos.foreach(si => stageToGroup.put(si.stageId, gr)))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          Option(stageToGroup.get(si.stageId)).foreach { gr =>
            val m = si.taskMetrics
            if (m != null)
              shuffleByGroup
                .computeIfAbsent(gr, _ => new java.util.concurrent.atomic.AtomicLong)
                .addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    }

    def time(f: => Any): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // box-load + collector telemetry so a uniform wall-time shift
    // (like the unattributed r5-vs-r4 drift) is attributable from the
    // artifact alone: a loaded box shows in loadavg, a collector storm
    // in the per-round gc_sec delta
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

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
    // compact number: 3 decimals is ±0.5 ms, far below run-to-run noise
    def num(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def obj(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => jq(k) + ":" + v }.mkString("{", ",", "}")

    // ---- per-kernel regression budgets (r10 verdict #3): 147 queries
    // averaging ~0.8 s hide a single 5 s regression inside a ~4% total
    // move, so the total alone cannot gate. BUDGETS.tsv pins every
    // kernel's committed min-of-clean-rounds; a kernel whose measured
    // min exceeds 3× its pin AND is at least 0.75 s over it (the
    // absolute floor keeps 0.05 → 0.2 s jitter on tiny kernels from
    // flagging) is a BUDGET VIOLATION — named in the compact line's
    // `slow` field, detailed in the artifact. Budgets are sf-specific:
    // the gate only engages when the file's `# sf` tag matches this
    // run's sfDir (a probe run at another scale must not compare
    // against sf0.1 pins). SPARK_GRAFT_BUDGETS overrides the file path
    // (how the gate's own test pins a tiny fixture file).
    val budgetsFile = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_BUDGETS",
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR",
        sys.props("user.dir") + "/bench") + "/BUDGETS.tsv"))
    val (budgetSf, budgets): (String, Map[String, Double]) =
      if (!budgetsFile.isFile) ("", Map.empty)
      else {
        val lines = scala.io.Source.fromFile(budgetsFile, "UTF-8").getLines().toVector
        val sf = lines.collectFirst { case l if l.startsWith("# sf ") => l.drop(5).trim }
          .getOrElse("")
        val m = lines.filterNot(_.startsWith("#")).flatMap { l =>
          l.split("\t") match {
            case Array(k, v) => Some(k -> v.toDouble)
            case _ => None
          }
        }.toMap
        (sf, m)
      }
    val budgetsActive = budgets.nonEmpty && budgetSf == sfDir
    def budgetViolation(name: String, minSec: Double): Option[(String, Double, Double)] =
      if (!budgetsActive) None
      else budgets.get(name).collect {
        case b if minSec > 3.0 * b && minSec - b > 0.75 => (name, minSec, b)
      }
    // test hook for the gate itself: SPARK_GRAFT_BENCH_SLEEP=name:sec
    // injects a sleep into ONE kernel so the violation path is provable
    // end-to-end without editing a query
    val sleepHook: Map[String, Double] =
      sys.env.get("SPARK_GRAFT_BENCH_SLEEP").map { s =>
        val Array(n, sec) = s.split(":", 2); Map(n -> sec.toDouble)
      }.getOrElse(Map.empty)

    // phase GC bracket 0: before any warmup work
    val gcAtBenchStart = gcMillis()

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
    // min of its OK rounds. Interleaving (rather than 3 back-to-back
    // runs per query) keeps a GC pause or JIT storm from poisoning all
    // of one query's samples, and the per-round spread is written to
    // the artifact file so round-over-round deltas are attributable:
    // a real regression moves the MIN; measurement noise only widens
    // the spread (r4 recorded q_minhash_sig at 8.41 s single-run where
    // a clean same-binary run measured 1.10 s).
    val lastError = scala.collection.mutable.LinkedHashMap[String, String]()
    // every attempt keeps (round, wall, ok) so a flaky kernel is
    // visible as ok_rounds < runs (never conflated with a clean min)
    // and the load gate can prefer minima from uncontaminated rounds
    case class Sample(round: Int, sec: Double, ok: Boolean, gcSec: Double,
                      iowaitSec: Double, spillMb: Double, stealSec: Double)
    case class RoundTel(round: Int, wallSec: Double, loadStart: Double,
                        loadEnd: Double, gcSec: Double,
                        foreignCores: Double, contaminated: Boolean,
                        iowaitSec: Double, spillMb: Double, stealSec: Double)
    // per-kernel min: over OK samples from CLEAN rounds when any exist,
    // else over all OK samples with the kernel flagged load-contaminated;
    // null (None) when no round succeeded at all
    case class QStat(min: Option[Double], okCount: Int, loadContaminated: Boolean)
    /** Shared gated-round machinery, used by BOTH the contract-query
      * phase and (since r8, verdict #1) the headline-kernel phase:
      * every kernel runs once per round (interleaved, so a GC pause or
      * JIT storm can't poison all of one kernel's samples), a round
      * whose foreign cpu exceeds the gate is CONTAMINATED, and up to
      * `extraMax` extra rounds buy clean samples when a base round was
      * contaminated — so one noisy co-tenant can't silently own any
      * reported minimum, headline or contract. */
    class GatedPhase(kernels0: Seq[(String, () => Unit)]) {
      val kernels: Seq[(String, () => Unit)] = kernels0.map { case (n, f) =>
        n -> (() => { sleepHook.get(n).foreach(s => Thread.sleep((s * 1000).toLong)); f() })
      }
      val samples = Array.fill(kernels.size)(Vector.empty[Sample])
      val roundTel = scala.collection.mutable.ArrayBuffer[RoundTel]()
      var totalRounds = 0
      var extraRounds = 0
      private def runRound(r: Int): Unit = {
        System.gc()
        val l0 = loadavg(); val g0 = gcMillis(); val rt0 = System.nanoTime()
        val bj0 = busyJiffies(); val sc0 = selfCpuSec()
        val io0 = iowaitJiffies(); val sp0 = spillMbNow()
        val st0 = stealJiffies()
        kernels.zipWithIndex.foreach { case ((name, fn), i) =>
          var ok = true
          // per-kernel GC + iowait + spill brackets (r8 verdict #1 /
          // r9 verdict #2: a kernel whose wall number triples with no
          // in-artifact attribution is 'weak' — these split collector
          // time, disk-wait time, and shuffle/agg spill out of every
          // reported second)
          val kg0 = gcMillis(); val kio0 = iowaitJiffies(); val ksp0 = spillMbNow()
          val kst0 = stealJiffies()
          // job-group tag for the shuffle-bytes listener ("name@@rN")
          spark.sparkContext.setJobGroup(s"$name@@r$r", s"bench $name r$r")
          val t = time {
            try fn()
            catch { case e: Throwable =>
              ok = false
              lastError(name) = s"r$r ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            }
          }
          spark.sparkContext.clearJobGroup()
          val kio1 = iowaitJiffies(); val kst1 = stealJiffies()
          samples(i) = samples(i) :+ Sample(r, t, ok, (gcMillis() - kg0) / 1000.0,
            if (kio0 < 0 || kio1 < 0) -1.0 else (kio1 - kio0) / 100.0,
            spillMbNow() - ksp0,
            if (kst0 < 0 || kst1 < 0) -1.0 else (kst1 - kst0) / 100.0)
        }
        val wall = (System.nanoTime() - rt0) / 1e9
        // foreign cpu = box busy − this JVM, in sustained cores over
        // the round; -1 (unreadable /proc) never flags
        val foreign =
          if (bj0 < 0 || sc0 < 0) -1.0
          else math.max(0.0, ((busyJiffies() - bj0) / 100.0 - (selfCpuSec() - sc0)) / wall)
        val io1 = iowaitJiffies(); val st1 = stealJiffies()
        roundTel += RoundTel(r, wall, l0, loadavg(), (gcMillis() - g0) / 1000.0,
          foreign, foreign > loadGateCores,
          if (io0 < 0 || io1 < 0) -1.0 else (io1 - io0) / 100.0,
          spillMbNow() - sp0,
          if (st0 < 0 || st1 < 0) -1.0 else (st1 - st0) / 100.0)
      }
      def run(baseRounds: Int, extraMax: Int): Unit = {
        (1 to baseRounds).foreach(runRound)
        var extra = 0
        while (roundTel.count(!_.contaminated) < baseRounds && extra < extraMax) {
          extra += 1
          runRound(baseRounds + extra)
        }
        extraRounds = extra
        totalRounds = baseRounds + extra
      }
      def cleanRound: Map[Int, Boolean] =
        roundTel.map(rt => rt.round -> !rt.contaminated).toMap
      lazy val qstats: Seq[(String, QStat)] = kernels.zipWithIndex.map { case ((name, _), i) =>
        val oks = samples(i).filter(_.ok)
        val cleanOks = oks.filter(s => cleanRound(s.round))
        val st =
          if (cleanOks.nonEmpty) QStat(Some(cleanOks.map(_.sec).min), oks.size, false)
          else if (oks.nonEmpty) QStat(Some(oks.map(_.sec).min), oks.size, true)
          else QStat(None, 0, false)
        name -> st
      }
      def okRounds: Seq[(String, Int)] = qstats.map { case (n, s) => n -> s.okCount }
      def loadContam: Seq[String] = qstats.collect { case (n, s) if s.loadContaminated => n }
      // spread rows: negative value = crashed attempt
      def spreadJson: Seq[(String, String)] = kernels.zipWithIndex.map { case ((name, _), i) =>
        name -> samples(i).map(s => num(if (s.ok) s.sec else -s.sec)).mkString("[", ",", "]")
      }
      // per-kernel GC seconds, per round, parallel to `spread`: a wall
      // reading whose GC share is near the wall itself is a collector
      // artifact, not a plan regression — attributable without a re-run
      def gcSpreadJson: Seq[(String, String)] = kernels.zipWithIndex.map { case ((name, _), i) =>
        name -> samples(i).map(s => num(s.gcSec)).mkString("[", ",", "]")
      }
      // per-kernel iowait seconds / spill MB per round, parallel to
      // `spread` (r9 verdict #2): a spike round whose iowait tracks the
      // wall is a disk stall; one whose spill jumps is a memory-pressure
      // repartition — both now named without a re-run
      def ioSpreadJson: Seq[(String, String)] = kernels.zipWithIndex.map { case ((name, _), i) =>
        name -> samples(i).map(s => num(s.iowaitSec)).mkString("[", ",", "]")
      }
      def spillSpreadJson: Seq[(String, String)] = kernels.zipWithIndex.map { case ((name, _), i) =>
        name -> samples(i).map(s => num(s.spillMb)).mkString("[", ",", "]")
      }
      // per-kernel hypervisor steal seconds, parallel to `spread`: a
      // spike whose steal tracks the wall is a co-tenant VM, not a plan
      def stealSpreadJson: Seq[(String, String)] = kernels.zipWithIndex.map { case ((name, _), i) =>
        name -> samples(i).map(s => num(s.stealSec)).mkString("[", ",", "]")
      }
      def telJson: String = roundTel.map(rt => obj(Seq(
        "round" -> rt.round.toString, "wall_sec" -> num(rt.wallSec),
        "loadavg_start" -> num(rt.loadStart), "loadavg_end" -> num(rt.loadEnd),
        "gc_sec" -> num(rt.gcSec),
        "foreign_cores" -> num(rt.foreignCores),
        "contaminated" -> rt.contaminated.toString,
        "iowait_sec" -> num(rt.iowaitSec),
        "spill_mb" -> num(rt.spillMb),
        "steal_sec" -> num(rt.stealSec)))).mkString("[", ",", "]")
    }

    // SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the contract phase to a
    // subset and SKIPS the headline kernels (r15 verdict #6: the gated
    // sf1.0 bench line runs the 15-query subset at /tmp/sf1 with its
    // own budgets file; headline kernels are grid-synthesized and
    // sf-independent — re-measuring them there would only add noise).
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
    val contractRounds = 3
    val extraRoundsMax = 2
    val loadAtStart = loadavg()
    val gcAtStart = gcMillis()
    val contractPhase = new GatedPhase(
      names.map { case (name, fn) => name -> (() => { fn(spark, sfDir).count(); () }) })
    contractPhase.run(contractRounds, extraRoundsMax)
    val totalRounds = contractPhase.totalRounds
    val qstats = contractPhase.qstats
    val contract: Seq[(String, Option[Double])] = qstats.map { case (n, s) => n -> s.min }
    val okRounds = contractPhase.okRounds
    val loadContamQueries = contractPhase.loadContam
    val gcAfterContract = gcMillis()

    // ---- reference-benchmark workload (grids from BASELINE.md) ----
    // skipped entirely under SPARK_GRAFT_BENCH_ONLY (subset runs gate
    // contract queries only; the kernels are sf-independent)
    val headlineRounds = 3
    var gcAfterFixtures = gcAfterContract
    var gcAfterHeadline = gcAfterContract
    val headPhase: GatedPhase = if (only.nonEmpty) new GatedPhase(Seq.empty) else {
    val gridIn = RectGrid.of(-120, 120, 0.4, -60, 60, 0.3)    // 400 x 600
    val gridOut = RectGrid.of(-120, 120, 0.6, -60, 60, 0.4)   // 300 x 400
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
    val slab2d = spark.range(0, 1).toDF("slab_id")
      .selectExpr("slab_id",
        s"transform(sequence(0, ${nIn - 1}), c -> CAST($waveE AS DOUBLE)) AS values")
      .cache()
    slab2d.count()

    // relational join-agg fixture for the same 4-D workload (the
    // regression guard for the shuffled path — the one that serves W
    // too big to replicate)
    val field = Grids.cells(spark, gridIn)
      .select(col("cell_id"), TestFields.waveSmooth(col("lon"), col("lat")).as("v0"))
      .crossJoin(spark.range(1, 11).toDF("time"))
      .crossJoin(spark.range(1, 51).toDF("lev"))
      .select(col("cell_id"), col("time"), col("lev"),
        (col("time") * col("lev") * col("v0")).as("value"))
      .cache()
    field.count()

    // the five headline kernels, inside the same gated-round structure
    // as the contract queries (r7 verdict #1). Per round: a fresh
    // weight build (uncached plan), the W collect+broadcast prep (the
    // scipy COO-load analog, smm.py:34-41 — the previous round's
    // broadcast is released first so broadcasts don't accumulate),
    // then the three applies against the round's fresh applier.
    // Kernel minima over clean rounds match the baseline's `%timeit`
    // best-of-N semantics.
    var applier: SlabApplier = null
    def runSlabs(in: org.apache.spark.sql.DataFrame): Unit = {
      applier.apply(in).select(sum(size(col("values")))).collect(); ()
    }
    val headlineKernels: Seq[(String, () => Unit)] = Seq(
      "bench_weight_build_bilinear_400x600_300x400" -> (() => {
        Weights.bilinear(gridIn, Grids.cells(spark, gridOut), periodic = false).count(); ()
      }),
      "bench_apply_prep_collectW" -> (() => {
        if (applier != null) applier.close()
        applier = new SlabApplier(weights, gridOut.nCells.toInt)
      }),
      "bench_apply_4d_120M" -> (() => runSlabs(slabs)),
      "bench_apply_2d_240k" -> (() => runSlabs(slab2d)),
      "bench_apply_4d_relational" -> (() => {
        Apply.regrid(weights, field, Grids.cells(spark, gridOut),
          extraDims = Seq("time", "lev"), roundDigits = 0).count(); ()
      }))
    gcAfterFixtures = gcMillis()
    val hp = new GatedPhase(headlineKernels)
    hp.run(headlineRounds, extraRoundsMax)
    field.unpersist()
    gcAfterHeadline = gcMillis()
    hp
    }
    val headline: Seq[(String, Option[Double])] =
      headPhase.qstats.map { case (n, s) => n -> s.min }

    // per-kernel budget gate over contract AND headline minima
    val kernelBudgetViolations: Seq[(String, Double, Double)] =
      (qstats ++ headPhase.qstats).flatMap { case (n, s) =>
        s.min.flatMap(m => budgetViolation(n, m)) }
    val unbudgeted: Seq[String] =
      if (!budgetsActive) Nil
      else (qstats ++ headPhase.qstats).collect {
        case (n, _) if !budgets.contains(n) => n }

    // ---- shuffle-bytes gate (r15 verdict #5) ----
    // listener bus is async: poll until stable (same discipline as
    // Verify's drain, r15 advice #2), bounded at 10 s
    locally {
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var prev = -1L
      var stableSince = System.nanoTime()
      var done = false
      while (!done && System.nanoTime() < deadline) {
        Thread.sleep(100)
        import scala.jdk.CollectionConverters._
        val cur = shuffleByGroup.asScala.values.map(_.get()).sum
        if (cur != prev) { prev = cur; stableSince = System.nanoTime() }
        else if (System.nanoTime() - stableSince > 500L * 1000 * 1000) done = true
      }
    }
    // per-kernel min shuffle-write bytes over OK rounds (contract
    // phase only — the headline kernels' shuffle is pinned by plan
    // shape in PlanAudit already)
    val shuffleMinBytes: Map[String, Long] =
      contractPhase.kernels.zipWithIndex.flatMap { case ((name, _), i) =>
        val oks = contractPhase.samples(i).filter(_.ok).map { s =>
          Option(shuffleByGroup.get(s"$name@@r${s.round}")).map(_.get()).getOrElse(0L)
        }
        if (oks.isEmpty) None else Some(name -> oks.min)
      }.toMap
    val shuffleBudgetsFile = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BUDGETS",
        sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR",
          sys.props("user.dir") + "/bench") + "/SHUFFLE_BUDGETS.tsv"))
    val (shuffleBudgetSf, shuffleBudgets): (String, Map[String, Long]) =
      if (!shuffleBudgetsFile.isFile) ("", Map.empty)
      else {
        val lines = scala.io.Source.fromFile(shuffleBudgetsFile, "UTF-8").getLines().toVector
        val sf = lines.collectFirst { case l if l.startsWith("# sf ") => l.drop(5).trim }
          .getOrElse("")
        val m = lines.filterNot(_.startsWith("#")).flatMap { l =>
          l.split("\t") match {
            case Array(k, v) => Some(k -> v.toLong)
            case _ => None
          }
        }.toMap
        (sf, m)
      }
    val shuffleGateActive = shuffleBudgets.nonEmpty && shuffleBudgetSf == sfDir
    val shuffleViolations: Seq[(String, Double, Double)] =
      if (!shuffleGateActive) Nil
      else shuffleMinBytes.toSeq.sortBy(_._1).flatMap { case (n, b) =>
        shuffleBudgets.get(n).collect {
          case pin if b > 2L * pin && b - pin > 4L * 1024 * 1024 =>
            (s"shuffle:$n", b / 1048576.0, pin / 1048576.0)
        }
      }
    val shuffleUnbudgeted: Seq[String] =
      if (!shuffleGateActive) Nil
      else shuffleMinBytes.keys.filterNot(shuffleBudgets.contains).toSeq.sorted

    val contractTotal = contract.flatMap(_._2).sum
    val total = contractTotal + headline.flatMap(_._2).sum
    val nClean = okRounds.count(_._2 == totalRounds)
    val nFlaky = okRounds.count(kv => kv._2 > 0 && kv._2 < totalRounds)
    val nFailed = okRounds.count(_._2 == 0)
    // drift-triage total over only the queries that are BOTH
    // all-rounds-OK and load-clean (ADVICE r6: a query failing every
    // round silently SHRINKS the headline total — round-over-round
    // comparisons must use this clean total, same-key intersection)
    val contractTotalClean = qstats.collect {
      case (_, s) if s.okCount == totalRounds && !s.loadContaminated => s.min.get
    }.sum

    // r14 verdict #7: contract-TOTAL tripwire. Two consecutive
    // all-noise drifts in the same direction (+15% over r13→r14, zero
    // queries outside the 1.3×+0.3 s band) passed the per-kernel gate
    // by construction — 150 small uniform moves never trip a 3× pin.
    // BUDGETS.tsv's __contract_total__ row pins a HARD ceiling on the
    // clean contract total (value already includes its 1.25×
    // allowance over the committed clean min), compared directly: a
    // third drift round becomes a gated n_slow event, not a judgment
    // call. Only the CLEAN total gates — a query failing or
    // load-contaminated already reports through its own fields, and
    // the clean total is the round-over-round comparable statistic.
    // r15 advice #1: the ceiling is pinned for the FULL contract, but
    // the measured side sums only the all-rounds-OK, load-clean
    // queries — a failing/contaminated query would shrink the measured
    // total while the pin stayed full-sized, letting a uniform drift
    // round slip under the gate exactly on noisy runs. Scale the
    // ceiling to the clean subset: multiply the pin by
    // (Σ per-kernel pins of the clean queries) / (Σ all contract
    // pins), so a shrunken clean set gets a proportionally shrunken
    // ceiling. With every query clean (the normal case) the ratio is
    // exactly 1 and the gate is unchanged.
    val pinnedContract = qstats.flatMap { case (n, _) => budgets.get(n).map(n -> _) }.toMap
    val cleanPinSum = qstats.collect {
      case (n, s) if s.okCount == totalRounds && !s.loadContaminated =>
        pinnedContract.getOrElse(n, 0.0)
    }.sum
    val fullPinSum = pinnedContract.values.sum
    val cleanPinRatio = if (fullPinSum > 0) cleanPinSum / fullPinSum else 1.0
    val totalViolation: Seq[(String, Double, Double)] =
      if (!budgetsActive) Nil
      else budgets.get("__contract_total__").collect {
        case b if contractTotalClean > b * cleanPinRatio =>
          ("__contract_total__", contractTotalClean, b * cleanPinRatio)
      }.toSeq
    val budgetViolations = kernelBudgetViolations ++ totalViolation ++ shuffleViolations

    // ---- full artifact file: everything the 2000-char stdout tail
    // cannot hold — per-query minima, per-round spread (negative =
    // crashed attempt), ok-round counts, per-round telemetry, errors
    val fullJson = {
      val qs = obj(contract.map { case (k, v) => k -> v.map(num).getOrElse("null") })
      val ok = obj(okRounds.map { case (k, v) => k -> v.toString })
      val spread = obj(contractPhase.spreadJson)
      val errs = obj(lastError.toSeq.map { case (k, v) => k -> jq(v) })
      val head = obj(headline.map { case (k, v) => k -> v.map(num).getOrElse("null") })
      Seq(
        "sf" -> jq(sfDir), "cpus" -> cpus, "runs" -> totalRounds.toString,
        "base_rounds" -> contractRounds.toString,
        "extra_rounds_load" -> contractPhase.extraRounds.toString,
        "load_gate_cores" -> num(loadGateCores),
        "contract_total_sec" -> num(contractTotal),
        "contract_total_clean_sec" -> num(contractTotalClean),
        "load_contaminated" -> loadContamQueries.map(jq).mkString("[", ",", "]"),
        "queries" -> qs, "ok_rounds" -> ok, "spread" -> spread,
        "gc_spread" -> obj(contractPhase.gcSpreadJson),
        "iowait_spread" -> obj(contractPhase.ioSpreadJson),
        "spill_spread" -> obj(contractPhase.spillSpreadJson),
        "steal_spread" -> obj(contractPhase.stealSpreadJson),
        "errors" -> errs, "round_telemetry" -> contractPhase.telJson,
        "headline" -> head,
        // r7 verdict #1: the headline kernels' own gated-round evidence
        // — spread, ok-rounds, per-round foreign-cores/GC telemetry and
        // contamination flags, same semantics as the contract fields
        "headline_runs" -> headPhase.totalRounds.toString,
        "headline_base_rounds" -> headlineRounds.toString,
        "headline_extra_rounds_load" -> headPhase.extraRounds.toString,
        "headline_load_contaminated" -> headPhase.loadContam.map(jq).mkString("[", ",", "]"),
        "headline_ok_rounds" -> obj(headPhase.okRounds.map { case (k, v) => k -> v.toString }),
        "headline_spread" -> obj(headPhase.spreadJson),
        "headline_gc_spread" -> obj(headPhase.gcSpreadJson),
        "headline_iowait_spread" -> obj(headPhase.ioSpreadJson),
        "headline_spill_spread" -> obj(headPhase.spillSpreadJson),
        "headline_steal_spread" -> obj(headPhase.stealSpreadJson),
        "headline_round_telemetry" -> headPhase.telJson,
        // whole-JVM GC split by phase (r7 verdict #1: an 89 GB-heap,
        // 46-GC-sec run must be diagnosable in-artifact): warmup =
        // classload/codegen warm-up, contract = the gated contract
        // rounds, headline_fixtures = weight/slab/field cache builds,
        // headline_rounds = the gated headline rounds
        "gc_sec_phases" -> obj(Seq(
          "warmup" -> num((gcAtStart - gcAtBenchStart) / 1000.0),
          "contract_rounds" -> num((gcAfterContract - gcAtStart) / 1000.0),
          "headline_fixtures" -> num((gcAfterFixtures - gcAfterContract) / 1000.0),
          "headline_rounds" -> num((gcAfterHeadline - gcAfterFixtures) / 1000.0))),
        // whole-JVM GC since bench start, INCLUDING warmup + headline
        // kernels — legitimately larger than Σ round_telemetry.gc_sec
        "gc_sec_total_jvm" -> num((gcMillis() - gcAtStart) / 1000.0),
        "heap_max_gb" -> num(Runtime.getRuntime.maxMemory / 1024.0 / 1024 / 1024),
        // r10 verdict #3: per-kernel budget gate evidence — which pins
        // were active, every violation as [measured_min, pinned], and
        // kernels that have no pin yet (new queries: re-pin BUDGETS.tsv)
        "budgets_active" -> budgetsActive.toString,
        "budget_sf" -> jq(budgetSf),
        // clean-subset scaling of the __contract_total__ ceiling
        // (r15 advice #1): ratio 1.0 = every pinned query was clean
        "contract_total_ceiling_ratio" -> num(cleanPinRatio),
        "budget_violations" -> obj(budgetViolations.map { case (n, m, b) =>
          n -> s"[${num(m)},${num(b)}]" }),
        "unbudgeted" -> unbudgeted.map(jq).mkString("[", ",", "]"),
        // r15 verdict #5: per-query min shuffle-write bytes (OK rounds)
        // and the shuffle gate's state — violations ride in
        // budget_violations/n_slow as "shuffle:<name>" in MB
        "shuffle_gate_active" -> shuffleGateActive.toString,
        "shuffle_budget_sf" -> jq(shuffleBudgetSf),
        "shuffle_write_b" -> obj(shuffleMinBytes.toSeq.sortBy(_._1)
          .map { case (k, v) => k -> v.toString }),
        "shuffle_unbudgeted" -> shuffleUnbudgeted.map(jq).mkString("[", ",", "]")
      ).map { case (k, v) => "  " + jq(k) + ": " + v }.mkString("{\n", ",\n", "\n}\n")
    }
    // bench dir from env or the working directory (ADVICE r6: no
    // hardcoded /root/repo); the live artifact is GITIGNORED so a
    // driver run leaves the tree clean — committed evidence is a
    // deliberate builder-side copy to BENCH_full.json
    val benchDir = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR",
      sys.props("user.dir") + "/bench"))
    benchDir.mkdirs()
    val outFile = new java.io.File(benchDir, "BENCH_full_latest.json")
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try w.print(fullJson) finally w.close()

    // ---- one-line JSON contract (r16 verdict #2: `parsed` was null in
    // EVERY BENCH_r1..r16 artifact — the driver parses the bench's LAST
    // stdout line, and every round so far ended with sbt's "[success]
    // Total time" epilogue, with "[info] " prefixed to each program
    // line). Three coordinated fixes restore the contract:
    //  (a) `queries` now carries EVERY per-query minimum (adding
    //      entries is allowed by the driver contract; contract_total /
    //      contract_total_clean and the 5 headline kernels keep their
    //      keys and semantics unchanged);
    //  (b) the line prints AFTER spark.stop(), so no shutdown logging
    //      can trail it;
    //  (c) build.sbt routes forked `run` stdout through the unprefixed
    //      StdoutOutput strategy and suppresses the [success] epilogue,
    //      so this line IS the final stdout line, verbatim.
    // The full line is ~4.5 KB — deliberately larger than the 2000-char
    // tail the driver ARCHIVES (a tail cannot hold 151 query names:
    // they alone are 2402 chars). The aggregate/telemetry fields ride
    // at the END of the object so the archived tail, which cuts into
    // the queries map from the left, still shows them human-readable.
    val slowest = contract.collect { case (k, Some(v)) => k -> v }
      .sortBy(-_._2).take(5)
    val lineQueries = obj(
      ("contract_total" -> num(contractTotal)) +:
      ("contract_total_clean" -> num(contractTotalClean)) +:
      (headline ++ contract).map { case (k, v) => k -> v.map(num).getOrElse("null") })
    val lineSlowest = obj(slowest.map { case (k, v) => k -> num(v) })
    // at most 3 error names inline (full detail in the artifact file)
    val lineErrs = obj(lastError.take(3).toSeq.map { case (k, v) => k -> jq(v.take(60)) })
    // r13 verdict #7: the warehouse GC runs DRY in every bench so
    // cross-round artifact accumulation is visible in-artifact —
    // [reclaimable tables, live tables kept, dead-PID sketch snaps,
    // dead-PID weight files]. Counts only; nothing is deleted here
    // (graft.tools.Vacuum --apply is the operator action).
    val vacuum = try {
      val (rec, kept) = graft.tools.Vacuum.sweepWarehouse(spark,
        graft.pipeline.CorpusIO.defaultVacuumGraceMs, apply = false)
      val snaps = graft.tools.Vacuum.sweepSketchIo(
        sys.props("user.dir") + "/target/sketch_io", apply = false)
      val weights = graft.tools.Vacuum.sweepWeightsIo(
        sys.props("user.dir") + "/target/weights_io", apply = false)
      s"[${rec.size},${kept.size},${snaps.size},${weights.size}]"
    } catch { case e: Throwable =>
      jq("err:" + Option(e.getMessage).getOrElse(e.getClass.getName).take(40)) }
    val line = obj(Seq(
      "metric" -> jq("total"), "value" -> num(total), "unit" -> jq("sec"),
      "queries" -> lineQueries, "slowest" -> lineSlowest,
      "runs" -> totalRounds.toString,
      "n_queries" -> names.size.toString, "n_clean" -> nClean.toString,
      "n_flaky" -> nFlaky.toString, "n_failed" -> nFailed.toString,
      "n_load_contam" -> loadContamQueries.size.toString,
      "n_load_contam_headline" -> headPhase.loadContam.size.toString,
      // budget gate (r10 verdict #3): n_slow is always present (adds
      // ~12 chars clean); names + [min, pin] ride inline only when a
      // kernel actually blew its 3× pinned budget
      "n_slow" -> budgetViolations.size.toString) ++
      (if (budgetViolations.nonEmpty) Seq(
        "slow" -> obj(budgetViolations.take(3).map { case (n, m, b) =>
          n -> s"[${num(m)},${num(b)}]" })) else Nil) ++ Seq(
      // whole-bench brackets: the end value includes OUR OWN headline
      // kernels' load; foreign load lives in round_telemetry
      "loadavg_start_end" -> s"[${num(loadAtStart)},${num(loadavg())}]",
      "gc_sec_total_jvm" -> num((gcMillis() - gcAtStart) / 1000.0),
      "vacuum" -> vacuum,
      "errors" -> lineErrs,
      // the actual artifact path (ADVICE r7: benchDir is env-resolved,
      // so a hardcoded literal could name a file that doesn't exist)
      "detail" -> jq(outFile.getPath),
      "sf" -> jq(sfDir)))
    // stop BEFORE printing: Spark's stop() logging (stderr, but some
    // deployments merge streams) must never land after the contract
    // line — the driver parses the LAST line
    try spark.stop() catch { case _: Throwable => () }
    println(line)
    System.out.flush()
  }
}
