package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{AnnIO, CorpusIO}

/** Warehouse and lifecycle garbage collector (r11 verdict #5): one
  * tool that sweeps every class of leftover the persisted-artifact
  * disciplines can shed, without ever touching a LIVE artifact.
  *
  * What accumulates and why (all by design — crash-safety puts
  * sweeping *after* the fact, never in the failure path):
  *  - ANN code-relation tables under the warehouse (`annio_*` spec
  *    fixtures, `graft_ann*` per-PID contract-query tables): every
  *    suite run and every contract-query JVM mints fresh per-run /
  *    per-PID names precisely so the ownership seal can never be
  *    tripped by a name reuse — so dead runs leave tables behind;
  *  - per-PID sketch snapshot dirs (`target/sketch_io/snap_<pid>`);
  *  - corpus-layout orphans (staged-but-unpublished append files) —
  *    [[graft.pipeline.CorpusIO.vacuumOrphans]]'s job, folded in here
  *    for explicitly-named snapshot paths.
  *
  * Classification of a warehouse entry (prefix-matched — anything not
  * named like a graft artifact is NEVER touched):
  *  - LIVE: ownership seal present and its recorded owner path still
  *    holds a complete index meta → kept, always;
  *  - STALE SEAL: seal present, owner meta gone (index retired or its
  *    meta dir deleted without retire) → reclaimed;
  *  - UNSEALED: no seal — either a save crashed before its meta wrote
  *    or one is IN FLIGHT right now; age-gated like
  *    [[graft.pipeline.CorpusIO.vacuumOrphans]] (newest modification
  *    older than the grace window → reclaimed).
  *
  * A LIVE table is never reclaimed by the sweep — but test-suite
  * leftovers are often "live" forever: their owner meta dirs sit in
  * java.io.tmpdir where `deleteOnExit` cannot remove non-empty dirs,
  * so the seal keeps protecting an index no one will ever load again.
  * `--retire-owners-under DIR` is the explicit, operator-scoped
  * escape hatch: LIVE indexes whose owner path is under DIR are
  * retired through [[graft.pipeline.AnnIO.retire]] (meta first, then
  * table — the crash-ordering discipline holds even here). The blast
  * radius is exactly the named directory; nothing outside it is ever
  * touched.
  *
  * Default is a DRY RUN that prints the plan; `--apply` deletes.
  * Exit 0 always (a GC is maintenance, not a gate).
  *
  * Usage: runMain graft.tools.Vacuum [--apply] [--grace-ms N]
  *          [--warehouse DIR] [--sketch-io DIR] [--weights-io DIR]
  *          [--retire-owners-under DIR] [layoutPath ...]
  */
object Vacuum {

  /** Warehouse dir-name prefixes this tool is allowed to consider.
    * Everything else in the warehouse is presumed someone else's data
    * (the CorpusIO refuse-to-clear discipline, r10 advice #2). */
  val graftPrefixes: Seq[String] = Seq("annio_", "graft_ann")

  sealed trait Verdict { def reason: String }
  case class Keep(reason: String) extends Verdict
  case class Reclaim(reason: String) extends Verdict

  /** Classify one warehouse table directory (see object doc). */
  def classify(spark: SparkSession, table: String, graceMs: Long): Verdict = {
    AnnIO.sealOwner(spark, table) match {
      case Some(owner) if owner.nonEmpty && AnnIO.exists(spark, owner) =>
        Keep(s"LIVE — sealed to complete index at $owner")
      case Some(owner) =>
        Reclaim(s"stale seal — owner ${if (owner.isEmpty) "(empty)" else owner} no longer a complete index")
      case None =>
        val dir = AnnIO.tableDir(spark, table)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        def newest(p: org.apache.hadoop.fs.Path): Long = {
          val st = fs.getFileStatus(p)
          if (!st.isDirectory) st.getModificationTime
          else (st.getModificationTime +:
            fs.listStatus(p).toSeq.map(c => newest(c.getPath))).max
        }
        val age = System.currentTimeMillis() - newest(dir)
        if (age > graceMs)
          Reclaim(f"unsealed partial, idle ${age / 1000.0}%.0f s > grace")
        else Keep(f"unsealed but young (${age / 1000.0}%.0f s) — possible in-flight save")
    }
  }

  /** Sweep the warehouse: classify every graft-prefixed table dir,
    * delete the reclaimable ones when `apply`. LIVE tables whose seal
    * owner sits under `retireOwnersUnder` (when given) are first
    * RETIRED through the proper lifecycle — meta removed before table
    * — then reported reclaimed; see the object doc for why this
    * explicit scope exists. Returns (reclaimed, kept) table names. */
  def sweepWarehouse(spark: SparkSession, graceMs: Long, apply: Boolean,
                     retireOwnersUnder: Option[String] = None)
      : (Seq[String], Seq[String]) = {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val entries = Option(new java.io.File(wh).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && graftPrefixes.exists(f.getName.startsWith))
      .map(_.getName).sorted.toSeq
    val scopePrefix = retireOwnersUnder.map(_.stripSuffix("/") + "/")
    val out = entries.map { t =>
      val v = classify(spark, t, graceMs) match {
        case Keep(reason) if reason.startsWith("LIVE") &&
            scopePrefix.exists(pfx => AnnIO.sealOwner(spark, t)
              .exists(o => o.startsWith(pfx) || o == pfx.stripSuffix("/"))) =>
          Reclaim(s"$reason — owner under --retire-owners-under scope, retiring")
        case other => other
      }
      (t, v)
    }
    out.foreach { case (t, v) =>
      val tag = v match { case _: Keep => "KEEP   "; case _: Reclaim => "RECLAIM" }
      println(s"[vacuum] $tag $t — ${v.reason}")
    }
    val reclaim = out.collect { case (t, _: Reclaim) => t }
    if (apply) out.foreach {
      case (t, Reclaim(reason)) if reason.contains("retiring") =>
        // a scoped-live table goes through the proper lifecycle: retire
        // the OWNER (meta first, then table — crash ordering preserved)
        AnnIO.sealOwner(spark, t).foreach(owner => AnnIO.retire(spark, owner))
      case (t, _: Reclaim) =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        val dir = AnnIO.tableDir(spark, t)
        dir.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(dir, true)
      case _ => ()
    }
    (reclaim, out.collect { case (t, _: Keep) => t })
  }

  /** Sweep a directory of per-PID artifacts: every entry matching
    * `pattern` (capture group 1 = the owning pid) whose pid is no
    * longer alive is a dead JVM's leftover — the lazy sweep
    * `sketchIoPath` / `weightsIoPath` perform on next use, available
    * on demand here. */
  def sweepDeadPids(dir: String, pattern: scala.util.matching.Regex,
                    what: String, apply: Boolean): Seq[String] = {
    val dead = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File]).toSeq
      .filter(f => pattern.findFirstMatchIn(f.getName) match {
        case Some(m) if m.start == 0 && m.end == f.getName.length =>
          !ProcessHandle.of(m.group(1).toLong).isPresent
        case _ => false
      })
    dead.foreach { f =>
      println(s"[vacuum] RECLAIM ${f.getPath} — dead-PID $what")
      if (apply) {
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
          x.delete(); ()
        }
        rm(f)
      }
    }
    dead.map(_.getName)
  }

  /** `target/sketch_io` per-PID snapshot dirs (see [[sweepDeadPids]]). */
  def sweepSketchIo(dir: String, apply: Boolean): Seq[String] =
    sweepDeadPids(dir, "snap_(\\d+)".r, "sketch snapshot", apply)

  /** `target/weights_io` per-PID ESMF weight files (G8 round-trips). */
  def sweepWeightsIo(dir: String, apply: Boolean): Seq[String] =
    sweepDeadPids(dir, "esmf_conservative_(\\d+)\\.(?:parquet|nc)".r,
      "weight file", apply)

  def main(args: Array[String]): Unit = {
    val apply = args.contains("--apply")
    def optArg(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val graceMs = optArg("--grace-ms").map(_.toLong)
      .getOrElse(CorpusIO.defaultVacuumGraceMs)
    val sketchDir = optArg("--sketch-io")
      .getOrElse(sys.props("user.dir") + "/target/sketch_io")
    val retireUnder = optArg("--retire-owners-under")
    val layoutPaths = {
      // positionals = corpus-layout snapshot paths; drop flag values
      val flagVals = Seq("--grace-ms", "--warehouse", "--sketch-io",
        "--weights-io", "--retire-owners-under").flatMap(optArg).toSet
      args.filterNot(_.startsWith("--")).filterNot(flagVals).toSeq
    }
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-vacuum")
    optArg("--warehouse").foreach(w => builder.config("spark.sql.warehouse.dir", w))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(s"[vacuum] mode=${if (apply) "APPLY" else "DRY-RUN"} graceMs=$graceMs")
    val (reclaimed, kept) = sweepWarehouse(spark, graceMs, apply, retireUnder)
    val snaps = sweepSketchIo(sketchDir, apply)
    val weights = sweepWeightsIo(
      optArg("--weights-io").getOrElse(sys.props("user.dir") + "/target/weights_io"),
      apply)
    val layoutOrphans = layoutPaths.map { p =>
      val n =
        if (apply) CorpusIO.vacuumOrphans(spark, p, graceMs).size
        else CorpusIO.listOrphans(spark, p, graceMs).size
      println(s"[vacuum] layout $p: $n orphans${if (apply) " reclaimed" else ""}")
      p -> n
    }
    println(s"[vacuum] summary: ${reclaimed.size} tables reclaimable, " +
      s"${kept.size} kept, ${snaps.size} dead sketch snaps, " +
      s"${weights.size} dead weight files, " +
      s"${layoutOrphans.map(_._2).sum} layout orphans" +
      (if (apply) "" else " (DRY-RUN — nothing deleted)"))
    spark.stop()
  }
}
