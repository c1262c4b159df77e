package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{AnnIO, Clustering}

/** The warehouse GC contract (r11 verdict #5): a create/retire cycle
  * returns the warehouse to its pre-run inventory, a LIVE index's
  * table is never touched (the ownership seal exercised through the
  * classifier), a stale-sealed table (owner meta gone without retire)
  * is reclaimed, and an unsealed partial is reclaimed only past the
  * grace window — the same age discipline as CorpusIO.vacuumOrphans,
  * because an unsealed dir is also what an IN-FLIGHT save looks like. */
class VacuumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("vacuum-spec")
    .getOrCreate()
  import spark.implicits._

  // per-run names: seals are tripped BY DESIGN on cross-run reuse
  private val run = java.lang.Long.toHexString(System.nanoTime())
  private def tbl(base: String): String = s"${base}_$run"

  private def tmpBase(): String = {
    val d = java.nio.file.Files.createTempDirectory("vacuum_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def vecs: DataFrame = spark.range(400L)
    .selectExpr("id AS vec_id",
      """transform(sequence(0, 63), j -> CAST(
           CAST(hash(id, j) AS DOUBLE) / 2.147483647e9 AS FLOAT)) AS embedding""")

  private def whPath(table: String): java.io.File =
    new java.io.File(AnnIO.tableDir(spark, table).toUri.getPath)

  test("create/retire cycle returns the warehouse to pre-run inventory; live index untouched") {
    val base = tmpBase()
    val v = vecs

    // LIVE: a complete saved index seals its table to its meta path
    val liveTable = tbl("annio_gc_live")
    AnnIO.save(Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 1,
      coarseCells = 4), s"$base/live_idx", liveTable)
    assert(whPath(liveTable).exists())

    // STALE SEAL: a second complete index whose meta dir then vanishes
    // WITHOUT a retire (crashed cleanup, /tmp reaping — the 85-table
    // accumulation scenario)
    val staleTable = tbl("annio_gc_stale")
    AnnIO.save(Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 1,
      coarseCells = 4), s"$base/stale_idx", staleTable)
    val hfs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(s"$base/stale_idx"), true)

    // UNSEALED: a partial save that died before its meta wrote
    val partialTable = tbl("annio_gc_partial")
    val pd = whPath(partialTable)
    pd.mkdirs()
    java.nio.file.Files.write(pd.toPath.resolve("part-00000"), "x".getBytes)

    // classification: live kept, stale reclaimed, young partial kept
    // under the default grace, reclaimed at grace 0
    assert(Vacuum.classify(spark, liveTable, 0L).isInstanceOf[Vacuum.Keep])
    assert(Vacuum.classify(spark, staleTable, 0L).isInstanceOf[Vacuum.Reclaim])
    assert(Vacuum.classify(spark, partialTable,
      graft.pipeline.CorpusIO.defaultVacuumGraceMs).isInstanceOf[Vacuum.Keep],
      "an unsealed dir inside the grace window may be an in-flight save")
    Thread.sleep(15)
    assert(Vacuum.classify(spark, partialTable, 0L).isInstanceOf[Vacuum.Reclaim])

    // the applied sweep deletes exactly the reclaimable classes
    val (reclaimed, kept) = Vacuum.sweepWarehouse(spark, graceMs = 0L, apply = true)
    assert(kept.contains(liveTable), "a LIVE sealed table must survive every sweep")
    assert(reclaimed.contains(staleTable))
    assert(reclaimed.contains(partialTable))
    assert(whPath(liveTable).exists())
    assert(!whPath(staleTable).exists())
    assert(!whPath(partialTable).exists())

    // the index still SERVES after the sweep (nothing load-bearing lost)
    assert(AnnIO.load(spark, s"$base/live_idx").codebooks.nonEmpty)

    // retire closes the cycle: meta first, table gone with it
    AnnIO.retire(spark, s"$base/live_idx")
    assert(!whPath(liveTable).exists())
    val leftovers = Option(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")).listFiles())
      .getOrElse(Array.empty[java.io.File]).map(_.getName)
      .filter(_.endsWith(run))
    assert(leftovers.isEmpty,
      s"pre-run inventory must be restored, found: ${leftovers.mkString(", ")}")
  }

  test("--retire-owners-under retires ONLY live indexes whose owner is inside the named scope") {
    val inScope = tmpBase()   // stands in for the test-scratch dir
    val outScope = tmpBase()  // a "production" index elsewhere
    val v = vecs
    val tIn = tbl("annio_gc_scoped")
    val tOut = tbl("annio_gc_prod")
    AnnIO.save(Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 1,
      coarseCells = 4), s"$inScope/idx", tIn)
    AnnIO.save(Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 1,
      coarseCells = 4), s"$outScope/idx", tOut)
    val (reclaimed, kept) = Vacuum.sweepWarehouse(spark, graceMs = 0L,
      apply = true, retireOwnersUnder = Some(inScope))
    assert(reclaimed.contains(tIn), "in-scope live index must be retired")
    assert(kept.contains(tOut), "out-of-scope live index must be untouched")
    assert(!whPath(tIn).exists())
    assert(!AnnIO.exists(spark, s"$inScope/idx"),
      "the retire goes through the lifecycle: owner meta removed too")
    assert(whPath(tOut).exists())
    assert(AnnIO.load(spark, s"$outScope/idx").codebooks.nonEmpty)
    AnnIO.retire(spark, s"$outScope/idx")
  }

  test("dead-PID sketch snapshots are reclaimed; live-PID ones kept") {
    val dir = s"${tmpBase()}/sketch_io"
    val self = ProcessHandle.current().pid()
    // a pid that is certainly dead: probe downward from an unlikely one
    val dead = (200000L to 200100L).find(p => !ProcessHandle.of(p).isPresent).get
    new java.io.File(s"$dir/snap_$dead").mkdirs()
    new java.io.File(s"$dir/snap_$self").mkdirs()
    val removed = Vacuum.sweepSketchIo(dir, apply = true)
    assert(removed === Seq(s"snap_$dead"))
    assert(!new java.io.File(s"$dir/snap_$dead").exists())
    assert(new java.io.File(s"$dir/snap_$self").exists(),
      "a live JVM's snapshot dir must survive")
  }
}
