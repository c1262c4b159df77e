package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.regrid._

/** Scale probe: run the weight builders on grids 100-1000× the contract
  * fixtures (0.5° global source = 259 200 cells → 1° destination =
  * 64 800 cells; bilinear also at 0.1° = 6.48 M cells) to demonstrate
  * the banded equi-join plans hold their shape as the grids grow —
  * the local[32] stand-in for the 1000-executor question.
  *
  * Not part of Bench (keeps BENCH totals comparable round to round);
  * run manually: runMain graft.tools.ScaleProbe
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val gHalf = RectGrid.of(-180, 180, 0.5, -90, 90, 0.5)   // 720x360 = 259k
    val gOne = RectGrid.of(-180, 180, 1.0, -90, 90, 1.0)    // 360x180 = 65k
    val gTenth = RectGrid.of(-180, 180, 0.1, -90, 90, 0.1)  // 3600x1800 = 6.48M

    // same codegen/JIT warmup as Bench: the first timed probe otherwise
    // absorbs several seconds of one-time compilation
    locally {
      val wg = RectGrid.of(-40, 40, 10, -40, 40, 10)
      val wd = RectGrid.of(-30, 30, 15, -30, 30, 15)
      Weights.conservative(Grids.cells(spark, wg, withBounds = true),
        Grids.cells(spark, wd, withBounds = true)).count()
      Weights.nearestS2D(Grids.cells(spark, wg), Grids.cells(spark, wd)).count()
      ()
    }

    time("conservative 0.5deg->1deg (259k->65k)") {
      Weights.conservative(
        Grids.cells(spark, gHalf, withBounds = true),
        Grids.cells(spark, gOne, withBounds = true)).count()
    }
    time("nearest_s2d 0.5deg->1deg") {
      // auto radius (density-derived ≈ 1.0° here)
      Weights.nearestS2D(Grids.cells(spark, gHalf), Grids.cells(spark, gOne)).count()
    }
    time("bilinear peri 0.1deg->0.5deg (6.5M->259k)") {
      Weights.bilinear(gTenth, Grids.cells(spark, gHalf), periodic = true).count()
    }
    time("bilinear nonuniform 0.5deg->1deg (banded interval join)") {
      val ax = CoordAxis.fromUniform(gHalf.lonAxis)
      val ay = CoordAxis.fromUniform(gHalf.latAxis)
      Weights.bilinearIrregular(CoordGrid(ax, ay), Grids.cells(spark, gOne)).count()
    }
    time("curvilinear bilinear rot 1deg mesh (64k quads -> 65k dst)") {
      val rot = RectGrid.of(2, 62, 0.25, -30, 30, 0.25)     // 240x240 = 57.6k cells
      val dst = RectGrid.of(-25, 0, 0.1, 5, 30, 0.1)        // 250x250 = 62.5k
      Weights.bilinearCurvilinear(
        Curvilinear.rotatedCells(spark, rot, 70.0, -165.0),
        Grids.cells(spark, dst)).count()
    }
    // end-to-end bucketed-weights apply (G9 at probe scale), in the
    // regime bucketing exists for — W far larger than the field (the
    // 100 TB shape: precompute-once weights too big to broadcast,
    // applied to every incoming field): the 0.5°→0.1° upsampling W
    // (25.9M triplets) is persisted BUCKETED on the join key `col`,
    // read back, and applied against the 259k-row source field. Both
    // variants read W from parquet tables of identical content — the
    // only difference is bucketing — so the wall-time delta and the
    // Exchange count isolate the weights-side shuffle that bucketing
    // removes.
    locally {
      import org.apache.spark.sql.DataFrame
      val w = Weights.bilinear(gHalf, Grids.cells(spark, gTenth), periodic = true)
      Seq("w_bucketed_probe", "w_plain_probe").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) { fs.delete(loc, true); () }
      }
      time("persist W bucketed(64 on col) + plain (25.9M triplets)") {
        WeightsIO.writeBucketed(w, "w_bucketed_probe", buckets = 64)
        w.select(col("row").cast("long"), col("col").cast("long"), col("s"))
          .write.mode("overwrite").format("parquet").saveAsTable("w_plain_probe")
        spark.table("w_bucketed_probe").count()
      }
      val field = Grids.cells(spark, gHalf)
        .select(col("cell_id"), TestFields.waveSmooth(col("lon"), col("lat")).as("value"))
      def applyWith(wj: DataFrame): DataFrame =
        field.join(wj.hint("shuffle_merge"), field("cell_id") === wj("col"))
          .groupBy("row").agg(sum(col("s") * col("value")).as("value"))
      val bucketed = applyWith(WeightsIO.readBucketed(spark, "w_bucketed_probe"))
      val unbucketed = applyWith(spark.table("w_plain_probe"))
      // shuffle BYTES are the scale-relevant evidence: at local[32]
      // with the page cache warm, a 31M-row shuffle costs ~nothing in
      // wall time, but on a 1000-executor cluster those bytes cross
      // the network on EVERY apply — the bucketed W removes them once
      // at persist time.
      def shuffledBytes(f: => Unit): Long = {
        val acc = new java.util.concurrent.atomic.AtomicLong
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (te.taskMetrics != null)
              acc.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        spark.sparkContext.addSparkListener(l)
        try {
          f
          // let the listener bus drain: poll until the counter is
          // stable (the bus is async; no public waitUntilEmpty)
          var prev = -1L
          var spins = 0
          while (acc.get != prev && spins < 30) {
            prev = acc.get; Thread.sleep(100); spins += 1
          }
          acc.get
        } finally spark.sparkContext.removeSparkListener(l)
      }
      var bRows = 0L; var uRows = 0L
      var bBytes = 0L; var uBytes = 0L
      time("apply 259k field via BUCKETED 25.9M-row W") {
        bBytes = shuffledBytes { bRows = bucketed.count() }; bRows
      }
      time("apply 259k field via unbucketed W") {
        uBytes = shuffledBytes { uRows = unbucketed.count() }; uRows
      }
      println(f"  shuffle bytes written: bucketed=${bBytes / 1048576}%,d MiB " +
        f"unbucketed=${uBytes / 1048576}%,d MiB")
      require(bBytes * 2 < uBytes,
        s"bucketed apply should shuffle far fewer bytes: $bBytes vs $uBytes")
      // executed plans (post-AQE): the bucketed variant must have lost
      // the weights-side Exchange
      def nExchanges(df: DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
      val (nB, nU) = (nExchanges(bucketed), nExchanges(unbucketed))
      println(s"  exchanges: bucketed=$nB unbucketed=$nU")
      require(nB < nU,
        s"bucketed apply should lose the weights-side Exchange: $nB vs $nU")
      // identical numbers either way
      val diff = bucketed.withColumnRenamed("value", "vb")
        .join(unbucketed, Seq("row") /* value from unbucketed */)
        .filter(abs(col("vb") - col("value")) > 1e-9).count()
      require(diff == 0L, s"$diff rows differ between bucketed and plain apply")

      // CO-BUCKETED field (round-6 verdict #5): the bucketed-W apply
      // above still pays the FIELD-side Exchange (the field arrives
      // unpartitioned and must shuffle to W's bucketing). A pipeline
      // that applies the same W to every incoming field can land the
      // field ALREADY bucketed on cell_id with W's bucket count — then
      // the join needs no Exchange on either side and the only
      // remaining Exchange in the whole apply is the output
      // aggregation's (row ≠ cell_id, irreducible: the result LIVES on
      // a different key). 64 buckets both sides, same bucket function
      // → Spark plans a zero-shuffle sort-merge join.
      spark.sql("DROP TABLE IF EXISTS field_bucketed_probe")
      time("persist field co-bucketed(64 on cell_id)") {
        WeightsIO.writeBucketedField(field, "field_bucketed_probe", buckets = 64)
        spark.table("field_bucketed_probe").count()
      }
      val fieldB = spark.table("field_bucketed_probe")
      val wB = WeightsIO.readBucketed(spark, "w_bucketed_probe")
      val cob = fieldB.join(wB.hint("shuffle_merge"), fieldB("cell_id") === wB("col"))
        .groupBy("row").agg(sum(col("s") * col("value")).as("value"))
      var cRows = 0L; var cBytes = 0L
      time("apply co-bucketed field via bucketed W") {
        cBytes = shuffledBytes { cRows = cob.count() }; cRows
      }
      println(f"  shuffle bytes written: co-bucketed=${cBytes / 1048576}%,d MiB " +
        f"(W-only=${bBytes / 1048576}%,d, none=${uBytes / 1048576}%,d)")
      val nC = nExchanges(cob)
      println(s"  exchanges: co-bucketed=$nC (W-only=$nB, none=$nU)")
      require(nC <= 1,
        s"co-bucketed apply must keep only the output-agg Exchange, got $nC")
      require(cBytes < bBytes,
        s"co-bucketing should cut shuffle bytes further: $cBytes vs W-only $bBytes")
      val cdiff = cob.withColumnRenamed("value", "vc")
        .join(unbucketed, Seq("row"))
        .filter(abs(col("vc") - col("value")) > 1e-9).count()
      require(cdiff == 0L, s"$cdiff rows differ between co-bucketed and plain apply")
      Seq("w_bucketed_probe", "w_plain_probe", "field_bucketed_probe").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }

    time("curvilinear conservative clip (57.6k x 62.5k polys)") {
      val rot = RectGrid.of(2, 62, 0.25, -30, 30, 0.25)
      val dst = RectGrid.of(-25, 0, 0.1, 5, 30, 0.1)
      Weights.conservativeCurvilinear(
        Curvilinear.rotatedCorners(spark, rot, 70.0, -165.0),
        Curvilinear.boundsToPolys(Grids.cells(spark, dst, withBounds = true)),
        bandDeg = 2.0).count()
    }
    time("  + exactEdges at 4x polys (230k x 250k)") {
      // scaling check: 4x the cells (~16x the candidate pairs at the
      // same tile width) — the gc kernel must scale with candidates,
      // linear like the straight kernel, no superlinear surprises
      val rot = RectGrid.of(2, 62, 0.125, -30, 30, 0.125)
      val dst = RectGrid.of(-25, 0, 0.05, 5, 30, 0.05)
      Weights.conservativeCurvilinear(
        Curvilinear.rotatedCorners(spark, rot, 70.0, -165.0),
        Curvilinear.boundsToPolys(Grids.cells(spark, dst, withBounds = true)),
        bandDeg = 1.0, exactEdges = true).count()
    }
    time("  + exactEdges (gc clip + spherical excess), same polys") {
      // the ESMF-CONSERVE-exact kernel on the same candidate volume:
      // same equi-join plan, extra per-pair trig (projection +
      // l'Huilier) — measured ~8% over the straight kernel once the
      // bbox pad stays out of Catalyst (a collapsed pad projection
      // cost 30 s via whole-stage-codegen fallback; the typed-map pad
      // keeps the stage compiled). Exact gc semantics is a kernel
      // constant, not a plan change.
      val rot = RectGrid.of(2, 62, 0.25, -30, 30, 0.25)
      val dst = RectGrid.of(-25, 0, 0.1, 5, 30, 0.1)
      Weights.conservativeCurvilinear(
        Curvilinear.rotatedCorners(spark, rot, 70.0, -165.0),
        Curvilinear.boundsToPolys(Grids.cells(spark, dst, withBounds = true)),
        bandDeg = 2.0, exactEdges = true).count()
    }
    spark.stop()
  }
}
