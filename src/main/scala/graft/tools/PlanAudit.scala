package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ENFORCING physical-plan audit over every contract query: flags the
  * plan shapes that do not survive a 100× scale-up (nested-loop joins,
  * cartesian products) and reports join/exchange/codegen composition.
  *
  * Since r10 the audit is a GATE, not a report: the attributed-benign
  * flags live in an explicit in-code allowlist `{query → (BNLJ, CART)}`
  * below, and ANY deviation — a new flag, a changed count, a retired
  * flag that still sits in the allowlist, or a plan error — is a
  * VIOLATION with a nonzero exit. A scale regression can no longer
  * scroll past among the knowns (r9 verdict "What's wrong" #1).
  *
  * The allowlist entries are attributed one-for-one to their sources
  * (audited 2026-08-12, re-pinned 2026-08-14; the same inventory as
  * PLANS.md prose):
  *  - `Apply.regrid`'s unmapped-destination padding crossJoins a
  *    ONE-ROW broadcast (the zero-weight anchor cell) — constant cost
  *    at any scale (appears in every apply-family query);
  *  - `Weights.bilinear` periodic pole caps crossJoin the broadcast
  *    lon-index range — the output IS that size (ALLAVG pole spreads
  *    weight over the whole extreme row);
  *  - `q_ann_topk` / `bruteTopK` probes × corpus — the documented
  *    exact baseline, probe side filtered small and broadcast;
  *  - test-fixture field expansion (crossJoin of tiny time/lev ranges);
  *  - `Sampling.exactPercentiles` (q_length_quantiles, r8): the
  *    UNGROUPED call's |pcts|-row × tiny-histogram rank-location
  *    cross (×2 — the locating branch is referenced twice); both
  *    sides bounded by |pcts| / histogram size, never the corpus.
  *    The grouped variant (q_length_quantiles_by_source) equi-joins
  *    on the group key — zero BNLJs;
  *  - `Sketches.hllPairOverlap` (q_hll_overlap, r9): the `ga < gb`
  *    pair enumeration over the one-row-per-group estimate relation
  *    (×2 — referenced by both register-replication branches) — the
  *    same |sources|²-bounded shape as q_kmv_jaccard's pair join,
  *    never the corpus or the register file itself.
  *
  * Counts are pinned at the DEFAULT audit scale (sf0.001, 8 threads);
  * BNLJ/CART arise from plan STRUCTURE (cross joins, non-equi
  * conditions), not size estimates, so they are stable across sf —
  * but if you audit a different sfDir and a count moves, re-pin at the
  * default before concluding regression.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [--selftest]
  *   --selftest additionally injects a deliberate corpus×corpus cross
  *   join under a name absent from the allowlist and asserts the gate
  *   REJECTS it (exit 0 iff the violation is detected) — proof the
  *   enforcement path actually fires.
  */
object PlanAudit {

  /** query → expected (BNLJ, CART). Queries absent here must audit
    * clean (0, 0). Every entry is attributed in the scaladoc above. */
  val allowlist: Map[String, (Int, Int)] = Map(
    "q_ann_topk"                       -> (1, 0), // bruteTopK exact baseline: broadcast probes × corpus
    "q_attach_coords"                  -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_bigram_lm"                      -> (1, 0), // bounded vocab self-pair enumeration
    "q_broadcast_dims"                 -> (11, 0), // fixture time/lev expansion + per-slab one-row pads
    "q_dataset_map"                    -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_hll_overlap"                    -> (2, 0), // |sources|² pair enumeration, ×2 branches
    "q_kmv_jaccard"                    -> (1, 0), // |sources|² pair enumeration over k-row sketches
    "q_length_quantiles"               -> (2, 0), // |pcts| × tiny-histogram rank location, ×2 branches
    "q_locstream_nearest"              -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_regrid_conservative_curv"       -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_regrid_conservative_curv_exact" -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_regrid_curv"                    -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_regrid_locstream"               -> (7, 0), // both-direction locstream chain: per-leg one-row pads + fixture expansion
    "q_regrid_locstream_in"            -> (5, 0), // locstream-in chain: per-leg one-row pads
    "q_spmm_apply"                     -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_unmapped_zero"                  -> (1, 0), // the pad IS the query under test
    "q_w_bilinear_peri"                -> (2, 0), // periodic pole caps × broadcast lon range (N+S)
  )

  def main(args: Array[String]): Unit = {
    val selftest = args.contains("--selftest")
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val violations = scala.collection.mutable.ArrayBuffer.empty[String]

    val audited: Seq[(String, (SparkSession, String) => DataFrame)] =
      graft.SparkEntry.queries.toSeq.sortBy(_._1) ++
        (if (selftest) Seq(
          "zz_selftest_crossjoin" -> ((s: SparkSession, dir: String) => {
            val d = s.read.parquet(s"$dir/documents.parquet")
            d.as("a").crossJoin(d.as("b")) // deliberate corpus × corpus
          })) else Nil)

    audited.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = PlanScan.opCount(plan, p)
        val bnlj = n("BroadcastNestedLoopJoin")
        val cart = n("CartesianProduct")
        val expected = allowlist.getOrElse(name, (0, 0))
        val ok = (bnlj, cart) == expected
        if (!ok) violations +=
          s"$name: (BNLJ=$bnlj, CART=$cart) != allowlisted $expected"
        val summary = Seq(
          "BHJ" -> n("BroadcastHashJoin"), "SMJ" -> n("SortMergeJoin"),
          "SHJ" -> n("ShuffledHashJoin"), "BNLJ" -> bnlj,
          "CART" -> cart, "EXCH" -> n("Exchange"),
          "WSCG" -> n("WholeStageCodegen"))
          .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
        val flag =
          if (!ok) "  <-- VIOLATION: unattributed scale risk"
          else if (bnlj + cart > 0) "  (allowlisted)"
          else ""
        println(f"$name%-28s $summary$flag")
      } catch { case e: Throwable =>
        violations += s"$name: PLAN ERROR ${e.getMessage.take(120)}"
        println(f"$name%-28s PLAN ERROR: ${e.getMessage.take(120)}")
      }
    }
    // an allowlist entry whose query vanished is stale — also a violation
    allowlist.keys.filterNot(graft.SparkEntry.queries.contains).foreach { k =>
      violations += s"$k: allowlisted but no longer a contract query (stale entry)"
    }
    // targeted skew guard (r8 verdict #7): the bucketed as-of variant
    // exists precisely so one mega key cannot serialize into a single
    // window task — assert its physical Window really partitions by
    // (key, __b), i.e. the bucket column survives into the window
    // spec. A refactor that dropped __b from the partition list would
    // still be result-correct (hash gate blind) but single-task again.
    locally {
      val plan = graft.SparkEntry.queries("q_asof_join_bucketed")(spark, sfDir)
        .queryExecution.executedPlan.toString
      val winPartitionedByBucket =
        "(?s)Window .*windowspecdefinition\\([^)]*__b".r.findFirstIn(plan).isDefined
      if (!winPartitionedByBucket) {
        violations += "q_asof_join_bucketed: window not partitioned by (key, __b) — mega-key serialization regression"
        println("q_asof_join_bucketed  <-- WINDOW NOT PARTITIONED BY (key, __b): mega-key serialization regression")
      } else println("q_asof_join_bucketed window partitioned by (key, __b): OK")
    }
    spark.stop()

    if (selftest) {
      val caught = violations.exists(_.startsWith("zz_selftest_crossjoin"))
      val others = violations.filterNot(_.startsWith("zz_selftest_crossjoin"))
      others.foreach(v => println(s"VIOLATION: $v"))
      if (caught && others.isEmpty) {
        println("== SELFTEST PASS: deliberate cross join rejected, real surface clean")
      } else {
        if (!caught) println("== SELFTEST FAIL: deliberate cross join NOT caught")
        else println(s"== SELFTEST saw ${others.size} real violation(s)")
        sys.exit(1)
      }
    } else {
      violations.foreach(v => println(s"VIOLATION: $v"))
      println(s"== violations: ${violations.size} (allowlisted flags: ${allowlist.size})")
      if (violations.nonEmpty) sys.exit(1)
    }
  }
}
