package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit over every contract query: flags the plan
  * shapes that do not survive a 100× scale-up (nested-loop joins,
  * cartesian products) and reports join/exchange/codegen composition,
  * so plan regressions are caught the same way correctness ones are.
  *
  * Known-acceptable BNLJ sources (audited 2026-08-12, all others are
  * regressions):
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
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = PlanScan.opCount(plan, p)
        val bad = PlanScan.forbiddenOps.map(n).sum
        val summary = Seq(
          "BHJ" -> n("BroadcastHashJoin"), "SMJ" -> n("SortMergeJoin"),
          "SHJ" -> n("ShuffledHashJoin"), "BNLJ" -> n("BroadcastNestedLoopJoin"),
          "CART" -> n("CartesianProduct"), "EXCH" -> n("Exchange"),
          "WSCG" -> n("WholeStageCodegen"))
          .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
        val flag = if (bad > 0) "  <-- SCALE RISK" else ""
        if (bad > 0) flagged += 1
        println(f"$name%-28s $summary$flag")
      } catch { case e: Throwable =>
        println(f"$name%-28s PLAN ERROR: ${e.getMessage.take(120)}")
      }
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
        flagged += 1
        println("q_asof_join_bucketed  <-- WINDOW NOT PARTITIONED BY (key, __b): mega-key serialization regression")
      } else println("q_asof_join_bucketed window partitioned by (key, __b): OK")
    }
    println(s"== flagged: $flagged")
    spark.stop()
  }
}
