package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph statistics over relational edge lists — the item/document
  * affinity graphs that fall out of [[Events.coOccurrence]] and the
  * dedup pair relations.
  *
  * Triangle counting is the canonical "naive SQL dies at scale" graph
  * op: the unoriented wedge join generates deg(v)² candidates at every
  * node, and real co-occurrence graphs are power-law — one hub node
  * can emit 10¹⁰ wedges. The fix [Schank & Wagner 2005; the standard
  * MapReduce/GraphX formulation] is DEGREE ORIENTATION: direct every
  * edge from its lower-(degree, id) endpoint to the higher one, build
  * wedges only at each node's OUT-neighbors, and close them against
  * oriented edges. Out-degrees are bounded by O(√m), so wedge volume
  * drops from Σ deg² to O(m^1.5) worst-case — hub nodes generate no
  * wedges at all. Every triangle is counted exactly once, at its
  * minimum-(degree, id) corner.
  */
object Graphs {

  /** localCheckpoint plus the exact persisted-RDD ids it created (read
    * off the LogicalRDD plan — the Dedup.clustersWithRounds hygiene),
    * so the size gate's materialization can be FREED the moment the
    * path decision is made: the small path frees after its bounded
    * collect, and the LARGE path frees immediately and continues from
    * the unmaterialized plan (r16 advice #2 — a gate checkpoint kept
    * for the whole iteration DAG pins a corpus-sized relation in
    * executor storage at the 10⁹-edge scale these scaladocs target,
    * storage pressure the pre-r16 lazy plans never had). */
  private def ckptWithIds(df: DataFrame): (DataFrame, Seq[Int]) = {
    val out = df.localCheckpoint()
    val ids = out.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD => Seq(r.rdd.id)
      case _ => Nil   // unexpected plan shape: keep blocks, stay correct
    }
    (out, ids)
  }

  private def free(df: DataFrame, ids: Seq[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** Per-node triangle participation and local clustering coefficient
    * over an undirected simple graph given as `(a, b)` edge rows with
    * `a < b` (any duplicate rows are deduped). Output:
    * `(node, degree, n_tri, clustering)` where clustering =
    * 2·n_tri / (degree·(degree−1)), 0 when degree < 2, rounded to 9
    * decimals with the shared floor-trick.
    *
    * Plan shape: degree agg (map-side combined) → join degree rank
    * onto edges for orientation → self equi-join on the wedge
    * center → equi-join against oriented edges to close → explode each
    * triangle to its 3 corners → hash agg. All joins are equi-joins on
    * node ids; nothing is quadratic in hub degree.
    *
    * The three degree joins carry NO broadcast hint (r8 verdict #2:
    * a forced `broadcast(deg)` is O(V) driver+executor memory — an OOM,
    * not a plan choice, at the 10⁹-node co-occurrence graphs this
    * engine targets). They are plain equi-joins on the node id; AQE
    * sees the degree aggregate's true runtime size and picks a
    * broadcast join itself whenever it actually fits
    * (`spark.sql.adaptive.autoBroadcastJoinThreshold`), and degrades to
    * a shuffled join — same answer, bounded memory — when it doesn't.
    * PipelineScaleProbe's `graphTriangles10x` pins the shuffled plan's
    * viability at 10× contract edges. */
  /** Edge-count ceiling for triangleStats' exact small-graph fast
    * path — smaller than [[smallEdgesMax]] because the driver replay
    * is not linear: oriented triangle counting is O(m^1.5) worst-case
    * (~1.3·10⁸ wedge checks at this cap, well under a second), so the
    * bound caps WORK, not just collected bytes. Counts are integers —
    * the driver walk is exactly the relation the distributed
    * orientation DAG aggregates (property-spec pinned both ways). */
  val smallTriEdgesMax: Long = 1L << 18

  def triangleStats(edges0: DataFrame,
                    smallMax: Long = smallTriEdgesMax): DataFrame = {
    val spark = edges0.sparkSession
    val edgesPlan = edges0.select(col("a").cast("long"), col("b").cast("long"))
      .where(col("a") < col("b")).distinct()
    val (edgesCk, edgesCkIds) = ckptWithIds(edgesPlan)
    if (edgesCk.count() <= smallMax) {
      val es = edgesCk.collect().map(r => (r.getLong(0), r.getLong(1)))
      free(edgesCk, edgesCkIds)
      val deg = new scala.collection.mutable.LongMap[Long]()
      es.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1L; deg(b) = deg.getOrElse(b, 0L) + 1L
      }
      // degree orientation (lower (degree, id) → higher), out-adjacency
      // sets, wedges closed against oriented edges — the identical
      // count the distributed DAG computes, one corner per triangle
      def lt(x: Long, y: Long): Boolean =
        deg(x) < deg(y) || (deg(x) == deg(y) && x < y)
      val out = new scala.collection.mutable.LongMap[scala.collection.mutable.ArrayBuffer[Long]]()
      val outSet = new scala.collection.mutable.LongMap[scala.collection.mutable.HashSet[Long]]()
      es.foreach { case (a, b) =>
        val (u, v) = if (lt(a, b)) (a, b) else (b, a)
        out.getOrElseUpdate(u, new scala.collection.mutable.ArrayBuffer[Long]()) += v
        outSet.getOrElseUpdate(u, new scala.collection.mutable.HashSet[Long]()) += v
      }
      val nTri = new scala.collection.mutable.LongMap[Long]()
      out.foreach { case (u, nbrs) =>
        var i = 0
        while (i < nbrs.length) {
          var j = i + 1
          while (j < nbrs.length) {
            val (x, y) = (nbrs(i), nbrs(j))
            val (v, w) = if (lt(x, y)) (x, y) else (y, x)
            if (outSet.get(v).exists(_.contains(w))) {
              nTri(u) = nTri.getOrElse(u, 0L) + 1L
              nTri(v) = nTri.getOrElse(v, 0L) + 1L
              nTri(w) = nTri.getOrElse(w, 0L) + 1L
            }
            j += 1
          }
          i += 1
        }
      }
      val rows = deg.keys.toArray.map(v => (v, deg(v), nTri.getOrElse(v, 0L)))
      import spark.implicits._
      return spark.sparkContext
        .parallelize(rows.toIndexedSeq, math.max(1, spark.sparkContext.defaultParallelism min 8))
        .toDF("node", "degree", "n_tri")
        .withColumn("clustering", expr(
          """CASE WHEN degree < 2 THEN 0.0e0
             ELSE floor((2.0e0 * CAST(n_tri AS DOUBLE)
               / (CAST(degree AS DOUBLE) * CAST(degree - 1 AS DOUBLE)))
               * 1.0e9 + 0.5e0) / 1.0e9 END"""))
        .select("node", "degree", "n_tri", "clustering")
    }
    // large graph: free the gate checkpoint and continue from the LAZY
    // deduped plan — the distributed DAG is exactly the pre-gate shape,
    // with no corpus-sized relation pinned for its lifetime
    free(edgesCk, edgesCkIds)
    val edges = edgesPlan
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

    // orientation key: (degree, node) — a total order, so edge
    // direction is unambiguous and every triangle has exactly one
    // all-outgoing corner
    val withRanks = edges
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    val oriented = withRanks.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      // carry the rank of v for the wedge-side ordering
      .join(deg.select(col("node").as("v"), col("degree").as("dv")), "v")

    // wedges at u over its out-neighborhood, ordered so (v, w) is
    // emitted once; close against the oriented edge (v, w)
    val o1 = oriented.select(col("u"), col("v"), col("dv"))
    val o2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = o1.join(o2, Seq("u"))
      .where(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val tri = wedges.join(closing, Seq("v", "w"))
      .select(col("u").as("x"), col("v").as("y"), col("w").as("z"))

    val perNode = tri.select(col("x").as("node"))
      .unionAll(tri.select(col("y").as("node")))
      .unionAll(tri.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))

    deg.join(perNode, Seq("node"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .withColumn("clustering", expr(
        """CASE WHEN degree < 2 THEN 0.0e0
           ELSE floor((2.0e0 * CAST(n_tri AS DOUBLE)
             / (CAST(degree AS DOUBLE) * CAST(degree - 1 AS DOUBLE)))
             * 1.0e9 + 0.5e0) / 1.0e9 END"""))
      .select("node", "degree", "n_tri", "clustering")
  }

  /** Fixed-point scale for [[pageRankFixedPoint]]: ranks live in
    * integer units of 10⁻¹². */
  val PrScale: Long = 1000000000000L

  /** PageRank over an undirected simple graph `(a, b)` (a < b), in
    * FIXED-POINT integer arithmetic: ranks are BIGINT multiples of
    * 10⁻¹², per-edge contributions are integer divisions
    * `pr DIV out_degree`, and the damping update is
    * `base + (85·Σcontrib) DIV 100`.
    *
    * Why fixed-point: float PageRank sums neighbor contributions in
    * partition order, so the low bits differ run to run and engine to
    * engine — fine for ranking, fatal for bit-reproducibility audits.
    * Integer sums are associative-commutative EXACTLY, making the
    * result independent of partitioning, shuffle order, and engine
    * (the truncation the DIVs introduce is deterministic and bounded
    * by 10⁻¹² per term). Each iteration is one equi-join of the rank
    * relation with the directed edge list + a map-side-combinable sum
    * — the standard distributed PageRank shape; at power-law scale the
    * hub-destination skew is AQE's skew-join case. Dangling nodes
    * cannot arise from an undirected edge list (every endpoint has
    * out-degree ≥ 1). Output: `(node, pr_fixed, pr)` where `pr` is
    * the readable double `pr_fixed / 10¹²` rounded to 9 decimals. */
  /** Lineage-truncation period for [[pageRankFixedPoint]]'s loop.
    * Chosen above the contract query's 5 rounds so shallow runs pay no
    * eager materialization (a checkpoint measured ~+2 s on the sf0.1
    * graph), while deep runs truncate every 6 joins — the graphs10x
    * probe runs 9 iterations to exercise the checkpointed path. */
  val checkpointEvery: Int = 6

  /** Edge-count ceiling for the exact small-graph fast path: at or
    * below this many (distinct undirected) edges the fixed-point
    * recurrence runs on the driver over ONE bounded collect (~16
    * bytes/edge ⟹ ≤ 16 MB at the cap) instead of `iters`
    * driver-coordinated join rounds. Sound because the ranks are
    * INTEGER fixed-point by design: the sums are exact and
    * associative, so the driver replay is bit-identical to the
    * distributed loop (the property spec literally pins this replay
    * against the loop). Same guarded-collect discipline as
    * `Dedup.smallPairsMax`; the distributed loop remains the path for
    * every larger graph (the graphs10x probe regime). */
  val smallEdgesMax: Long = 1L << 20

  def pageRankFixedPoint(edges0: DataFrame, iters: Int,
                         smallMax: Long = smallEdgesMax): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = edges0.sparkSession
    // the deduped edge list is materialized only for the size gate —
    // the small path frees it after its bounded collect, the large path
    // frees it immediately (r16 advice #2) and keeps the lazy plan
    val undPlan = edges0.select(col("a").cast("long"), col("b").cast("long"))
      .where(col("a") < col("b")).distinct()
    val (undCk, undCkIds) = ckptWithIds(undPlan)
    if (undCk.count() <= smallMax) {
      val es = undCk.collect().map(r => (r.getLong(0), r.getLong(1)))
      free(undCk, undCkIds)
      val od = new scala.collection.mutable.LongMap[Long]()
      es.foreach { case (a, b) =>
        od(a) = od.getOrElse(a, 0L) + 1L; od(b) = od.getOrElse(b, 0L) + 1L
      }
      val ns = od.keys.toArray
      val n = ns.length.toLong
      val base = (PrScale * 15L / 100L) / n
      var pr = new scala.collection.mutable.LongMap[Long]()
      ns.foreach(v => pr(v) = PrScale / n)
      (1 to iters).foreach { _ =>
        val contrib = new scala.collection.mutable.LongMap[Long]()
        // Long `/` == the SQL DIV on these operands (all non-negative);
        // integer sums are order-independent, so accumulation order
        // cannot matter — the same invariant the distributed loop
        // rests on
        es.foreach { case (a, b) =>
          contrib(b) = contrib.getOrElse(b, 0L) + pr(a) / od(a)
          contrib(a) = contrib.getOrElse(a, 0L) + pr(b) / od(b)
        }
        val next = new scala.collection.mutable.LongMap[Long]()
        ns.foreach(v => next(v) = base + contrib.getOrElse(v, 0L) * 85L / 100L)
        pr = next
      }
      import spark.implicits._
      return spark.sparkContext
        .parallelize(ns.map(v => (v, pr(v))).toIndexedSeq,
          math.max(1, spark.sparkContext.defaultParallelism min 8))
        .toDF("node", "pr")
        .select(col("node"), col("pr").as("pr_fixed"),
          expr(s"floor((CAST(pr AS DOUBLE) / ${PrScale}.0e0) * 1.0e9 + 0.5e0) / 1.0e9").as("pr"))
    }
    // large graph: drop the gate checkpoint, continue from the lazy
    // plan — the pre-gate distributed DAG, nothing pinned for the loop
    free(undCk, undCkIds)
    val und = undPlan
    val directed = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
    val out = directed.groupBy("src").agg(count(lit(1)).as("od")).cache()
    val nodes = out.select(col("src").as("node"))
    val n = nodes.count()
    // all driver-side Long arithmetic — replicated literally in SQL as
    // (PrScale * 15 DIV 100) DIV n
    val base = (PrScale * 15L / 100L) / n
    var pr = nodes.withColumn("pr", lit(PrScale / n))
    for (i <- 1 to iters) {
      val contrib = pr
        .join(out, pr("node") === out("src"))
        .join(directed, Seq("src"))
        .selectExpr("dst", "pr DIV od AS c")
        .groupBy("dst").agg(sum("c").as("s"))
      pr = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("coalesce(s, CAST(0 AS BIGINT)) * 85 DIV 100")).as("pr"))
      // truncate lineage every few rounds (r8 verdict #2, same
      // discipline as Dedup.clusters' pointer-jumping loop): without
      // this the plan nests one join+agg deeper per iteration, so a
      // 50-round run re-optimizes — and on executor loss would
      // recompute — a 50-deep tree. localCheckpoint is EAGER; blocks
      // are freed by the ContextCleaner once the plan is collected.
      if (i % checkpointEvery == 0 && i < iters) pr = pr.localCheckpoint()
    }
    out.unpersist()
    pr.select(col("node"), col("pr").as("pr_fixed"),
      expr(s"floor((CAST(pr AS DOUBLE) / ${PrScale}.0e0) * 1.0e9 + 0.5e0) / 1.0e9").as("pr"))
  }
}
