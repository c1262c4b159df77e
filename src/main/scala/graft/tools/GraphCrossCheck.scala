package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.pipeline.{Events, Graphs}

/** Engine-internal cross-check for the graph pair at rungs the DuckDB
  * oracle cannot execute (r14 verdict #2): at sf100 the co-view edge
  * derivation reads 100M events, and single-node DuckDB dies on the
  * iterative-CTE PageRank (>35 GB spill) and was never attempted on
  * the triangle enumeration — so q_graph_pagerank / q_graph_triangles
  * carried "oracle-exact at sf10" evidence only. Both queries are
  * bit-DETERMINISTIC by design (triangle counts are integers; ranks
  * are fixed-point BIGINTs), so a second, independently-shaped ENGINE
  * plan verifies them exactly without an external oracle:
  *
  *  - triangles: the optimized operator (degree orientation, wedges
  *    only at out-neighborhoods — `Graphs.triangleStats`) vs the NAIVE
  *    three-way self-join its DuckDB oracle states, here executed by
  *    Spark SQL over the same edge relation;
  *  - pagerank: the iterative DataFrame loop
  *    (`Graphs.pageRankFixedPoint`) vs the oracle's UNROLLED 5-round
  *    declarative CTE chain, translated `//`→`div` — one is a loop of
  *    checkpointed joins, the other a single 5-deep optimizer-planned
  *    tree; identical BIGINT ranks mean the fixed-point arithmetic,
  *    join semantics, and null/coalesce handling agree bit-for-bit.
  *
  * Equality is multiset (exceptAll both directions, fully
  * distributed — nothing collects). Exit 0 + one JSON line on match;
  * exit 3 on any difference.
  *
  * Usage: runMain graft.tools.GraphCrossCheck <sfDir> [iters=5]
  */
object GraphCrossCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same edge derivation as q_graph_triangles / q_graph_pagerank:
    // co-view item pairs with support >= 2. Cached — the cross-check
    // targets the graph ALGORITHMS; the co-occurrence relation itself
    // is oracle-gated (q_item_cooccurrence) at every rung it runs.
    val edges = Events.coOccurrence(Events.load(spark, sfDir), "view", 0, 2)
      .select(col("item_a").cast("long").as("a"),
        col("item_b").cast("long").as("b"))
      .cache()
    val nEdges = edges.count()
    edges.createOrReplaceTempView("und")

    def diff(a: org.apache.spark.sql.DataFrame,
             b: org.apache.spark.sql.DataFrame): Long =
      a.exceptAll(b).count() + b.exceptAll(a).count()

    // ---- triangles: operator vs naive three-way self-join ----------
    val t0 = System.nanoTime()
    val triOp = Graphs.triangleStats(edges)
    val triNaive = spark.sql(
      """WITH e AS (SELECT a, b FROM und),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1 JOIN e e2 ON e2.a = e1.b
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
          GROUP BY node),
        pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
            SELECT x AS node FROM tri UNION ALL SELECT y AS node FROM tri
            UNION ALL SELECT z AS node FROM tri) GROUP BY node)
        SELECT deg.node, deg.degree,
          coalesce(pn.n_tri, CAST(0 AS BIGINT)) AS n_tri,
          CASE WHEN deg.degree < 2 THEN 0.0e0
            ELSE floor((2.0e0 * CAST(coalesce(pn.n_tri, 0) AS DOUBLE)
              / (CAST(deg.degree AS DOUBLE) * CAST(deg.degree - 1 AS DOUBLE)))
              * 1.0e9 + 0.5e0) / 1.0e9 END AS clustering
        FROM deg LEFT JOIN pn ON deg.node = pn.node""")
    val triRows = triOp.count()
    val triMismatch = diff(triOp, triNaive)
    val triWall = (System.nanoTime() - t0) / 1e9

    // ---- pagerank: iterative loop vs unrolled declarative chain ----
    val t1 = System.nanoTime()
    val sc = Graphs.PrScale
    val rounds = (1 to iters).map { r =>
      s"""p$r AS (
        SELECT od.src AS node,
          ((CAST($sc AS BIGINT) * 15 div 100) div nn.n)
            + (coalesce(c.s, CAST(0 AS BIGINT)) * 85 div 100) AS pr
        FROM od CROSS JOIN nn LEFT JOIN (
          SELECT e.dst AS dst, CAST(sum(p${r - 1}.pr div od.od) AS BIGINT) AS s
          FROM p${r - 1} JOIN od ON od.src = p${r - 1}.node
            JOIN e ON e.src = p${r - 1}.node
          GROUP BY e.dst) c ON c.dst = od.src)"""
    }
    val prOp = Graphs.pageRankFixedPoint(edges, iters)
    val prNaive = spark.sql(
      s"""WITH e AS (SELECT a AS src, b AS dst FROM und
          UNION ALL SELECT b AS src, a AS dst FROM und),
        od AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY src),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM od),
        p0 AS (SELECT src AS node, CAST($sc AS BIGINT) div n AS pr
               FROM od CROSS JOIN nn),
        ${rounds.mkString(",\n")}
        SELECT node, pr AS pr_fixed,
          floor((CAST(pr AS DOUBLE) / ${sc}.0e0) * 1.0e9 + 0.5e0) / 1.0e9 AS pr
        FROM p$iters""")
    val prRows = prOp.count()
    val prMismatch = diff(prOp, prNaive)
    val prWall = (System.nanoTime() - t1) / 1e9

    println(f"""{"tool":"graph_crosscheck","sf":"$sfDir","iters":$iters,""" +
      f""""edges":$nEdges,"triangles_rows":$triRows,""" +
      f""""triangles_mismatch":$triMismatch,"triangles_wall_s":$triWall%.1f,""" +
      f""""pagerank_rows":$prRows,"pagerank_mismatch":$prMismatch,""" +
      f""""pagerank_wall_s":$prWall%.1f}""")
    spark.stop()
    if (triMismatch != 0 || prMismatch != 0) sys.exit(3)
  }
}
