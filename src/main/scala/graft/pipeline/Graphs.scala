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

  /** Per-node triangle participation and local clustering coefficient
    * over an undirected simple graph given as `(a, b)` edge rows with
    * `a < b` (any duplicate rows are deduped). Output:
    * `(node, degree, n_tri, clustering)` where clustering =
    * 2·n_tri / (degree·(degree−1)), 0 when degree < 2, rounded to 9
    * decimals with the shared floor-trick.
    *
    * Plan shape: degree agg (map-side combined) → broadcast degree
    * rank onto edges for orientation → self equi-join on the wedge
    * center → equi-join against oriented edges to close → explode each
    * triangle to its 3 corners → hash agg. All joins are equi-joins on
    * node ids; nothing is quadratic in hub degree. */
  def triangleStats(edges0: DataFrame): DataFrame = {
    val edges = edges0.select(col("a").cast("long"), col("b").cast("long"))
      .where(col("a") < col("b")).distinct()
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

    // orientation key: (degree, node) — a total order, so edge
    // direction is unambiguous and every triangle has exactly one
    // all-outgoing corner
    val withRanks = edges
      .join(broadcast(deg.select(col("node").as("a"), col("degree").as("da"))), "a")
      .join(broadcast(deg.select(col("node").as("b"), col("degree").as("db"))), "b")
    val oriented = withRanks.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      // carry the rank of v for the wedge-side ordering
      .join(broadcast(deg.select(col("node").as("v"), col("degree").as("dv"))), "v")

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
}
