package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-means over embedding columns — the clustering step a
  * curation pipeline runs for semantic dedup (SemDeDup-style: cluster,
  * then near-dup within clusters), corpus topic balancing, and learned
  * IVF centroids (upgrading [[Similarity.ivfTopK]]'s sign buckets to
  * data-adaptive cells).
  *
  * Lloyd's algorithm with a FIXED iteration count and deterministic
  * init (the first k vectors by `vec_id`), engineered for bit-exact
  * reproducibility across engines and re-runs:
  *  - inputs are quantized to integer-valued doubles
  *    (`round(x · 10⁴)`), so partial sums are EXACT (< 2⁵³) and
  *    order-independent — the one place floating-point addition order
  *    could differ between a 32-way shuffle and a single-threaded
  *    oracle is made exact instead;
  *  - each centroid component is one IEEE division `sum / count`;
  *  - distance folds run in fixed dimension order 0..dim−1, matching
  *    the oracle's `list_reduce` fold, so every comparison sees
  *    bit-identical doubles; argmin ties break on cluster id.
  *
  * Scale shape per iteration: assignment is a stateless map over the
  * corpus against BROADCAST centroids (k·dim doubles — tiny); the
  * update is a per-partition dense accumulator (k × dim) emitted as
  * k rows per partition, then an element-wise exact sum — the shuffle
  * moves O(partitions · k · dim) values, never the corpus. Empty
  * clusters are dropped (both engines see identical assignments, so
  * they drop identically).
  */
object Clustering {

  /** `(vec_id, v)` with v the quantized integer-valued double vector. */
  def quantized(emb: DataFrame, dim: Int): DataFrame =
    emb.selectExpr("vec_id",
      s"transform(embedding, x -> round(CAST(x AS DOUBLE) * 10000.0e0)) AS v")

  /** Assignments `(vec_id, cluster, dist2)` after `iters` Lloyd
    * rounds; `dist2` is the squared distance to the final centroid
    * (bit-exact, so callers may hash it after shared rounding). */
  def kmeans(emb: DataFrame, k: Int, iters: Int, dim: Int = 64): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = quantized(emb, dim).as[(Long, Array[Double])]

    // deterministic init: the first k vectors by vec_id
    var cents: Array[(Int, Array[Double])] = q.orderBy("vec_id").take(k)
      .zipWithIndex.map { case ((_, v), i) => (i, v) }

    def assigned(cs: Array[(Int, Array[Double])]) = {
      val bc = spark.sparkContext.broadcast(cs)
      q.mapPartitions { it =>
        val centroids = bc.value
        it.map { case (id, v) =>
          var bestCl = -1
          var bestD = Double.MaxValue
          centroids.foreach { case (cl, c) =>
            var d = 0.0
            var j = 0
            while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
            if (d < bestD || (d == bestD && cl < bestCl)) { bestD = d; bestCl = cl }
          }
          (id, bestCl, bestD, v)
        }
      }
    }

    for (_ <- 1 until iters) {
      // exact element-wise sums: k rows of dense accumulators per
      // partition, then an integer-exact reduce — the corpus never
      // shuffles
      val partials = assigned(cents).mapPartitions { it =>
        val acc = scala.collection.mutable.Map[Int, (Array[Double], Long)]()
        it.foreach { case (_, cl, _, v) =>
          val (s, _) = acc.getOrElseUpdate(cl, (new Array[Double](v.length), 0L))
          var j = 0
          while (j < v.length) { s(j) += v(j); j += 1 }
          acc(cl) = (s, acc(cl)._2 + 1)
        }
        acc.iterator.map { case (cl, (s, n)) => (cl, s, n) }
      }.toDF("cl", "sums", "n")
      val merged = partials
        .select(col("cl"), col("n"), posexplode(col("sums")).as(Seq("j", "s")))
        .groupBy("cl", "j").agg(sum("s").as("s"), sum("n").as("n"))
        .groupBy("cl").agg(
          map_from_arrays(collect_list("j"), collect_list("s")).as("sm"),
          first("n").as("n"))
        .collect()
      cents = merged.map { r =>
        val cl = r.getInt(0)
        val sm = r.getMap[Int, Double](1)
        val n = r.getLong(2).toDouble
        (cl, Array.tabulate(dimOf(sm))(j => sm(j) / n))
      }.sortBy(_._1)
    }
    assigned(cents).map { case (id, cl, d, _) => (id, cl, d) }
      .toDF("vec_id", "cluster", "dist2")
  }

  private def dimOf(m: scala.collection.Map[Int, Double]): Int = m.keys.max + 1

  /** ANN top-k over LEARNED cells: corpus and queries land in their
    * k-means cell (data-adaptive — cells follow the embedding density,
    * where the fixed sign-hyperplane buckets of
    * [[Similarity.ivfTopK]] split dense regions arbitrarily), and
    * exact cosine rank runs within the cell. Same plan shape as the
    * sign-bucket IVF: one equi-join on the cell id, top-k window. */
  def ivfLearnedTopK(emb: DataFrame, probeFilter: String, k: Int,
                     cells: Int, iters: Int): DataFrame = {
    val asg = kmeans(emb, cells, iters)
      .select(col("vec_id"), col("cluster").as("g")).localCheckpoint()
    Similarity.topKWithinGroups(emb, asg, probeFilter, k)
  }

  /** SemDeDup-style semantic dedup: k-means partitions the corpus into
    * k cells, exact cosine pairs are computed WITHIN cells only (a
    * pure equi-join on the cell id — the O(n²) work becomes k
    * independent O((n/k)²) blocks), near-dup groups are resolved by
    * connected components, and each group keeps its min-id
    * representative. Returns one row per vector:
    * `(vec_id, rep_id, keep)` — `keep` marks the representative (and
    * every vector with no near-dup). Cross-cell near-dups are out of
    * scope by the algorithm's construction, not approximation error.
    */
  def semanticDedup(emb: DataFrame, k: Int, iters: Int,
                    minCos: Double): DataFrame = {
    // checkpoint: the assignment feeds both sides of the pair join and
    // would otherwise re-run the full Lloyd chain twice
    val asg = kmeans(emb, k, iters)
      .select(col("vec_id"), col("cluster").as("g")).localCheckpoint()
    val pairs = Similarity.withinGroupPairs(emb, asg, minCos)
    val comp = Dedup.clusters(pairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id").as("rep_id"))
    emb.select("vec_id").join(comp, Seq("vec_id"), "left")
      .selectExpr("vec_id", "coalesce(rep_id, vec_id) AS rep_id",
        "coalesce(rep_id, vec_id) = vec_id AS keep")
  }
}
