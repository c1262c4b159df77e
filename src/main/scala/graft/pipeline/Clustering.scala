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

  /** `(vec_id, v)` with v the quantized integer-valued double vector.
    * The declared `dim` is enforced per row — a wrong-width embedding
    * fails loudly here instead of silently diverging from the
    * fixed-dimension oracle chains. */
  def quantized(emb: DataFrame, dim: Int): DataFrame =
    emb.selectExpr("vec_id",
      s"""CASE WHEN size(embedding) = $dim
          THEN transform(embedding, x -> round(CAST(x AS DOUBLE) * 10000.0e0))
          ELSE raise_error(concat('expected $dim-dim embedding, got ',
            CAST(size(embedding) AS STRING), ' for vec_id ', CAST(vec_id AS STRING)))
          END AS v""")

  /** Assignments `(vec_id, cluster, dist2)` after `iters` Lloyd
    * rounds; `dist2` is the squared distance to the final centroid
    * (bit-exact, so callers may hash it after shared rounding). */
  def kmeans(emb: DataFrame, k: Int, iters: Int, dim: Int = 64): DataFrame =
    kmeansFull(emb, k, iters, dim)._1

  /** [[kmeans]] plus the final centroids (quantized-space doubles) —
    * the codebook consumers ([[pqTopK]]'s ADC lookup tables) need.
    *
    * Large-k note: each Lloyd round's assignment is a dense O(n·k·dim)
    * scan — right for the contract's bit-exact parity and for k ≤ a
    * few hundred. Training a k ≈ 10⁴⁺ learned-IVF codebook at corpus
    * scale uses [[kmeansFullTwoLevel]] (the two-level scan inside
    * every round — per-iteration cost sublinear in k, probe-measured
    * at k = 4096 / 1M vectors in PipelineScaleProbe `train4096`),
    * optionally on a SAMPLE (codebook quality converges long before
    * the full corpus adds information), then places the corpus with
    * the two-level [[assignToCentroids]] path. */
  def kmeansFull(emb: DataFrame, k: Int, iters: Int,
                 dim: Int = 64): (DataFrame, Array[(Int, Array[Double])]) =
    kmeansFullImpl(emb, k, iters, dim, coarseGroups = 0, coarseProbes = 0)

  /** Large-k TRAINING (the k ≈ 10³⁺ learned-IVF codebook): Lloyd's with
    * the two-level coarse-then-fine scan of [[assignToCentroids]]
    * INSIDE every round — per round the current codebook is grouped
    * driver-side ([[groupCodebook]] over k·dim doubles, trivial) and
    * each corpus vector evaluates g + p·k/g centroid distances instead
    * of k, making the per-iteration cost sublinear in k. Standard
    * IMI-style approximate training: a vector whose true nearest cell's
    * group goes unprobed lands in its best probed cell that round —
    * measured in PipelineScaleProbe (`train4096`) as marginal
    * within-cluster-distance inflation on clustered data. The
    * bit-exact contract queries keep [[kmeansFull]]'s dense rounds. */
  def kmeansFullTwoLevel(emb: DataFrame, k: Int, iters: Int, dim: Int = 64,
                         coarseGroups: Int = 64, coarseProbes: Int = 8)
      : (DataFrame, Array[(Int, Array[Double])]) = {
    require(coarseGroups > 0, s"coarseGroups must be > 0, got $coarseGroups")
    // ADVICE r7: probes = 0 would make the two-level scan probe NOTHING
    // and silently assign every vector cluster -1 / dist2 = MaxValue
    require(coarseProbes >= 1, s"coarseProbes must be >= 1, got $coarseProbes")
    kmeansFullImpl(emb, k, iters, dim, coarseGroups, coarseProbes)
  }

  private def kmeansFullImpl(emb: DataFrame, k: Int, iters: Int, dim: Int,
                             coarseGroups: Int, coarseProbes: Int)
      : (DataFrame, Array[(Int, Array[Double])]) = {
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = quantized(emb, dim).as[(Long, Array[Double])]

    // deterministic init: the first k vectors by vec_id
    val init: Array[(Int, Array[Double])] = q.orderBy("vec_id").take(k)
      .zipWithIndex.map { case ((_, v), i) => (i, v) }
    val cents = lloydRounds(q, init, iters, coarseGroups, coarseProbes)
    (assignedTo(q, cents, coarseGroups, coarseProbes)
      .map { case (id, cl, d, _) => (id, cl, d) }
      .toDF("vec_id", "cluster", "dist2"), cents)
  }

  /** One stateless assignment pass against broadcast centroids:
    * `(vec_id, cluster, dist2, v)` — the shared map stage of every
    * Lloyd round and the final labeling. */
  private def assignedTo(q: org.apache.spark.sql.Dataset[(Long, Array[Double])],
                         cs: Array[(Int, Array[Double])],
                         coarseGroups: Int, coarseProbes: Int)
      : org.apache.spark.sql.Dataset[(Long, Int, Double, Array[Double])] = {
    val spark = q.sparkSession
    import spark.implicits._
    if (coarseGroups <= 0) {
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
    } else {
      val (coarse, members) = groupCodebook(cs, coarseGroups)
      val p = math.min(coarseProbes, coarse.length)
      val bcC = spark.sparkContext.broadcast(coarse)
      val bcM = spark.sparkContext.broadcast(members)
      val bcF = spark.sparkContext.broadcast(cs)
      q.mapPartitions { it =>
        val cc = bcC.value; val mem = bcM.value; val fine = bcF.value
        val gd = new Array[Double](cc.length)
        it.map { case (id, v) =>
          val (cl, d) = twoLevelScan(cc, mem, fine, p, gd, v)
          (id, cl, d, v)
        }
      }
    }
  }

  /** The `iters − 1` Lloyd update rounds, returning the final
    * centroids. Each round is ONE single-stage job: the assignment map
    * emits k dense per-partition accumulators and the element-wise
    * merge happens on the DRIVER — the sums are integer-valued doubles
    * (< 2⁵³, see the object scaladoc), so a driver-side add in
    * collection order is bit-identical to the former
    * posexplode → groupBy → groupBy exchange chain it replaces (two
    * shuffles per round, measured pure overhead at every scale: the
    * collected relation is ≤ partitions · k rows either way, the same
    * driver boundedness as MLlib's per-round reduce). */
  private def lloydRounds(q: org.apache.spark.sql.Dataset[(Long, Array[Double])],
                          init: Array[(Int, Array[Double])], iters: Int,
                          coarseGroups: Int, coarseProbes: Int)
      : Array[(Int, Array[Double])] = {
    val spark = q.sparkSession
    import spark.implicits._
    var cents = init
    for (_ <- 1 until iters) {
      val partials = assignedTo(q, cents, coarseGroups, coarseProbes)
        .mapPartitions { it =>
          val acc = scala.collection.mutable.Map[Int, (Array[Double], Long)]()
          it.foreach { case (_, cl, _, v) =>
            val (s, _) = acc.getOrElseUpdate(cl, (new Array[Double](v.length), 0L))
            var j = 0
            while (j < v.length) { s(j) += v(j); j += 1 }
            acc(cl) = (s, acc(cl)._2 + 1)
          }
          acc.iterator.map { case (cl, (s, n)) => (cl, s, n) }
        }.collect()
      val acc = scala.collection.mutable.HashMap[Int, (Array[Double], Long)]()
      partials.foreach { case (cl, s, n) =>
        acc.get(cl) match {
          case Some((t, n0)) =>
            var j = 0
            while (j < t.length) { t(j) += s(j); j += 1 }
            acc(cl) = (t, n0 + n)
          case None => acc(cl) = (s, n)
        }
      }
      cents = acc.toArray.sortBy(_._1).map { case (cl, (s, n)) =>
        (cl, Array.tabulate(s.length)(j => s(j) / n)) }
    }
    cents
  }

  /** Decayed mini-batch Lloyd refresh of a FIXED centroid set against
    * an ingest batch — the [[encodePqBatch]] analog for the CENTROIDS
    * (r10 verdict #7), completing the incremental lifecycle: encode is
    * O(batch) today, model refresh is O(batch) now too. The standard
    * mini-batch k-means update (Sculley, WWW 2010 — per-center
    * prior-count learning rate) with an explicit prior weight:
    *
    *   c' = (priorWeight·c + Σ_{v∈batch→c} v) / (priorWeight + n_c)
    *
    * `priorWeight` is the effective per-centroid memory in vectors —
    * the corpus-tracking choice is ≈ |corpus|/k (the refresh then
    * behaves like one more Lloyd round over corpus+batch); smaller
    * values track drift faster, 0 snaps each touched centroid to its
    * batch mean. Contracts: a centroid that receives NO batch vectors
    * is returned BIT-UNCHANGED (an empty batch is a no-op, so serving
    * hashes cannot move without data moving them); assignment uses the
    * same quantization / fixed-order fold / id tie-break as training
    * ([[assignToCentroids]]' contract); the batch never shuffles —
    * one broadcast-scan with per-partition dense accumulators, the
    * [[kmeansFullImpl]] update shape, then a k·dim-bounded reduce.
    * Result quality vs a full retrain is spec-pinned on a drifting
    * fixture (tolerance, not hash — cluster identities can permute
    * under retraining). */
  def refreshCentroids(cents: Array[(Int, Array[Double])], batch: DataFrame,
                       priorWeight: Long): Array[(Int, Array[Double])] = {
    require(priorWeight >= 0, s"priorWeight must be >= 0, got $priorWeight")
    require(cents.nonEmpty, "refreshCentroids needs a trained centroid set")
    // dim comes from the model itself (the assignToCentroids rule): a
    // caller-passed dim disagreeing with the centroid length would
    // silently assign and update on a truncated prefix
    val dim = cents.head._2.length
    val spark = batch.sparkSession
    import spark.implicits._
    val q = quantized(batch, dim).as[(Long, Array[Double])]
    val bc = spark.sparkContext.broadcast(cents)
    val partials = q.mapPartitions { it =>
      val cs = bc.value
      val acc = scala.collection.mutable.Map[Int, (Array[Double], Long)]()
      it.foreach { case (_, v) =>
        var bestCl = -1
        var bestD = Double.MaxValue
        cs.foreach { case (cl, c) =>
          var d = 0.0
          var j = 0
          while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
          if (d < bestD || (d == bestD && cl < bestCl)) { bestD = d; bestCl = cl }
        }
        val (s, _) = acc.getOrElseUpdate(bestCl, (new Array[Double](v.length), 0L))
        var j = 0
        while (j < v.length) { s(j) += v(j); j += 1 }
        acc(bestCl) = (s, acc(bestCl)._2 + 1)
      }
      acc.iterator.map { case (cl, (s, n)) => (cl, s, n) }
    }.collect()
    // driver-side element-wise merge of the ≤ partitions · k partial
    // accumulators — integer-exact sums, so collection order is
    // irrelevant and the former two-shuffle posexplode/groupBy merge
    // is replaced by a single-stage job (same boundedness: the merge
    // input was already collected to the driver)
    val merged = {
      val acc = scala.collection.mutable.HashMap[Int, (Array[Double], Long)]()
      partials.foreach { case (cl, s, n) =>
        acc.get(cl) match {
          case Some((t, n0)) =>
            var j = 0
            while (j < t.length) { t(j) += s(j); j += 1 }
            acc(cl) = (t, n0 + n)
          case None => acc(cl) = (s, n)
        }
      }
      acc.toMap
    }
    // loud-guard discipline (r11 advice): a vector whose distance to
    // EVERY centroid is NaN (NaN components poison the accumulation)
    // keeps bestCl = -1; its sums would land under cluster -1, which
    // the merge below never reads — silently dropping it from the
    // refresh. Raise instead, mirroring quantized()'s guards (in
    // assignToCentroids' output the -1 is at least visible).
    merged.get(-1).foreach { case (_, n) =>
      throw new IllegalArgumentException(
        s"refreshCentroids: $n batch vector(s) assigned to NO centroid " +
          "(non-finite embedding components make every distance NaN) — " +
          "clean the batch before refreshing")
    }
    cents.map { case (cl, c) =>
      merged.get(cl) match {
        case Some((sm, n)) =>
          (cl, Array.tabulate(c.length)(j =>
            (priorWeight.toDouble * c(j) + sm(j)) / (priorWeight.toDouble + n)))
        case None => (cl, c) // untouched centroid: bit-unchanged
      }
    }
  }

  /** Assign vectors to FIXED centroids (e.g. [[kmeansFull]]'s output) —
    * the incremental-corpus path: cluster/encode a NEW ingest batch
    * against the already-trained model without re-running Lloyd over
    * the world. Stateless broadcast map, same quantization/tie-break as
    * the training assignment, so assigning the training corpus itself
    * reproduces [[kmeans]]'s output bit-for-bit.
    *
    * `coarseGroups > 0` selects the TWO-LEVEL path for large
    * codebooks: the dense scan is O(k·dim) per vector — fine at the
    * probe sizes k = 16–64, linear-in-k pain at the k ≈ 10⁴–10⁵ cells
    * a 100 TB learned IVF wants. The codebook itself is clustered
    * (driver-side Lloyd over k centroids — k·dim doubles, trivially
    * in-memory) into `coarseGroups ≈ √k` groups; each vector ranks the
    * coarse centroids, then scans only the fine centroids of its
    * `coarseProbes` nearest groups: g + p·k/g distance evaluations per
    * vector instead of k (≈ (1+p)·√k at g = √k). Same fixed-order
    * fold + id tie-break, so within the probed set the choice is
    * bit-identical to the dense scan's. Approximation contract: a
    * vector whose true nearest fine centroid lives in a non-probed
    * group gets its best PROBED centroid — standard IVF/IMI semantics;
    * the scalatest asserts exact parity on clustered data at modest
    * probes and the probe tool measures parity + speedup at k = 4096
    * on the 1M-vector corpus. The bit-exact contract queries keep the
    * default dense path. */
  def assignToCentroids(emb: DataFrame,
                        cents: Array[(Int, Array[Double])],
                        coarseGroups: Int = 0,
                        coarseProbes: Int = 4): DataFrame = {
    require(cents.nonEmpty, "assignToCentroids needs at least one centroid")
    // same silent-garbage guard as kmeansFullTwoLevel: a two-level call
    // (coarseGroups > 0) with zero probes scans no cells at all
    require(coarseGroups <= 0 || coarseProbes >= 1,
      s"coarseProbes must be >= 1 when coarseGroups > 0, got $coarseProbes")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = quantized(emb, cents.head._2.length).as[(Long, Array[Double])]
    if (coarseGroups <= 0) {
      val bc = spark.sparkContext.broadcast(cents)
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
          (id, bestCl, bestD)
        }
      }
        .toDF("vec_id", "cluster", "dist2")
    } else {
      val (coarse, members) = groupCodebook(cents, coarseGroups)
      val p = math.min(coarseProbes, coarse.length)
      val bcC = spark.sparkContext.broadcast(coarse)
      val bcM = spark.sparkContext.broadcast(members)
      val bcF = spark.sparkContext.broadcast(cents)
      q.mapPartitions { it =>
        val cc = bcC.value; val mem = bcM.value; val fine = bcF.value
        val gd = new Array[Double](cc.length)   // reused per vector
        it.map { case (id, v) =>
          val (cl, d) = twoLevelScan(cc, mem, fine, p, gd, v)
          (id, cl, d)
        }
      }
        .toDF("vec_id", "cluster", "dist2")
    }
  }

  /** One two-level nearest-centroid scan — the shared kernel of
    * [[assignToCentroids]] and [[kmeansFullTwoLevel]]'s training
    * rounds: coarse distances into the caller-owned `gd` scratch
    * (allocation-free across vectors), then a fine scan of the `p`
    * nearest groups' members. Strict `<` on the group selection keeps
    * the lowest group id on ties; the fine scan uses the same
    * fixed-order fold + cluster-id tie-break as the dense path, so
    * within the probed set the choice is bit-identical to dense. */
  private def twoLevelScan(cc: Array[Array[Double]], mem: Array[Array[Int]],
                           fine: Array[(Int, Array[Double])], p: Int,
                           gd: Array[Double], v: Array[Double]): (Int, Double) = {
    var g = 0
    while (g < cc.length) {
      val c = cc(g)
      var d = 0.0
      var j = 0
      while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
      gd(g) = d
      g += 1
    }
    var bestCl = -1
    var bestD = Double.MaxValue
    var pi = 0
    while (pi < p) {
      var sel = -1
      var selD = Double.MaxValue
      var gi = 0
      while (gi < cc.length) {
        if (gd(gi) < selD) { selD = gd(gi); sel = gi }
        gi += 1
      }
      gd(sel) = Double.PositiveInfinity   // exclude from later rounds
      val ms = mem(sel)
      var mi = 0
      while (mi < ms.length) {
        val (cl, c) = fine(ms(mi))
        var d = 0.0
        var j = 0
        while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
        if (d < bestD || (d == bestD && cl < bestCl)) { bestD = d; bestCl = cl }
        mi += 1
      }
      pi += 1
    }
    (bestCl, bestD)
  }

  /** Cluster a codebook into coarse groups, driver-side: deterministic
    * Lloyd (init = first g centroids in id order, 5 rounds, same
    * dist/tie-break discipline as the distributed kernel) over the k
    * fine centroids. Returns the coarse centroids and, per group, the
    * member INDEXES into the input array. Empty groups keep empty
    * member lists (harmless — never probed as nearest). */
  private[pipeline] def groupCodebook(
      cents: Array[(Int, Array[Double])],
      g: Int): (Array[Array[Double]], Array[Array[Int]]) = {
    val k = cents.length
    val gg = math.min(g, k)
    val dim = cents.head._2.length
    var coarse: Array[Array[Double]] = cents.take(gg).map(_._2.clone())
    var asg = new Array[Int](k)
    def assignAll(): Unit = {
      var i = 0
      while (i < k) {
        val v = cents(i)._2
        var bestG = -1
        var bestD = Double.MaxValue
        var gi = 0
        while (gi < gg) {
          val c = coarse(gi)
          var d = 0.0
          var j = 0
          while (j < dim) { val t = v(j) - c(j); d += t * t; j += 1 }
          if (d < bestD || (d == bestD && gi < bestG)) { bestD = d; bestG = gi }
          gi += 1
        }
        asg(i) = bestG
        i += 1
      }
    }
    var round = 0
    while (round < 5) {
      assignAll()
      val sums = Array.fill(gg)(new Array[Double](dim))
      val ns = new Array[Long](gg)
      var i = 0
      while (i < k) {
        val s = sums(asg(i)); val v = cents(i)._2
        var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        ns(asg(i)) += 1
        i += 1
      }
      coarse = Array.tabulate(gg)(gi =>
        if (ns(gi) == 0) coarse(gi)
        else Array.tabulate(dim)(j => sums(gi)(j) / ns(gi)))
      round += 1
    }
    assignAll()
    val members = Array.fill(gg)(new scala.collection.mutable.ArrayBuffer[Int]())
    var i = 0
    while (i < k) { members(asg(i)) += i; i += 1 }
    (coarse, members.map(_.toArray))
  }

  /** Multi-probe cell assignment for a PROBE subset: each filtered
    * vector gets `nprobe` rows `(vec_id, g)` — its `nprobe` nearest
    * centroids by quantized-space squared distance, ties broken on
    * cluster id (the same total order as the assignment itself, so
    * probe 1 is exactly the [[assignToCentroids]] cell). Stateless
    * broadcast map over the probe subset — the corpus never moves, and
    * the output is the query-side relation [[Similarity.topKWithinGroups]]
    * and [[pqTopK]] equi-join on (still a pure equi-join plan, just
    * `nprobe` probe rows per query instead of 1). */
  def probeCells(emb: DataFrame, probeFilter: String,
                 cents: Array[(Int, Array[Double])], nprobe: Int): DataFrame = {
    require(cents.nonEmpty && nprobe >= 1,
      s"probeCells needs centroids and nprobe >= 1, got ${cents.length} cents, nprobe=$nprobe")
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    quantized(emb.filter(probeFilter), cents.head._2.length)
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val centroids = bc.value
        it.flatMap { case (id, v) =>
          centroids.map { case (cl, c) =>
            var d = 0.0
            var j = 0
            while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
            (cl, d)
          }.sortBy { case (cl, d) => (d, cl) }
            .take(nprobe)
            .map { case (cl, _) => (id, cl) }
        }
      }
      .toDF("vec_id", "g")
  }

  /** ANN top-k over LEARNED cells: corpus and queries land in their
    * k-means cell (data-adaptive — cells follow the embedding density,
    * where the fixed sign-hyperplane buckets of
    * [[Similarity.ivfTopK]] split dense regions arbitrarily), and
    * exact cosine rank runs within the cell. Same plan shape as the
    * sign-bucket IVF: one equi-join on the cell id, top-k window.
    *
    * `nprobe > 1` is the recall lever: each query scans its `nprobe`
    * nearest cells ([[probeCells]] — still one equi-join, `nprobe`
    * probe rows per query), recovering neighbors that land just across
    * a Voronoi boundary at `nprobe×` the candidate volume. */
  def ivfLearnedTopK(emb: DataFrame, probeFilter: String, k: Int,
                     cells: Int, iters: Int, nprobe: Int = 1): DataFrame =
    ivfQueryTopK(trainIvfIndex(emb, cells, iters), emb, probeFilter, k, nprobe)

  /** A trained learned-IVF index — the exact-within-cell sibling of
    * [[PqIndex]]: the cell assignment `(vec_id, g)` (the only
    * corpus-sized relation) plus the k-means centroids (parameters).
    * Persisted/loaded by [[AnnIO.saveIvf]]/[[AnnIO.loadIvf]]. Unlike
    * IVF-PQ the candidate scoring reads TRUE vectors, so queries need
    * the embedding table alongside — the index only prunes. */
  case class IvfIndex(asg: DataFrame,
                      cents: Array[(Int, Array[Double])],
                      dim: Int)

  /** Train the learned-IVF model of [[ivfLearnedTopK]] as a reusable
    * [[IvfIndex]] (the Lloyd chain is the expensive pass — persist it,
    * don't re-run it per query batch). */
  def trainIvfIndex(emb: DataFrame, cells: Int, iters: Int,
                    dim: Int = 64): IvfIndex = {
    val (asgRaw, cents) = kmeansFull(emb, cells, iters, dim)
    IvfIndex(asgRaw.select(col("vec_id"), col("cluster").as("g"))
      .localCheckpoint(), cents, dim)
  }

  /** Serve learned-IVF ANN top-k from a trained (or loaded)
    * [[IvfIndex]] — the query half of [[ivfLearnedTopK]]: cell
    * equi-join candidate pruning from the index, exact cosine rank
    * over the true vectors within. */
  def ivfQueryTopK(index: IvfIndex, emb: DataFrame, probeFilter: String,
                   k: Int, nprobe: Int = 1): DataFrame = {
    val qg = if (nprobe <= 1) None
             else Some(probeCells(emb, probeFilter, index.cents, nprobe))
    Similarity.topKWithinGroups(emb, index.asg, probeFilter, k, qg)
  }

  /** Product-quantization ANN (the IVF-PQ compression path): each
    * vector is encoded as `m` small codes — the nearest per-subspace
    * k-means centroid of each of its `m` dim/m-dim slices — and query
    * distance is the asymmetric-distance (ADC) sum of per-subspace
    * lookup-table entries, computed over the CODES, never the raw
    * vectors. At 100 TB this is what makes an embedding corpus
    * scannable: m bytes/vector (m·k centroid doubles broadcast) instead
    * of dim floats, with the corpus-side scan a stack of broadcast
    * equi-joins on the code columns.
    *
    * Plan shape: m per-subspace Lloyd runs (each the [[kmeans]] shape:
    * broadcast assignment + accumulator-only update shuffle), an m−1
    * equi-join pivot of the code columns (vec_id-keyed, co-partitioned
    * by AQE), then per query: a broadcast LUT equi-join per subspace
    * and a fixed-order `d_0 + d_1 + …` sum — no BNLJ anywhere.
    * With `coarseCells > 0` (IVF-PQ proper, the 100 TB configuration) a
    * coarse full-vector k-means keys the first LUT join by the
    * query's cell, so the ADC fan-out is corpus/cells per query
    * instead of the whole corpus — `coarseCells = 0` is the exhaustive
    * ADC scan (exact PQ ranking, the small-corpus baseline). Exact
    * re-ranking of the ADC top-k (the standard refinement step) is
    * [[pqTopKRefined]].
    *
    * Parity: codebooks inherit [[kmeans]]'s bit-exactness; LUT entries
    * are fixed-index-order folds of identical doubles; per-pair sums
    * add the per-subspace terms in subspace order. `adist` is the
    * squared distance in the quantized (×10⁴) input space.
    * Ranks tie-break on neighbor_id — a total order, so both engines
    * cut identically. */
  def pqTopK(emb: DataFrame, probeFilter: String, kNN: Int, m: Int,
             codebookK: Int, iters: Int, dim: Int = 64,
             coarseCells: Int = 0, coarseIters: Int = 2,
             coarseNprobe: Int = 1): DataFrame = {
    require(kNN >= 1, s"kNN must be >= 1, got $kNN")
    pqQueryTopK(trainPqIndex(emb, m, codebookK, iters, dim, coarseCells, coarseIters),
      emb, probeFilter, kNN, coarseNprobe)
  }

  /** A trained IVF-PQ index — everything [[pqQueryTopK]] needs to
    * serve queries WITHOUT re-training, and everything [[AnnIO]]
    * persists (the `reuse_weights` analog for the ANN family,
    * reference `frontend.py:144-146`):
    *  - `codes`: one row per corpus vector — `vec_id`,
    *    `code_0..code_{m-1}`, plus `cell` when coarse IVF is on. The
    *    only corpus-sized relation; everything else is parameters.
    *  - `cellAsg`: the (vec_id, cell) view used to key probes at
    *    nprobe = 1 (a column-pruned projection of `codes` for a loaded
    *    index; the checkpointed training assignment when trained here).
    *  - `codebooks`: per-subspace centroid arrays (m·k tiny rows).
    *  - `coarse`: coarse IVF centroids, when trained with them. */
  case class PqIndex(codes: DataFrame,
                     cellAsg: Option[DataFrame],
                     codebooks: Seq[(Int, Array[(Int, Array[Double])])],
                     coarse: Option[Array[(Int, Array[Double])]],
                     m: Int, codebookK: Int, dim: Int)

  /** Train the IVF-PQ model of [[pqTopK]] and return it as a reusable
    * [[PqIndex]]: per-subspace Lloyd codebooks, the code pivot, and
    * (with `coarseCells > 0`) the coarse cell assignment. Training is
    * the expensive pass — m + 1 Lloyd chains over the corpus — which is
    * exactly why the index persists ([[AnnIO.save]]) instead of
    * re-deriving per query batch. */
  def trainPqIndex(emb: DataFrame, m: Int, codebookK: Int, iters: Int,
                   dim: Int = 64, coarseCells: Int = 0,
                   coarseIters: Int = 2): PqIndex = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val spark = emb.sparkSession
    import spark.implicits._

    // ONE quantized-corpus materialization feeds every Lloyd chain,
    // every update round, and the final encode (was: each of the m + 1
    // chains re-scanned the source per round). Slicing commutes with
    // the element-wise round(x·10⁴), so per-subspace slices of the
    // checkpointed full vectors are bit-identical to quantizing the
    // sliced source.
    val q = quantized(emb, dim).as[(Long, Array[Double])].localCheckpoint()
    // shared deterministic init: the first max(k, cells) vectors by
    // vec_id — each chain's init is a prefix (subspace chains sliced)
    val initFull = q.orderBy("vec_id")
      .take(math.max(codebookK, coarseCells))
    def slicedInit(n: Int, s0: Int): Array[(Int, Array[Double])] =
      initFull.take(n).zipWithIndex.map { case ((_, v), i) =>
        (i, java.util.Arrays.copyOfRange(v, s0 * subDim, (s0 + 1) * subDim)) }

    // per-subspace codebooks: the Lloyd chains run over slices of the
    // shared checkpoint; no per-subspace assignment relation is ever
    // materialized — the final codes come from ONE corpus pass below.
    val codebooks = (0 until m).map { s0 =>
      val sliced = q.map { case (id, v) =>
        (id, java.util.Arrays.copyOfRange(v, s0 * subDim, (s0 + 1) * subDim)) }
      (s0, lloydRounds(sliced, slicedInit(codebookK, s0), iters, 0, 0))
    }
    // coarse IVF cells (the scale path): the ADC scan is restricted to
    // the query's cell, so per-query work is corpus/cells, not corpus.
    // coarseCells = 0 is the exhaustive ADC scan (exact PQ ranking).
    val ccents = if (coarseCells > 0)
      Some(lloydRounds(q,
        initFull.take(coarseCells).zipWithIndex.map { case ((_, v), i) => (i, v) },
        coarseIters, 0, 0))
    else None

    // the code relation in ONE stateless corpus pass against the m
    // broadcast codebooks (+ coarse centroids): same per-subspace
    // fixed-order fold and id tie-break as the per-chain assignment,
    // so the rows are bit-identical to the former m-way vec_id join
    // pivot — which shuffled the corpus-sized code relation m − 1 + 1
    // times for no information gain. Checkpointed: every downstream
    // action reads codes, never the Lloyd chains.
    val codes = encodeRows(q, codebooks, ccents, subDim).localCheckpoint()
    val cellAsg = if (coarseCells > 0) Some(codes.select("vec_id", "cell")) else None
    PqIndex(if (coarseCells > 0) codes
            else codes.drop("cell"),
      cellAsg, codebooks, ccents, m, codebookK, dim)
  }

  /** ONE stateless encode pass shared by [[trainPqIndex]] and
    * [[encodePqBatch]]: per vector, the m per-subspace nearest-centroid
    * codes (fixed-order fold, id tie-break — the [[assignToCentroids]]
    * contract per slice) and, when coarse centroids are given, the
    * coarse cell. Output schema matches the persisted code relation:
    * `(vec_id, code_0..code_{m-1}[, cell])`. */
  private def encodeRows(q: org.apache.spark.sql.Dataset[(Long, Array[Double])],
                         codebooks: Seq[(Int, Array[(Int, Array[Double])])],
                         coarse: Option[Array[(Int, Array[Double])]],
                         subDim: Int): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    val m = codebooks.size
    val cbArr: Array[Array[(Int, Array[Double])]] =
      codebooks.sortBy(_._1).map(_._2).toArray
    val bcCb = spark.sparkContext.broadcast(cbArr)
    val bcCo = spark.sparkContext.broadcast(coarse.orNull)
    val withCell = coarse.isDefined
    val rows = q.mapPartitions { it =>
      val cbs = bcCb.value; val co = bcCo.value
      it.map { case (id, v) =>
        val codes = new Array[Int](m)
        var s0 = 0
        while (s0 < m) {
          val cs = cbs(s0)
          var bestCl = -1
          var bestD = Double.MaxValue
          cs.foreach { case (cl, c) =>
            var d = 0.0
            var j = 0
            while (j < c.length) { val t = v(s0 * subDim + j) - c(j); d += t * t; j += 1 }
            if (d < bestD || (d == bestD && cl < bestCl)) { bestD = d; bestCl = cl }
          }
          codes(s0) = bestCl
          s0 += 1
        }
        var cell = -1
        if (co != null) {
          var bestD = Double.MaxValue
          co.foreach { case (cl, c) =>
            var d = 0.0
            var j = 0
            while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
            if (d < bestD || (d == bestD && cl < cell)) { bestD = d; cell = cl }
          }
        }
        (id, codes, cell)
      }
    }.toDF("vec_id", "codes", "cell")
    val codeCols = (0 until m).map(i => col("codes").getItem(i).as(s"code_$i"))
    rows.select((col("vec_id") +: codeCols) ++
      (if (withCell) Seq(col("cell")) else Nil): _*)
  }

  /** Encode a NEW ingest batch against a trained (or loaded)
    * [[PqIndex]] WITHOUT re-training — the incremental-corpus path for
    * the ANN family, mirroring [[assignToCentroids]]'s contract for
    * plain k-means: per-subspace code assignment and (when the index
    * carries coarse IVF) cell assignment all run against the FIXED
    * persisted codebooks as stateless broadcast maps, O(batch) work
    * with the corpus untouched. Same quantization / fixed-order fold /
    * id tie-break as training, so encoding the training corpus itself
    * reproduces the trained code relation BIT-FOR-BIT (spec-pinned).
    * Returns rows in the index's code-relation schema, ready for
    * [[AnnIO.appendCodes]]. */
  def encodePqBatch(index: PqIndex, emb: DataFrame): DataFrame = {
    val subDim = index.dim / index.m
    require((0 until index.m).forall(s0 => index.codebooks.exists(_._1 == s0)),
      s"index is missing a codebook for one of subspaces 0..${index.m - 1}")
    val spark = emb.sparkSession
    import spark.implicits._
    // ONE stateless pass against the broadcast codebooks (+ coarse):
    // the former per-subspace assignToCentroids relations joined
    // m − 1 (+1) times on vec_id shuffled the batch per subspace for
    // no information gain; the shared encode kernel keeps the math
    // (fixed-order fold, id tie-break) bit-identical per slice.
    val q = quantized(emb, index.dim).as[(Long, Array[Double])]
    val out = encodeRows(q, index.codebooks, index.coarse, subDim)
    // stamp the model identity into the vec_id field's schema metadata
    // (zero data, zero jobs): AnnIO.appendCodes refuses a batch whose
    // stamp disagrees with the target index's fingerprint — codes
    // encoded against other codebooks can never poison a served index
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(AnnIO.encStampKey,
        AnnIO.fingerprint(index.codebooks, index.coarse)).build()
    out.withColumn("vec_id", col("vec_id").as("vec_id", md))
  }

  /** Serve ANN top-k from a trained (or loaded) [[PqIndex]] — the
    * query half of [[pqTopK]], touching only the index relations and
    * the PROBE vectors of `emb` (LUT slices + multi-probe ranking);
    * the corpus embeddings are never re-read.
    *
    * `indexFilter` (a predicate over the code relation's columns)
    * gives FILTERED serving with pre-filter semantics — top-k among
    * index vectors satisfying the predicate, [[Similarity.ivfTopK]]'s
    * `indexFilter` contract at the persisted-index layer. Metadata
    * columns saved alongside the codes ([[AnnIO.save]]'s `metaCols`)
    * make the predicate answerable INSIDE the bucketed code scan
    * (pushed filter, no side join, index distribution untouched);
    * the probe side is never filtered — a query needn't satisfy the
    * predicate it searches under. */
  def pqQueryTopK(index: PqIndex, emb: DataFrame, probeFilter: String,
                  kNN: Int, coarseNprobe: Int = 1,
                  indexFilter: String = "true"): DataFrame = {
    require(kNN >= 1, s"kNN must be >= 1, got $kNN")
    val spark = emb.sparkSession
    val m = index.m
    val dim = index.dim
    val subDim = dim / m

    val qcells = index.coarse.map { ccents =>
      // probeFilter only references vec_id, so at nprobe=1 the probes'
      // cells are a direct filter of the cell assignment — no second
      // corpus scan. nprobe > 1 (multi-probe IVF-PQ) widens each
      // query to its nprobe nearest coarse centroids — still an
      // equi-join on the cell, nprobe probe rows per query, and each
      // (query, vector) pair matches at most once (one cell per
      // corpus vector).
      if (coarseNprobe <= 1)
        index.cellAsg.getOrElse(index.codes.select(col("vec_id"), col("cell")))
          .filter(expr(probeFilter))
      else probeCells(emb, probeFilter, ccents, coarseNprobe)
        .select(col("vec_id"), col("g").as("cell"))
    }

    // ADC lookup tables: per (query, subspace, code) the exact squared
    // distance from the query's quantized slice to that centroid —
    // an equi-join of the probe slices against the m·k-row broadcast
    // codebook relation, fixed-index-order fold
    import spark.implicits._
    val cents = index.codebooks.flatMap { case (s0, cs) =>
      cs.map { case (code, c) => (s0, code, c) }
    }.toDF("sub", "code", "cv")
    val qslices = quantized(emb.filter(probeFilter), dim)
      .select(col("vec_id").as("query_id"),
        explode(expr(s"transform(sequence(0, ${m - 1}), " +
          s"s -> named_struct('sub', s, 'qv', slice(v, s * $subDim + 1, $subDim)))")).as("sl"))
      .select(col("query_id"), col("sl.sub").as("sub"), col("sl.qv").as("qv"))
    val lut = qslices.join(broadcast(cents), "sub")
      // native codegen L2 kernel — same fold order as the
      // aggregate(zip_with(...)) oracle text, bit-equal result
      .withColumn("d", graft.functions.VectorKernels.l2sq(col("qv"), col("cv")))
      .select("query_id", "sub", "code", "d")

    // candidates: one broadcast LUT join per subspace — the FIRST join
    // carries the coarse cell key when IVF is on, so the fan-out is
    // (queries in this cell) per vector, not (all queries) per vector —
    // then the fixed-order ADC sum and the per-query exact top-k cut.
    // The index filter lands here, BEFORE any join: for a loaded index
    // it pushes into the bucketed code scan, and candidate volume
    // shrinks with the predicate's selectivity.
    var cand = index.codes.filter(expr(indexFilter))
    for (s0 <- 0 until m) {
      var l = lut.filter(col("sub") === s0)
        .select(col("query_id"), col("code").as(s"code_$s0"), col("d").as(s"d_$s0"))
      val keys = if (s0 == 0) qcells match {
        case Some(qc) =>
          l = l.join(qc.withColumnRenamed("vec_id", "query_id"), "query_id")
          Seq("cell", s"code_$s0")
        case None => Seq(s"code_$s0")
      } else Seq("query_id", s"code_$s0")
      cand = cand.join(broadcast(l), keys)
    }
    val adist = expr((0 until m).map(s0 => s"d_$s0").mkString(" + "))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist"), col("vec_id"))
    cand
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= kNN)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adist"), col("rank"))
  }

  /** Exact re-rank of [[pqTopK]]'s ADC candidates — the standard
    * IVF-PQ refinement: the top `candK` by approximate (code-space)
    * distance are re-scored with the TRUE vectors and cut to `kNN` by
    * exact cosine. Only candK vectors per query are ever read at full
    * precision, so the expensive exact kernel touches
    * probes × candK rows, not the corpus. */
  def pqTopKRefined(emb: DataFrame, probeFilter: String, kNN: Int,
                    candK: Int, m: Int, codebookK: Int, iters: Int,
                    dim: Int = 64, coarseCells: Int = 0,
                    coarseIters: Int = 2, coarseNprobe: Int = 1): DataFrame = {
    require(candK >= kNN, s"candK=$candK must be >= kNN=$kNN")
    val cand = pqTopK(emb, probeFilter, candK, m, codebookK, iters, dim,
      coarseCells, coarseIters, coarseNprobe).select("query_id", "neighbor_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    Similarity.rescorePairs(emb, cand)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= kNN)
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
