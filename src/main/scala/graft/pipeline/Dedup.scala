package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash-LSH, and n-gram Jaccard.
  *
  * Scale shape: everything is hash-groupBy or inverted-index equi-join.
  * The only pairwise work happens AFTER candidate generation, on the
  * (tiny) candidate set — never on the full corpus cross product.
  */
object Dedup {

  /** Exact dedup on normalized content hash: one row per distinct
    * content, keeping the smallest doc_id. Pure hash-aggregate —
    * one shuffle on the hash, no join. */
  def exact(docs: DataFrame): DataFrame =
    docs.selectExpr("md5(lower(trim(text))) AS h", "doc_id")
      .groupBy("h")
      .agg(min("doc_id").as("keep_id"), count("*").as("n_copies"))

  /** Corpus snapshot diff — the incremental-processing primitive: which
    * documents were added, removed, changed (same id, different
    * normalized content) or unchanged between two corpus versions. At
    * 100 TB this is what lets a pipeline re-process ONLY the delta
    * instead of the world. Returns one row per doc id present in
    * either snapshot: `(doc_id, status)`.
    *
    * Scale shape: both sides reduce to `(doc_id, content-hash)` in the
    * scan projection (narrow — the text never shuffles), then one full
    * outer hash equi-join on doc_id. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def h(df: DataFrame, as: String) =
      df.selectExpr("doc_id", s"md5(lower(trim(text))) AS $as")
    h(oldDocs, "h_old").join(h(newDocs, "h_new"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed"))
      .select("doc_id", "status")
  }

  /** Exact Jaccard for a candidate pair relation `(a, b)` via the
    * inverted shingle index: |A∩B| from a shingle equi-join, sizes from
    * a groupBy — never materializing per-doc sets in memory.
    *
    * `pruneSizes` picks which side of a measured trade-off to pay
    * (values identical either way): `false` (default) sizes every doc
    * in one corpus-wide map-side-combined aggregate — fastest when the
    * pair relation is an expensive subtree referenced once (the
    * in-corpus LSH chain: 2.2 vs 3.3 s at sf0.1, because the prune
    * re-references `pairs` twice more and re-evaluates its self-join);
    * `true` semi-joins the shingle relation down to candidate docs
    * before the agg — the right side when the corpus dwarfs the pair
    * set and the pair subtree is cheap to re-evaluate (the indexed
    * incremental path: 24.5 vs 26.8 s per 10k-doc batch against a 1M
    * corpus, and no corpus-wide aggregate per ingest). */
  def jaccardFor(shingles: DataFrame, pairs: DataFrame,
                 pruneSizes: Boolean = false): DataFrame = {
    val sizes = if (pruneSizes) {
      val docsInPairs = pairs.select(col("a").as("doc_id"))
        .unionByName(pairs.select(col("b").as("doc_id"))).distinct()
      shingles.join(docsInPairs, "doc_id")
        .groupBy("doc_id").agg(count("*").as("n"))
    } else shingles.groupBy("doc_id").agg(count("*").as("n"))
    // candidates-first: expand the pair set to side-a shingles, then
    // equi-join side b on (b, s) — cost scales with candidate pairs,
    // not with every shingle collision in the corpus. The pair side is
    // hinted MERGE, never broadcast: its cardinality is a property of
    // the corpus's collision structure (a mass-templated corpus puts
    // millions of candidates in the pair set), while the static
    // planner only sees a multi-join+distinct subtree whose size
    // estimate is fiction small enough to broadcast — at 100× data
    // that planned broadcast materializes gigabytes and OOMs the
    // build (found by the sf10 rehearsal, r13). A shuffled join costs
    // one extra exchange of the (id-only) pair relation at small
    // scale and is the only shape that survives the regime the pair
    // set exists to find.
    // both inter joins are hinted: the second would otherwise broadcast
    // the CORPUS-WIDE shingle relation, whose static estimate is even
    // worse fiction (a Generate's output size is guessed from its
    // input rows — the ~90× shingle expansion is invisible)
    val inter = pairs.hint("merge")
      .join(shingles.select(col("doc_id").as("a"), col("s")), "a")
      .hint("merge")
      .join(shingles.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
      .groupBy("a", "b")
      .agg(count("*").as("i"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .selectExpr("a", "b",
        "floor((CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9 AS jaccard")
  }

  /** MinHash-LSH near-dup pipeline: shingle → minhash → band →
    * bucket-join for candidates → exact Jaccard verification.
    * Returns `(a, b, jaccard)` for candidate pairs, ordered ids.
    *
    * `maxBucket` (optional) is the hot-bucket guard for mass-templated
    * corpora: a band signature shared by 10⁶ near-identical documents
    * (same boilerplate page, different timestamps — these SURVIVE
    * exact-dedup-first) would put ~10¹² candidate pairs in one
    * `(band, sig)` join key. Buckets above the cap short-circuit to a
    * STAR on the bucket's min doc_id (O(size) pairs instead of
    * O(size²)); only the exhaustive within-bucket pair list is
    * deliberately not materialized. Star pairs still go through the
    * exact-Jaccard verify like every other candidate.
    *
    * Cluster-equivalence caveat: star routing yields the same
    * downstream [[clusters]] component as the full clique only when
    * bucket members verify against the bucket-min doc — the
    * NEAR-IDENTICAL-bucket regime the cap targets (mass-templated
    * docs whose pairwise Jaccard all clears the verify threshold; the
    * scale-probe fixture's shape). A mixed hot bucket with CHAINED
    * similarity (A~B, B~C, but A!~C) can lose the B–C edge the clique
    * would have kept, splitting that cluster differently than the
    * uncapped run. The cap is opt-in and sized so genuine mixed
    * buckets (bounded by shingle collisions, not template mass) stay
    * under it. */
  def minhashLsh(docs: DataFrame, k: Int = 16, rowsPerBand: Int = 4,
                 maxBucket: Option[Int] = None,
                 persistShingles: Boolean = false): DataFrame = {
    // The shingle relation is referenced up to FIVE times per action
    // (both band self-join sides — alias-renamed, so ReuseExchange
    // cannot unify them — both intersection-join sides, and the sizes
    // agg). Interleaved best-of-4 A/B (graft.tools.MinhashParts):
    //  - 1M docs / 16M shingles: persist 31.7 s vs recompute 85.4 s
    //    (2.7x), and far tighter spread (32-34 s vs 85-197 s — the 5x
    //    re-evaluation's long critical path is what host co-tenancy
    //    keeps amplifying);
    //  - contract scale (sf0.1, ~60k docs): statistical tie
    //    (1.48 vs 1.56 s min).
    // Default stays false so the call keeps its lazy, side-effect-free
    // contract (the flag's localCheckpoint is EAGER: it materializes
    // at call time, blocks freed by the ContextCleaner once the plan
    // is garbage-collected); large-corpus batch callers — and the
    // 1M-doc probe — should pass true. Rows are identical either way
    // (scalatest-pinned).
    val sh0 = TextOps.shingleSet(docs, 5)
    val sh = if (persistShingles) sh0.localCheckpoint() else sh0
    // signatures via the grouped chain: measured ~2x faster here than
    // the stateless per-row projection (4.2 vs 2.1 s at sf0.1 — the
    // md5-once exploded relation + map-side-combined min-aggs beat 16
    // per-row array folds in the batch context); the stateless form
    // (TextOps.bandSigsStateless, row-identical) exists for streams
    // and zero-shuffle scan-side use
    val bands = TextOps.lshBands(TextOps.minhashFromShingles(sh, k), rowsPerBand)
    val candidates = maxBucket match {
      case None =>
        bands.select(col("band"), col("sig"), col("doc_id").as("a"))
          .join(bands.select(col("band"), col("sig"), col("doc_id").as("b")), Seq("band", "sig"))
          .filter(col("a") < col("b"))
          .select("a", "b")
          .distinct()
      case Some(cap) =>
        // size every bucket once (map-side combined count), route each
        // band row by its bucket's size: ≤ cap → the normal pair
        // clique; > cap → a star on the bucket min. Checkpoint: the
        // banded relation feeds the sizing agg and both join sides.
        val b = bands.localCheckpoint()
        val sized = b.join(
          b.groupBy("band", "sig").agg(count(lit(1)).as("bn"), min("doc_id").as("bmin")),
          Seq("band", "sig"))
        val small = sized.filter(col("bn") <= cap)
        val clique = small.select(col("band"), col("sig"), col("doc_id").as("a"))
          .join(small.select(col("band"), col("sig"), col("doc_id").as("b")), Seq("band", "sig"))
          .filter(col("a") < col("b"))
          .select("a", "b")
        val star = sized.filter(col("bn") > cap && col("doc_id") =!= col("bmin"))
          .select(col("bmin").as("a"), col("doc_id").as("b"))
        clique.unionByName(star).distinct()
    }
    jaccardFor(sh, candidates)
  }

  /** SimHash near-dup pairs: all pairs with Hamming distance ≤
    * `maxHamming` between their 60-bit [[TextOps.simhash]] signatures
    * — EXACT over the signature space (unlike the probabilistic LSH
    * candidates) by the pigeonhole band join: the signature splits
    * into `maxHamming + 1` equal bands, and two signatures differing
    * in ≤ maxHamming bits MUST agree on at least one whole band, so
    * the per-band equi-join provably misses nothing. Returns
    * `(a, b, hamming)`, ordered ids.
    *
    * Scale shape: one signature pass (a map-side-combined aggregate),
    * then `bands` rows per doc into a chunk equi-join — the same
    * bucket-join plan as every dedup candidate stage here; candidates
    * are verified with one codegen'd `bit_count(xor)` and never touch
    * the text again. `60 % (maxHamming + 1)` must be 0
    * (maxHamming ∈ {1, 2, 3, 4, 5, 9, 11, ...}). */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    require(maxHamming >= 1 && 60 % bands == 0,
      s"60 bits must split into maxHamming + 1 = $bands equal bands")
    val width = 60 / bands
    val mask = (1L << width) - 1
    // checkpoint: the signature aggregate feeds both join sides
    val sh = TextOps.simhash(docs).localCheckpoint()
    val banded = sh
      .withColumn("band", explode(expr(s"sequence(0, ${bands - 1})")))
      .withColumn("chunk", expr(s"shiftright(simhash, band * $width) & $mask"))
    banded.select(col("band"), col("chunk"), col("doc_id").as("a"), col("simhash").as("ha"))
      .join(banded.select(col("band"), col("chunk"), col("doc_id").as("b"),
        col("simhash").as("hb")), Seq("band", "chunk"))
      .filter(col("a") < col("b"))
      .select("a", "b", "ha", "hb")
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  /** INCREMENTAL MinHash-LSH near-dup: pairs TOUCHING a new ingest
    * batch — batch↔corpus and batch↔batch, never corpus↔corpus. The
    * incremental-processing counterpart of [[minhashLsh]] (same
    * signatures, same verify), and the shape a 100 TB pipeline
    * actually runs on every ingest: the corpus side contributes its
    * PERSISTED index (`corpusIndex` from [[minhashIndex]] — shingles +
    * band signatures, built once per corpus version; recomputed from
    * `corpus` when absent) and an equi-join keyed by the batch's band
    * signatures, so per-batch work scales with the BATCH, not with
    * the corpus pair space. Semantically identical to
    * `minhashLsh(corpus ∪ batch)` filtered to batch-touching pairs
    * (asserted in scalatest; the contract oracle states it that way).
    * Returns `(a, b, jaccard)`, ordered ids. */
  /** The persisted per-corpus LSH index `(shingles, band signatures)`
    * that makes [[minhashLshIncremental]] actually incremental: build
    * (and persist — parquet, localCheckpoint, …) ONCE per corpus
    * version, pass to every ingest batch. Without it each batch pays a
    * full corpus signature recompute, which dominates the batch pass
    * (measured 81 s of 84 s at the 1M-doc probe). */
  def minhashIndex(docs: DataFrame, k: Int = 16,
                   rowsPerBand: Int = 4): (DataFrame, DataFrame) = {
    val sh = TextOps.shingleSet(docs, 5)
    (sh, TextOps.lshBands(TextOps.minhashFromShingles(sh, k), rowsPerBand))
  }

  /** Append a processed ingest batch to a persisted LSH index WITHOUT
    * recomputing the corpus side — the maintenance half of the
    * incremental-dedup story: after [[minhashLshIncremental]] admits a
    * batch, the batch's shingles and band signatures (computed ONCE
    * here, O(batch)) union into the standing index, so the NEXT ingest
    * probes corpus+batch at per-batch cost and the index never pays a
    * full rebuild. Sound because every index row is PER-DOC (shingles
    * and minhash signatures carry no corpus-global state), so
    * `append(minhashIndex(corpus), batch) ≡ minhashIndex(corpus ∪
    * batch)` relation-for-relation — asserted in scalatest. The batch
    * side is localCheckpoint'ed so the returned relations don't
    * re-derive it per downstream action; callers persisting the index
    * across jobs write the union back to parquet (or just append the
    * two batch relations — the index is a plain pair of tables). */
  def minhashIndexAppend(index: (DataFrame, DataFrame), batch: DataFrame,
                         k: Int = 16, rowsPerBand: Int = 4): (DataFrame, DataFrame) = {
    val (shC, bandsC) = index
    val shB = TextOps.shingleSet(batch, 5).localCheckpoint()
    val bandsB = TextOps.lshBands(TextOps.minhashFromShingles(shB, k), rowsPerBand)
      .localCheckpoint()
    (shC.unionByName(shB), bandsC.unionByName(bandsB))
  }

  def minhashLshIncremental(corpus: DataFrame, batch: DataFrame,
                            k: Int = 16, rowsPerBand: Int = 4,
                            corpusIndex: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val (shC, bandsC) = corpusIndex.getOrElse(minhashIndex(corpus, k, rowsPerBand))
    val shB = TextOps.shingleSet(batch, 5)
    // checkpoint the (small) batch signatures: they feed the cross join
    // AND the within-batch self-join
    val bandsB = TextOps.lshBands(TextOps.minhashFromShingles(shB, k), rowsPerBand)
      .localCheckpoint()
    val cross = bandsC.select(col("band"), col("sig"), col("doc_id").as("x"))
      .join(bandsB.select(col("band"), col("sig"), col("doc_id").as("y")), Seq("band", "sig"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
    val within = bandsB.select(col("band"), col("sig"), col("doc_id").as("a"))
      .join(bandsB.select(col("band"), col("sig"), col("doc_id").as("b")), Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select("a", "b")
    // Deliberately NOT checkpointed beyond bandsB: r16 A/Bs measured
    // both materialization variants as net losses at sf0.1 (corpus
    // shingles + bands eager: 4.3 → 5.0 s; candidate-pair relation
    // eager: 4.3 → 6.2 s) — the lazy multi-reference DAG re-computes
    // more but keeps one wide parallel job instead of serialized
    // materialize-then-consume phases. Large-corpus callers pass a
    // persisted corpusIndex and skip the corpus recompute entirely
    // (the 1M-doc probe's measured regime).
    jaccardFor(shC.unionByName(shB), cross.unionByName(within).distinct(),
      pruneSizes = true)
  }

  /** Duplicate-CLUSTER resolution: connected components over a
    * near-dup pair relation, labeling every clustered document with
    * its component's minimum doc_id (the canonical keeper a training
    * pipeline retains). Pairs only tell you edges; picking one
    * survivor per transitive group needs the components.
    *
    * Algorithm: min-label propagation with POINTER JUMPING — each
    * round first takes the min label over graph neighbors (one hash
    * equi-join + agg), then short-circuits chains with
    * `label := label(label)` (a self equi-join), so convergence is
    * O(log diameter) rounds instead of O(diameter): a 10^6-long
    * duplicate chain resolves in ~20 rounds. Every round is
    * shuffle-partitioned on id and `localCheckpoint`ed, so round k
    * never recomputes rounds 1..k−1 (the NearestJoin discipline).
    * Documents appearing in no pair are absent from the output —
    * they are their own cluster. */
  def clusters(pairs: DataFrame, maxRounds: Int = 20): DataFrame =
    clustersWithRounds(pairs, maxRounds)._1

  /** Pair-count ceiling for the exact small-graph fast path: at or
    * below this many pairs the components are resolved with a driver
    * union-find over ONE bounded collect (~16 bytes/pair ⟹ ≤ 16 MB at
    * the cap) instead of O(log diameter) driver-coordinated join
    * rounds — the measured cost of the loop at gate scale is pure job
    * latency (~25 jobs for a pair set of a few hundred rows). Same
    * guarded-collect discipline as `SlabApplier`/`NearestJoin.
    * smallPtsMax`: the bound is checked on the MATERIALIZED pair
    * relation (one count on checkpointed blocks), the distributed
    * loop remains the path for every larger input (the 25M-node probe
    * regime), and both paths are relation-identical (scalatest-pinned;
    * min-label CC is the unique component labeling either way). */
  val smallPairsMax = 1L << 20

  /** [[clusters]] plus the number of propagation/pointer-jump rounds
    * it took to converge — the observable the O(log diameter) claim
    * is checked against (PipelineScaleProbe `ccrounds` measures
    * rounds vs planted chain diameter; PLANS.md records the curve). */
  def clustersWithRounds(pairs: DataFrame, maxRounds: Int = 20,
                         smallMax: Long = smallPairsMax): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    // localCheckpoint with block-manager HYGIENE: the loop checkpoints
    // two relations per round, and without explicit release every
    // round's blocks stay resident for the whole loop — ~2·rounds·n
    // rows of dead weight that at probe scale (25M nodes, 11 rounds)
    // was enough to OOM the executors. `ckpt` reads the persisted RDD
    // id straight off the returned Dataset's LogicalRDD plan — EXACTLY
    // the blocks this checkpoint created, never an upstream `.cache()`
    // that happened to materialize during the eager checkpoint scan
    // (a getPersistentRDDs set-diff would capture and later kill such
    // a caller-owned cache) — so a round can free its predecessor the
    // moment the new checkpoint is materialized.
    def ckpt(df: DataFrame): (DataFrame, Seq[Int]) = {
      val out = df.localCheckpoint()
      val ids = out.queryExecution.logical match {
        case r: org.apache.spark.sql.execution.LogicalRDD => Seq(r.rdd.id)
        case _ => Nil   // unexpected plan shape: keep blocks, stay correct
      }
      (out, ids)
    }
    def free(ids: Seq[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    // materialize the pair input once — the symmetric edge union below
    // references it twice, and the upstream is typically a full LSH
    // pipeline that must not run twice. Ids are cast to long up front
    // (mirroring the Graphs fast paths, r16 advice #1): the small-graph
    // collect reads longs, and BOTH paths emit LongType doc_id /
    // cluster_id for any integer-typed input — previously an int-typed
    // pair relation worked above the 2^20 gate but crashed below it,
    // and the two paths disagreed on output type
    val (p, pIds) = ckpt(pairs.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b")))
    if (p.count() <= smallMax) {
      // exact small-graph path: union-find (path-halving + union by
      // min label) over the bounded pair set — one collect of two
      // longs per pair, zero join rounds, labels identical to the
      // converged loop (each node → its component's min id)
      val es = p.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = new scala.collection.mutable.LongMap[Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent(x) != x) {
          parent(x) = parent(parent(x)); x = parent(x)
        }
        x
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union by MIN root: the surviving root is always the
        // component's smallest id, so find() IS the cluster label
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val labels = parent.keys.toArray.map(id => (id, find(id)))
      free(pIds)
      import spark.implicits._
      return (sc.parallelize(labels.toIndexedSeq, math.max(1, sc.defaultParallelism min 8))
        .toDF("doc_id", "cluster_id"), 0)
    }
    val (edges, _) = ckpt(p.select(col("a").as("x"), col("b").as("y"))
      .unionByName(p.select(col("b").as("x"), col("a").as("y")))
      .distinct())
    free(pIds)   // edges is self-contained; the raw pair copy can go
    var (labels, liveIds) = ckpt(edges.select(col("x").as("id")).distinct()
      .withColumn("lbl", col("id")))
    var round = 0
    var changed = 1L
    while (round < maxRounds && changed > 0) {
      val viaEdge = edges
        .join(labels.select(col("id").as("y"), col("lbl").as("ylbl")), "y")
        .groupBy(col("x").as("id")).agg(min("ylbl").as("nlbl"))
      // checkpoint before the pointer-jump self-join — it references
      // `stepped` twice, and without materialization each round would
      // evaluate the propagation join twice. The round's PREVIOUS label
      // rides along as `old`, so convergence needs no join back against
      // the prior labels relation (that join was ~+50% of the round's
      // shuffle work): the check is a shuffle-free scan-count over the
      // already-checkpointed partitions.
      val (stepped, steppedIds) = ckpt(labels.join(viaEdge, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")))
      val (jumped, jumpedIds) = ckpt(stepped
        .join(stepped.select(col("id").as("lbl"), col("lbl").as("lbl2")), Seq("lbl"), "left")
        .select(col("id"), col("old"), coalesce(col("lbl2"), col("lbl")).as("lbl")))
      // jumped is materialized and self-contained: the previous
      // round's labels and this round's intermediate can be freed
      free(liveIds); free(steppedIds)
      liveIds = jumpedIds
      changed = jumped.filter(col("lbl") =!= col("old")).count()
      labels = jumped.select("id", "lbl")
      round += 1
    }
    // partial labels would silently keep several "canonical" docs from
    // ONE duplicate cluster — refuse to return them
    require(changed == 0,
      s"duplicate-cluster labeling did not converge in $maxRounds rounds " +
        "(component deeper than 2^maxRounds?); raise maxRounds")
    (labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id")), round)
  }

  /** Retained representative per duplicate cluster by SCORE (argmax,
    * ties → min doc_id) — what a curation pipeline actually keeps:
    * [[clusters]]' min-id label is a canonical NAME, but the doc worth
    * retaining from a near-dup group is its best one (longest, highest
    * quality classifier, …). `clusterLabels` = `(doc_id, cluster_id)`
    * from [[clusters]]; `scores` = `(doc_id, score)`. Returns one row
    * per clustered doc: `(doc_id, cluster_id, score, keep)`.
    *
    * Scale shape: one equi-join + a per-cluster window — duplicate
    * clusters are small by construction, and a pathological
    * mega-cluster arrives pre-bounded by [[minhashLsh]]'s `maxBucket`
    * star routing. */
  def keepBest(clusterLabels: DataFrame, scores: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("score").desc, col("doc_id"))
    clusterLabels.join(scores.select("doc_id", "score"), "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
  }

  /** All same-group pairs with n-gram Jaccard ≥ threshold, via the
    * inverted index restricted to a blocking column (here: `source`).
    * The blocking key keeps the shingle self-join an equi-join on
    * (s, source) — no cross product across groups.
    *
    * `maxDocFreq` (optional) drops shingles appearing in more than that
    * many documents BEFORE the self-join — the standard df-cap for
    * web-scale corpora: a boilerplate shingle shared by 10⁶ documents
    * would otherwise put 10¹² pairs in one join key (hot-shingle skew),
    * while contributing nothing discriminative. Jaccard is then over
    * the retained shingle space (both |A∩B| and the sizes). */
  def ngramJaccardBlocked(docs: DataFrame, n: Int, minJaccard: Double,
                          maxDocFreq: Option[Int] = None): DataFrame = {
    val sh0 = TextOps.shingleSet(docs, n, carry = Seq("source"))
    val sh = maxDocFreq match {
      case Some(cap) =>
        val rare = sh0.groupBy("s").agg(count("*").as("df"))
          .filter(col("df") <= cap).select("s")
        sh0.join(rare, "s")
      case None => sh0
    }
    val sizes = sh.groupBy("doc_id").agg(count("*").as("n"))
    val inter = sh.select(col("doc_id").as("a"), col("source"), col("s"))
      .join(sh.select(col("doc_id").as("b"), col("source"), col("s")), Seq("source", "s"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count("*").as("i"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .selectExpr("a", "b",
        "floor((CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9 AS jaccard")
      .filter(col("jaccard") >= minJaccard)
  }
}
