package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline._

/** LLM-pipeline scale probe — the pipeline counterpart of
  * [[ScaleProbe]] (which covers regrid only): drive the dedup /
  * clustering / ANN operators at 10³–10⁴× the contract fixtures to
  * show the bucketed equi-join plans hold their shape as the corpus
  * grows. Corpora are synthesized in-Spark (deterministic hash
  * expressions — no driver-side materialization), with planted
  * near-duplicates so recall is checkable, not just throughput.
  *
  * Sections (all run by default; pass section names to restrict):
  *  - `minhash`:  1M-doc corpus → MinHash-LSH → exact-Jaccard verify →
  *                duplicate-cluster resolution, end to end;
  *  - `clusters`: duplicate-cluster resolution alone on a synthetic
  *                10⁶-edge graph (random giant component + a 100k-long
  *                chain that exercises pointer jumping);
  *  - `ann`:      multi-probe IVF top-k at 1M × 64-dim vectors;
  *  - `banded`:   banded random-hyperplane near-dup at 300k vectors in
  *                the high-cos regime (12 bands × 16 bits);
  *  - `packing`:  greedy next-fit sequence packing at 30M docs over
  *                1024 shards, with a bin-fill capacity audit;
  *  - `decontam`: 3M train docs against a 3k-doc broadcast eval split
  *                with planted eval partners;
  *  - `kmeans`:   Lloyd's k-means at 1M × 64-dim, k=16, 3 rounds;
  *  - `spans`:    duplicate-span removal at 1M docs (200k docs carry a
  *                planted 20-token duplicated span) + the scrub pass;
  *  - `bm25`:     BM25 top-100 retrieval over 3M docs;
  *  - `shuffle`:  deterministic global shuffle order at 30M docs, with
  *                an exact permutation check (distinct ords = n);
  *  - `mix`:      temperature mixture recipe + application at 3M docs
  *                over 17 log-skewed synthetic sources, token-budget
  *                audit;
  *  - `fuzzydecontam`: MinHash band collisions of 1M train docs vs a
  *                1k-doc eval split of planted near-dups (J ≈ 0.94);
  *  - `vocab`:    top-100 vocabulary induction + per-doc OOV at 3M
  *                docs (60M token occurrences);
  *  - `pq`:       product-quantization ANN at 1M × 64-dim — m=4 × k=16
  *                codebooks, ADC top-5 for 1000 probes, planted-partner
  *                recall;
  *  - `weighted`: Efraimidis–Spirakis weighted top-10k at 30M docs
  *                (two-level exact cut) + corpus snapshot diff at 30M
  *                (narrow hash full-outer join), status-count audit;
  *  - `assign2level`: large-codebook centroid assignment at 1M × 64-dim,
  *                k = 4096 — dense O(k) scan vs the two-level
  *                (coarse-then-fine) path at g = 64 groups and probe
  *                counts {4, 8, 16}: wall time, exact-agreement
  *                fraction, and assigned-distance inflation vs dense;
  *  - `train4096`: large-k TRAINING — full Lloyd's at k = 4096 (and
  *                k = 1024 for the sublinearity pin) on 1M × 64-dim:
  *                dense rounds vs kmeansFullTwoLevel, wall/iteration,
  *                assignment recall + k-means objective ratio vs dense;
  *  - `ccrounds`: connected-components convergence curve — pointer-
  *                jumping rounds vs planted chain diameter (4→256) at
  *                100k chains each, asserting rounds ≤ log2(d) + 3
  *                and that the early exit fires far below maxRounds;
  *  - `percentiles`: X38 exact order statistics at 60M values — a
  *                50M-value modular bijection (closed-form expected
  *                value at every rank) + a 10M-row tie block at the
  *                median, 12 percentiles checked exactly;
  *  - `asof`:     X42 as-of join at 30M left × 3M right over 100k
  *                keys, closed-form expected winner per left row
  *                (zero mismatches required);
  *  - `rangejoin`: X43 interval join at 30M points × 3M intervals —
  *                the exact containment count (half the points by
  *                construction) is required;
  *  - `kmv`:      X44 KMV sketch at 100M values / 32 groups with
  *                closed-form cardinalities — estimates within the
  *                5σ band, below-k group exact;
  *  - `cm`:       X53 Count-Min at 100M values / 10M distinct with 5
  *                planted heavy hitters — state ≤ d·w counters, heavy
  *                estimates inside the one-sided CM bound, rare
  *                estimates under the noise ceiling;
  *  - `vectorkernel`: native codegen dot-product expression vs the
  *                interpreted `aggregate(zip_with(...))` HOF on
  *                cached 3M × 64-dim pairs — identical bits required,
  *                wall ratio printed;
  *  - `asofskew`: the mega-key as-of regime — ONE key, 10M left ×
  *                1M right: plain (single-task window) vs bucketed
  *                (1000-way time-split + carry-forward), closed-form
  *                winner required on both;
  *  - `annio`:    IVF-PQ index persistence at 1M × 64-dim — train,
  *                save (bucketed codes), load, and serve: load+query
  *                vs retrain+query wall, loaded top-5 bit-identical;
  *  - `funnelstream`: the streaming funnel at 1M events / 100k users
  *                through MemoryStream micro-batches — throughput,
  *                state bounded by the reached-step-1 population, and
  *                final chains row-equal to the batch funnel;
  *  - `layout`:   X64 corpus layout at 4M docs — the same selective
  *                question against an unordered pile vs a CorpusIO
  *                layout; partition pruning + footer skipping must
  *                show in the files-read METRIC, answers identical;
  *  - `zorder`:   X65 z-order at 4M rows — x-only and y-only range
  *                questions over pile / sort-on-x / z-order layouts;
  *                the sort must fail the off-key question, the
  *                z-curve must serve both (numOutputRows), answers
  *                identical across all three.
  *
  * Each probe's physical plan is scanned for
  * BroadcastNestedLoopJoin/CartesianProduct — any hit fails the probe
  * loudly (exit 1), the same standard [[PlanAudit]] applies to the
  * contract queries.
  *
  * Not part of Bench (keeps BENCH totals comparable round to round);
  * run manually: SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.PipelineScaleProbe"
  */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    val sections = if (args.isEmpty)
                     Set("minhash", "clusters", "ann", "banded", "packing", "decontam",
                       "kmeans", "spans", "bm25", "shuffle", "mix", "fuzzydecontam",
                       "vocab", "pq", "weighted", "hotbucket", "incremental",
                       "simhash", "assign2level", "train4096", "ccrounds",
                       "percentiles", "asof", "rangejoin", "kmv", "cm",
                       "vectorkernel", "asofskew", "graphs10x", "bpefold",
                       "hll100m", "robuststats", "annio", "funnelstream",
                       "rolling", "phrase", "rollingstream", "layout",
                       "zorder", "auceval", "annfiltered")
                   else args.toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var planFailures = 0
    def auditPlan(tag: String, df: DataFrame): Unit =
      if (PlanScan.badJoinCount(df) > 0) {
        planFailures += 1; println(s"$tag  <-- BNLJ/CARTESIAN IN PLAN")
      }
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // scan-metric walk for the storage-layout sections: file scans
    // hide inside AQE QueryStageExec LEAVES — a naive children
    // traversal finds zero scans and silently reports 0
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec => fileScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case o => o.children.flatMap(fileScans)
    }
    def scanMetric(df: DataFrame, metric: String): Long =
      fileScans(df.queryExecution.executedPlan).map(_.metrics(metric).value).sum

    // ---- synthetic corpora (hash-derived, fully distributed) ----

    /** nDocs documents of 20 vocab-1000 tokens; ids ≡ 0 (mod 10) get a
      * near-dup partner at id+1 (same 20 tokens + one appended →
      * 5-gram Jaccard 16/17 ≈ 0.94). */
    def corpus(nDocs: Long): DataFrame =
      spark.range(nDocs)
        .withColumn("gid", when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id")))
        .selectExpr("id AS doc_id",
          """concat(
               array_join(transform(sequence(0, 19),
                 t -> concat('w', pmod(hash(gid, t), 1000))), ' '),
               CASE WHEN id % 10 = 1 THEN ' dupmarker' ELSE '' END) AS text""",
          "'syn' AS source")

    /** CLUSTERED corpus (what a real embedding table looks like, and
      * the only regime where a learned IVF means anything): each
      * vector = its seed vector (hash-derived, one of `kSeeds`) + 0.15
      * noise. Uniform random vectors are the adversarial case for
      * coarse pruning — distance concentration makes every cell
      * boundary arbitrary — and a uniform probe measured exactly that
      * (36% agreement at p=4); clustered data is the honest workload. */
    def seedExpr(idCol: String) =
      s"transform(sequence(0, 63), j -> CAST(hash($idCol, j, 3) AS DOUBLE) / 2.147483647e9)"
    def clusteredVectors(nVecs: Long, kSeeds: Int): DataFrame =
      spark.range(nVecs)
        // BIGINT seed: Spark's hash() is type-dependent, an INT seed
        // would hash differently than the codebook's BIGINT range ids
        .withColumn("seed", pmod(hash(col("id"), lit(1)), lit(kSeeds)).cast("long"))
        .selectExpr("id AS vec_id",
          s"""zip_with(${seedExpr("seed")},
                transform(sequence(0, 63), j -> CAST(hash(id, j, 5) AS DOUBLE) / 2.147483647e9),
                (s, n) -> CAST(s + 0.15e0 * n AS FLOAT)) AS embedding""")

    /** nVecs 64-dim vectors, uniform(-1,1) per component; ids ≡ 0
      * (mod 20) get a planted partner at id+1 (component noise 0.1 →
      * cos ≈ 0.99). */
    def vectors(nVecs: Long): DataFrame =
      spark.range(nVecs)
        .withColumn("gid", when(col("id") % 20 === 1, col("id") - 1).otherwise(col("id")))
        .selectExpr("id AS vec_id",
          """transform(sequence(0, 63), j -> CAST(
               CAST(hash(gid, j) AS DOUBLE) / 2.147483647e9 +
               CASE WHEN id % 20 = 1
                    THEN 0.1e0 * CAST(hash(id, j, 7) AS DOUBLE) / 2.147483647e9
                    ELSE 0.0e0 END AS FLOAT)) AS embedding""")

    if (sections("minhash")) {
      val docs = corpus(1000000L)
      // persistShingles: at 1M docs the shingle chain dominates and is
      // referenced 5x per action — materialize once. The checkpoint is
      // EAGER, so minhashLsh is constructed INSIDE the timed block to
      // keep the wall comparable with the recomputing-era readings.
      var pairs: DataFrame = null
      var found = 0L
      time("minhash-LSH near-dup, 1M docs (100k planted)") {
        pairs = Dedup.minhashLsh(docs, persistShingles = true)
          .filter(col("jaccard") >= 0.5)
        found = pairs.filter(col("b") === col("a") + 1 && col("a") % 10 === 0).count()
        pairs.count()
      }
      auditPlan("minhash-lsh 1M docs", pairs)
      println(s"  planted-pair recall: $found/100000")
      require(found >= 99000L, s"minhash planted recall $found/100000")
      time("  + duplicate-cluster resolution") {
        Dedup.clusters(pairs, maxRounds = 25).count()
      }
    }

    if (sections("hotbucket")) {
      // mass-templated near-dups — the hot-bucket failure mode exact
      // dedup can't remove (same boilerplate page, distinct timestamp):
      // 10k docs share one 20-token template plus a unique trailing
      // token. Per band, ~94% of each doc's 4 minhashes come from the
      // 16 SHARED shingles, so most of the 10k land in ONE (band, sig)
      // bucket in EVERY band; uncapped LSH would put ~n²/2 candidate
      // pairs per band into that join key. maxBucket=64 routes the
      // oversized buckets to a star on the bucket min — O(n) pairs,
      // same connected component.
      val base = corpus(300000L)
      val template = spark.range(10000L)
        .selectExpr("id + 2000000 AS doc_id",
          """concat(array_join(transform(sequence(0, 19),
               t -> concat('tpl', t)), ' '), ' ts', id) AS text""",
          "'syn' AS source")
      val docs = base.unionByName(template)
      // bucket census: the candidate volume the cap prevents
      val implied = TextOps.lshBands(TextOps.minhashFromShingles(
          TextOps.shingleSet(docs, 5), 16), 4)
        .groupBy("band", "sig").agg(count(lit(1)).as("n"))
        .agg(sum(expr("CAST(n * (n - 1) / 2 AS BIGINT)"))).head().getLong(0)
      println(f"  uncapped candidate-pair volume (sum over buckets): $implied%,d")
      val pairs = Dedup.minhashLsh(docs, maxBucket = Some(64))
        .filter(col("jaccard") >= 0.5).localCheckpoint()
      auditPlan("hot-bucket-capped LSH 310k docs", pairs)
      var tpl = 0L
      time("minhash-LSH w/ hot-bucket cap, 300k + 10k templated") {
        tpl = pairs.filter(col("a") >= 2000000L).count()
        pairs.count()
      }
      println(s"  template-doc pairs emitted: $tpl (star-bounded; clique would be ~5e7)")
      // ~0.2% of template docs deviate from the hot signature in every
      // band ((1 - (16/17)^4)^4 ≈ 0.002) and land in singleton buckets
      // — UNCAPPED LSH misses those identically, so the cap costs no
      // recall; the bound is the star shape, not perfect coverage
      require(tpl >= 9900L && tpl <= 50000L,
        s"template pairs $tpl outside star-routing bounds [9900, 50000]")
      // the star preserves the semantics that matter: every template
      // doc that collides at all resolves to ONE duplicate cluster
      time("  + cluster resolution over capped pairs") {
        val comp = Dedup.clusters(pairs, maxRounds = 25)
          .filter(col("doc_id") >= 2000000L)
        val (nDocs, nComps) = (comp.count(),
          comp.select("cluster_id").distinct().count())
        require(nDocs >= 9900L && nComps == 1L,
          s"template component broken: $nDocs docs in $nComps clusters")
        nDocs
      }
      // normal buckets are untouched by the cap: planted base-corpus
      // near-dup recall unchanged
      val found = pairs.filter(col("b") === col("a") + 1 &&
        col("a") % 10 === 0 && col("a") < 2000000L).count()
      println(s"  base planted-pair recall: $found/30000")
      require(found >= 29700L, s"capped-run base recall $found/30000")
    }

    if (sections("incremental")) {
      // the ingest-time shape: 10k new docs against a 1M standing
      // corpus. The corpus INDEX (shingles + band signatures) is built
      // once per corpus version — timed separately below — and every
      // batch then pays only its own signatures + the index equi-join;
      // corpus↔corpus pairs never form. Compare the `minhash` section:
      // the FULL pass over the same 1M docs pays the whole pair space
      // (and the signature scan) every run.
      val all = corpus(1000000L)
      val isBatch = "doc_id % 10 = 1 AND doc_id < 100000"
      val corp = all.filter(s"NOT ($isBatch)")
      var index: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = null
      time("one-time corpus LSH index (shingles + bands), 1M docs") {
        val (sh, bands) = Dedup.minhashIndex(corp)
        index = (sh.localCheckpoint(), bands.localCheckpoint())
        index._2.count()
      }
      val pairs = Dedup.minhashLshIncremental(corp, all.filter(isBatch),
          corpusIndex = Some(index))
        .filter(col("jaccard") >= 0.5)
      auditPlan("incremental LSH 1M corpus + 10k batch", pairs)
      var found = 0L
      time("per-batch incremental near-dup, 10k docs vs indexed 1M") {
        found = pairs.filter(col("b") === col("a") + 1 && col("a") % 10 === 0).count()
        pairs.count()
      }
      println(s"  planted batch-partner recall: $found/10000")
      require(found >= 9900L, s"incremental planted recall $found/10000")
      // index MAINTENANCE: after the batch is admitted, its signatures
      // union into the standing index at O(batch) cost — the next
      // ingest probes corpus+batch without any corpus-side recompute.
      // (The one-time index build above is the rebuild this avoids:
      // measured 163.7 s rebuild vs 2.2 s append at this probe.)
      time("  + index append (10k batch into the 1M index)") {
        // minhashIndexAppend eagerly checkpoints the batch relations —
        // the append cost happens inside the call; the count reads the
        // appended batch rows back through the unioned index
        val (_, bands2) = Dedup.minhashIndexAppend(index, all.filter(isBatch))
        bands2.filter(expr(isBatch)).count()
      }
    }

    if (sections("simhash")) {
      // pigeonhole Hamming join at 1M docs: 4 chunk equi-joins over
      // ~2^15 near-uniform buckets (sign bits of independent hash
      // votes), candidates verified by one bit_count(xor). The planted
      // partner (one appended token in 21) flips a doc-dependent
      // number of sign bits, so the section reports the Hamming
      // histogram of planted pairs rather than asserting a recall that
      // is not a property of SimHash at this doc length.
      val docs = corpus(1000000L)
      val nd = Dedup.simhashNearDup(docs, 3)
      auditPlan("simhash Hamming<=3 join 1M docs", nd)
      var planted = 0L
      time("simhash Hamming<=3 near-dup join, 1M docs") {
        planted = nd.filter(col("b") === col("a") + 1 && col("a") % 10 === 0).count()
        nd.count()
      }
      println(s"  planted partners within Hamming 3: $planted/100000")
      // measured at authoring: 28,009 planted pairs — and the output
      // contained ONLY planted pairs (zero of the ~5·10¹¹ random pairs
      // land within Hamming 3 of each other: the 60-bit signature is
      // that selective at 1M docs)
      require(planted >= 25000L, s"planted-within-3 count $planted below floor")
    }

    if (sections("clusters")) {
      // 900k random edges over 450k nodes (giant component, short
      // diameter) + a 100 001-node chain (ids offset by 10^7): the
      // chain collapses only via pointer jumping (log2(1e5) ≈ 17)
      val rand = spark.range(900000L)
        .selectExpr("pmod(hash(id, 1), 450000) AS a", "pmod(hash(id, 2), 450000) AS b")
        .filter(col("a") =!= col("b"))
      val chain = spark.range(100000L)
        .selectExpr("id + 10000000 AS a", "id + 10000001 AS b")
      val edges = rand.unionByName(chain)
      time("clusters on 10^6-edge synthetic graph") {
        val lbl = Dedup.clusters(edges, maxRounds = 25)
        // the chain must have fully collapsed to its min id
        val chainOk = lbl.filter(col("doc_id") >= 10000000L)
          .filter(col("cluster_id") =!= 10000000L).count()
        require(chainOk == 0, s"$chainOk chain nodes not collapsed")
        lbl.count()
      }
    }
    if (sections("ccrounds")) {
      // CC convergence curve (r7 verdict #6): pointer-jumping rounds
      // vs PLANTED component diameter, at a CONSTANT 6.4M nodes per
      // trial (~100× the heaviest contract graph) so diameter is the
      // only variable — chains of length L, 6.4M/L of them, where the
      // worst-case min-label distance is exactly the diameter L−1.
      // Expected rounds ≈ log2(diameter) + O(1): each round is one
      // neighbor propagation THEN one label(label) jump, so label
      // pointers at least double their reach per round. The early-exit
      // contract — the loop stops on the first changed = 0 round,
      // never running to maxRounds on a converged labeling — is
      // asserted as rounds ≤ log2(d) + 3 ≪ maxRounds.
      Seq(4, 16, 64, 256).foreach { len =>
        val nChains = 6400000L / len
        val edges = spark.range(nChains * (len - 1))
          // chain c occupies ids [c·len, (c+1)·len): link i → i+1
          .selectExpr(s"(id DIV ${len - 1}) * $len + (id % ${len - 1}) AS a",
            s"(id DIV ${len - 1}) * $len + (id % ${len - 1}) + 1 AS b")
        var rounds = -1
        time(f"ccrounds chains len=$len%-4d (diam ${len - 1})") {
          val (lbl, r) = Dedup.clustersWithRounds(edges, maxRounds = 25)
          rounds = r
          // every node must carry its chain's min id
          val bad = lbl.filter(col("cluster_id") =!= (col("doc_id").cast("long") / len).cast("long") * len)
            .count()
          require(bad == 0, s"$bad nodes mislabeled at len=$len")
          lbl.count()
        }
        val bound = (math.log(len - 1) / math.log(2)).ceil.toInt + 3
        println(f"  ccrounds len=$len%-4d rounds=$rounds (log2-bound $bound, maxRounds 25)")
        require(rounds <= bound,
          s"pointer jumping took $rounds rounds for diameter ${len - 1} (bound $bound)")
      }
    }

    if (sections("ann")) {
      val emb = vectors(1000000L)
      val ann = Similarity.ivfTopK(emb, "vec_id % 1000 = 0", 5, bits = 8,
        hammingProbes = true)
      auditPlan("multi-probe IVF 1M vectors", ann)
      time("multi-probe IVF top-5, 1M x 64-dim, 1000 probes") {
        ann.count()
      }
    }

    if (sections("annfiltered")) {
      // X67 filtered search at 1M vectors: the 10%-selective predicate
      // (label = id mod 10 = 3) lands on the index side BEFORE the
      // bucket join, so candidate volume — and wall — shrinks with
      // selectivity instead of post-filtering an over-provisioned k.
      // Correctness at scale: on 50 sampled queries the filtered IVF
      // result must be a SUBSET of the brute-force-filtered pair set
      // with identical cosines, and every served neighbor satisfies
      // the predicate.
      val embF = vectors(1000000L)
        .withColumn("label", pmod(col("vec_id"), lit(10)).cast("int"))
      val unf = Similarity.ivfTopK(embF, "vec_id % 1000 = 0", 5, bits = 8,
        hammingProbes = true)
      val fil = Similarity.ivfTopK(embF, "vec_id % 1000 = 0", 5, bits = 8,
        hammingProbes = true, indexFilter = "label = 3")
      auditPlan("filtered multi-probe IVF 1M vectors", fil)
      time("UNFILTERED multi-probe IVF top-5, 1M x 64-dim, 1000 probes") {
        unf.count()
      }
      time("filtered (10% selective) multi-probe IVF, same probes") {
        val rows = fil.select("query_id", "neighbor_id").collect()
        require(rows.forall(_.getLong(1) % 10 == 3),
          "a served neighbor violates the index predicate")
        rows.length.toLong
      }
      time("subset check: 50 sampled queries vs brute-filtered truth") {
        // DISTRIBUTED containment: the ~5M brute pairs never reach the
        // driver — the ≤ 250 sampled IVF rows broadcast into an
        // equi-join on (query, neighbor, cos) and the match count must
        // equal the sample count (pair present AND cosine identical)
        // cached: both the count and the containment join read the
        // ≤ 250-row sample — without it each action re-runs the full
        // 1M-vector bucket join
        val sample = Similarity.ivfTopK(embF, "vec_id % 20000 = 0", 5,
            bits = 8, hammingProbes = true, indexFilter = "label = 3")
          .select("query_id", "neighbor_id", "cos").cache()
        val brute = Similarity.bruteTopK(embF, "vec_id % 20000 = 0",
            1000000, indexFilter = "label = 3")
          .select("query_id", "neighbor_id", "cos")
        val n = sample.count()
        val matched = broadcast(sample)
          .join(brute, Seq("query_id", "neighbor_id", "cos")).count()
        sample.unpersist()
        require(matched == n,
          s"only $matched of $n filtered IVF pairs present (pair + cosine) in brute-filtered truth")
        n
      }
    }

    if (sections("banded")) {
      val emb = vectors(300000L)
      // high-cos regime config: 12 bands x 16 bits — random pairs
      // collide at 0.5^16 per band, planted cos~0.99 pairs at ~0.85
      val banded = Similarity.nearDupPairsBanded(emb, 0.9, bands = 12,
        rowsPerBand = 16)
      auditPlan("banded near-dup 300k vectors", banded)
      var found = 0L
      time("banded hyperplane near-dup, 300k x 64-dim (15k planted)") {
        found = banded.filter(col("b") === col("a") + 1 && col("a") % 20 === 0).count()
        banded.count()
      }
      println(s"  planted-pair recall: $found/15000")
      require(found >= 13500L, s"banded planted recall $found/15000")
    }

    if (sections("kmeans")) {
      // 1M × 64-dim, k=16, 3 Lloyd rounds: assignment is a stateless
      // broadcast map; each update shuffles only partitions × k dense
      // accumulators — the corpus itself never moves
      val emb = vectors(1000000L)
      time("k-means 1M x 64-dim, k=16, 3 iterations") {
        Clustering.kmeans(emb, 16, 3).count()
      }
    }

    if (sections("packing")) {
      // 30M docs over 1024 shards — parallelism comes from the shard
      // count, not doc count; n_tok provided directly (packGreedy's
      // fast path), mimicking a pipeline where token counts are a
      // materialized upstream column
      val docs30m = spark.range(30000000L)
        .selectExpr("id AS doc_id", "20L + pmod(hash(id, 3), 200) AS n_tok")
      val packed = Packing.packGreedy(docs30m, 2048L, 1024)
      auditPlan("greedy packing 30M docs", packed)
      time("greedy next-fit packing, 30M docs, 1024 shards") {
        packed.count()
      }
      // capacity invariant holds at scale (no oversize docs planted:
      // every bin fill must be <= capacity)
      time("  + bin-fill audit (max fill over all bins)") {
        val over = packed.groupBy("shard", "bin_id")
          .agg(sum("n_tok").as("fill"))
          .filter(col("fill") > 2048L).count()
        require(over == 0L, s"$over bins overfilled")
        over
      }
    }

    if (sections("decontam")) {
      // 3M train docs vs a 3k-doc eval split whose members are planted
      // near-dups of train docs (ids ≡ 1 mod 10 share 16 of 17
      // 5-shingles with id−1) — eval shingles broadcast, train side
      // scanned once, never shuffled before the match
      val all = corpus(3000000L)
      val evalDocs = all.filter("doc_id % 10 = 1 AND doc_id % 1000 = 1")
      val train = all.filter("doc_id % 10 != 1")
      val contaminated = Decontam.contamination(train, evalDocs, 5)
      auditPlan("decontam 3M train vs 3k eval", contaminated)
      var hit = 0L
      time("decontamination, 3M train docs vs 3k eval docs") {
        hit = contaminated.filter(col("doc_id") % 1000 === 0).count()
        contaminated.count()
      }
      println(s"  planted-partner detection: $hit/3000")
      require(hit >= 2970L, s"decontam planted detection $hit/3000")
    }

    if (sections("spans")) {
      // every planted pair shares its 20 gid-derived tokens, so both
      // members carry one merged duplicated span covering tokens 0..19
      // (the partner's trailing ' dupmarker' shingles stay unique);
      // random 5-gram collisions at vocab 1000 are negligible
      val docs = corpus(1000000L)
      val spans = Spans.duplicateSpans(docs, 5)
      auditPlan("duplicate spans 1M docs", spans)
      var full = 0L
      time("duplicate-span removal, 1M docs (200k planted spans)") {
        full = spans.filter(col("tok_start") === 0 && col("tok_end") === 19).count()
        spans.count()
      }
      println(s"  full planted spans found: $full/200000")
      require(full >= 199000L, s"planted span recovery $full/200000")
      val scrubbed = Spans.scrub(docs, 5)
      auditPlan("span scrub 1M docs", scrubbed)
      time("  + scrub pass (unique remainder per doc)") {
        // planted docs keep only 'dupmarker' (partner) or nothing (base)
        val kept = scrubbed.agg(sum("n_removed")).head().getLong(0)
        require(kept >= 199000L * 20, s"scrub removed only $kept tokens")
        scrubbed.count()
      }
    }

    if (sections("bm25")) {
      val docs = corpus(3000000L)
      val top = Search.bm25TopK(docs, Seq("w1", "w17", "w303"), 100)
      auditPlan("bm25 top-100 3M docs", top)
      time("BM25 top-100, 3M docs, 3 query terms") {
        val n = top.count()
        require(n == 100L, s"expected 100 rows, got $n")
        n
      }
    }

    if (sections("shuffle")) {
      // 30M docs — the two-level rank's exchange is on the 100 range
      // buckets; the permutation check is exact (distinct ords = n)
      val docs30m = spark.range(30000000L).selectExpr("id AS doc_id")
      val ord = Sampling.shuffleOrder(docs30m, "probe", 100)
      auditPlan("shuffle order 30M docs", ord)
      time("global shuffle order, 30M docs, 100 buckets") {
        val st = ord.agg(countDistinct("ord").as("d"),
          min("ord").as("lo"), max("ord").as("hi")).head()
        require(st.getLong(0) == 30000000L && st.getLong(1) == 0L &&
          st.getLong(2) == 29999999L,
          s"not a permutation: distinct=${st.getLong(0)} range=[${st.getLong(1)},${st.getLong(2)}]")
        st.getLong(0)
      }
    }

    if (sections("percentiles")) {
      // X38 exact percentiles at 60M values: a 50M-value bijection
      // (id·1000003 mod 5·10⁷ — the multiplier is prime and coprime
      // to the modulus, so the sorted values are EXACTLY 0..5·10⁷−1)
      // plus a 10M-row tie block at the median value, so every order
      // statistic has a closed-form expected value and the hot tie
      // exercises the map-side combine the per-distinct-value second
      // pass was chosen for (a within-bucket row_number sort would
      // put all 10M tie rows in one sort group). Not auditPlan'd: the
      // operator's ≤4 BNLJs are the documented-benign bounded sides
      // (PlanAudit scaladoc) — the count is pinned here instead.
      val n = 50000000L; val hot = 10000000L; val mid = n / 2
      val vals = spark.range(n + hot).selectExpr("id AS doc_id",
        s"CASE WHEN id < ${n}L THEN pmod(id * 1000003L, ${n}L) ELSE ${mid}L END AS v")
      val pcts = Seq(1, 5, 10, 25, 42, 50, 58, 75, 90, 95, 99, 100)
      val q = Sampling.exactPercentiles(vals, "v", pcts, bucketWidth = 65536)
      require(PlanScan.badJoinCount(q) <= 4,
        s"unexpected BNLJ growth in exactPercentiles plan: ${PlanScan.badJoinCount(q)}")
      time(s"exact percentiles, 60M values (10M-row tie), ${pcts.size} ranks") {
        val got = q.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        got.foreach { case (p, rk, v) =>
          val wantRk = (p.toLong * (n + hot) + 99) / 100
          val wantV = if (wantRk <= mid) wantRk - 1
                      else if (wantRk <= mid + hot + 1) mid
                      else wantRk - hot - 1
          require(rk == wantRk && v == wantV,
            s"pct $p: got (rank=$rk, value=$v) want (rank=$wantRk, value=$wantV)")
        }
        require(got.map(_._1).toSeq == pcts.sorted,
          s"missing percentile rows: ${got.map(_._1).mkString(",")}")
        got.length.toLong
      }
    }

    if (sections("mix")) {
      // 3M docs over 17 sources (s0..s16) of wildly different sizes
      // (source j holds ~2^j/2^16 of the corpus) — the τ=0.5 recipe
      // must spend the token budget and up-weight the small sources
      val docs3m = corpus(3000000L)
        .withColumn("source", expr("concat('s', CAST(floor(log2(1 + pmod(hash(doc_id, 9), 65536))) AS INT))"))
      val rates = Sampling.temperatureMixRates(docs3m, 250)
      auditPlan("mix rates 3M docs", rates)
      time("temperature mix recipe, 3M docs, 17 sources") {
        rates.count()
      }
      val sampled = Sampling.temperatureMixSample(docs3m, 250, "probe")
      auditPlan("mix apply 3M docs", sampled)
      time("  + applied sample (scan-stage filter)") {
        val kept = sampled.selectExpr(s"sum(size(${TextOps.tokensExpr}))")
          .head().getLong(0)
        val tot = docs3m.selectExpr(s"sum(size(${TextOps.tokensExpr}))")
          .head().getLong(0)
        val frac = kept.toDouble / tot
        require(frac > 0.2 && frac < 0.3, s"budget spend off: $frac vs 0.25")
        kept
      }
    }

    if (sections("fuzzydecontam")) {
      // same corpus/eval split as `decontam`, but 1M docs and the
      // signature-level near-dup detector: planted partners have
      // J ≈ 16/17, so ≥1 of the 4 bands collides for ~99.8% of them
      val all = corpus(1000000L)
      val evalDocs = all.filter("doc_id % 10 = 1 AND doc_id % 1000 = 1")
      val train = all.filter("doc_id % 10 != 1")
      val fuzzy = Decontam.fuzzyContamination(train, evalDocs)
      auditPlan("fuzzy decontam 1M train vs 1k eval", fuzzy)
      var hit = 0L
      time("fuzzy decontamination, 1M train docs, banded signatures") {
        hit = fuzzy.filter(col("doc_id") % 1000 === 0).count()
        fuzzy.count()
      }
      println(s"  planted near-dup partners flagged: $hit/1000")
      require(hit >= 980L, s"fuzzy planted detection $hit/1000")
    }

    if (sections("vocab")) {
      // 60M token occurrences → top-100 vocabulary → per-doc OOV; at
      // vocab 1000 uniform the expected OOV rate is ≈ 0.9
      val docs3m = corpus(3000000L)
      val vocab = TextOps.vocabTopV(docs3m, 100)
      auditPlan("vocab top-100 3M docs", vocab)
      time("vocabulary induction top-100, 3M docs (60M tokens)") {
        vocab.count()
      }
      val oov = TextOps.oovStats(docs3m, vocab)
      auditPlan("oov stats 3M docs", oov)
      time("  + per-doc OOV stats vs broadcast vocab") {
        val mean = oov.agg(avg("oov_rate")).head().getDouble(0)
        require(mean > 0.8 && mean < 0.95, s"OOV mean off: $mean")
        oov.count()
      }
    }

    if (sections("pq")) {
      // IVF-PQ at 1M × 64-dim: 64 coarse cells bound each query's ADC
      // scan to ~1/64 of the corpus; m=4 × k=16 codebooks (65536
      // combos) discriminate within the cell. The planted cos≈0.99
      // partner is recalled when it lands in the query's coarse cell
      // AND shares its codes — the standard nprobe=1 recall trade.
      val emb = vectors(1000000L)
      val top = Clustering.pqTopK(emb, "vec_id % 1000 = 0", 5, 4, 16, 2,
        coarseCells = 64)
      auditPlan("IVF-PQ top-5 1M vectors", top)
      var hit = 0L
      time("IVF-PQ (64 cells, m=4, k=16) top-5, 1M x 64-dim, 1000 probes") {
        hit = top.filter(col("neighbor_id") === col("query_id") + 1).count()
        top.count()
      }
      println(s"  planted-partner recall in top-5: $hit/1000")
      require(hit >= 750L, s"IVF-PQ planted recall $hit/1000 (793 at probe authoring)")
    }

    if (sections("annio")) {
      // index persistence (AnnIO): train the 1M-vector IVF-PQ index
      // once, persist it (bucketed code relation), and serve from the
      // LOADED index — load+query must dodge the m+1 Lloyd training
      // chains, and the loaded results must be bit-identical to the
      // trained index's.
      val emb = vectors(1000000L)
      // stale table/location cleanup is AnnIO.save's job (a previous
      // JVM's warehouse directory survives the in-memory catalog) —
      // but a COMPLETE previous probe index whose temp dir still
      // exists holds a live ownership seal on its table name (r11),
      // so each probe run claims a fresh name tied to its own dir
      val dir = java.nio.file.Files.createTempDirectory("annio_probe").toString
      val probeTable = s"annio_probe_codes_${math.abs(dir.hashCode.toLong)}"
      var idx: Clustering.PqIndex = null
      time("IVF-PQ TRAIN (64 cells, m=4, k=16), 1M x 64-dim") {
        idx = Clustering.trainPqIndex(emb, 4, 16, 2, coarseCells = 64)
        idx.codes.count()
      }
      time("  + save index (codes bucketed on cell, 16 buckets)") {
        AnnIO.save(idx, s"$dir/idx", probeTable); 1L
      }
      val qTrained = Clustering.pqQueryTopK(idx, emb, "vec_id % 1000 = 0", 5)
      time("  query from trained index, 1000 probes") { qTrained.count() }
      var loaded: Clustering.PqIndex = null
      time("  LOAD index (reuse path, no Lloyd)") {
        loaded = AnnIO.load(spark, s"$dir/idx"); 1L
      }
      val qLoaded = Clustering.pqQueryTopK(loaded, emb, "vec_id % 1000 = 0", 5)
      auditPlan("IVF-PQ query from loaded index", qLoaded)
      time("  query from LOADED index, 1000 probes") { qLoaded.count() }
      val drift = qLoaded.exceptAll(qTrained).count() + qTrained.exceptAll(qLoaded).count()
      require(drift == 0L, s"loaded-index results drifted from trained: $drift rows")
      println("  loaded-index top-5 bit-identical to trained: OK")

      // ROLLOVER at scale (r12 verdict #7): refresh the coarse model
      // on a 1% ingest batch and promote to a new serving index. The
      // pass must be O(index), never O(corpus): one broadcast
      // re-assignment over the embeddings, one vec_id equi-join
      // against the (bucketed) code relation, a localCheckpoint of the
      // re-celled codes (1M × (vec_id, cell, m codes) — the only
      // materialized footprint), save v2 meta-last, retire v1 LAST.
      // Compare its wall to the TRAIN + save legs above: rollover
      // should sit well under training (no Lloyd chains) and in the
      // same band as the fresh save it wraps.
      val dir2 = java.nio.file.Files.createTempDirectory("annio_probe_v2").toString
      val rollTable = s"annio_probe_codes2_${math.abs(dir2.hashCode.toLong)}"
      var v2: Clustering.PqIndex = null
      time("  ROLLOVER: refresh coarse (1% batch) + re-cell 1M + save v2 + retire v1") {
        val refreshed = Clustering.refreshCentroids(
          loaded.coarse.get, emb.filter("vec_id % 100 = 0"),
          priorWeight = 1000000L / 64)
        v2 = AnnIO.rollover(spark, s"$dir/idx", emb, refreshed,
          s"$dir2/idx", rollTable)
        1L
      }
      require(!AnnIO.exists(spark, s"$dir/idx"),
        "v1 must be retired once v2 serves")
      val qV2 = Clustering.pqQueryTopK(v2, emb, "vec_id % 1000 = 0", 5)
      auditPlan("IVF-PQ query from rolled-over index", qV2)
      time("  query from ROLLED-OVER index, 1000 probes") { qV2.count() }
      AnnIO.retire(spark, s"$dir2/idx") // pre-run inventory restored
    }

    if (sections("weighted")) {
      // 30M docs with hash-derived weights — the exactly-10k weighted
      // draw survives on the two-level cut (no global sort window)
      val docs30m = spark.range(30000000L)
        .selectExpr("id AS doc_id", "CAST(20 + pmod(hash(id, 5), 200) AS DOUBLE) AS wt")
      val top = Sampling.weightedTopK(docs30m, "wt", 10000, "probe")
      auditPlan("weighted top-10k 30M docs", top)
      time("weighted sample (E-S keys) top-10k, 30M docs") {
        val n = top.count()
        require(n == 10000L, s"expected 10000 rows, got $n")
        n
      }
      // snapshot diff at the same scale: 1/13 removed, 1/7 changed,
      // 1000 added — narrow (id, hash) sides, one full-outer equi-join
      val v1 = spark.range(30000000L)
        .selectExpr("id AS doc_id", "concat('doc ', CAST(hash(id, 11) AS STRING)) AS text")
      val v2 = v1.filter("doc_id % 13 != 0")
        .selectExpr("doc_id",
          "IF(doc_id % 7 = 0, concat(text, ' v2'), text) AS text")
        .unionByName(v1.filter("doc_id < 1000")
          .selectExpr("doc_id + 100000000 AS doc_id", "text"))
      val diff = Dedup.corpusDiff(v1, v2)
      auditPlan("corpus diff 30M docs", diff)
      time("  + corpus diff, 30M-doc snapshots") {
        val counts = diff.groupBy("status").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        require(counts("added") == 1000L &&
          counts("removed") == 30000000L / 13 + 1,
          s"diff counts off: $counts")
        counts.values.sum
      }
    }

    if (sections("assign2level")) {
      // large-codebook assignment: 1M × 64-dim vectors against k = 4096
      // centroids (the learned-IVF cell count a 100 TB corpus wants —
      // the trained-codebook sizes where the dense O(k·dim)/vector scan
      // stops being free). Codebook = the first 4096 corpus vectors in
      // quantized space (assignment COST does not depend on codebook
      // quality; Lloyd-TRAINING 4096 cells is probed in `train4096`).
      // Dense scan vs two-level at g = 64 = √k coarse groups:
      // g + p·k/g = 64 + p·64 evaluations per vector instead of 4096
      // (16× less arithmetic at p = 4). Corpus: clusteredVectors (the
      // honest workload — see its doc); codebook = the 4096 exact seeds.
      import spark.implicits._
      val emb1m = clusteredVectors(1000000L, 4096)
      val cents: Array[(Int, Array[Double])] =
        Clustering.quantized(
          spark.range(4096L).selectExpr("id AS vec_id", s"transform(${seedExpr("id")}, x -> CAST(x AS FLOAT)) AS embedding"),
          64)
          .as[(Long, Array[Double])].collect()
          .sortBy(_._1).zipWithIndex.map { case ((_, v), i) => (i, v) }
      val dense = Clustering.assignToCentroids(emb1m, cents).localCheckpoint()
      auditPlan("dense assignment 1M x 4096", dense)
      time("dense centroid assignment, 1M vecs, k=4096") { dense.count() }
      for (p <- Seq(4, 8, 16)) {
        val two = Clustering.assignToCentroids(emb1m, cents,
          coarseGroups = 64, coarseProbes = p).localCheckpoint()
        if (p == 4) auditPlan("two-level assignment 1M x 4096", two)
        time(f"two-level assignment, g=64 p=$p%-2d") { two.count() }
        val j = dense.select(col("vec_id"), col("cluster").as("cd"), col("dist2").as("dd"))
          .join(two.select(col("vec_id"), col("cluster").as("ct"), col("dist2").as("dt")), "vec_id")
        // the 4096 codebook-member vectors have dense dist2 = 0 (they
        // ARE centroids) — excluded from the ratio, covered by `agree`
        val st = j.selectExpr("avg(IF(cd = ct, 1.0e0, 0.0e0)) AS agree",
          "avg(IF(dd = 0.0e0, CAST(NULL AS DOUBLE), dt / dd)) AS dratio").head()
        println(f"  p=$p%-2d exact-agreement=${st.getDouble(0)}%.4f  mean dist2 ratio=${st.getDouble(1)}%.6f")
        // parity contract: the probed set's best is bit-identical to
        // dense wherever the true cell's group is probed; quality loss
        // where it isn't stays marginal (distance inflation ≲ 1%)
        require(st.getDouble(1) < 1.02, s"two-level p=$p dist inflation ${st.getDouble(1)}")
        if (p == 16) require(st.getDouble(0) > 0.9,
          s"two-level p=16 agreement ${st.getDouble(0)}")
      }
    }

    if (sections("train4096")) {
      // large-k TRAINING (r6 verdict #6 follow-through): full Lloyd's
      // at k = 4096 on the clustered 1M × 64-dim corpus — dense rounds
      // (kmeansFull, the bit-exact contract path: O(n·k·dim) per
      // round) vs kmeansFullTwoLevel (the two-level scan inside every
      // round: g + p·k/g evaluations per vector). k = 1024 two-level
      // alongside pins the SUBLINEAR-in-k claim: 4× the cells must
      // cost ~2× per iteration (g + p·k/g doubles when k quadruples at
      // g = √k), where dense would cost 4×.
      import spark.implicits._
      val emb1m = clusteredVectors(1000000L, 4096)
      val iters = 3
      def trained(tag: String, f: => (org.apache.spark.sql.DataFrame, Array[(Int, Array[Double])]))
          : DataFrame = {
        val t0 = System.nanoTime()
        val (asg, _) = f                       // Lloyd update rounds run eagerly here
        val out = asg.localCheckpoint()        // + the final assignment pass
        val n = out.count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"$tag%-52s $wall%8.2f s  (${wall / iters}%.2f s/iter)  rows=$n")
        out
      }
      val dn = trained(s"DENSE training  k=4096, $iters iters, 1M vecs",
        Clustering.kmeansFull(emb1m, 4096, iters))
      val tw = trained(s"two-level training k=4096 g=64 p=8, $iters iters",
        Clustering.kmeansFullTwoLevel(emb1m, 4096, iters, coarseGroups = 64, coarseProbes = 8))
      trained(s"two-level training k=1024 g=32 p=8, $iters iters",
        Clustering.kmeansFullTwoLevel(emb1m, 1024, iters, coarseGroups = 32, coarseProbes = 8))
      // quality: the k-means objective (total within-cluster squared
      // distance) of the approximately-trained model vs dense, plus
      // assignment recall (fraction landing in the same cell as the
      // dense-trained model — codebooks drift between the two
      // trainings, so this is a conservative lower bound on quality)
      val j = dn.select(col("vec_id"), col("cluster").as("cd"), col("dist2").as("dd"))
        .join(tw.select(col("vec_id"), col("cluster").as("ct"), col("dist2").as("dt")), "vec_id")
      val st = j.selectExpr("avg(IF(cd = ct, 1.0e0, 0.0e0)) AS recall",
        "sum(dt) / sum(dd) AS objective_ratio").head()
      println(f"  k=4096 two-level vs dense: assignment recall=${st.getDouble(0)}%.4f" +
        f"  objective ratio=${st.getDouble(1)}%.6f")
      require(st.getDouble(1) < 1.05,
        s"two-level training objective inflation ${st.getDouble(1)}")
    }

    if (sections("asof")) {
      // X42 as-of join at 30M × 3M over 100k keys, with a closed-form
      // expected winner per left row: right rows sit at ts = 100·j
      // (j = 0..29, rid = key·100 + j), left rows at ts = 10·i + 5
      // (i = 0..299), so the latest right row at-or-before t is
      // exactly j = t DIV 100 — any window-ordering or
      // ignoreNulls-bleed fault shows up as a nonzero mismatch count.
      val keys = 100000L
      val left = spark.range(keys * 300)
        .selectExpr(s"id AS lid", s"id DIV 300 AS k", "(id % 300) * 10 + 5 AS t")
      val right = spark.range(keys * 30)
        .selectExpr(s"id DIV 30 AS k", "(id % 30) * 100 AS rt", "id AS rid")
      val j = Temporal.asofJoin(left, right, "k", "k", "t", "rt",
        tieBreak = "rid", payload = Seq("rid"))
      auditPlan("asof 30M x 3M", j)
      time("as-of join, 30M left x 3M right, 100k keys") {
        val bad = j.selectExpr(
          "CASE WHEN asof_rid = k * 30 + t DIV 100 THEN 0 ELSE 1 END AS bad")
          .agg(sum("bad")).head().getLong(0)
        require(bad == 0L, s"$bad as-of rows picked the wrong right row")
        keys * 300
      }
    }

    if (sections("rangejoin")) {
      // X43 interval join at 30M points × 3M half-open intervals
      // (per key: [100j, 100j+50) seconds, points at 10i+5): a point
      // matches exactly when (t mod 100) < 50, so the total match
      // count is EXACTLY half the points — boundary or bucket-edge
      // faults shift the count. Buckets = interval width (100 s).
      val keys = 100000L
      val pts = spark.range(keys * 300)
        .selectExpr("id AS pid", "id DIV 300 AS k",
          "timestamp_micros(((id % 300) * 10 + 5) * 1000000) AS pt")
      val ivs = spark.range(keys * 30)
        .selectExpr("id DIV 30 AS k", "id AS iid",
          "timestamp_micros((id % 30) * 100 * 1000000) AS lo",
          "timestamp_micros(((id % 30) * 100 + 50) * 1000000) AS hi")
      val j = Temporal.rangeJoin(pts, ivs, "k", "k", "pt", "lo", "hi", bucketSec = 100L)
      auditPlan("rangejoin 30M x 3M", j)
      time("interval join, 30M points x 3M intervals, 100k keys") {
        val n = j.count()
        require(n == keys * 150, s"expected ${keys * 150} containments, got $n")
        n
      }
    }

    if (sections("asofskew")) {
      // the mega-key regime the plain as-of join serializes on: ONE key
      // with 10M left rows and 1M right rows. Plain = one task sorts
      // 11M rows; bucketed (10k-unit buckets → 1000 buckets) spreads
      // the same work across the cluster. Both must produce the same
      // closed-form winner (right rows every 10 units, rid = t DIV 10).
      val nL = 10000000L
      val left = spark.range(nL).selectExpr("id AS lid", "CAST(1 AS BIGINT) AS k",
        "id AS t")
      val right = spark.range(nL / 10).selectExpr("id AS rid",
        "CAST(1 AS BIGINT) AS k", "id * 10 AS rt")
      def check(df: DataFrame): Long = {
        val bad = df.selectExpr(
          "CASE WHEN asof_rid = t DIV 10 THEN 0 ELSE 1 END AS bad")
          .agg(sum("bad")).head().getLong(0)
        require(bad == 0L, s"$bad wrong winners"); nL
      }
      time("as-of MEGA-KEY, plain (1 key, 10M x 1M)") {
        check(Temporal.asofJoin(left, right, "k", "k", "t", "rt",
          "rid", Seq("rid")))
      }
      time("as-of MEGA-KEY, bucketed (1000 buckets)") {
        check(Temporal.asofJoinBucketed(left, right, "k", "k", "t", "rt",
          "rid", Seq("rid"), bucketWidth = 10000L))
      }
    }

    if (sections("vectorkernel")) {
      // native codegen fold vs interpreted HOF on MATERIALIZED 3M ×
      // 64-dim pairs (the arrays are cached first — generating them is
      // itself HOF work that would otherwise dominate both sides), two
      // passes each, min taken; identical summed result required.
      val n = 3000000L
      val pairsDf = spark.range(n).selectExpr("id",
        "transform(sequence(0, 63), j -> CAST(hash(id, j) AS DOUBLE)) AS a",
        "transform(sequence(0, 63), j -> CAST(hash(id, j, 2) AS DOUBLE)) AS b")
        .cache()
      pairsDf.count()
      def run(df: => DataFrame): (Double, Double) = {
        def once(): (Double, Double) = {
          val t0 = System.nanoTime()
          val s = df.agg(sum("d")).head().getDouble(0)
          (s, (System.nanoTime() - t0) / 1e9)
        }
        val (s1, w1) = once(); val (s2, w2) = once()
        require(s1 == s2); (s1, math.min(w1, w2))
      }
      val (sNative, wNative) = run(pairsDf.select(
        graft.functions.VectorKernels.dot(col("a"), col("b")).as("d")))
      val (sHof, wHof) = run(pairsDf.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d"))
      println(f"vector kernel, 3M x 64-dim cached: native $wNative%.2f s, HOF $wHof%.2f s" +
        f" (x${wHof / wNative}%.1f)")
      pairsDf.unpersist()
      require(sNative == sHof, s"kernel results diverged: $sNative vs $sHof")
    }

    if (sections("kmv")) {
      // X44 KMV sketch at 100M values over 32 groups with closed-form
      // cardinalities (group g holds values id mod (1000·(g+1)), group
      // population ~3.1M ≫ its cardinality, so true distinct counts
      // are exactly 1000·(g+1)): one hash agg, ≤ k longs of state per
      // (partition, group), estimates within the 5σ ≈ 45% KMV band at
      // k = 128 — and the below-k group (g=0 capped to 120) exact.
      val n = 100000000L
      // per-group SEQUENTIAL index (id DIV 32) so residues mod C are
      // covered exactly — id itself steps by 32 within a group and
      // gcd(32, C) would shrink the residue set
      val vals = spark.range(n).selectExpr(
        "CAST(id % 32 AS INT) AS g",
        """concat('v', CASE WHEN id % 32 = 0 THEN (id DIV 32) % 120
                 ELSE (id DIV 32) % (1000 * (id % 32 + 1)) END) AS v""")
      val q = Sketches.kmvDistinct(vals, "g", col("v"), 128)
      auditPlan("kmv 100M", q)
      time("KMV distinct sketch, 100M values, 32 groups, k=128") {
        val got = q.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
        require(got.length == 32, s"expected 32 groups, got ${got.length}")
        got.foreach { case (g, exact, est) =>
          val want = if (g == 0) 120L else 1000L * (g + 1)
          require(exact == want, s"group $g exact $exact != $want")
          require(est > 0.55 * want && est < 1.45 * want,
            s"group $g KMV estimate $est outside 5-sigma of $want")
        }
        require(got.find(_._1 == 0).get._3 == 120.0, "below-k group must be exact")
        n
      }
    }

    if (sections("cm")) {
      // X53 Count-Min at 100M values with closed-form counts: 5 heavy
      // tokens take half the mass (10M occurrences each), the other
      // half spreads over 10M rare tokens (exactly 5 each) — the
      // heavy-hitter regime CM exists for. d=4 × w=4096 = 16k counters
      // summarize 10M distinct tokens; heavy estimates must land in
      // [exact, exact + 4·2N/w] (the one-sided CM bound with slack)
      // and rare estimates stay under the same noise ceiling, so a
      // heavy hitter is unambiguous at 512× the bound separation.
      val n = 100000000L
      val depth = 4; val width = 4096
      val vals = spark.range(n).selectExpr(
        """CASE WHEN id % 10 < 5 THEN concat('h', id % 5)
           ELSE concat('r', (id DIV 10) % 10000000) END AS v""")
      val sk = Sketches.cmSketch(vals, col("v"), depth, width)
      auditPlan("cm sketch 100M", sk)
      val slack = 8L * n / width // 4x the 2N/w bound
      time(s"CM sketch, 100M values, 10M distinct, d=$depth w=$width") {
        val cells = sk.collect()
        require(cells.length <= depth * width,
          s"state ${cells.length} exceeds $depth x $width")
        val perRow = cells.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
        require(perRow.values.forall(_ == n), s"row mass != $n: $perRow")
        cells.length.toLong
      }
      val probes = {
        import spark.implicits._
        ((0 until 5).map(i => s"h$i") ++
          (0 until 10).map(i => s"r${i * 999999}")).toDF("v")
      }
      val est = Sketches.cmEstimate(sk, probes, "v", depth, width)
      auditPlan("cm estimate probes", est)
      time("CM point estimates, 15 probes vs closed-form counts") {
        val got = est.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        (0 until 5).foreach { i =>
          val e = got(s"h$i")
          require(e >= 10000000L && e <= 10000000L + slack,
            s"heavy h$i estimate $e outside [1e7, 1e7+$slack]")
        }
        (0 until 10).foreach { i =>
          val e = got(s"r${i * 999999}")
          require(e >= 5L && e <= slack, s"rare estimate $e outside [5, $slack]")
        }
        got.size.toLong
      }
    }

    if (sections("robuststats")) {
      // X50 robust stats at 500k × 64-dim (32M exploded rows). Since
      // r16 the operator is single-corpus-scan (the lattice-bounded
      // (pos, q) histogram replaces the ~5 re-scans the old shape
      // paid, and the old persistExploded A/B with it) — measure the
      // wall, and require the result identical to an independent
      // per-row percentile computation (Sampling.exactPercentilesBy
      // over the exploded relation — the OLD shape's machinery, kept
      // here as the cross-check).
      // values on the operator's documented domain: [-1, 1] on the
      // 1e-4 lattice (the raw `vectors()` hash doubles span ±2e9,
      // which after quantization makes every value its own histogram
      // bucket — a misuse the scaladoc's broadcast-small contract
      // excludes, and an OOM at the probe heap). NOT cached: caching
      // 512 MB of vectors squeezes execution memory under 8g, and the
      // generator is cheap hash math both paths re-run equally.
      val emb = spark.range(500000L).selectExpr("id AS vec_id",
        """transform(sequence(0, 63),
           j -> CAST(pmod(hash(id, j), 20001) - 10000 AS DOUBLE) / 10000.0e0)
           AS embedding""")
      val t0 = System.nanoTime()
      val rows = Similarity.embeddingRobustStats(emb, 64)
        .orderBy("pos")
        .selectExpr("concat(pos, ':', n, ':', median, ':', mad) AS row")
        .collect().map(_.getString(0)).toSeq
      val wHist = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val q = emb.selectExpr("posexplode(embedding) AS (pos, x)")
        .selectExpr("pos", "CAST(round(CAST(x AS DOUBLE) * 10000.0e0) AS BIGINT) AS q")
        .localCheckpoint()
      val med = Sampling.exactPercentilesBy(q, "q", Seq(50), Seq("pos"))
        .select(col("pos"), col("value").as("med_q"))
      val dev = q.join(broadcast(med), "pos").selectExpr("pos", "abs(q - med_q) AS adev")
      val mad = Sampling.exactPercentilesBy(dev, "adev", Seq(50), Seq("pos"))
        .select(col("pos"), col("value").as("mad_q"))
      val want = q.groupBy("pos").agg(count(lit(1)).as("n"))
        .join(med, "pos").join(mad, "pos")
        .selectExpr("pos", "n",
          "floor((CAST(med_q AS DOUBLE) / 1.0e4) * 1.0e9 + 0.5e0) / 1.0e9 AS median",
          "floor((CAST(mad_q AS DOUBLE) / 1.0e4) * 1.0e9 + 0.5e0) / 1.0e9 AS mad")
        .orderBy("pos")
        .selectExpr("concat(pos, ':', n, ':', median, ':', mad) AS row")
        .collect().map(_.getString(0)).toSeq
      val wRow = (System.nanoTime() - t1) / 1e9
      require(rows == want, "histogram-path robust stats != per-row percentile replay")
      println(f"[info-probe] robust stats 500k x 64-dim: histogram $wHist%.2f s, " +
        f"per-row replay $wRow%.2f s (rows identical)")
    }

    if (sections("hll100m")) {
      // X55 HLL at 100M rows / 10M distinct values in ONE pass: the
      // register relation must stay ≤ 2^p rows (fixed size regardless
      // of cardinality — the property that licenses shipping per-split
      // distinct summaries at 100 TB) and the estimate must land
      // within 4σ = 4·1.04/√256 = 26% of the true 1e7 (known md5-hash
      // determinism ⇒ the "randomness" is fixed; the bound is the
      // design slack, same convention as the cm/kmv probes).
      val n = 100000000L
      val p = 8
      val vals = spark.range(n)
        .selectExpr("'all' AS g", "concat('v', id % 10000000) AS v")
      val sk = Sketches.hllSketch(vals, "g", col("v"), p)
      auditPlan("hll sketch 100M", sk)
      time(s"HLL sketch+estimate, 100M rows, 10M distinct, p=$p") {
        val regs = sk.collect()
        require(regs.length <= (1 << p), s"register file ${regs.length} > 2^$p")
        val est = Sketches.hllEstimate(sk, "g", p).head().getDouble(1)
        require(math.abs(est - 1e7) / 1e7 < 0.26,
          s"HLL estimate $est outside 26% of 1e7")
        regs.length.toLong
      }
    }

    if (sections("bpefold")) {
      // the BPE re-segmentation fold past one task (r8 verdict #6):
      // same corpus trained at dictPartitions = 1 (the single-task
      // default, right for ~1e7-word real vocabularies) and 8 — the
      // merge tables must be BIT-EQUAL (the argmax is a global
      // orderBy-limit under a total order; the fold is per-row), which
      // is what licenses raising the partition count past the ~1e8
      // word-type ceiling the default serializes at.
      val c = corpus(300000L)
      def train(p: Int): Seq[String] =
        TextOps.bpeTrain(c, 8, dictPartitions = p)
          .orderBy("rank")
          .selectExpr("concat(rank, ':', lhs, '+', rhs, '=', cnt) AS m")
          .collect().map(_.getString(0)).toSeq
      var m1: Seq[String] = null
      time("BPE train 8 merges, 300k docs, dictPartitions=1") {
        m1 = train(1); m1.size.toLong
      }
      time("BPE train 8 merges, 300k docs, dictPartitions=8") {
        val m8 = train(8)
        require(m8 == m1, s"merge tables diverge:\n 1: $m1\n 8: $m8")
        m8.size.toLong
      }
    }

    if (sections("graphs10x")) {
      // ~100x the contract graph's edges (q_graph_* runs on ~20k
      // co-view pairs; this is 3M edges / 1M+1 nodes) with BOTH
      // broadcast thresholds disabled, so the degree joins that r8
      // force-broadcast MUST run as shuffled joins — proving the
      // unhinted plan (r9, verdict #2) holds when the O(V) degree
      // relation no longer fits a broadcast. The graph has closed-form
      // truth and a deliberate mega-hub: ring nodes 0..n-1 with edges
      // (i, i+1 mod n) and chords (i, i+2 mod n), plus node n adjacent
      // to every ring node. Per ring node: degree 5, 7 triangles
      // (3 ring/chord + 4 with the hub); hub: degree n, 2n triangles
      // (one per ring/chord edge). Degree orientation directs every
      // hub edge INTO the hub (max degree), so the hub emits zero
      // wedges — the O(m^1.5) bound in action at the worst skew.
      val thrOld = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      // default is null (falls back to the non-AQE threshold), and
      // conf.get returns that null rather than throwing
      val aqeThrOld = Option(
        try spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
        catch { case _: Exception => null }).getOrElse("")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        val n = 1000000L
        val ring = spark.range(n).selectExpr(
          s"id AS i", s"(id + 1) % $n AS j1", s"(id + 2) % $n AS j2")
        val edges = ring.selectExpr("least(i, j1) AS a", "greatest(i, j1) AS b")
          .unionAll(ring.selectExpr("least(i, j2) AS a", "greatest(i, j2) AS b"))
          .unionAll(spark.range(n).selectExpr("id AS a", s"CAST($n AS BIGINT) AS b"))
        val tri = Graphs.triangleStats(edges)
        auditPlan("triangles 3M edges + mega-hub", tri)
        time("triangles, 3M edges, 1M nodes + full hub, NO broadcast") {
          val rows = tri.selectExpr(
            s"CASE WHEN node < $n THEN (CASE WHEN degree = 5 AND n_tri = 7 THEN 0 ELSE 1 END)" +
            s" ELSE (CASE WHEN degree = $n AND n_tri = ${2 * n} THEN 0 ELSE 1 END) END AS bad")
            .agg(sum("bad"), count(lit(1))).head()
          require(rows.getLong(0) == 0L, s"${rows.getLong(0)} nodes off closed form")
          rows.getLong(1)
        }
        val pr = Graphs.pageRankFixedPoint(edges, iters = 9) // crosses checkpointEvery=6
        time("pagerank, 9 iters (1 lineage checkpoint), 6M directed") {
          val r = pr.agg(sum("pr_fixed"), min("pr_fixed"), count(lit(1))).head()
          // integer truncation only LOSES mass: sum <= scale, > 90% kept
          require(r.getLong(0) <= Graphs.PrScale && r.getLong(0) > Graphs.PrScale * 9 / 10,
            s"rank mass ${r.getLong(0)} outside (0.9, 1] of scale")
          require(r.getLong(1) > 0L, "non-positive rank")
          val hubPr = pr.where(col("node") === n).head().getLong(1)
          val maxPr = pr.agg(max("pr_fixed")).head().getLong(0)
          require(hubPr == maxPr, s"hub not top-ranked: $hubPr < $maxPr")
          r.getLong(2)
        }
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thrOld)
        if (aqeThrOld.nonEmpty)
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", aqeThrOld)
        else spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }

    if (sections("funnelstream")) {
      // the streaming funnel at 1M events / 100k users — the scale
      // evidence the 10k-row scalatest cannot give: throughput through
      // the broadcast-step-join + flatMapGroupsWithState plan, state
      // BOUNDED at (users who reached step 1) rows regardless of event
      // volume, and the final chains equal to the batch funnel
      // ROW-FOR-ROW under ordered delivery.
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val nEv = 1000000
      val nUsers = 100000L
      val types = Array("view", "click", "purchase", "error", "other")
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      // event i: user i%nUsers, type hash-derived, ts strictly increasing
      // (global event-time order => the documented exact-parity regime)
      val rows: IndexedSeq[(Long, String, java.sql.Timestamp)] =
        (0 until nEv).map { i =>
          (i % nUsers, types(math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s"e$i"), 5)),
            new java.sql.Timestamp(t0 + i * 100L))
        }
      val batchDf = rows.toDF("user_id", "event_type", "ts")
      val steps = Seq("view", "click", "purchase")
      val static = Events.funnel(batchDf, steps)
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet

      val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
      val out = graft.streaming.StreamingOps.funnelStream(spark,
        stream.toDF().toDF("user_id", "event_type", "ts"), steps,
        horizonMinutes = 7 * 24 * 60)
      val latest = new java.util.concurrent.ConcurrentHashMap[Long, (Any, Any, Any)]()
      val q = out.writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.collect().foreach(r => latest.put(r.getLong(0), (r.get(1), r.get(2), r.get(3))))
        }.start()
      time("streaming funnel, 1M events / 100k users, 10 batches") {
        rows.grouped(nEv / 10).foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
        }
        latest.size.toLong
      }
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      q.stop()
      import scala.jdk.CollectionConverters._
      val streamed = latest.asScala.map { case (u, (a, b, c)) => (u, a, b, c) }.toSet
      require(streamed == static,
        s"streamed chains != batch funnel: ${streamed.size} vs ${static.size} rows")
      println(s"  final chains row-equal to batch funnel (${static.size} users); " +
        s"state rows: $stateRows (bound: users reaching step 1 = ${static.size})")
      require(stateRows <= static.size,
        s"state $stateRows exceeds the reached-step-1 population ${static.size}")
    }

    if (sections("rollingstream")) {
      // the streaming rolling-anomaly monitor at 1M events / 10k keys
      // through 10 ordered micro-batches: throughput through the
      // flatMapGroupsWithState plan, state BOUNDED at (live keys) rows
      // regardless of event volume, and the emitted rows equal to the
      // batch operator ROW-FOR-ROW under ordered delivery.
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val nEv = 1000000
      // 100 events per key => the closed-form spike positions (49, 99)
      // actually occur, exercising the flag path at volume
      val nUsers = 10000L
      val t0us = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime * 1000L
      def tsOf(i: Int) = {
        val us = t0us + i * 100000L
        val t = new java.sql.Timestamp(us / 1000L)
        t.setNanos(((us % 1000000L) * 1000L).toInt)
        t
      }
      // event i: user i%nUsers, value cycles 0..4 with a 1000.0 spike
      // every 50th event of a key — the rolling probe's closed form
      val rows: IndexedSeq[(Long, Long, String, java.sql.Timestamp, Double)] =
        (0 until nEv).map { i =>
          val pos = i / nUsers.toInt
          (i.toLong, i % nUsers, "m", tsOf(i),
            if (pos % 50 == 49) 1000.0 else (pos % 5).toDouble)
        }
      val batchDf = rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      val static = Events.rollingAnomaly(batchDf).collect()
        .map(r => r.getLong(0) -> ((r.getInt(5), r.get(6), r.get(7), r.get(8),
          r.getBoolean(9)))).toMap
      val stream = MemoryStream[(Long, Long, String, java.sql.Timestamp, Double)]
      val out = graft.streaming.StreamingOps.rollingAnomalyStream(spark,
        stream.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"),
        horizonMinutes = 7 * 24 * 60)
      val got = new java.util.concurrent.ConcurrentHashMap[Long, (Int, Any, Any, Any, Boolean)]()
      val q = out.toDF().writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.collect().foreach(r => got.put(r.getLong(0),
            (r.getInt(5), r.get(6), r.get(7), r.get(8), r.getBoolean(9))))
        }.start()
      time("streaming rolling anomaly, 1M events / 10k keys, 10 batches") {
        rows.grouped(nEv / 10).foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
        }
        got.size.toLong
      }
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      q.stop()
      require(got.size == nEv, s"emitted ${got.size} rows != $nEv")
      val diffs = static.keysIterator.count(k => got.get(k) != static(k))
      require(diffs == 0, s"$diffs streamed rows differ from the batch operator")
      println(s"  all $nEv streamed rows equal batch rollingAnomaly; " +
        s"state rows: $stateRows (bound: live keys = $nUsers)")
      require(stateRows <= nUsers, s"state $stateRows exceeds the key population $nUsers")
    }

    if (sections("layout")) {
      // X64 corpus layout at 4M docs / 16 langs: the same selective
      // question (one lang, one n_chars band) against an unordered
      // pile vs a CorpusIO layout — partition pruning + footer-stats
      // skipping must show up in the files-read METRIC, not just the
      // plan text, and the answers must be identical.
      def filesRead(df: DataFrame): Long = scanMetric(df, "numFiles")
      val n = 4000000L
      val base = "/root/repo/target/probe_layout"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val docsDf = spark.range(n).select(
        col("id").as("doc_id"),
        md5(col("id").cast("string")).as("text"),
        concat(lit("l"), (col("id") % 16).cast("string")).as("lang"),
        concat(lit("s"), (col("id") % 50).cast("string")).as("source"),
        (lit(50) + pmod(col("id") * 37, lit(2000))).as("n_chars"))
      time("layout: 4M-doc pile write (64 unordered files)") {
        docsDf.repartition(64).write.parquet(s"$base/pile"); n
      }
      time("layout: CorpusIO write, partitionBy lang / sort n_chars") {
        CorpusIO.writeLayout(docsDf, s"$base/layout",
          Seq("lang"), Seq("n_chars"), fileTargets = 64)
        n
      }
      def ask(df: DataFrame): (DataFrame, Array[org.apache.spark.sql.Row]) = {
        val q = df.filter(col("lang") === "l3" && col("n_chars").between(1800, 1899))
          .groupBy("source").agg(count(lit(1)).as("n"), sum("n_chars").as("sc"))
          .orderBy("source")
        (q, q.collect())
      }
      var pile: Array[org.apache.spark.sql.Row] = null
      var laid: Array[org.apache.spark.sql.Row] = null
      var pileFiles = 0L; var laidFiles = 0L
      time("layout: selective question over the PILE") {
        val (q, r) = ask(spark.read.parquet(s"$base/pile"))
        auditPlan("pile scan", q); pileFiles = filesRead(q); pile = r; r.length.toLong
      }
      time("layout: selective question over the LAYOUT") {
        val (q, r) = ask(CorpusIO.readLayout(spark, s"$base/layout"))
        auditPlan("layout scan", q); laidFiles = filesRead(q); laid = r; r.length.toLong
      }
      require(pile.map(_.toSeq).toSeq == laid.map(_.toSeq).toSeq,
        "layout changed the ANSWER — it may only change the scan cost")
      println(s"  files read: pile $pileFiles vs layout $laidFiles")
      require(pileFiles > 0, "files-read metric walk found no scan — walk is broken")
      require(laidFiles * 8 <= pileFiles,
        s"layout read $laidFiles of $pileFiles files — pruning is not engaging")
    }

    if (sections("zorder")) {
      // X65 z-order at 4M rows: two independent uniform columns,
      // three layouts — unordered pile, single-key sort on x, z-order
      // on (x, y) — and the same two selective questions (an x-only
      // and a y-only range). The single-key sort must serve x and FAIL
      // y; the z-curve must serve BOTH. Skipping is measured in the
      // scan's numOutputRows (row groups surviving footer-stats
      // pruning), answers must be identical everywhere.
      val n = 4000000L
      val base = "/root/repo/target/probe_zorder"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val df = spark.range(n).select(
        col("id"),
        (col("id") * 2654435761L % 65536).as("x"),
        (col("id") * 40503L % 65536).as("y"))
      time("zorder: pile write (64 unordered files)") {
        df.repartition(64).write.parquet(s"$base/pile"); n
      }
      time("zorder: single-key layout, sort on x") {
        CorpusIO.writeLayout(df.withColumn("all", lit("a")), s"$base/sortx",
          Seq("all"), Seq("x"), fileTargets = 64)
        n
      }
      time("zorder: z-order layout on (x, y), 8 bits") {
        CorpusIO.writeLayoutZordered(df, s"$base/zord",
          Nil, Seq("x", "y"), bits = 8, fileTargets = 64)
        n
      }
      // top-1/64 range on one column only
      def ask(df: DataFrame, c: String): (Long, Long, Long) = {
        val q = df.filter(col(c) >= 64512L)
          .agg(count(lit(1)).as("n"), sum(col(c)).as("s"))
        val r = q.collect()(0)
        auditPlan(s"zorder $c", q)
        (r.getLong(0), r.getLong(1), scanMetric(q, "numOutputRows"))
      }
      val layouts = Seq(
        "pile " -> spark.read.parquet(s"$base/pile"),
        "sortx" -> CorpusIO.readLayout(spark, s"$base/sortx"),
        "zord " -> CorpusIO.readLayout(spark, s"$base/zord"))
      val res = for (c <- Seq("x", "y"); (tag, d) <- layouts) yield {
        var out: (Long, Long, Long) = null
        time(s"zorder: $c-range question over $tag") { out = ask(d, c); out._1 }
        (c, tag.trim, out)
      }
      // identical answers across layouts, per question
      Seq("x", "y").foreach { c =>
        val answers = res.filter(_._1 == c).map { case (_, _, (n1, s1, _)) => (n1, s1) }
        require(answers.distinct.size == 1, s"$c answers differ across layouts: $answers")
      }
      res.foreach { case (c, tag, (_, _, scanned)) =>
        println(s"  $c over $tag: scanned $scanned of $n rows")
      }
      def scanned(c: String, tag: String) =
        res.find(r => r._1 == c && r._2 == tag).get._3._3
      require(scanned("x", "sortx") * 8 <= n, "sorted layout failed to skip on its own key")
      require(scanned("x", "zord") * 3 <= n && scanned("y", "zord") * 3 <= n,
        "z-order layout must skip on BOTH columns")
      require(scanned("y", "sortx") * 2 > n,
        "single-key sort unexpectedly skipped on the non-key column (probe premise broken)")
    }

    if (sections("rolling")) {
      // X61 rolling anomaly at 10M events / 100k keys, closed-form
      // truth: per key, positions i = 0..99 at 1 s spacing cycle value
      // i mod 5 with a 1000.0 spike at i ≡ 49 (mod 50). Every spike
      // lands on a varied low baseline (z ≈ 7e2 ≫ 3 → flagged) and
      // every post-spike normal divides a spike-inflated std
      // (z ≈ 0.4 ≪ 3 → silent), so the expected flag set is EXACTLY
      // the spikes: 2 per key, nothing else — any frame-bounds,
      // ordering, or variance fault shows as a count/placement drift.
      val keys = 100000L
      val ev = spark.range(keys * 100).selectExpr(
        "id AS event_id", "id DIV 100 AS user_id", "'m' AS event_type",
        "timestamp_micros((id % 100) * 1000000) AS ts",
        "CASE WHEN id % 50 = 49 THEN 1000.0e0 ELSE CAST(id % 5 AS DOUBLE) END AS value")
      val ra = Events.rollingAnomaly(ev)
      auditPlan("rolling anomaly 10M x 100k keys", ra)
      time("rolling anomaly, 10M events / 100k keys") {
        val agg = ra.selectExpr(
          "CAST(is_anomaly AS INT) AS f",
          "CASE WHEN is_anomaly AND event_id % 50 != 49 THEN 1 ELSE 0 END AS off")
          .agg(sum("f"), sum("off"), count(lit(1))).head()
        require(agg.getLong(2) == keys * 100, s"row count ${agg.getLong(2)}")
        require(agg.getLong(1) == 0L, s"${agg.getLong(1)} flags off the spike positions")
        require(agg.getLong(0) == keys * 2, s"flags ${agg.getLong(0)} != ${keys * 2}")
        keys * 100
      }
      // per-key work is inherently sequential (order-dependent stats):
      // the mega-key regime is one task folding the key's whole run —
      // linear, just not parallel; time it to keep the claim honest
      val mega = spark.range(1000000).selectExpr(
        "id AS event_id", "CAST(0 AS BIGINT) AS user_id", "'m' AS event_type",
        "timestamp_micros(id * 1000000) AS ts",
        "CASE WHEN id % 50 = 49 THEN 1000.0e0 ELSE CAST(id % 5 AS DOUBLE) END AS value")
      time("rolling anomaly, mega-key: 1M events on ONE key") {
        val f = Events.rollingAnomaly(mega)
          .agg(sum(expr("CAST(is_anomaly AS INT)"))).head().getLong(0)
        require(f == 2 * 1000000 / 100, s"mega-key flags $f")
        1000000L
      }
    }

    if (sections("phrase")) {
      // X63 phrase search at 10M docs: a planted phrase with an exact
      // closed-form answer (' p q' appended to ids ≡ 0 mod 100 — the
      // p/q tokens exist nowhere else in the w### vocabulary, so
      // exactly nDocs/100 docs match, once each, at position 20) plus
      // an organic phrase cross-checked against an independent regexp
      // scan of the same corpus (doc-set equality, not just counts).
      val nDocs = 10000000L
      val docs = corpus(nDocs).selectExpr("doc_id",
        "concat(text, CASE WHEN doc_id % 100 = 0 THEN ' p q' ELSE '' END) AS text")
      val pm = Search.phraseMatch(docs, Seq(Seq("p", "q"), Seq("w1", "w2")))
      auditPlan("phrase search 10M docs", pm)
      time("phrase search, 10M docs, planted + organic phrase") {
        val planted = pm.filter("phrase = 'p q'")
        val pAgg = planted.selectExpr(
          "CASE WHEN n_matches = 1 AND first_pos = 20 AND doc_id % 100 = 0 THEN 0 ELSE 1 END AS bad")
          .agg(count(lit(1)), sum("bad")).head()
        require(pAgg.getLong(0) == nDocs / 100,
          s"planted matches ${pAgg.getLong(0)} != ${nDocs / 100}")
        require(pAgg.getLong(1) == 0L, s"${pAgg.getLong(1)} malformed planted matches")
        pAgg.getLong(0)
      }
      time("phrase search organic vs regexp scan, 10M docs") {
        val got = pm.filter("phrase = 'w1 w2'").select("doc_id")
        val want = docs.filter("text rlike '(^| )w1 w2( |$)'").select("doc_id")
        val diff = got.unionAll(want).groupBy("doc_id").agg(count(lit(1)).as("c"))
          .filter("c != 2").count()
        require(diff == 0L, s"$diff docs disagree with the regexp scan")
        want.count()
      }
    }

    if (sections("auceval")) {
      // X68 exact AUC at 50M rows, EVERY score distinct (the
      // adversarial regime for rank statistics — the per-score
      // histogram is corpus-sized, 12.5M rows per group, so whatever
      // carries the cumulative positives is carrying the corpus):
      // score = a bijection (id·1000003 mod 5·10⁷), group = score mod
      // 4, label = alternating by within-group rank — so each group is
      // a perfect even/odd interleave with the closed form
      // A = p(p+1), auc = 1 − (p+1)/(2p), p = n/8. The same statistic
      // is then computed with the NAIVE single window partitioned by
      // group alone (4 sort groups × 12.5M rows through one task
      // each) — the funnel the two-level bucket split exists to avoid;
      // results must agree bit-for-bit.
      val n = 50000000L
      val df = spark.range(n).selectExpr(
        s"pmod(id * 1000003L, ${n}L) AS s")
        .selectExpr("s", "CAST(s % 4L AS STRING) AS g",
          "((s DIV 4L) % 2L) = 0L AS label")
      val p = n / 8
      val expAuc = math.floor((1.0 - (p * (p + 1)).toDouble /
        (2.0 * p.toDouble * p.toDouble)) * 1e9 + 0.5) / 1e9
      val q = Diagnostics.aucBy(df, "s", "label", by = Seq("g"))
      auditPlan("aucBy 50M distinct scores", q)
      var twoLevel: Map[String, (Long, Long, Double)] = Map.empty
      time("aucBy, 50M rows, all-distinct scores, 4 groups") {
        twoLevel = q.collect().map(r =>
          r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
        twoLevel.foreach { case (g, (np, nn, auc)) =>
          require(np == p && nn == p, s"group $g counts ($np, $nn) != $p")
          require(auc == expAuc, s"group $g auc $auc != closed-form $expAuc")
        }
        twoLevel.size.toLong
      }
      time("NAIVE single-window AUC, same 50M rows (the avoided funnel)") {
        val hist = Diagnostics.scoreHistogram(df, "s", "label", Seq("g"))
        val w = Window.partitionBy("g").orderBy("s")
          .rowsBetween(Window.unboundedPreceding, -1)
        val naive = hist
          .withColumn("cum", coalesce(sum(col("p")).over(w), lit(0L)))
          .groupBy("g")
          .agg(sum("p").as("n_pos"), sum("ng").as("n_neg"),
            sum(expr("ng * (2L * cum + p)")).as("a2"))
          .selectExpr("g", "n_pos", "n_neg",
            """floor((1.0e0 - CAST(a2 AS DOUBLE)
               / (2.0e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
               * 1.0e9 + 0.5e0) / 1.0e9 AS auc""")
          .collect().map(r =>
            r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
        require(naive == twoLevel, "naive window AUC disagrees with the two-level path")
        naive.size.toLong
      }
      time("prAtThresholds, same 50M rows (suffix sums on the bucket grid)") {
        val pr = Diagnostics.prAtThresholds(
          Diagnostics.scoreHistogram(df, "s", "label", Seq("g")), Seq("g"))
        auditPlan("prAtThresholds 50M", pr)
        val rows = pr.collect()
        // the zero threshold covers everything: tp = all positives
        rows.filter(_.getLong(1) == 0L).foreach { r =>
          require(r.getLong(2) + r.getLong(4) == p && r.getLong(3) + r.getLong(5) == p,
            s"threshold-0 row inconsistent: $r")
        }
        rows.length.toLong
      }
    }

    println(s"== plan failures: $planFailures")
    if (planFailures > 0) sys.exit(1)
    spark.stop()
  }
}
