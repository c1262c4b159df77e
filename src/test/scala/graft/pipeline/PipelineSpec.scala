package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic tests for the training-data pipeline operators, beyond the
  * oracle hash-parity the driver checks: planted-duplicate recovery,
  * LSH candidate correctness, similarity ordering, session invariants,
  * multimodal decode determinism. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("pipeline-spec")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"
  def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")
  def emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")
  def events: DataFrame = Events.load(spark, sf)

  import spark.implicits._

  test("exact dedup keeps the smallest doc_id per planted duplicate group") {
    val planted = docs.limit(3).select(col("doc_id") + 100000, col("text"),
        col("lang"), col("source"), col("n_chars"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = Dedup.exact(docs.unionByName(planted))
    val dups = d.filter(col("n_copies") === 2)
    assert(dups.count() === 3)
    // the kept id is always the original (smaller) one
    assert(dups.filter(col("keep_id") >= 100000).count() === 0)
    assert(d.agg(sum("n_copies")).head().getLong(0) === docs.count() + 3)
  }

  test("minhash LSH finds high-jaccard near-dups and reports exact jaccard") {
    val lsh = Dedup.minhashLsh(docs)
    val found = lsh.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(found.nonEmpty, "expected planted near-duplicates in documents")
    // every reported jaccard must equal the brute-force value
    val pairsDf = lsh.select("a", "b")
    val brute = Dedup.jaccardFor(TextOps.shingleSet(docs, 5), pairsDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(found === brute)
    // LSH with 4 bands of 4 rows must recover everything with j >= 0.95
    val all = Dedup.ngramJaccardBlocked(
      docs.withColumn("source", lit("all")), 5, 0.95)
    val strong = all.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.subsetOf(found.keySet), s"missed strong pairs: ${strong -- found.keySet}")
  }

  test("minhash signature: k entries per doc, values inside the LCG field") {
    val mh = TextOps.minhash(docs, k = 16)
    val perDoc = mh.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") =!= 16).count() === 0)
    assert(mh.filter(col("minhash") < 0 || col("minhash") >= TextOps.minhashP).count() === 0)
    // deterministic across runs
    assert(mh.exceptAll(TextOps.minhash(docs, k = 16)).count() === 0)
  }

  test("simhash: near-dup pairs have much smaller hamming distance than random") {
    val sh = TextOps.simhash(docs)
    val near = Dedup.minhashLsh(docs).filter(col("jaccard") >= 0.8).select("a", "b")
    if (near.head(1).nonEmpty) {
      val j = near
        .join(sh.select(col("doc_id").as("a"), col("simhash").as("sa")), "a")
        .join(sh.select(col("doc_id").as("b"), col("simhash").as("sb")), "b")
      val nearHam = j.select(avg(expr("bit_count(sa ^ sb)"))).head().getDouble(0)
      assert(nearHam < 12.0, s"near-dup mean hamming $nearHam")
    }
    assert(sh.count() === docs.count())
  }

  test("language id is deterministic and total") {
    val l = TextOps.langId(docs)
    assert(l.count() === docs.count())
    assert(l.filter(col("predicted").isNull).count() === 0)
    val dist = l.groupBy("predicted").count().collect()
    assert(dist.nonEmpty)
  }

  test("quality score in [0,1] and monotone in components") {
    val q = TextOps.qualityScore(docs)
    assert(q.filter(col("score") < 0.0 || col("score") > 1.0).count() === 0)
    assert(q.filter(col("alpha_ratio") < 0.0 || col("alpha_ratio") > 1.0).count() === 0)
  }

  test("brute top-k: ranks ordered by cosine, no self-matches, k rows per probe") {
    val t = Similarity.bruteTopK(emb, "vec_id % 50 = 0", 5)
    val nProbes = emb.filter(expr("vec_id % 50 = 0")).count()
    assert(t.count() === nProbes * 5)
    assert(t.filter(col("query_id") === col("neighbor_id")).count() === 0)
    // rank 1 has the max cosine per query
    val bad = t.groupBy("query_id")
      .agg(max("cos").as("mx"), max(when(col("rank") === 1, col("cos"))).as("r1"))
      .filter(col("mx") =!= col("r1"))
    assert(bad.count() === 0)
  }

  test("ngram Jaccard df-cap drops ubiquitous shingles but keeps discriminative pairs") {
    val full = Dedup.ngramJaccardBlocked(docs, 3, 0.3)
    val capped = Dedup.ngramJaccardBlocked(docs, 3, 0.3, maxDocFreq = Some(50))
    // the planted high-jaccard pairs survive a generous cap (their
    // shared shingles are rare); pair set equality on this corpus
    assert(capped.select("a", "b").exceptAll(full.select("a", "b")).count() === 0)
    assert(full.select("a", "b").exceptAll(capped.select("a", "b")).count() === 0)
    // a cap of 0 removes every shingle → no pairs at all
    assert(Dedup.ngramJaccardBlocked(docs, 3, 0.3, maxDocFreq = Some(0)).count() === 0)
  }

  test("blocked exact near-dup == naive all-pairs (block replication changes plan, not result)") {
    val naive = Similarity.nearDupPairs(emb, 0.45)
      .select(col("a"), col("b"), col("cos").as("ncos"))
    val blocked = Similarity.nearDupPairsBlocked(emb, 0.45)
    assert(blocked.count() === naive.count())
    val j = blocked.join(naive, Seq("a", "b"), "full")
    assert(j.filter(col("cos").isNull || col("ncos").isNull).count() === 0)
    assert(j.filter(col("cos") =!= col("ncos")).count() === 0)
    // no duplicate pair emitted by the replication scheme
    assert(blocked.groupBy("a", "b").count().filter(col("count") > 1).count() === 0)
  }

  test("bucketed LSH near-dup is a subset of exact all-pairs with identical cosines") {
    val lsh = Similarity.nearDupPairsBucketed(emb, 0.45, bits = 8)
    val exact = Similarity.nearDupPairs(emb, 0.45)
      .select(col("a"), col("b"), col("cos").as("ecos"))
    val j = lsh.join(exact, Seq("a", "b"), "left")
    assert(j.filter(col("ecos").isNull || col("ecos") =!= col("cos")).count() === 0)
    assert(lsh.groupBy("a", "b").count().filter(col("count") > 1).count() === 0)
  }

  test("banded LSH near-dup: recall >= 0.9 vs exact all-pairs, identical cosines") {
    val exact = Similarity.nearDupPairs(emb, 0.45)
      .select(col("a"), col("b"), col("cos").as("ecos"))
    val banded = Similarity.nearDupPairsBanded(emb, 0.45)
    // subset with the same exact cosine (the verify kernel is shared)
    val j = banded.join(exact, Seq("a", "b"), "left")
    assert(j.filter(col("ecos").isNull || col("ecos") =!= col("cos")).count() === 0)
    assert(banded.groupBy("a", "b").count().filter(col("count") > 1).count() === 0)
    // the round-3 weakness: the Hamming-<=1 probe recovered 3/14 pairs;
    // the banded contract must recover >= 0.9 of the exact pair set
    val nExact = exact.count()
    val nFound = banded.count()
    assert(nExact > 0, "fixture must contain near-dup pairs")
    assert(nFound.toDouble / nExact >= 0.9,
      s"banded LSH recall $nFound/$nExact below 0.9")
  }

  test("banded LSH prunes hard in the real near-dup regime (planted cos~0.95 pairs)") {
    import spark.implicits._
    // deterministic synthetic corpus: 1000 random 64-d vectors plus 25
    // planted near-dup partners (v + 0.2*noise => cos ~ 0.98). At this
    // cosine the per-hyperplane agreement is ~0.94, so 8 bands x 8 bits
    // keep recall while random pairs (p = 0.5) collapse to ~3% of
    // all-pairs -- the selectivity sign-LSH cannot deliver at 0.45.
    val rnd = new scala.util.Random(7)
    def gauss() = rnd.nextGaussian()
    val base = Array.tabulate(1000)(i => (i.toLong, Array.fill(64)(gauss().toFloat)))
    val planted = base.take(25).map { case (id, v) =>
      (id + 10000L, v.map(x => x + 0.2f * gauss().toFloat))
    }
    val embSyn = (base ++ planted).toSeq.toDF("vec_id", "embedding")
    val found = Similarity.nearDupPairsBanded(embSyn, 0.9, bands = 8, rowsPerBand = 8)
      .filter(col("b") === col("a") + 10000L).count()
    assert(found >= 23, s"planted-pair recall $found/25 below 0.9")
    // candidate volume: distinct pairs sharing any band signature
    val sigs = Similarity.bandSignatures(embSyn, 8, 8, 64)
    val nCand = sigs.select(col("band"), col("sig"), col("vec_id").as("id1"))
      .join(sigs.select(col("band"), col("sig"), col("vec_id").as("id2")), Seq("band", "sig"))
      .filter(col("id1") < col("id2")).select("id1", "id2").distinct().count()
    val n = 1025L
    val allPairs = n * (n - 1) / 2
    assert(nCand.toDouble / allPairs <= 0.10,
      s"candidate fraction ${nCand.toDouble / allPairs} — LSH not pruning")
  }

  test("IVF top-k is the bucket-restricted subset of brute force") {
    val ivf = Similarity.ivfTopK(emb, "vec_id % 50 = 0", 5)
      .select("query_id", "neighbor_id", "cos")
    // every IVF hit must appear in the full brute ranking with same cos
    val brute = Similarity.bruteTopK(emb, "vec_id % 50 = 0", 100000)
      .select(col("query_id"), col("neighbor_id"), col("cos").as("bcos"))
    val joined = ivf.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter(col("bcos").isNull || col("bcos") =!= col("cos")).count() === 0)
  }

  test("multi-probe IVF: recall dominates single-probe, still exact-cos subset of brute") {
    val sp = Similarity.ivfTopK(emb, "vec_id % 50 = 0", 5)
      .select(col("query_id"), col("rank"), col("cos").as("sp_cos"))
    val mp = Similarity.ivfTopK(emb, "vec_id % 50 = 0", 5, hammingProbes = true)
      .select(col("query_id"), col("rank"), col("cos").as("mp_cos"),
        col("neighbor_id"))
    // per (query, rank): the multi-probe candidate pool is a superset,
    // so its k-th best cosine can never be worse
    val j = mp.join(sp, Seq("query_id", "rank"))
    assert(j.filter(col("mp_cos") < col("sp_cos")).count() === 0,
      "multi-probe rank-wise cosine must dominate single-probe")
    // and it actually finds MORE (the fixture has cross-boundary
    // neighbors, otherwise the probe would be pointless)
    assert(mp.count() >= sp.select(count(lit(1))).head().getLong(0))
    assert(j.filter(col("mp_cos") > col("sp_cos")).count() > 0,
      "fixture should contain neighbors across one sign boundary")
    // cosines remain exact (same kernel): every hit appears in brute
    val brute = Similarity.bruteTopK(emb, "vec_id % 50 = 0", 100000)
      .select(col("query_id"), col("neighbor_id"), col("cos").as("bcos"))
    val chk = mp.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(chk.filter(col("bcos").isNull || col("bcos") =!= col("mp_cos")).count() === 0)
  }

  test("learned-IVF: recall vs brute dominates sign-bucket IVF at the same nprobe=1") {
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val brute = hits(Similarity.bruteTopK(emb, "vec_id % 50 = 0", 5))
    val sign = hits(Similarity.ivfTopK(emb, "vec_id % 50 = 0", 5))
    val learned = hits(Clustering.ivfLearnedTopK(emb, "vec_id % 50 = 0", 5, 4, 2))
    assert(brute.nonEmpty)
    val rl = (brute & learned).size.toDouble / brute.size
    val rs = (brute & sign).size.toDouble / brute.size
    assert(rl >= rs,
      s"learned cells should not lose to sign buckets: learned=$rl sign=$rs")
    // cosines remain exact: every learned hit appears in the full
    // brute ranking with the same cosine
    val bruteAll = Similarity.bruteTopK(emb, "vec_id % 50 = 0", 100000)
      .select(col("query_id"), col("neighbor_id"), col("cos").as("bcos"))
    val l = Clustering.ivfLearnedTopK(emb, "vec_id % 50 = 0", 5, 4, 2)
      .join(bruteAll, Seq("query_id", "neighbor_id"), "left")
    assert(l.filter(col("bcos").isNull || col("bcos") =!= col("cos")).count() === 0)
  }

  test("learned-IVF multi-probe: nprobe=2 recall strictly dominates nprobe=1") {
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val brute = hits(Similarity.bruteTopK(emb, "vec_id % 50 = 0", 5))
    val sp = Clustering.ivfLearnedTopK(emb, "vec_id % 50 = 0", 5, 8, 2)
    val mp = Clustering.ivfLearnedTopK(emb, "vec_id % 50 = 0", 5, 8, 2, nprobe = 2)
    // per (query, rank): the 2-cell candidate pool is a superset of
    // the 1-cell pool, so the k-th best cosine can never be worse
    val j = mp.select(col("query_id"), col("rank"), col("cos").as("mp_cos"))
      .join(sp.select(col("query_id"), col("rank"), col("cos").as("sp_cos")),
        Seq("query_id", "rank"))
    assert(j.filter(col("mp_cos") < col("sp_cos")).count() === 0,
      "multi-probe rank-wise cosine must dominate nprobe=1")
    // and recall vs brute strictly improves on this fixture (the
    // Voronoi boundaries cut real neighbor pairs, else nprobe would
    // be pointless)
    val rSp = (brute & hits(sp)).size
    val rMp = (brute & hits(mp)).size
    assert(rMp > rSp, s"expected strict recall gain: nprobe=2 $rMp vs nprobe=1 $rSp")
    // cosines remain exact: every multi-probe hit appears in the full
    // brute ranking with the same cosine
    val bruteAll = Similarity.bruteTopK(emb, "vec_id % 50 = 0", 100000)
      .select(col("query_id"), col("neighbor_id"), col("cos").as("bcos"))
    val chk = mp.join(bruteAll, Seq("query_id", "neighbor_id"), "left")
    assert(chk.filter(col("bcos").isNull || col("bcos") =!= col("cos")).count() === 0)
  }

  test("IVF-PQ multi-probe: coarseNprobe=2 ADC rank-wise dominates nprobe=1") {
    val sp = Clustering.pqTopK(emb, "vec_id % 50 = 0", 5, 2, 8, 2, coarseCells = 4)
      .select(col("query_id"), col("rank"), col("adist").as("sp_d"))
    val mp = Clustering.pqTopK(emb, "vec_id % 50 = 0", 5, 2, 8, 2,
        coarseCells = 4, coarseNprobe = 2)
      .select(col("query_id"), col("rank"), col("adist").as("mp_d"))
    // superset candidate pool: the k-th smallest ADC distance can only
    // shrink when a second coarse cell is probed
    val j = mp.join(sp, Seq("query_id", "rank"))
    assert(j.filter(col("mp_d") > col("sp_d")).count() === 0,
      "multi-probe rank-wise ADC distance must dominate nprobe=1")
    assert(j.filter(col("mp_d") < col("sp_d")).count() > 0,
      "fixture should contain candidates in the second-nearest coarse cell")
  }

  test("keepBest: exactly one keeper per cluster — max score, ties min id") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.1), (11L, 0.1))
      .toDF("doc_id", "score")
    val kept = Dedup.keepBest(labels, scores)
      .filter(col("keep")).select("cluster_id", "doc_id")
      .as[(Long, Long)].collect().toMap
    // cluster 1: docs 2 and 3 tie at 0.9 -> min id 2; cluster 10: tie -> 10
    assert(kept === Map(1L -> 2L, 10L -> 10L))
    val perCluster = Dedup.keepBest(labels, scores).filter(col("keep"))
      .groupBy("cluster_id").count().as[(Long, Long)].collect().toMap
    assert(perCluster.values.forall(_ == 1L))
  }

  test("simhash Hamming band join is COMPLETE: equals brute-force over signatures") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    val banded = key(Dedup.simhashNearDup(docs, 3))
    // brute-force reference over the same signatures
    val sh = TextOps.simhash(docs)
    val brute = key(sh.select(col("doc_id").as("a"), col("simhash").as("ha"))
      .join(sh.select(col("doc_id").as("b"), col("simhash").as("hb")),
        col("a") < col("b"))
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= 3))
    assert(banded === brute, "pigeonhole candidates must be lossless")
    assert(banded.nonEmpty, "fixture should contain Hamming-close signatures")
    intercept[IllegalArgumentException](Dedup.simhashNearDup(docs, 6)) // 60 % 7 != 0
  }

  test("incremental LSH == full LSH restricted to batch-touching pairs") {
    val corpus = docs.filter("doc_id % 20 != 7")
    val batch = docs.filter("doc_id % 20 = 7")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("a", "b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val inc = key(Dedup.minhashLshIncremental(corpus, batch))
    val full = key(Dedup.minhashLsh(docs)
      .filter(col("a") % 20 === 7 || col("b") % 20 === 7))
    assert(inc === full, "incremental pair set must equal the filtered full pass")
    assert(inc.nonEmpty, "fixture should produce batch-touching pairs")
  }

  test("index append: two appended batches == the fresh index; dedup through it identical") {
    // the maintenance half of X34: successive ingests extend the
    // standing index at O(batch) cost, never a rebuild
    val standing = docs.filter("doc_id % 20 != 3")
    val base = standing.filter("doc_id % 20 NOT IN (7, 13)")
    val batch1 = standing.filter("doc_id % 20 = 7")
    val batch2 = standing.filter("doc_id % 20 = 13")
    val appended = Dedup.minhashIndexAppend(
      Dedup.minhashIndexAppend(Dedup.minhashIndex(base), batch1), batch2)
    val fresh = Dedup.minhashIndex(standing)
    def shKey(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "s").as[(Long, String)].collect().toSet
    def bandKey(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "band", "sig").as[(Long, Int, String)].collect().toSet
    assert(shKey(appended._1) === shKey(fresh._1),
      "appended shingle relation must equal the fresh index's")
    assert(bandKey(appended._2) === bandKey(fresh._2),
      "appended band relation must equal the fresh index's")
    // and the next ingest probed through the appended index gets the
    // same answer as through a fresh rebuild
    val batch3 = docs.filter("doc_id % 20 = 3")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val viaAppended = key(Dedup.minhashLshIncremental(standing, batch3,
      corpusIndex = Some(appended)))
    val viaFresh = key(Dedup.minhashLshIncremental(standing, batch3,
      corpusIndex = Some(Dedup.minhashIndex(standing))))
    assert(viaAppended === viaFresh)
    assert(viaAppended.nonEmpty, "fixture should produce batch-touching pairs")
  }

  test("minhash hot-bucket cap: star routing bounds pairs, preserves components") {
    import spark.implicits._
    // 30 near-identical template docs (one shared 20-token template +
    // a unique tail token each — the mass-templated shape exact dedup
    // cannot remove) + the regular corpus docs
    val tplBase = (0 until 20).map(t => s"tpl$t").mkString(" ")
    val template = (0 until 30).map(i => (1000L + i, s"$tplBase ts$i", "syn"))
    val docsSyn = template.toDF("doc_id", "text", "source")
    val uncapped = Dedup.minhashLsh(docsSyn).filter(col("jaccard") >= 0.5)
    val capped = Dedup.minhashLsh(docsSyn, maxBucket = Some(8))
      .filter(col("jaccard") >= 0.5)
    // the cap bounds the emitted pair set (star ~n vs clique ~n²/2)...
    val (nCap, nFull) = (capped.count(), uncapped.count())
    assert(nFull >= 380L, s"uncapped should emit ~the full 435-pair clique, got $nFull")
    assert(nCap < nFull && nCap >= 29L, s"star routing should emit ~n pairs, got $nCap")
    // ...while the duplicate clusters are identical
    def comps(p: org.apache.spark.sql.DataFrame) = Dedup.clusters(p)
      .as[(Long, Long)].collect().toMap
    assert(comps(capped) === comps(uncapped))
  }

  test("repetition stats: duplicate lines surface, clean docs score zero") {
    import spark.implicits._
    val d = Seq(
      (1L, "unique one\nunique two\nunique three"),
      (2L, "spam line\nspam line\nspam line\nspam line"),
      (3L, "")).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(d).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("dup_line_ratio") === 0.0)
    assert(r(2L).getAs[Double]("dup_line_ratio") === 0.75)
    assert(r(2L).getAs[Double]("dup_char_ratio") === 0.75)
    assert(r(3L).getAs[Int]("n_lines") === 0)
    assert(r(3L).getAs[Double]("dup_char_ratio") === 0.0)
  }

  test("dedup clusters: components resolve transitively, min-id canonical, log-round chains") {
    import spark.implicits._
    // synthetic 61-node chain + a separate triangle: pointer jumping
    // must collapse the chain well inside maxRounds (log2(61) ≈ 6)
    val chain = (0 until 60).map(i => (i.toLong, i.toLong + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val cl = Dedup.clusters((chain ++ tri).toDF("a", "b"), maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 to 60).forall(i => cl(i.toLong) == 0L), "chain must collapse to min id 0")
    assert(Seq(100L, 101L, 102L).forall(cl(_) == 100L))
    // real pipeline: LSH pairs → clusters; every edge must land inside
    // one cluster and each cluster's id is its min member
    val pairs = Dedup.minhashLsh(docs).filter(col("jaccard") >= 0.5).cache()
    val c = Dedup.clusters(pairs)
    val lbl = c.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.select("a", "b").collect().foreach { r =>
      assert(lbl(r.getLong(0)) == lbl(r.getLong(1)), s"edge $r split across clusters")
    }
    c.groupBy("cluster_id").agg(min("doc_id").as("m")).collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(1), "cluster_id must equal its min member")
    }
    pairs.unpersist()
  }

  test("clustersWithRounds: log2 convergence count + block-manager hygiene") {
    import spark.implicits._
    // 65-node chain: diameter 64, pointer jumping must converge in
    // ~log2(64) + 1 = 7 rounds (the ccrounds probe measures the full
    // curve at 6.4M nodes; this pins the observable in-suite)
    val chain = (0 until 64).map(i => (i.toLong, i.toLong + 1))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // smallMax = 0 forces the distributed loop: the default would take
    // the union-find fast path for a 64-pair input and never iterate
    val (lbl, rounds) = Dedup.clustersWithRounds(chain.toDF("a", "b"), maxRounds = 12,
      smallMax = 0L)
    assert(lbl.filter(col("cluster_id") =!= 0L).count() === 0, "chain collapses to min id")
    assert(rounds <= 8, s"diameter 64 took $rounds rounds (log2 bound ~7)")
    // checkpoint hygiene: superseded rounds' blocks are freed as the
    // loop goes — only edges + the final labels survive the call, not
    // 2 blocks per round (the shape that OOM'ed the 25M-node probe)
    val live = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(live.size <= 3,
      s"${live.size} checkpoint RDDs still persisted after clusters (expect <= 3: edges + final)")
  }

  test("clusters small-graph union-find path == distributed loop, row for row") {
    import spark.implicits._
    // chains (deep diameter), a triangle, an isolated pair, duplicate
    // and reversed edges: the union-find fast path must produce the
    // exact relation the pointer-jumping loop converges to
    val edges = (0 until 40).map(i => (i.toLong, i.toLong + 1)) ++
      Seq((100L, 101L), (102L, 101L), (100L, 102L), (200L, 201L),
        (201L, 200L), (200L, 201L), (300L, 310L), (310L, 305L)) ++
      (0 until 40).map(i => (i.toLong + 1, i.toLong)) // reversed copies
    val df = edges.toDF("a", "b")
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.orderBy("doc_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val fast = Dedup.clustersWithRounds(df, maxRounds = 12)
    val loop = Dedup.clustersWithRounds(df, maxRounds = 12, smallMax = 0L)
    assert(fast._2 === 0, "small input must take the zero-round fast path")
    assert(loop._2 > 0, "smallMax = 0 must force the iterating loop")
    assert(rows(fast._1) === rows(loop._1))
  }

  test("sessions partition the event stream: counts add up, gaps split") {
    val s = Events.sessions(events, 30)
    assert(s.agg(sum("n_events")).head().getLong(0) === events.count())
    assert(s.filter(col("session_end") < col("session_start")).count() === 0)
    // more sessions than users (gaps exist in the data)
    assert(s.count() > events.select("user_id").distinct().count())
  }

  test("hourly window totals equal raw totals") {
    val h = Events.hourly(events)
    assert(h.agg(sum("n")).head().getLong(0) === events.count())
  }

  test("funnel: equals brute-force greedy chain per user, partial funnels kept, step counts non-increasing") {
    val steps = Seq("view", "click", "purchase")
    val got = Events.funnel(events, steps).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)))).toMap
    // driver-side reference: per user, earliest t1, then earliest
    // step-2 event >= t1, then earliest step-3 event >= t2
    val byUser = events.select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .groupBy(_._1)
    val want = byUser.flatMap { case (uid, evs) =>
      // micro-precision-safe min (Timestamp.getTime is millis-only)
      def earliest(tp: String, atOrAfter: Option[java.sql.Timestamp]) =
        evs.filter(e => e._2 == tp && atOrAfter.forall(a => !e._3.before(a)))
          .map(_._3).reduceOption((a, b) => if (a.before(b)) a else b)
      earliest(steps(0), None).map { t1 =>
        val t2 = earliest(steps(1), Some(t1))
        val t3 = t2.flatMap(t => earliest(steps(2), Some(t)))
        uid -> ((Option(t1), t2, t3))
      }
    }
    assert(got === want)
    // chain is monotone wherever present
    got.values.foreach { case (t1, t2, t3) =>
      t2.foreach(t => assert(!t.before(t1.get)))
      t3.foreach(t => assert(!t.before(t2.get)))
    }
    // summary counts match the per-user relation and never increase
    val cnt = Events.funnelSteps(events, steps).orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(cnt.map(_._2).toSeq === steps)
    assert(cnt(0)._3 === got.size.toLong)
    assert(cnt(1)._3 === got.values.count(_._2.isDefined).toLong)
    assert(cnt(2)._3 === got.values.count(_._3.isDefined).toLong)
    assert(cnt(0)._3 >= cnt(1)._3 && cnt(1)._3 >= cnt(2)._3)
  }

  test("retentionCohorts: equals brute-force cohort triangle, offsets are week-exact, week-0 covers every cohort user") {
    val r = Events.retentionCohorts(events, "signup").collect()
      .map(x => (x.getDate(0).toString, x.getInt(1)) -> x.getLong(2)).toMap
    // driver-side reference over the raw rows
    val rows = events.select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("w"), col("event_type"))
      .collect().map(x => (x.getLong(0), x.getDate(1), x.getString(2)))
    val cohortOf = rows.filter(_._3 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._2).minBy(_.getTime)).toMap
    val want = rows.map(x => (x._1, x._2)).distinct
      .flatMap { case (uid, w) => cohortOf.get(uid).collect {
        case cw if !w.before(cw) =>
          ((cw.toString, (java.time.temporal.ChronoUnit.DAYS
            .between(cw.toLocalDate, w.toLocalDate) / 7).toInt), 1L)
      }}
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(r === want)
    assert(r.nonEmpty)
    // week-0 count per cohort = cohort size (a signup IS activity)
    val sizes = cohortOf.values.groupBy(_.toString).view.mapValues(_.size.toLong).toMap
    sizes.foreach { case (cw, n) => assert(r((cw, 0)) === n) }
  }

  test("multimodal REAL codec: PNG encode→decode round-trip recovers synthesized shape/color") {
    val out = Multimodal.decodePng(spark, Multimodal.withPngPayload(spark, docs))
    assert(out.count() === docs.count())
    // expected features from the same content hash the synthesizer used
    val expect = docs.select(col("doc_id").cast("long").as("doc_id"), col("text")).collect()
      .map { r =>
        val h = Multimodal.textHash60(r.getString(1))
        val rgb = (h % 16777216).toInt
        r.getLong(0) -> ((16 + h % 48).toInt, (16 + (h / 48) % 48).toInt,
          ((rgb >> 16) & 0xff).toDouble, ((rgb >> 8) & 0xff).toDouble, (rgb & 0xff).toDouble)
      }.toMap
    val got = out.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (w, hh, mr, mg, mb) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("img_w") === w)
      assert(r.getAs[Int]("img_h") === hh)
      assert(r.getAs[Double]("mean_r") === mr)
      assert(r.getAs[Double]("mean_g") === mg)
      assert(r.getAs[Double]("mean_b") === mb)
      assert(r.getAs[Int]("n_bytes") > 0)    // real PNG payload
    }
  }

  test("audio REAL codec: WAV encode→decode round-trip, features match driver-side PCM, corrupt container fails loudly") {
    // byte-level round-trip on a local sample array (incl. extremes)
    val s0 = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 123, -456)
    val (r0, back) = Multimodal.decodeWav(Multimodal.encodeWav(22050, s0))
    assert(r0 === 22050 && back.toSeq === s0.toSeq)
    // header is canonical RIFF/WAVE: a standard reader's magic checks pass
    val bytes = Multimodal.encodeWav(8000, s0)
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    assert(bytes.length === 44 + 2 * s0.length)
    // corrupt magic must not decode silently
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeWav(bad) }
    // full pipeline: decoded features equal driver-side recompute from
    // the same content hash (spec → samples → features)
    val out = Multimodal.decodeWavFeatures(spark,
      Multimodal.withWavPayload(spark, docs)).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val res = Multimodal.resampleWav(spark,
      Multimodal.withWavPayload(spark, docs), 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out.nonEmpty && out.size === res.size)
    docs.select(col("doc_id").cast("long"), col("text")).collect().foreach { r =>
      val (rate, ns, hm) = Multimodal.wavSpec(Multimodal.textHash60(r.getString(1)))
      val pcm = Multimodal.synthSamples(hm, ns)
      val (peak, sumAbs, zc) = Multimodal.pcmFeatures(pcm)
      assert(out(r.getLong(0)) === ((rate, ns.toLong, ns.toLong * 1000 / rate,
        peak, sumAbs, zc)))
      val kept = Array.range(0, ns, 2).map(pcm)
      val (p2, sa2, zc2) = Multimodal.pcmFeatures(kept)
      assert(res(r.getLong(0)) === ((rate / 2, kept.length.toLong, p2, sa2, zc2)))
    }
  }

  test("multimodal stub decode: deterministic, consistent with relational meta") {
    val feats = Multimodal.decodeFeatures(spark, docs).toDF()
    val meta = Multimodal.metaRelational(docs)
    val j = feats.alias("f").join(meta.alias("m"), "doc_id")
    assert(j.count() === docs.count())
    assert(j.filter(col("f.width") =!= col("m.width") ||
      col("f.height") =!= col("m.height") ||
      col("f.format") =!= col("m.format") ||
      col("f.n_bytes") =!= col("m.n_bytes")).count() === 0)
    // byte stats are sane
    assert(feats.filter(col("mean_byte") <= 0.0 || col("mean_byte") >= 256.0).count() === 0)
    assert(feats.filter(col("entropy_q") < 0.0 || col("entropy_q") > 8.0).count() === 0)
    // deterministic across runs
    val again = Multimodal.decodeFeatures(spark, docs).toDF()
    assert(feats.exceptAll(again).count() === 0)
  }

  test("streaming: windowed counts over a stream equal the batch result") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val data = events.select("ts", "event_type").as[(java.sql.Timestamp, String)].collect()
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.streaming.StreamingOps.hourlyCounts(
        stream.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(data.toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.table("hourly_stream")
    val batch = graft.streaming.StreamingOps.hourlyCounts(events)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    q.stop()
  }

  test("streaming: stateful sessionization closes sessions on gap and on watermark timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = graft.streaming.StreamingOps.sessionizeStream(spark,
      stream.toDF().toDF("user_id", "ts", "value"))
    val q = out.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    stream.addData(Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0)))
    q.processAllAvailable()
    stream.addData(Seq((1L, ts(60), 5.0)))    // 50-min gap closes session 1
    q.processAllAvailable()
    // late-but-within-watermark event PRECEDING the open session's
    // start: must extend session_start backward (min, not keep)
    stream.addData(Seq((1L, ts(55), 0.5)))
    q.processAllAvailable()
    stream.addData(Seq((2L, ts(500), 1.0)))   // pushes watermark past 60+30
    q.processAllAvailable()
    stream.addData(Seq((2L, ts(501), 1.0)))   // next trigger fires the timeout
    q.processAllAvailable()
    val got = spark.table("sess_stream")
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().toSet
    q.stop()
    assert(got.contains((1L, ts(0), ts(10), 2L, 3.0)))     // closed by gap
    assert(got.contains((1L, ts(55), ts(60), 2L, 5.5)))    // closed by event-time timeout
  }

  test("streaming sessionization == static q_events_sessions on the sf0.01 events table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the contract-query input: real sub-millisecond timestamps, 10k
    // events — the DuckDB oracle then covers the streaming path
    // transitively through this row-for-row equality
    // adversarial decimal-cast boundaries: Spark casts the SHORTEST
    // repr of the double (7.8872335 -> 7.887234 HALF_UP) while the
    // exact binary expansion (...7334999...) would round DOWN — these
    // rows catch any drift between the two in the streaming kernel
    val boundary = Seq(
      (9000001L, "2027-03-01 00:00:00", 88888888L, "b", 7.8872335, ""),
      (9000002L, "2027-03-01 00:05:00", 88888888L, "b", 2.3308445, ""),
      (9000003L, "2027-03-01 00:40:00", 88888888L, "b", 0.0210605, ""))
      .map { case (e, t, u, et, v, p) =>
        (e, java.sql.Timestamp.valueOf(t), u, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ev = Events.load(spark, "/root/testdata/sf0.01")
      .unionByName(boundary)
    val static = Events.sessions(ev, 30)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    val rows = ev.select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)].collect()
    val maxTs = rows.map(_._2.getTime).max
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = graft.streaming.StreamingOps.sessionizeStream(spark,
      stream.toDF().toDF("user_id", "ts", "value"))
    val q = out.writeStream.format("memory").queryName("sess_equiv")
      .outputMode("append").start()
    stream.addData(rows.toIndexedSeq)
    q.processAllAvailable()
    // sentinel user far past every real session pushes the watermark
    // beyond end+gap for all of them; the second batch fires the
    // event-time timeouts that close the still-open sessions
    def sentinel(offsetH: Long) =
      (-1L, new java.sql.Timestamp(maxTs + offsetH * 3600 * 1000), 0.0)
    stream.addData(Seq(sentinel(2)))
    q.processAllAvailable()
    stream.addData(Seq(sentinel(3)))
    q.processAllAvailable()
    val streamed = spark.table("sess_equiv")
      .filter(col("user_id") >= 0)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    assert(streamed.count() === static.count())
    assert(streamed.exceptAll(static).count() === 0, "streamed rows not in static")
    assert(static.exceptAll(streamed).count() === 0, "static rows not in streamed")
    q.stop()
  }

  test("streaming: watermarked exact dedup keeps first occurrence per content hash") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.dedupStream(
      stream.toDF().toDF("doc_id", "content_hash", "ts"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    stream.addData(Seq(
      (1L, "aaa", ts(0)), (2L, "bbb", ts(1)), (3L, "aaa", ts(2))))   // 3 dups 1
    q.processAllAvailable()
    stream.addData(Seq((4L, "aaa", ts(3)), (5L, "ccc", ts(4))))      // 4 dups 1
    q.processAllAvailable()
    val got = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(got === Set(1L, 2L, 5L))
  }

  test("streaming dedup: state evicts past the horizon — a re-arrival is re-admitted") {
    // the documented horizon-bounded-exactness tradeoff of dedupStream:
    // within the watermark a duplicate hash is suppressed (covered by
    // the first-occurrence test); once the watermark passes the key's
    // state, the entry is EVICTED and the hash earns a fresh first
    // occurrence — bounded state means bounded memory, not global
    // exactness
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.dedupStream(
      stream.toDF().toDF("doc_id", "content_hash", "ts"), horizon = "30 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_evict")
      .outputMode("append").start()
    stream.addData(Seq((1L, "aaa", ts(0))))
    q.processAllAvailable()
    stream.addData(Seq((2L, "aaa", ts(5))))       // within horizon: suppressed
    q.processAllAvailable()
    stream.addData(Seq((3L, "zzz", ts(120))))     // watermark -> 90, "aaa" state evicted
    q.processAllAvailable()
    stream.addData(Seq((4L, "aaa", ts(125))))     // re-arrival past horizon: re-admitted
    q.processAllAvailable()
    val got = spark.table("dedup_evict").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(got === Set(1L, 3L, 4L),
      s"expected eviction-then-readmission semantics, got $got")
  }

  test("streaming windowed counts: beyond-watermark events are dropped from finalized windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val out = graft.streaming.StreamingOps.hourlyCounts(
      stream.toDF().toDF("ts", "event_type"))
    val q = out.writeStream.format("memory").queryName("hourly_late")
      .outputMode("append").start()
    // two events in hour 0, then drive the watermark far past hour 0's
    // 2-hour lateness allowance so the window finalizes and emits
    stream.addData(Seq((ts(10), "a"), (ts(20), "a")))
    q.processAllAvailable()
    stream.addData(Seq((ts(400), "b")))
    q.processAllAvailable()
    stream.addData(Seq((ts(401), "b")))
    q.processAllAvailable()
    // a straggler for hour 0 beyond the watermark: dropped — the
    // finalized count must not change and no second hour-0 row appears
    stream.addData(Seq((ts(30), "a")))
    q.processAllAvailable()
    stream.addData(Seq((ts(402), "b")))
    q.processAllAvailable()
    val hour0 = spark.table("hourly_late")
      .filter(col("hour") === ts(0) && col("event_type") === "a")
      .select("n").as[Long].collect().toSeq
    q.stop()
    assert(hour0 === Seq(2L),
      s"hour-0 'a' count must finalize at 2 with the late straggler dropped, got $hour0")
  }

  test("streaming sessionization: checkpoint restart resumes state without loss or duplication") {
    // the recovery contract a production ingest relies on: kill the
    // query with a session OPEN, restart from the same checkpoint, and
    // the restored state must close that session once, with every
    // pre-crash event counted — no lost events, no duplicate emission
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("sess_ckpt").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = graft.streaming.StreamingOps.sessionizeStream(spark,
      stream.toDF().toDF("user_id", "ts", "value"))
    // the memory sink is non-fault-tolerant (refuses checkpoint
    // recovery) — a parquet sink is the recoverable kind a real
    // pipeline uses
    val outDir = java.nio.file.Files.createTempDirectory("sess_out").toString
    def startQuery() = out.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = startQuery()
    // session opens (2 events) and stays OPEN — then the query dies
    stream.addData(Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0)))
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint
    val q2 = startQuery()
    // one more in-session event, then watermark sentinels close it
    stream.addData(Seq((1L, ts(15), 4.0)))
    q2.processAllAvailable()
    stream.addData(Seq((99L, ts(300), 0.0)))
    q2.processAllAvailable()
    stream.addData(Seq((99L, ts(400), 0.0)))
    q2.processAllAvailable()
    val u1 = spark.read.parquet(outDir)
      .filter(col("user_id") === 1L)
      .select("session_start", "session_end", "n_events", "sum_value")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Double)].collect().toSeq
    q2.stop()
    assert(u1 === Seq((ts(0), ts(15), 3L, 7.0)),
      s"restart must restore the open session and close it exactly once: $u1")
  }

  test("streaming sessionization: events beyond the watermark are dropped, within it merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = graft.streaming.StreamingOps.sessionizeStream(spark,
      stream.toDF().toDF("user_id", "ts", "value"))
    val q = out.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    // u1 opens a session [0, 10]; watermark after this batch is still
    // 0 (10 min - 30 min gap clamps at zero)
    stream.addData(Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0)))
    q.processAllAvailable()
    // out-of-order WITHIN the watermark (5 > watermark 0): must merge
    // into the open session
    stream.addData(Seq((1L, ts(5), 4.0)))
    q.processAllAvailable()
    // u99 drives the watermark to 90 (= 120 - gap 30)...
    stream.addData(Seq((99L, ts(120), 0.0)))
    q.processAllAvailable()
    // ...so u1's session (event-time timeout at end + gap = 40) fires
    // on this trigger
    stream.addData(Seq((99L, ts(121), 0.0)))
    q.processAllAvailable()
    // BEYOND the watermark (20 << 91): dropped by the stateful
    // operator — must not extend, resurrect, or open a session
    stream.addData(Seq((1L, ts(20), 8.0)))
    q.processAllAvailable()
    // push the watermark far past everything; fire remaining timeouts
    stream.addData(Seq((99L, ts(300), 0.0)))
    q.processAllAvailable()
    stream.addData(Seq((99L, ts(400), 0.0)))
    q.processAllAvailable()
    val got = spark.table("sess_late")
      .filter(col("user_id") === 1L)
      .select("session_start", "session_end", "n_events", "sum_value")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Double)].collect().toSeq
    q.stop()
    // exactly ONE u1 session: [0, 10] with the within-watermark t=5
    // event merged (3 events, sum 7.0) and the beyond-watermark t=20
    // event absent
    assert(got === Seq((ts(0), ts(10), 3L, 7.0)),
      s"late-data contract violated: $got")
  }

  test("streaming: near-dup flags with watermark-bounded dedup state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    // corpus: one known doc; its band index is what the stream probes
    val corpus = Seq((100L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val bands = TextOps.lshBands(
      TextOps.minhashFromShingles(TextOps.shingleSet(corpus, 5), 16), 4)
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.nearDupFlagsStream(
      stream.toDF().toDF("doc_id", "text", "ts"), bands,
      watermarkCol = Some("ts"))
    val q = out.writeStream.format("memory").queryName("neardup_wm")
      .outputMode("append").start()
    val dupText = "the quick brown fox jumps over the lazy dog again and again"
    val cleanText = "completely unrelated content with no shared shingles at all whatsoever today"
    stream.addData(Seq((1L, dupText, ts(0)), (2L, cleanText, ts(1))))
    q.processAllAvailable()
    // same flagged doc re-arrives WITHIN the watermark horizon (1 h):
    // suppressed by dropDuplicatesWithinWatermark
    stream.addData(Seq((1L, dupText, ts(2))))
    q.processAllAvailable()
    val got = spark.table("neardup_wm").as[Long].collect().toSeq
    q.stop()
    assert(got === Seq(1L),
      s"expected exactly one flag for doc 1 (match) and none for doc 2 (clean): $got")
  }

  test("streaming: per-batch regrid equals batch apply") {
    import graft.regrid._
    val gIn = RectGrid.of(-180, 180, 20, -90, 90, 12)
    val gOut = RectGrid.of(-180, 180, 15, -90, 90, 9)
    val src = Grids.cells(spark, gIn, withBounds = true)
    val dst = Grids.cells(spark, gOut, withBounds = true)
    val w = Weights.conservative(src, dst)
    val field = Grids.cells(spark, gIn).select(col("cell_id"),
      TestFields.waveSmooth(col("lon"), col("lat")).as("value"))
    val streamed = graft.streaming.StreamingOps.regridBatch(w, field)
    val batch = Apply.regrid(w, field, Grids.cells(spark, gOut), roundDigits = 0)
      .filter(col("value") =!= 0.0)
    assert(streamed.count() === batch.count())
  }

  // ---- decontamination / PII / sampling ----

  test("decontamination: flags exactly the overlap set incl. a planted eval copy; keep+flag partition train") {
    val eval = docs.filter("doc_id % 20 = 0")
    val train = docs.filter("doc_id % 20 <> 0")
    // plant a train doc that verbatim-copies an eval doc's text
    val planted = eval.orderBy("doc_id").limit(1)
      .select(lit(999983L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
    val train2 = train.unionByName(planted)

    val flagged = Decontam.contamination(train2, eval, 5)
    val ids = flagged.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(999983L), "verbatim eval copy must be flagged")

    // brute-force reference: plain distinct shingle-join, no broadcast
    val brute = TextOps.shingleSet(train2, 5)
      .join(TextOps.shingleSet(eval, 5).select("s"), "s")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(ids === brute)

    // the verbatim copy shares its ENTIRE shingle set
    val nsh = TextOps.shingleSet(planted, 5).count()
    val row = flagged.filter(col("doc_id") === 999983L).head()
    assert(row.getLong(1) === nsh && row.getLong(2) >= 1L)

    // decontaminate == train minus flagged (partition, no overlap)
    val kept = Decontam.decontaminate(train2, eval, 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(ids).isEmpty)
    assert(kept.size + ids.size === train2.count())
  }

  test("PII redaction: fixture counts and masks exact, clean text untouched, idempotent") {
    val fx = Seq(
      (1L, "mail a.b_c%x+1@ex-ample.co.uk or q@y.io thanks"),
      (2L, "call +1-555-0042 or +49-30-1234567 now"),
      (3L, "from 192.168.3.17 to 10.0.255.1."),
      (4L, "no pii here, just words 12.5 and 3.4"),
      (5L, "mixed: u@v.org +1-555-0199 10.1.2.3")
    ).toDF("doc_id", "text")
    val r = Pii.redact(fx).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) === 2 &&
      r(1L).getString(4) === "mail <EMAIL> or <EMAIL> thanks")
    assert(r(2L).getInt(2) === 2 &&
      r(2L).getString(4) === "call <PHONE> or <PHONE> now")
    assert(r(3L).getInt(3) === 2 &&
      r(3L).getString(4) === "from <IP> to <IP>.")
    assert((1 to 3).forall(i => r(4L).getInt(i) === 0) &&
      r(4L).getString(4) === "no pii here, just words 12.5 and 3.4")
    assert(r(5L).getInt(1) === 1 && r(5L).getInt(2) === 1 && r(5L).getInt(3) === 1 &&
      r(5L).getString(4) === "mixed: <EMAIL> <PHONE> <IP>")
    // a second pass over redacted output finds nothing and changes nothing
    val again = Pii.redact(Pii.redact(fx)
      .select(col("doc_id"), col("redacted").as("text"))).collect()
    assert(again.forall(x => x.getInt(1) + x.getInt(2) + x.getInt(3) === 0))
    assert(again.map(x => x.getLong(0) -> x.getString(4)).toMap ===
      r.map { case (k, v) => k -> v.getString(4) })
  }

  /** Test-side replica of TextOps.hash60 (md5, first 15 hex chars). */
  private def h60t(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("stratified sample: exact hash membership, rate-monotone, shuffle-free plan") {
    val rates03 = (0 to 19).map(i => s"src$i" -> 0.3).toMap
    val got = Sampling.stratified(docs, rates03, "t")
      .select("doc_id").as[Long].collect().toSet
    val expect = docs.select("doc_id").as[Long].collect()
      .filter(id => h60t(s"t:$id") % 1000000 < 300000).toSet
    assert(got === expect)
    // monotone: raising every rate only adds rows
    val bigger = Sampling.stratified(docs, rates03.map { case (k, _) => k -> 0.6 }, "t")
      .select("doc_id").as[Long].collect().toSet
    assert(got.subsetOf(bigger))
    // the sample decision is a scan-stage filter: no exchange in the plan
    val plan = Sampling.stratified(docs, rates03, "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample plan must not shuffle:\n$plan")
  }

  test("perStratumTopK: exactly k per source, equals one-level rank, partition-invariant") {
    val k = 7
    def key(df: DataFrame) = df.select("doc_id", "source", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val t1 = key(Sampling.perStratumTopK(docs, k, "t"))
    // every source contributes exactly k rows with ranks 1..k
    val bySrc = t1.groupBy(_._2)
    assert(bySrc.forall { case (_, rs) => rs.map(_._3).toSeq.sorted == (1 to k) })
    // reference: one-level rank computed driver-side
    val ref = docs.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).toSeq.flatMap { case (src, rows) =>
        rows.toSeq.sortBy { case (id, _) => (h60t(s"t:$id") % 1000000, id) }
          .take(k).zipWithIndex
          .map { case ((id, _), i) => (id, src, i + 1) }
      }.toSet
    assert(t1 === ref)
    // the two-level draw is exact under any input partitioning
    val t2 = key(Sampling.perStratumTopK(docs.repartition(13), k, "t"))
    assert(t2 === t1)
  }

  test("property: packGreedy equals a straight-line next-fit reference on random corpora") {
    val cap = 100L
    for (seed <- 1 to 5) {
      val r = new scala.util.Random(seed)
      // token counts hit the boundaries on purpose: exactly-capacity
      // docs, capacity+1 (oversize), tiny docs
      val nToks = Array.fill(400)(r.nextInt(120) match {
        case x if x >= 115 => cap            // == capacity: fits alone exactly
        case x if x >= 110 => cap + 1 + x    // oversize
        case x             => x + 1L
      })
      val in = nToks.zipWithIndex
        .map { case (n, i) => (i.toLong, n) }.toSeq.toDF("doc_id", "n_tok")
      val got = Packing.packGreedy(in, cap, 3, s"seed$seed").collect()
        .map(x => (x.getLong(0), (x.getInt(1), x.getLong(3), x.getLong(4)))).toMap
      // driver-side reference: group by the same hash shard, walk in
      // doc_id order carrying (bin, fill)
      val ref = scala.collection.mutable.Map[Long, (Int, Long, Long)]()
      (0 until 3).foreach { shard =>
        val mine = nToks.indices.map(_.toLong)
          .filter(id => (h60t(s"seed$seed:$id") % 3).toInt == shard)
        var bin = 0L; var fill = 0L
        mine.foreach { id =>
          val n = nToks(id.toInt)
          val off = if (fill > 0 && fill + n > cap) { bin += 1; fill = 0L; 0L }
                    else fill
          fill = off + n
          ref(id) = (shard, bin, off)
        }
      }
      assert(got === ref.toMap, s"seed $seed mismatch")
    }
  }

  test("kmeans: SSE non-increasing over iterations, partition-invariant, k covers") {
    def run(df: org.apache.spark.sql.DataFrame, iters: Int) =
      Clustering.kmeans(df, 4, iters)
    val sse = (1 to 3).map(i =>
      run(emb, i).agg(sum("dist2")).as[Double].head())
    assert(sse.sliding(2).forall(w => w(1) <= w(0) * (1 + 1e-12)),
      s"SSE increased across Lloyd iterations: $sse")
    val base = run(emb, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    // exact under any input partitioning (quantized sums are exact,
    // so no float-order drift between 4 and 13 partitions)
    val reparted = run(emb.repartition(13), 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(reparted === base)
    // every vector assigned, clusters within [0, k)
    assert(base.size === emb.count())
    assert(base.map(_._2).forall(c => c >= 0 && c < 4))
  }

  test("semanticDedup: rep is the min id of its group, pairs share a rep, keeps partition") {
    val out = Clustering.semanticDedup(emb, 4, 2, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === emb.count())
    out.foreach { case (id, rep, keep) =>
      assert(keep === (rep == id))
      assert(rep <= id, s"rep $rep > member $id (min-label violated)")
    }
    // every assigned rep is itself a kept row
    val reps = out.filter(_._3).map(_._1).toSet
    out.foreach { case (_, rep, _) => assert(reps.contains(rep)) }
    // every within-cell near-dup pair landed in one group (kmeans is
    // deterministic, so recomputing the cells reproduces them exactly)
    val asg = Clustering.kmeans(emb, 4, 2)
      .select(col("vec_id"), col("cluster").as("g"))
    val repOf = out.map(x => x._1 -> x._2).toMap
    val pairs = Similarity.withinGroupPairs(emb, asg, 0.45)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(repOf(a) === repOf(b), s"pair ($a, $b) split across groups")
    }
  }

  test("streaming decontamination flags the same docs as the static pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = docs.filter("doc_id % 20 = 0")
    val train = docs.filter("doc_id % 20 != 0")
    val staticFlags = Decontam.contamination(train, evalDocs, 5)
      .select("doc_id").as[Long].collect().toSet
    assert(staticFlags.nonEmpty)
    // stream the training docs in two micro-batches
    val rows = train.select("doc_id", "text").as[(Long, String)].collect()
    val stream = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingOps.decontamFlagsStream(
      stream.toDF().toDF("doc_id", "text"), evalDocs)
    val q = out.writeStream.format("memory").queryName("decontam_stream")
      .outputMode("append").start()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    stream.addData(b1.toSeq); q.processAllAvailable()
    stream.addData(b2.toSeq); q.processAllAvailable()
    val got = spark.table("decontam_stream").as[Long].collect().toSet
    q.stop()
    assert(got === staticFlags)
  }

  test("packGreedy: next-fit invariants, oversize isolation, partition-invariant") {
    val cap = 64L
    // plant one doc longer than the capacity among real docs
    val oversize = Seq((900001L, ("tok " * 100).trim)).toDF("doc_id", "text")
    val in = docs.select("doc_id", "text").unionByName(oversize)
    val p = Packing.packGreedy(in, cap, 4, "t")
    val rows = p.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === in.count())
    val byBin = rows.groupBy(r => (r._2, r._4))
    byBin.foreach { case ((shard, bin), ds) =>
      val sorted = ds.sortBy(_._1)
      // offsets are the exact running token sum, in doc_id order
      var fill = 0L
      sorted.foreach { case (id, _, n, _, off) =>
        assert(off === fill, s"doc $id in ($shard, $bin): offset $off != fill $fill")
        fill += n
      }
      // a bin only exceeds capacity when it holds a single oversize doc
      assert(fill <= cap || (ds.length == 1 && ds.head._3 > cap),
        s"bin ($shard, $bin) overfilled to $fill with ${ds.length} docs")
    }
    // the planted oversize doc sits alone in its bin
    val big = rows.find(_._1 == 900001L).get
    assert(big._3 === 100 && big._5 === 0L &&
      byBin((big._2, big._4)).length === 1)
    // bin ids are dense 0..max per shard
    rows.groupBy(_._2).foreach { case (_, ds) =>
      val bins = ds.map(_._4).distinct.sorted
      assert(bins === (0L until bins.length).toArray)
    }
    // deterministic under input partitioning (shuffle + sort fixes order)
    val p13 = Packing.packGreedy(in.repartition(13), cap, 4, "t")
    assert(p13.collect().toSet === p.collect().toSet)
    // audit math: utilization consistent with assignments
    val st = Packing.packStats(p, cap).collect()
    st.foreach { r =>
      val (nBins, nTok) = (r.getLong(1), r.getLong(3))
      assert(math.abs(r.getDouble(4) - nTok.toDouble / (nBins * cap)) < 1e-9)
    }
  }

  test("duplicateSpans: planted cross-doc + within-doc spans located exactly, islands disjoint") {
    // A and B share an 8-token phrase at different offsets; C repeats a
    // 5-token phrase internally; all other tokens are globally unique.
    val phrase = (1 to 8).map(i => s"P$i").mkString(" ")
    val rep = (1 to 5).map(i => s"q$i").mkString(" ")
    val corpus = Seq(
      (1L, s"u1 u2 u3 $phrase u4 u5 u6"),  // phrase at tokens 3..10
      (2L, s"v1 v2 $phrase v3 v4 v5 v6"),  // phrase at tokens 2..9
      (3L, s"w1 $rep w2 $rep w3"),         // rep at 1..5 and 7..11
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")
    ).toDF("doc_id", "text")
    val spans = Spans.duplicateSpans(corpus, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.toSet === Set(
      (1L, 3, 10, 8), (2L, 2, 9, 8), (3L, 1, 5, 5), (3L, 7, 11, 5)))
    // islands on the real corpus: disjoint with >= 1 unique token between
    val real = Spans.duplicateSpans(docs, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(real.nonEmpty, "expected duplicated spans in the near-dup corpus")
    real.groupBy(_._1).foreach { case (id, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(s2 > e1 + 1, s"doc $id: spans not merged ($e1, $s2)")
        case _ =>
      }
    }
  }

  test("scrub removes exactly the span tokens and keeps every doc") {
    val sc = Spans.scrub(docs, 5)
    assert(sc.count() === docs.count())
    val spanSum = Spans.duplicateSpans(docs, 5)
      .groupBy("doc_id").agg(sum("span_toks").as("st"))
    val joined = sc.join(spanSum, Seq("doc_id"), "left")
      .selectExpr("doc_id", "n_tokens", "n_removed",
        "coalesce(st, 0L) AS st",
        "size(split(clean_text, ' ')) AS n_clean")
      .collect()
    joined.foreach { r =>
      assert(r.getInt(2) === r.getLong(3).toInt,
        s"doc ${r.getLong(0)}: n_removed != span token sum")
      // split('') gives one empty token; fully-scrubbed docs excepted
      if (r.getInt(1) > r.getInt(2))
        assert(r.getInt(4) === r.getInt(1) - r.getInt(2),
          s"doc ${r.getLong(0)}: clean_text token count")
    }
    // scrubbing a span-free corpus is the identity (modulo whitespace norm)
    val clean = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    assert(Spans.scrub(clean, 5).select("doc_id", "clean_text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a b c"), (2L, "d e f")))
  }

  test("bm25TopK equals a straight-line reference implementation, ranks rare terms up") {
    // reference BM25 on the collected corpus, same micro-unit quantization
    val terms = Seq("spark", "vector", "merge")
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val n = corpus.length
    val avgdl = corpus.map(_._2.length.toLong).sum.toDouble / n.toDouble
    val dfm = terms.map(t => t -> corpus.count(_._2.contains(t))).toMap
    val expected = corpus.flatMap { case (id, toks) =>
      val dl = toks.length
      val s = terms.map { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) 0L
        else {
          val idf = math.log(1.0 + (n.toDouble - dfm(t) + 0.5) / (dfm(t) + 0.5))
          math.floor(idf * (tf * Search.k1p1) /
            (tf + Search.k1 * (1.0 - Search.b + Search.b * dl / avgdl)) * 1e6 + 0.5).toLong
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Search.bm25TopK(docs, terms, 20).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6), r.getInt(2)))
    assert(got.map(_._3).toSeq === (1 to 20))
    assert(got.map(g => (g._1, g._2)).toSeq === expected.toSeq)
    // a rare term outranks a flood of a common one
    val synth = Seq(
      (1L, "zebra crossing here"),
      (2L, "the the the the the the the the"),
      (3L, "the zebra runs"),
      (4L, "the quick fox"), (5L, "the slow fox"), (6L, "the red fox")
    ).toDF("doc_id", "text")
    val top = Search.bm25TopK(synth, Seq("zebra", "the"), 6).collect()
    assert(Set(1L, 3L).contains(top.head.getLong(0)),
      s"rare-term doc should rank first, got ${top.head.getLong(0)}")
  }

  test("hashedClassifier: integer fold matches md5 reference, prob bounded and monotone in z") {
    val got = TextOps.hashedClassifier(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.take(20).foreach { case (id, nTok, wSum, _, _) =>
      val toks = texts(id).trim.split("\\s+").toSeq
      assert(nTok === toks.length)
      assert(wSum === toks.map(t => h60t(t) % 2001 - 1000).sum,
        s"doc $id: hashed-feature sum mismatch")
    }
    got.foreach { case (id, _, _, p, keep) =>
      assert(p > 0.0 && p < 1.0, s"doc $id prob $p outside (0,1)")
      assert(keep === (p >= 0.5))
    }
    // prob strictly increases with the mean activation
    val byZ = got.map(g => (g._3.toDouble / (1000.0 * g._2), g._4)).sortBy(_._1)
    byZ.sliding(2).foreach {
      case Array((z1, p1), (z2, p2)) =>
        if (z2 > z1) assert(p2 >= p1, s"prob not monotone at z=$z1..$z2")
      case _ =>
    }
  }

  test("splitAssign: total partition, stable under corpus growth, proportions near cuts") {
    val s1 = Sampling.splitAssign(docs, "t").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1.size === docs.count())
    // growth stability: assignments on a prefix agree with the full corpus
    val s2 = Sampling.splitAssign(docs.limit(100), "t").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    s2.foreach { case (id, sp) => assert(s1(id) === sp) }
    val frac = s1.values.groupBy(identity).view.mapValues(_.size.toDouble / s1.size).toMap
    assert(frac("train") > 0.94 && frac("train") < 1.0)
    assert(frac.getOrElse("val", 0.0) < 0.05 && frac.getOrElse("test", 0.0) < 0.05)
    // different salt reshuffles membership
    val s3 = Sampling.splitAssign(docs, "other").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1.exists { case (id, sp) => s3(id) != sp })
  }

  test("shuffleOrder: exact permutation equal to the one-level rank, invariant to partitioning and bucket count") {
    def key(df: DataFrame) = df.select("doc_id", "ord").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = key(Sampling.shuffleOrder(docs, "t", 100))
    val n = docs.count()
    // a permutation: every ord in [0, n) exactly once
    assert(got.values.toSeq.sorted === (0L until n))
    // equals the driver-side global sort by (u, doc_id)
    val ref = docs.select("doc_id").as[Long].collect()
      .sortBy(id => (h60t(s"t:$id") % 1000000, id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got === ref)
    // two-level rank is exact under any partitioning / bucket width
    assert(key(Sampling.shuffleOrder(docs.repartition(13), "t", 100)) === got)
    assert(key(Sampling.shuffleOrder(docs, "t", 8)) === got)
    // a different salt is a different permutation
    assert(key(Sampling.shuffleOrder(docs, "u", 100)) !== got)
  }

  test("exactPercentiles: equals the driver-side sort at every rank, any bucket width, ties and negatives included") {
    // skewed synthetic values: a hot tie block (the map-side-combine
    // case), negatives (floor-div bucket order), and a spread tail
    val vals = Seq.fill(40)(7L) ++ (-20L to -1L) ++ (1L to 60L).map(_ * 13) ++ Seq(Long.MinValue / 4, 0L, 0L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("doc_id", "v").repartition(7)
    val pcts = Seq(1, 10, 25, 50, 75, 90, 99, 100)
    def run(width: Long) = Sampling.exactPercentiles(df, "v", pcts, width)
      .orderBy("pct").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val sorted = vals.sorted
    val want = pcts.map { p =>
      val rk = (p.toLong * vals.size + 99) / 100
      (p, rk, sorted((rk - 1).toInt))
    }
    assert(run(64).toSeq === want)
    // exactness is width-invariant: 1 (bucket = value) through huge
    // (single bucket — degenerates to the per-value pass alone)
    for (w <- Seq(1L, 3L, 1000000L)) assert(run(w).toSeq === want)
    // percentile domain + empty input
    intercept[IllegalArgumentException] { Sampling.exactPercentiles(df, "v", Seq(0)) }
    intercept[IllegalArgumentException] { Sampling.exactPercentiles(df, "v", Nil) }
    assert(Sampling.exactPercentiles(df.limit(0), "v", pcts).count() === 0)
    // grouped: per-group ranks equal the per-group driver-side sort
    // (unequal group sizes, shared values across groups)
    val gdf = df.withColumn("grp", when(col("doc_id") % 3 === 0, "a").otherwise("b"))
    val got = Sampling.exactPercentilesBy(gdf, "v", pcts, Seq("grp"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val wantG = vals.zipWithIndex.groupBy { case (_, i) => if (i % 3 == 0) "a" else "b" }
      .flatMap { case (grp, vs) =>
        val s = vs.map(_._1).sorted
        pcts.map { p =>
          val rk = (p.toLong * s.size + 99) / 100
          (grp, p, rk, s((rk - 1).toInt))
        }
      }.toSet
    assert(got === wantG)
  }

  test("temperatureMixRates: sqrt shares sum to 1, up-weight small sources, spend the budget") {
    val r = Sampling.temperatureMixRates(docs, 250)
      .select("source", "n_tokens", "p_mix", "rate_u").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
    assert(math.abs(r.map(_._3).sum - 1.0) < 1e-6)
    val totTok = r.map(_._2).sum.toDouble
    // τ=0.5 up-weights small sources: rate ordering is inverse to size
    val bySize = r.sortBy(_._2)
    assert(bySize.head._4 >= bySize.last._4)
    // expected kept tokens ≈ budget (within rounding; no source capped here)
    val spent = r.map(x => x._4 / 1e6 * x._2).sum
    assert(math.abs(spent - 0.25 * totTok) / totTok < 0.01)
    // rates monotone in budget, capped at 1e6
    val r2 = Sampling.temperatureMixRates(docs, 1000)
      .select("source", "rate_u").collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { case (s, _, _, u) => assert(r2(s) >= u && r2(s) <= 1000000L) }
    // the sampled membership is the exact hash filter at those rates
    val rateBySrc = r.map(x => x._1 -> x._4).toMap
    val got = Sampling.temperatureMixSample(docs, 250, "t")
      .select("doc_id").as[Long].collect().toSet
    val expect = docs.select("doc_id", "source").collect()
      .filter(x => h60t(s"t:${x.getLong(0)}") % 1000000 < rateBySrc(x.getString(1)))
      .map(_.getLong(0)).toSet
    assert(got === expect)
  }

  test("temperatureMixRates tau grid: lower tau flattens the mixture toward uniform") {
    // p_mix spread (max/min over sources) must shrink monotonically as
    // tau drops: x^(1/4) compresses size differences harder than x^(3/4)
    def spread(tauQ: Int): Double = {
      val p = Sampling.temperatureMixRates(docs, 250, tauQ)
        .select("p_mix").as[Double].collect()
      p.max / p.min
    }
    val (s1, s2, s3) = (spread(1), spread(2), spread(3))
    assert(s1 < s2 && s2 < s3,
      s"mixture should flatten as tau drops: spreads $s1 (tau=.25) $s2 (.5) $s3 (.75)")
    // every tau's shares still sum to 1
    (1 to 3).foreach { q =>
      val tot = Sampling.temperatureMixRates(docs, 250, q)
        .select("p_mix").as[Double].collect().sum
      assert(math.abs(tot - 1.0) < 1e-6, s"tau_q=$q shares sum $tot")
    }
    assertThrows[IllegalArgumentException](Sampling.tauPowExpr("x", 4))
  }

  test("fuzzyContamination: planted eval near-copy flagged, clean corpus silent, partition-invariant") {
    // eval doc 0's text with one appended token — shingle Jaccard ≈
    // (L−4)/(L−3) ≈ 0.98, not identical (the near-dup contamination
    // case); with fixed md5-derived hashes the collision is
    // deterministic, not probabilistic
    val evalDocs = docs.limit(5)
    val base = evalDocs.select("text").as[String].head()
    val perturbed = base.trim + " xqzt"
    val train = docs.filter(col("doc_id") >= 200).limit(40)
      .unionByName(spark.createDataset(Seq((900001L, perturbed)))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("srcX"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(docs.columns.map(col): _*))
    val flagged = Decontam.fuzzyContamination(train, evalDocs)
    val byId = flagged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.contains(900001L), s"planted near-copy not flagged: $byId")
    assert(byId(900001L) >= 1 && byId(900001L) <= 4) // k/rowsPerBand = 4 bands
    // unrelated synthetic docs never collide on a full band
    assert(!byId.keys.exists(_ != 900001L))
    val again = Decontam.fuzzyContamination(train.repartition(7), evalDocs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === byId)
  }

  test("end-to-end curation pipeline: dedup -> decontam -> filter -> mix -> split -> chunk -> pack composes") {
    // the full corpus-curation chain over sf0.001 + planted artifacts:
    // an exact duplicate (drops in dedup) and an eval copy (drops in
    // decontamination); every stage's output feeds the next
    val evalDocs = docs.filter(col("doc_id") % 20 === 0)
    val trainRaw = docs.filter(col("doc_id") % 20 =!= 0)
    val dupOfTrain = trainRaw.limit(1)
      .select(lit(700000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val evalCopy = evalDocs.limit(1)
      .select(lit(700001L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val corpus = trainRaw.unionByName(dupOfTrain).unionByName(evalCopy)

    // 1. exact dedup keeps one of each duplicate group
    val keep = Dedup.exact(corpus).select(col("keep_id").as("doc_id"))
    val deduped = corpus.join(keep, "doc_id")
    assert(deduped.count() === trainRaw.count() + 1)  // dup dropped, eval copy still here
    assert(deduped.filter(col("doc_id") === lit(700000L)).count() === 0)

    // 2. decontamination drops the planted eval copy (and any organic overlap)
    val cleaned = Decontam.decontaminate(deduped, evalDocs, 5)
    assert(cleaned.filter(col("doc_id") === lit(700001L)).count() === 0)

    // 3. quality gate (hashed classifier) — deterministic filter
    val kept = TextOps.hashedClassifier(cleaned).filter(col("keep"))
      .select("doc_id").join(cleaned, "doc_id")
    assert(kept.count() > 0 && kept.count() <= cleaned.count())

    // 4. temperature mixing spends ~the token budget on the survivors
    val mixed = Sampling.temperatureMixSample(kept, 500, "e2e")
    val keptTok = mixed.selectExpr(s"sum(size(${TextOps.tokensExpr}))").head().getLong(0)
    val totTok = kept.selectExpr(s"sum(size(${TextOps.tokensExpr}))").head().getLong(0)
    assert(math.abs(keptTok.toDouble / totTok - 0.5) < 0.1,
      s"mix spent ${keptTok.toDouble / totTok} of the budget, wanted ~0.5")

    // 5. split assignment partitions the sample
    val split = Sampling.splitAssign(mixed, "e2e")
    assert(split.count() === mixed.count())
    assert(split.select("split").distinct().count() <= 3)

    // 6. train docs chunked into 32-token windows, then packed into
    //    128-token training sequences — every chunk lands in exactly
    //    one bin and no bin overflows
    val train = split.filter(col("split") === "train")
    val chunks = TextOps.chunkDocs(train, 32, 32)
      .select((col("doc_id") * 1000 + col("chunk_id")).as("doc_id"),
        col("chunk_len").cast("long").as("n_tok"))
    val packed = Packing.packGreedy(chunks, 128L, 4)
    assert(packed.count() === chunks.count())
    val over = packed.groupBy("shard", "bin_id").agg(sum("n_tok").as("fill"))
      .filter(col("fill") > 128L).count()
    assert(over === 0L, s"$over bins overfilled")
  }

  test("corpusReport: grouped means equal driver-side recomputation from per-doc scores") {
    val rep = TextOps.corpusReport(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toMap
    val perDoc = TextOps.qualityScore(docs, carry = Seq("source", "lang")).collect()
      .map(r => (r.getString(1), r.getString(2), r.getInt(4).toLong,
        math.floor(r.getDouble(7) * 1e9 + 0.5).toLong))
    perDoc.groupBy(_._1).foreach { case (src, rows) =>
      val (nDocs, nTok, meanTok, nLangs, meanQ) = rep(src)
      assert(nDocs === rows.length)
      assert(nTok === rows.map(_._3).sum)
      assert(nLangs === rows.map(_._2).distinct.length)
      assert(meanTok === math.floor(nTok.toDouble / nDocs * 1e9 + 0.5) / 1e9)
      assert(meanQ === math.floor(rows.map(_._4).sum.toDouble / nDocs / 1e9 * 1e9 + 0.5) / 1e9)
    }
    assert(rep.keySet === perDoc.map(_._1).toSet)
  }

  test("stripMarkup: tags out, entities decoded once, clean text is a fixpoint") {
    val probe = spark.createDataset(Seq(
        (1L, "<div class=\"x\"><p>hello <b>world</b></p></div>"),
        (2L, "a &amp; b &lt;tag&gt; c &amp;lt; d"),   // &amp;lt; must NOT double-decode
        (3L, "  plain   text  with	spaces "),
        (4L, "<script>var x = 1;</script>keep")))
      .toDF("doc_id", "text")
    val got = TextOps.stripMarkup(probe).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) === ((6, 0, "hello world")))
    assert(got(2L) === ((0, 4, "a & b <tag> c &lt; d")))
    assert(got(3L) === ((0, 0, "plain text with spaces")))
    assert(got(4L) === ((2, 0, "var x = 1; keep")))
    // idempotence on already-clean text: stripping a stripped corpus
    // changes nothing and reports zero dirt (modulo re-escaped
    // entities, absent here)
    val again = TextOps.stripMarkup(
        TextOps.stripMarkup(probe.filter(col("doc_id") =!= 2))
          .selectExpr("doc_id", "clean_text AS text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    again.foreach { case (id, t, e, c) =>
      assert(t === 0 && e === 0 && c === got(id)._3)
    }
  }

  test("assignToCentroids reproduces training assignments; edge-case contracts fail loudly") {
    // incremental path: assigning the training corpus to the trained
    // centroids is bit-identical to the in-training final assignment
    val (asg, cents) = Clustering.kmeansFull(emb, 4, 2)
    val trained = asg.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val applied = Clustering.assignToCentroids(emb, cents).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(applied === trained)
    // a shifted new batch still lands in some trained cell
    val newBatch = emb.limit(10).selectExpr("vec_id + 5000 AS vec_id",
      "transform(embedding, x -> CAST(x * 0.9e0 + 0.01e0 AS FLOAT)) AS embedding")
    val nb = Clustering.assignToCentroids(newBatch, cents)
    assert(nb.count() === 10)
    assert(nb.filter(col("cluster") < 0 || col("cluster") >= 4).count() === 0)
    // edge contracts
    intercept[IllegalArgumentException] {
      Clustering.assignToCentroids(emb, Array.empty)
    }
    // two-level path: probing EVERY coarse group covers the whole
    // codebook, so the result is bit-identical to the dense scan
    // (same fold order, same tie-breaks) regardless of the grouping
    val allProbes = Clustering.assignToCentroids(emb, cents,
      coarseGroups = 2, coarseProbes = 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(allProbes === trained,
      "two-level with p = g must equal the dense scan bit-for-bit")
    // single-probe two-level on a trained codebook: the coarse groups
    // follow the codebook's own structure, so agreement stays high
    // even at p = 1 (quality, not a bit-contract — report + floor)
    val one = Clustering.assignToCentroids(emb, cents,
      coarseGroups = 2, coarseProbes = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agree = trained.count { case (id, (cl, _)) => one(id) == cl }.toDouble / trained.size
    info(f"two-level p=1/g=2 agreement vs dense: $agree%.3f")
    assert(agree > 0.8, s"two-level p=1 agreement collapsed: $agree")
    // two-level TRAINING with p = g probes every group in every Lloyd
    // round, so the whole training trajectory — every per-round
    // assignment, hence every centroid update — is bit-identical to
    // dense training (same fold order, same tie-breaks)
    val (asgTL, centsTL) = Clustering.kmeansFullTwoLevel(emb, 4, 2,
      coarseGroups = 2, coarseProbes = 2)
    assert(asgTL.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap === trained,
      "two-level training with p = g must equal dense training bit-for-bit")
    assert(centsTL.map { case (i, c) => (i, c.toSeq) }.toSeq ===
      cents.map { case (i, c) => (i, c.toSeq) }.toSeq)
    intercept[IllegalArgumentException] {
      Clustering.kmeansFullTwoLevel(emb, 4, 2, coarseGroups = 0)
    }
    intercept[IllegalArgumentException] { Sampling.shuffleOrder(docs, "t", 7) }
    intercept[IllegalArgumentException] { Sampling.temperatureMixRates(docs, 1001) }
    intercept[IllegalArgumentException] { TextOps.chunkDocs(docs, 8, 9) }
    intercept[IllegalArgumentException] { Sampling.weightedTopK(docs, "1.0e0", 0) }
    intercept[IllegalArgumentException] {
      Clustering.pqTopK(emb, "vec_id = 0", 5, 3, 4, 2) // 3 does not divide 64
    }
    // k larger than the corpus: every doc returned, ranks still total
    val all = Sampling.weightedTopK(docs, "1.0e0", 10000, "t")
    assert(all.count() === docs.count())
  }

  test("stateless band signatures == grouped minhash/lshBands rows exactly") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "band", "sig").as[(Long, Int, String)].collect().toSet
    val grouped = key(TextOps.lshBands(TextOps.minhash(docs)))
    val stateless = key(TextOps.bandSigsStateless(docs))
    assert(stateless === grouped)
    intercept[IllegalArgumentException](TextOps.bandSigsStateless(docs, 16, 5))
  }

  test("streaming near-dup flags == static incremental LSH candidates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // standing corpus = docs not in the batch; its band index is built
    // once; the batch docs then stream through in two micro-batches
    val corpus = docs.filter("doc_id % 20 != 7")
    val batch = docs.filter("doc_id % 20 = 7")
    val (_, corpusBands) = Dedup.minhashIndex(corpus)
    // static reference: batch docs with >= 1 band collision vs corpus
    val expect = TextOps.lshBands(TextOps.minhash(batch))
      .join(corpusBands.select("band", "sig").distinct(), Seq("band", "sig"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(expect.nonEmpty, "fixture should contain batch-corpus collisions")
    val rows = batch.select("doc_id", "text").as[(Long, String)].collect()
    val stream = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingOps.nearDupFlagsStream(
      stream.toDF().toDF("doc_id", "text"), corpusBands.localCheckpoint())
    val q = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    stream.addData(b1.toSeq); q.processAllAvailable()
    stream.addData(b2.toSeq); q.processAllAvailable()
    val got = spark.table("neardup_stream").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(got === expect)
  }

  test("streaming mix sampling admits exactly the batch sample's docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // static reference corpus fixes the rates; the same docs streamed
    // through must reproduce the batch sample membership exactly
    val staticSample = Sampling.temperatureMixSample(docs, 400, "st")
      .select("doc_id").as[Long].collect().toSet
    assert(staticSample.nonEmpty)
    val rows = docs.select("doc_id", "source").as[(Long, String)].collect()
    val stream = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingOps.mixSampleStream(
      stream.toDF().toDF("doc_id", "source"), docs, 400, "st")
    val q = out.writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    stream.addData(b1.toSeq); q.processAllAvailable()
    stream.addData(b2.toSeq); q.processAllAvailable()
    val got = spark.table("mix_stream").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(got === staticSample)
  }

  test("property: chunkDocs equals driver-side slicing on random docs, sizes and strides") {
    val r = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val maxTok = 1 + r.nextInt(40)
      val stride = 1 + r.nextInt(maxTok)
      val corpus = (1 to 30).map(i =>
        (i.toLong, (0 until r.nextInt(120)).map(j => s"t${i}_$j").mkString(" ")))
      val df = spark.createDataset(corpus).toDF("doc_id", "text")
      val got = TextOps.chunkDocs(df, maxTok, stride).collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getInt(3), x.getString(4)))
        .toSet
      val expect = corpus.flatMap { case (id, text) =>
        val toks = text.trim.split("\\s+")
        (0 until toks.length by stride).map { st =>
          val slice = toks.slice(st, st + maxTok)
          (id, st / stride, st, slice.length, slice.mkString(" "))
        }
      }.toSet
      assert(got === expect, s"trial $trial (maxTok=$maxTok stride=$stride)")
    }
  }

  test("weightedTopK: matches driver-side E-S reference, scale-invariant, weight-monotone") {
    val k = 40
    val wExpr = s"CAST(size(${TextOps.tokensExpr}) AS DOUBLE)"
    def key(df: DataFrame) = df.select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = key(Sampling.weightedTopK(docs, wExpr, k, "t"))
    assert(got.values.toSeq.sorted === (1 to k))
    // driver-side reference: same hash draw, Math.log, same quantization
    val ref = docs.selectExpr("doc_id", wExpr + " AS w").collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getDouble(1)
        val u = h60t(s"t:$id") % 1000000
        val keyN = math.floor(-math.log((u + 0.5) / 1.0e6) / w * 1.0e9 + 0.5).toLong
        (id, keyN)
      }.sortBy { case (id, kn) => (kn, id) }.take(k)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    assert(got === ref)
    // scale invariance: multiplying every weight by 7 keeps the sample
    // (up to nano-unit key ties — none on this fixture)
    val scaled = key(Sampling.weightedTopK(docs, s"7.0e0 * ($wExpr)", k, "t"))
    assert(scaled.keySet === got.keySet)
    // zero / NaN weights fail loudly at scan time instead of silently
    // ranking first via a NULL key (ascending windows are NULLS FIRST)
    val e1 = intercept[RuntimeException] {
      Sampling.weightedTopK(docs, "CAST(doc_id % 2 AS DOUBLE)", k, "t").count()
    }
    assert(e1.getMessage.contains("strictly positive"))
    val e2 = intercept[RuntimeException] {
      Sampling.weightedTopK(docs, "CAST('NaN' AS DOUBLE)", k, "t").count()
    }
    assert(e2.getMessage.contains("strictly positive"))
    // weight monotonicity: the sampled docs are longer on average
    val sampledMean = docs.join(
        Sampling.weightedTopK(docs, wExpr, k, "t").select("doc_id"), "doc_id")
      .selectExpr(s"avg($wExpr)").head().getDouble(0)
    val corpusMean = docs.selectExpr(s"avg($wExpr)").head().getDouble(0)
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean !> corpus mean $corpusMean")
  }

  test("corpusDiff: added/removed/changed/unchanged partition both snapshots exactly") {
    val v1 = docs
    val v2 = v1.filter("doc_id % 10 != 3")
      .selectExpr("doc_id", "IF(doc_id % 4 = 0, concat(text, ' x'), text) AS text")
      .unionByName(spark.createDataset(Seq((990001L, "brand new doc")))
        .toDF("doc_id", "text"))
    val d = Dedup.corpusDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = v1.count()
    val ids = v1.select("doc_id").as[Long].collect().toSet
    // every id of either snapshot appears exactly once
    assert(d.keySet === ids + 990001L)
    assert(d(990001L) === "added")
    ids.foreach { id =>
      val expect = if (id % 10 == 3) "removed"
        else if (id % 4 == 0) "changed" else "unchanged"
      assert(d(id) === expect, s"doc $id")
    }
    assert(d.size === n + 1)
  }

  test("bigramLmScore: docs following the corpus's bigram structure score below reversed ones") {
    // a corpus WITH bigram structure: every doc cycles c0→c1→…→c4→c0,
    // so the LM learns p(c_{i+1}|c_i) ≈ 1. The in-structure probe walks
    // the cycle; the garbled probe walks it BACKWARDS (every bigram
    // unseen, every prefix common — maximal surprise).
    val cycle = (0 until 40).map(i => s"c${i % 5}").mkString(" ")
    val corpus = spark.range(50)
      .selectExpr("id AS doc_id", s"'$cycle' AS text")
    val probe = corpus.unionByName(spark.createDataset(Seq(
        (800001L, (0 until 20).map(i => s"c${i % 5}").mkString(" ")),
        (800002L, (0 until 20).map(i => s"c${(20 - i) % 5}").mkString(" ")),
        (800003L, "solo")))
      .toDF("doc_id", "text"))
    val scored = TextOps.bigramLmScore(probe)
    val byId = scored.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // single-token doc has no bigram → excluded
    assert(!byId.contains(800003L))
    // n_bigrams = n_tokens − 1
    assert(byId(800001L)._1 === 19L)
    assert(byId(800002L)._1 === 19L)
    // following the learned structure is far more probable than
    // reversing it
    assert(byId(800001L)._3 < byId(800002L)._3 - 1.0,
      s"in-structure ${byId(800001L)._3} !< reversed ${byId(800002L)._3} - 1")
    // deterministic under repartitioning (exact integer sums)
    val again = TextOps.bigramLmScore(probe.repartition(7)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(again === byId)
  }

  test("pqTopK: planted near-dup partners surface in ADC top-k, k per probe, partition-invariant") {
    // 2000 synthetic 64-dim vectors; ids ≡ 0 (mod 20) get a planted
    // partner at id+1 (small component noise → cos ≈ 0.99). With
    // m=4 × k=16 codebooks (65536 combos ≫ 2000 vectors) the partner
    // almost always shares the query's codes, making its ADC distance
    // the attainable minimum.
    val vecs = spark.range(2000L)
      .withColumn("gid", when(col("id") % 20 === 1, col("id") - 1).otherwise(col("id")))
      .selectExpr("id AS vec_id",
        """transform(sequence(0, 63), j -> CAST(
             CAST(hash(gid, j) AS DOUBLE) / 2.147483647e9 +
             CASE WHEN id % 20 = 1
                  THEN 0.1e0 * CAST(hash(id, j, 7) AS DOUBLE) / 2.147483647e9
                  ELSE 0.0e0 END AS FLOAT)) AS embedding""")
    val top = Clustering.pqTopK(vecs, "vec_id % 20 = 0", 3, 4, 16, 2)
    val rows = top.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 100)
    byQ.foreach { case (_, rs) => assert(rs.map(_._4).toSeq.sorted === (1 to 3)) }
    // the planted partner lands in the top-3 for the vast majority
    val hit = byQ.count { case (q, rs) => rs.exists(_._2 == q + 1) }
    assert(hit >= 80, s"planted partner in ADC top-3 for only $hit/100 probes")
    // adist non-decreasing in rank, no self matches
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.sliding(2).forall(p => p(0)._3 <= p(1)._3))
      assert(!rs.exists(_._2 == q))
    }
    // exact under repartitioning; equi-join-only plan
    val again = Clustering.pqTopK(vecs.repartition(7), "vec_id % 20 = 0", 3, 4, 16, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(again.toSet === rows.toSet)
    assert(graft.tools.PlanScan.badJoinCount(top) === 0)
    // exact refinement: the re-ranked top-1 is the planted partner at
    // least as often as the raw ADC cut (re-scoring with true vectors
    // can only sharpen the code-space ties)
    val refined = Clustering.pqTopKRefined(vecs, "vec_id % 20 = 0", 3, 10, 4, 16, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val rHit = refined.filter(x => x._3 == 1 && x._2 == x._1 + 1).length
    val aHit = rows.filter(x => x._4 == 1 && x._2 == x._1 + 1).length
    assert(rHit >= aHit, s"refined top-1 recall $rHit < ADC top-1 recall $aHit")
    assert(rHit >= 80, s"refined top-1 planted recall only $rHit/100")
  }

  test("chunkDocs: windows tile with stride, tail truncates, reconstruction at stride=maxTok") {
    val probe = spark.createDataset(Seq(
        (1L, (1 to 75).map(i => s"t$i").mkString(" ")),  // 75 tokens
        (2L, "a b c")))                                   // shorter than one window
      .toDF("doc_id", "text")
    val c = TextOps.chunkDocs(probe, 32, 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val d1 = c.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,16,32,48,64; lengths 32,32,32,27,11
    assert(d1.map(_._3).toSeq === Seq(0, 16, 32, 48, 64))
    assert(d1.map(_._4).toSeq === Seq(32, 32, 32, 27, 11))
    assert(d1.forall(x => x._5.split(" ").length == x._4))
    // overlap: each window starts mid-previous
    assert(d1(1)._5.startsWith("t17 t18"))
    // short doc: one truncated window
    val d2 = c.filter(_._1 == 2L)
    assert(d2.toSeq === Seq((2L, 0, 0, 3, "a b c")))
    // stride = maxTok partitions exactly: concatenation reconstructs
    val part = TextOps.chunkDocs(probe.filter(col("doc_id") === 1), 32, 32)
      .orderBy("chunk_id").select("chunk_text").as[String].collect()
    assert(part.mkString(" ") === (1 to 75).map(i => s"t$i").mkString(" "))
    // plan: no exchange — chunking is a scan-stage projection
    val plan = TextOps.chunkDocs(probe, 32, 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("vocabTopV + oovStats: exact cut, full coverage is oov 0, nonsense is oov 1") {
    val v = TextOps.vocabTopV(docs, 10)
    val vs = v.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // exact cut vs driver-side occurrence counts, total tie order
    val ref = docs.select("text").as[String].collect()
      .flatMap(_.trim.split("\\s+")).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
      .sortBy { case (t, n) => (-n, t) }.take(10)
    assert(vs.map(x => (x._1, x._2)).toSeq === ref)
    assert(vs.map(_._3).toSeq === (1 to vs.length))
    // oov: a doc of only the top token scores 0, nonsense scores 1
    val top = vs.head._1
    val probe = spark.createDataset(Seq(
        (1L, s"$top $top $top"), (2L, "zzq1 zzq2 zzq3 zzq4")))
      .toDF("doc_id", "text")
    val o = TextOps.oovStats(probe, v).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(o(1L) === ((3L, 0L, 0.0)))
    assert(o(2L) === ((4L, 4L, 1.0)))
    // corpus-wide: rates in [0,1], token counts match size(tokens)
    val all = TextOps.oovStats(docs, v)
    assert(all.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() === 0)
    val nTok = docs.selectExpr("doc_id", s"size(${TextOps.tokensExpr}) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    all.select("doc_id", "n_tokens").collect()
      .foreach(r => assert(r.getLong(1) === nTok(r.getLong(0))))
  }

  test("bench foreign-load telemetry: /proc readers are sane and monotonic") {
    // the load gate's inputs (Bench.busyJiffies from /proc/stat,
    // Bench.selfCpuSec from /proc/self/stat) must parse on this
    // platform and move in the right direction under real cpu work —
    // a silent parse regression would disable the gate (-1 sentinels)
    // without failing any artifact field. On non-Linux the readers
    // return their -1 sentinels BY DESIGN (the gate self-disables) —
    // skip rather than fail there (ADVICE r7)
    assume(sys.props.getOrElse("os.name", "").toLowerCase.contains("linux"),
      "/proc readers are Linux-only; the bench gate self-disables elsewhere")
    val b0 = graft.Bench.busyJiffies()
    val s0 = graft.Bench.selfCpuSec()
    assert(b0 > 0, "busyJiffies must parse /proc/stat on Linux")
    assert(s0 >= 0, "selfCpuSec must parse /proc/self/stat on Linux")
    // burn ~200ms of cpu in this JVM; both counters must advance, and
    // box busy must advance at least as much as our own cpu
    val t0 = System.nanoTime()
    var x = 0L
    while (System.nanoTime() - t0 < 200e6) { x += 1 }
    assert(x > 0)
    val dSelf = graft.Bench.selfCpuSec() - s0
    val dBusy = (graft.Bench.busyJiffies() - b0) / 100.0
    assert(dSelf >= 0.0)
    assert(dBusy >= dSelf - 0.05,
      s"box busy cpu ($dBusy s) cannot lag this JVM's own cpu ($dSelf s)")
  }

  test("minhashLsh persistShingles changes evaluation strategy only, never rows") {
    val base = Dedup.minhashLsh(docs).orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val per = Dedup.minhashLsh(docs, persistShingles = true).orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(per.toSeq === base.toSeq)
    assert(base.nonEmpty)
  }

  test("Events.load: both generator ts encodings produce identical TimestampType rows") {
    // the testdata generator has shipped events.ts as int64 epoch-nanos
    // (rounds ≤7) and as native parquet timestamp[us] (round 8) — the
    // loader must normalize either to the same micro-precision
    // session-TZ timestamps, or every events query silently forks on
    // generator version. Write the SAME logical rows in both
    // encodings, load each through Events.load, pin type + values.
    val dirL = "target/spark-tmp/ev_enc_long"
    val dirT = "target/spark-tmp/ev_enc_ts"
    val micros = Seq(0L, 1700000000123456L, 1700003599999999L)
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, 7L, "a", 1.5, "") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    base.withColumn("ts", expr("us * 1000")).drop("us") // epoch-nanos long
      .write.mode("overwrite").parquet(s"$dirL/events.parquet")
    base.withColumn("ts", expr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ)")).drop("us")
      .write.mode("overwrite").parquet(s"$dirT/events.parquet")
    val l = Events.load(spark, dirL)
    val t = Events.load(spark, dirT)
    for (df <- Seq(l, t))
      assert(df.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    val lv = l.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).sortBy(_._1)
    val tv = t.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).sortBy(_._1)
    assert(lv.toSeq === tv.toSeq)
    // and the micros survive exactly (UTC session): epoch-millis from
    // java.sql.Timestamp plus the sub-milli fraction
    val us1 = t.filter(col("event_id") === 1).select("ts").collect()(0).getTimestamp(0)
    assert(us1.getTime === 1700000000123L && us1.getNanos === 123456000)
  }

  test("asofJoin: inclusive boundary, tiebreak, no-match null, no payload-field bleed") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // right side: key 1 has rows at t=10 (two rows, tie on tieBreak),
    // t=20 (payload FIELD null), t=30; key 2 has one row at t=50
    val right = Seq(
      (1L, ts(10), 100L, Some(1.0)),
      (1L, ts(10), 101L, Some(2.0)),   // same ts — greater tie must win
      (1L, ts(20), 102L, None),        // null FIELD must not bleed older value
      (1L, ts(30), 103L, Some(4.0)),
      (2L, ts(50), 200L, Some(9.0)))
      .toDF("k", "rts", "rid", "v")
    val left = Seq(
      (0L, 1L, ts(5)),    // before any right row → nulls
      (1L, 1L, ts(10)),   // equal ts is INCLUSIVE → rid 101 (tiebreak)
      (2L, 1L, ts(25)),   // lands on the null-field row → rid 102, v null
      (3L, 1L, ts(99)),   // after all → rid 103
      (4L, 2L, ts(49)),   // other key, before its row → nulls
      (5L, 2L, ts(50)))   // other key, inclusive → rid 200
      .toDF("id", "k", "lts")
    val out = Temporal.asofJoin(left, right, "k", "k", "lts", "rts",
        tieBreak = "rid", payload = Seq("rid", "v"))
      .orderBy("id")
      .select("id", "asof_rid", "asof_v")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(out(0)._1 === 0L && out(0)._2 === -1L && out(0)._3.isNaN)
    assert(out(1) === ((1L, 101L, 2.0)))
    assert(out(2)._1 === 2L && out(2)._2 === 102L && out(2)._3.isNaN,
      s"null payload field must stay null, got ${out(2)}")
    assert(out(3) === ((3L, 103L, 4.0)))
    assert(out(4)._1 === 4L && out(4)._2 === -1L && out(4)._3.isNaN)
    assert(out(5) === ((5L, 200L, 9.0)))
    // partition-invariance: same answer under adversarial partitioning
    val out2 = Temporal.asofJoin(left.repartition(7), right.repartition(5),
        "k", "k", "lts", "rts", "rid", Seq("rid", "v"))
      .orderBy("id").select("id", "asof_rid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out2.toSeq === Seq((0L, -1L), (1L, 101L), (2L, 102L),
      (3L, 103L), (4L, -1L), (5L, 200L)))
  }

  test("kmvDistinct: exact below k, calibrated estimate above k, partition-invariant") {
    // 10k distinct values in one group (sketch regime at k=256) and 40
    // in another (exact regime), with every value duplicated 3x — the
    // sketch must dedup, not count
    val rows = (0 until 10000).map(i => ("big", s"v$i")) ++
      (0 until 40).map(i => ("small", s"w$i"))
    val df = (rows ++ rows ++ rows).toDF("g", "v")
    val out = Sketches.kmvDistinct(df, "g", col("v"), 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("small") === ((40L, 40.0)), "below-k group must be exact")
    val (nBig, estBig) = out("big")
    assert(nBig === 10000L)
    // standard error ≈ 1/sqrt(k-2) ≈ 6.3%; 4 sigma = 25%
    assert(math.abs(estBig - 10000.0) / 10000.0 < 0.25,
      s"KMV estimate $estBig too far from 10000")
    // merge path determinism: any partitioning gives the same bits
    val out2 = Sketches.kmvDistinct(df.repartition(13), "g", col("v"), 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out2 === out)
    // the raw buffer is sorted, distinct, capped at k
    val kmv = udaf(new Sketches.KmvAgg(8), org.apache.spark.sql.Encoders.scalaLong)
    val buf = df.filter(col("g") === "big")
      .select(Sketches.hash60(col("v")).as("h"))
      .agg(kmv(col("h"))).collect()(0).getSeq[Long](0)
    assert(buf.length === 8 && buf === buf.sorted && buf.distinct === buf)
  }

  test("asofEnrichStream: streamed enrichment equals the batch as-of join row for row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val right = Seq(
      (1L, ts(10), 100L, 1.0), (1L, ts(10), 101L, 2.0), (1L, ts(30), 103L, 4.0),
      (2L, ts(50), 200L, 9.0))
      .toDF("k", "rts", "rid", "v")
    val leftRows = Seq(
      (0L, 1L, ts(5)), (1L, 1L, ts(10)), (2L, 1L, ts(25)),
      (3L, 1L, ts(99)), (4L, 2L, ts(49)), (5L, 2L, ts(50)), (6L, 9L, ts(50)))
    val batch = Temporal.asofJoin(leftRows.toDF("id", "k", "lts"), right,
        "k", "k", "lts", "rts", "rid", Seq("rid", "v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    val stream = MemoryStream[(Long, Long, Timestamp)]
    val out = graft.streaming.StreamingOps.asofEnrichStream(
      stream.toDF().toDF("id", "k", "lts"), right,
      "k", "k", "lts", "rts", "rid", Seq("rid", "v"))
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    stream.addData(leftRows.take(4)); q.processAllAvailable()
    stream.addData(leftRows.drop(4)); q.processAllAvailable()
    val streamed = spark.table("asof_stream").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    q.stop()
    // batch has no row for unknown key 9 in this projection? it does —
    // left-outer: id 6 with null payload; both must agree exactly
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.length === 7 && streamed.last === ((6L, -1L)))
  }

  test("embeddingRobustStats: outlier immunity — one corrupted vector moves the mean, not the median") {
    val base = emb
    val stats0 = Similarity.embeddingRobustStats(base).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val outlier = base.limit(1).selectExpr("vec_id + 900000 AS vec_id",
      "transform(embedding, x -> CAST(1.0e6 AS FLOAT)) AS embedding", "label")
    val poisoned = base.unionByName(outlier)
    val stats1 = Similarity.embeddingRobustStats(poisoned).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val mean0 = Similarity.embeddingMoments(base)
      .agg(avg("mean")).head().getDouble(0)
    val mean1 = Similarity.embeddingMoments(poisoned)
      .agg(avg("mean")).head().getDouble(0)
    assert(math.abs(mean1 - mean0) > 100.0, "planted outlier must drag the mean")
    // the median shifts by at most one rank per dimension
    stats0.foreach { case (pos, (m0, _)) =>
      assert(math.abs(stats1(pos)._1 - m0) < 0.5,
        s"median at dim $pos moved from $m0 to ${stats1(pos)._1}")
    }
    // dual-path parity: the driver rank-pick (default — the histogram
    // is lattice-bounded) and the distributed percentilesFromHistogram
    // fallback (histMax = 0) must produce the identical relation
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("pos").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(rows(Similarity.embeddingRobustStats(base)) ===
      rows(Similarity.embeddingRobustStats(base, histMax = 0L)))
  }

  test("semanticDecontamFlags: planted leaks surface through the bucket discipline, clean corpus stays clean") {
    val base = emb
    val planted = base.filter("vec_id % 20 = 0")
      .selectExpr("vec_id + 1000000 AS vec_id",
        "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.02e0 + 0.01e0 AS FLOAT)) AS embedding",
        "label")
    val flags = Similarity.semanticDecontamFlags(
        base.unionByName(planted), "vec_id >= 1000000", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nPlanted = planted.count()
    // near-identity perturbation: at most one sign bit flips per
    // component band, so the Hamming-1 probes recover (nearly) all
    // partners; every flag must BE a partner at cos ≈ 1
    assert(flags.forall { case (t, e, c) => e === t + 1000000 && c > 0.99 })
    assert(flags.length >= (nPlanted * 0.8).toInt,
      s"only ${flags.length}/$nPlanted planted leaks recovered")
    // without planted leaks nothing reaches 0.8
    val clean = Similarity.semanticDecontamFlags(base, "vec_id % 20 = 0", 0.8)
    assert(clean.count() === 0L)
  }

  test("VectorKernels: native dot/l2sq bit-equal to the HOF fold, null on length mismatch, codegen survives") {
    import graft.functions.VectorKernels
    val df = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.1, 0.2), Array(0.3, 0.7)),
      (3L, Array.empty[Double], Array.empty[Double]))
      .toDF("id", "a", "b")
    val native = df.select(col("id"), VectorKernels.dot(col("a"), col("b")).as("d"),
        VectorKernels.l2sq(col("a"), col("b")).as("l"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val hof = df.selectExpr("id",
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d",
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS l")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(native.toSeq === hof.toSeq) // bit-equal, same fold order
    // unequal lengths → null (zip_with pads with null and poisons the fold)
    val mix = Seq((1L, Array(1.0, 2.0), Array(1.0))).toDF("id", "a", "b")
    assert(mix.select(VectorKernels.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
    // 10k-row run through the codegen path (would fall back loudly on bad Java)
    val big = spark.range(10000).selectExpr("id",
      "transform(sequence(0, 63), j -> CAST(hash(id, j) AS DOUBLE)) AS a",
      "transform(sequence(0, 63), j -> CAST(hash(id, j, 2) AS DOUBLE)) AS b")
    val s1 = big.select(VectorKernels.dot(col("a"), col("b")).as("d"))
      .agg(sum("d")).head().getDouble(0)
    val s2 = big.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d")
      .agg(sum("d")).head().getDouble(0)
    assert(s1 === s2)
  }

  test("keySkewReport: exact bit-length buckets on a hand-built distribution") {
    // counts: a=1, b=1, c=2, d=3, e=8 → buckets 1(two keys, 2 rows),
    // 2(two keys, 5 rows, max 3), 4(one key, 8 rows); total 15
    val rows = Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(3)("d") ++ Seq.fill(8)("e")
    val got = Diagnostics.keySkewReport(rows.toDF("k"), Seq("k"))
      .orderBy("bucket_bits").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1, 2L, 2L, 1L, math.floor(2.0 / 15.0 * 1e9 + 0.5) / 1e9),
      (2, 2L, 5L, 3L, math.floor(5.0 / 15.0 * 1e9 + 0.5) / 1e9),
      (4, 1L, 8L, 8L, math.floor(8.0 / 15.0 * 1e9 + 0.5) / 1e9)))
  }

  test("streaming KMV distinct: bit-equal to batch, duplicate-immune, state bounded at k") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val k = 64
    val values = (0 until 5000).map(i => ("big", s"v$i")) ++
      (0 until 20).map(i => ("small", s"w$i"))
    val hashed = values.toDF("g", "v")
      .select(col("g"), Sketches.hash60(col("v")).as("h"))
      .as[(String, Long)].collect()
    val stream = MemoryStream[(String, Long)]
    val out = graft.streaming.StreamingOps.kmvDistinctStream(
      spark, stream.toDF().toDF("g", "h"), k)
    val q = out.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    // two batches, then a full REPLAY of batch 1 (duplicates must not
    // move the estimate)
    val (b1, b2) = hashed.splitAt(2500)
    stream.addData(b1.toIndexedSeq); q.processAllAvailable()
    stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    val afterAll = spark.table("kmv_stream")
      .groupBy("g").agg(max("n_kept").as("n_kept"), max("est_distinct").as("est"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    stream.addData(b1.toIndexedSeq); q.processAllAvailable()
    val afterReplay = spark.table("kmv_stream")
      .groupBy("g").agg(max("n_kept").as("n_kept"), max("est_distinct").as("est"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    q.stop()
    assert(afterReplay === afterAll, "replayed rows moved the sketch")
    // state bound + exact-below-k
    assert(afterAll("big")._1 === k)
    assert(afterAll("small") === ((20, 20.0)))
    // bit-equality with the batch estimator on the same rows
    val batch = Sketches.kmvDistinct(values.toDF("g", "v"), "g", col("v"), k)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(afterAll("big")._2 === batch("big"))
    assert(afterAll("small")._2 === batch("small"))
  }

  test("bloom filter: zero false negatives, bounded FP rate, mergeable bits") {
    val m = 4096; val k = 3
    val vals = (0 until 500).map(i => s"s$i").toDF("s")
    val bits = Sketches.bloomBits(vals, col("s"), m, k)
    assert(bits.count() <= math.min(m.toLong, 3L * 500))
    // every inserted value must be flagged — the no-false-negative law
    val ins = Sketches.bloomMaybeContains(bits, vals, "s", m, k)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(ins.size === 500 && ins.values.forall(identity))
    // absent values: FP rate ~ (1-e^{-kn/m})^k ≈ 2.9% here; 4x slack
    val absent = (0 until 2000).map(i => s"x$i").toDF("s")
    val fp = Sketches.bloomMaybeContains(bits, absent, "s", m, k)
      .filter(col("maybe_present")).count()
    assert(fp < 240, s"FP count $fp implausibly high for m=$m k=$k n=500")
    // set semantics: filter of a union = distinct union of filters
    val (a, b) = (0 until 500).map(i => s"s$i").splitAt(200)
    val merged = Sketches.bloomBits(a.toDF("s"), col("s"), m, k)
      .unionByName(Sketches.bloomBits(b.toDF("s"), col("s"), m, k))
      .distinct().orderBy("pos").collect().toSeq
    assert(merged === bits.orderBy("pos").collect().toSeq)
    // carry columns ride through the probe
    val carried = Sketches.bloomMaybeContains(bits,
        Seq((7L, "s1"), (7L, "x1"), (9L, "s2")).toDF("doc_id", "s"),
        "s", m, k, carry = Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(carried((7L, "s1")) && carried((9L, "s2")))
    // DUPLICATED probe rows (ADVICE r8): a (carry, item) key appearing
    // j > 1 times holds j*k exploded rows — comparing hits to the
    // constant k read an inserted item as ABSENT (false negative).
    // The no-false-negative law must hold for non-distinct callers too.
    val duped = Sketches.bloomMaybeContains(bits,
        (Seq.fill(3)((7L, "s1")) ++ Seq.fill(2)((7L, "x1"))).toDF("doc_id", "s"),
        "s", m, k, carry = Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(duped.size === 2, "probe output stays one row per (carry, item)")
    assert(duped((7L, "s1")), "duplicated inserted item must still be flagged present")
  }

  test("streaming CM sketch: prefix-equal to batch, state bounded at depth*width") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val depth = 4; val width = 32
    val rows = (0 until 30).flatMap(i => Seq.fill(100 / (i + 1))(s"t$i"))
    val stream = MemoryStream[String]
    val out = graft.streaming.StreamingOps.cmSketchStream(
      stream.toDF().toDF("v"), col("v"), depth, width)
    val q = out.writeStream.format("memory").queryName("cm_stream")
      .outputMode("update").start()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    try {
      stream.addData(b1); q.processAllAvailable()
      // counters only grow, so max per cell = the cell's latest value
      def latest() = spark.table("cm_stream")
        .groupBy("r", "c").agg(max("cnt").as("cnt"))
        .orderBy("r", "c").collect().toSeq
      val afterB1 = latest()
      val batchB1 = Sketches.cmSketch(b1.toDF("v"), col("v"), depth, width)
        .orderBy("r", "c").collect().toSeq
      assert(afterB1 === batchB1, "prefix sketch must equal the batch sketch")
      stream.addData(b2); q.processAllAvailable()
      val afterAll = latest()
      val batchAll = Sketches.cmSketch(rows.toDF("v"), col("v"), depth, width)
        .orderBy("r", "c").collect().toSeq
      assert(afterAll === batchAll)
      // state bound: never more than depth*width live cells
      assert(afterAll.size <= depth * width)
    } finally q.stop()
    // WEIGHTED stream (ADVICE r8: weight was hardwired to 1, making a
    // weighted streaming sketch impossible): same prefix-equality law
    // against the weighted batch sketch
    val wRows = (0 until 30).map(i => (s"t$i", (i % 5 + 1).toLong))
    val wStream = MemoryStream[(String, Long)]
    val wOut = graft.streaming.StreamingOps.cmSketchStream(
      wStream.toDF().toDF("v", "w"), col("v"), depth, width, weight = col("w"))
    val wq = wOut.writeStream.format("memory").queryName("cm_stream_w")
      .outputMode("update").start()
    try {
      wStream.addData(wRows); wq.processAllAvailable()
      val got = spark.table("cm_stream_w")
        .groupBy("r", "c").agg(max("cnt").as("cnt"))
        .orderBy("r", "c").collect().toSeq
      val want = Sketches.cmSketch(wRows.toDF("v", "w"), col("v"), depth, width,
          weight = col("w"))
        .orderBy("r", "c").collect().toSeq
      assert(got === want, "weighted stream sketch must equal weighted batch sketch")
    } finally wq.stop()
  }

  test("streaming bloom bits: prefix bit-set equals batch, state bounded at mBits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val m = 4096; val k = 3
    val rows = (0 until 800).map(i => s"s$i")
    val stream = MemoryStream[String]
    val out = graft.streaming.StreamingOps.bloomBitsStream(
      stream.toDF().toDF("v"), col("v"), m, k)
    val q = out.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("update").start()
    def bits() = spark.table("bloom_stream").select("pos").distinct()
      .orderBy("pos").collect().toSeq
    def batchBits(xs: Seq[String]) =
      Sketches.bloomBits(xs.toDF("v"), col("v"), m, k)
        .orderBy("pos").collect().toSeq
    val (b1, b2) = rows.splitAt(400)
    try {
      stream.addData(b1); q.processAllAvailable()
      assert(bits() === batchBits(b1), "prefix bit set must equal batch bloomBits")
      stream.addData(b2); q.processAllAvailable()
      val all = bits()
      assert(all === batchBits(rows))
      assert(all.size <= m)
    } finally q.stop()
  }

  test("HLL sketch: mergeable registers, calibrated estimates, both branches") {
    val p = 8
    val big = (0 until 5000).map(i => ("big", s"v$i"))     // raw harmonic branch
    val small = (0 until 20).map(i => ("small", s"w$i"))   // linear-counting branch
    val out = Sketches.hllDistinct((big ++ small).toDF("g", "v"), "g", col("v"), p)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("big")._1 === 5000L)
    // sigma = 1.04/sqrt(256) = 6.5%; 4-sigma slack
    assert(math.abs(out("big")._2 - 5000) / 5000.0 < 0.26, s"big est ${out("big")._2}")
    assert(out("small")._1 === 20L)
    // n << m: linear counting is tight
    assert(math.abs(out("small")._2 - 20) / 20.0 < 0.25, s"small est ${out("small")._2}")
    // duplicates never move a register (max of equal ranks)
    val dup = Sketches.hllDistinct(
      (big ++ big).toDF("g", "v"), "g", col("v"), p).head()
    assert(dup.getDouble(2) === out("big")._2)
    // set closure: sketch of A ∪ B = elementwise max of the sketches
    val (a, b) = (0 until 5000).map(i => s"v$i").splitAt(2000)
    def sk(xs: Seq[String]) =
      Sketches.hllSketch(xs.map(("g", _)).toDF("g", "v"), "g", col("v"), p)
    val merged = sk(a).unionByName(sk(b)).groupBy("g", "bucket")
      .agg(max("r").as("r")).orderBy("bucket").collect().toSeq
    val direct = sk(a ++ b).orderBy("bucket").collect().toSeq
    assert(merged === direct)
    // register file is fixed-size: <= 2^p rows however large the set
    assert(direct.size <= (1 << p))
    // pairwise overlap from register files alone: planted A∩B = 1500,
    // |A∪B| = 4500, plus a disjoint C — inclusion-exclusion compounds
    // three ~6.5%-sigma estimates, so bounds are wide but directional
    val pairRows = (0 until 3000).map(i => ("A", s"v$i")) ++
      (1500 until 4500).map(i => ("B", s"v$i")) ++
      (9000 until 12000).map(i => ("C", s"v$i"))
    val ov = Sketches.hllPairOverlap(pairRows.toDF("g", "v"), "g", col("v"), p)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (estA, _, estU, estOv) = ov(("A", "B"))
    assert(math.abs(estA - 3000) / 3000.0 < 0.26, s"est_a $estA")
    assert(math.abs(estU - 4500) / 4500.0 < 0.26, s"est_union $estU")
    assert(math.abs(estOv - 1500) < 1200, s"overlap $estOv vs 1500")
    assert(ov(("A", "C"))._4 < 700, s"disjoint overlap ${ov(("A", "C"))._4}")
    assert(ov(("B", "C"))._4 < 700, s"disjoint overlap ${ov(("B", "C"))._4}")
  }

  test("streaming HLL: prefix-equal to batch registers, state bounded at 2^p") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val p = 8
    val rows = (0 until 3000).map(i => s"v$i")
    val stream = MemoryStream[String]
    val out = graft.streaming.StreamingOps.hllSketchStream(
      stream.toDF().toDF("v"), col("v"), p)
    val q = out.writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").start()
    def batchSk(xs: Seq[String]) =
      Sketches.hllSketch(xs.map(("x", _)).toDF("g", "v"), "g", col("v"), p)
        .select("bucket", "r").orderBy("bucket").collect().toSeq
    // registers only grow, so the latest value per bucket is its max
    def latest() = spark.table("hll_stream")
      .groupBy("bucket").agg(max("r").as("r"))
      .orderBy("bucket").collect().toSeq
    val (b1, b2) = rows.splitAt(1500)
    try {
      stream.addData(b1); q.processAllAvailable()
      assert(latest() === batchSk(b1), "prefix registers must equal the batch sketch")
      stream.addData(b2); q.processAllAvailable()
      val all = latest()
      assert(all === batchSk(rows))
      assert(all.size <= (1 << p))
    } finally q.stop()
  }

  test("kmvPairSimilarity: union closure is exact set algebra, planted overlap calibrates") {
    // A = v0..v2999, B = v1500..v4499 → |A∩B|=1500, |A∪B|=4500, J=1/3
    val rows = (0 until 3000).map(i => ("A", s"v$i")) ++
      (1500 until 4500).map(i => ("B", s"v$i")) ++
      (9000 until 12000).map(i => ("C", s"v$i")) // disjoint from both
    val df = rows.toDF("g", "v")
    val k = 256
    // closure: the merged-and-truncated sketch of A and B equals the
    // sketch of A∪B computed directly — exact, not statistical
    val sk = Sketches.kmvSketchBy(df, "g", col("v"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val unionDirect = Sketches.kmvSketchBy(
      df.filter(col("g") =!= "C").withColumn("g", lit("AB")).distinct(),
      "g", col("v"), k).collect()(0).getSeq[Long](1)
    val merged = (sk("A") ++ sk("B")).distinct.sorted.take(k)
    assert(merged === unionDirect)
    val est = Sketches.kmvPairSimilarity(df, "g", col("v"), k)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    // k=256 → se ≈ 6%; the A-B estimate must land near 1/3
    assert(math.abs(est(("A", "B")) - 1.0 / 3.0) < 0.15,
      s"planted J=1/3 estimated as ${est(("A", "B"))}")
    assert(est(("A", "C")) < 0.15 && est(("B", "C")) < 0.15)
  }

  test("cmSketch: bounded state, one-sided error, additive merge, partition-invariant") {
    val depth = 4; val width = 64
    // zipf-ish: value i appears (2000 / (i+1)) times over 50 distinct
    val rows = (0 until 50).flatMap(i => Seq.fill(2000 / (i + 1))(s"t$i"))
    val df = rows.toDF("v")
    val sk = Sketches.cmSketch(df, col("v"), depth, width)
    // state bound: the whole sketch is at most depth*width counters,
    // no matter the input volume; total mass per row = n inputs
    val cells = sk.collect()
    assert(cells.length <= depth * width)
    val perRow = cells.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.values.toSet === Set(rows.size.toLong),
      s"every hash row must carry the full mass, got $perRow")
    // point estimates: est >= exact for EVERY value (one-sided error)
    val items = (0 until 50).map(i => s"t$i").toDF("v")
    val est = Sketches.cmEstimate(sk, items, "v", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 50).foreach { i =>
      val exact = 2000 / (i + 1)
      assert(est(s"t$i") >= exact, s"t$i: est ${est(s"t$i")} < exact $exact")
      // CM error bound: over by <= 2N/width w.p. 1-2^-depth; allow 4x slack
      assert(est(s"t$i") - exact <= 8L * rows.size / width,
        s"t$i: est ${est(s"t$i")} vs exact $exact exceeds the error bound")
    }
    // absent value: min over its buckets — bounded by the same noise
    val ghost = Sketches.cmEstimate(sk, Seq("never-seen").toDF("v"), "v", depth, width)
      .collect()(0).getLong(1)
    assert(ghost <= 8L * rows.size / width, s"ghost estimate $ghost")
    // partition invariance: counters are additive, so any partitioning
    // yields the same bits
    val sk2 = Sketches.cmSketch(df.repartition(13), col("v"), depth, width)
    assert(sk2.orderBy("r", "c").collect().toSeq ===
      sk.orderBy("r", "c").collect().toSeq)
    // mergeability: sketch(a ++ b) = elementwise sum of the two sketches
    val (a, b) = rows.splitAt(rows.size / 3)
    val skA = Sketches.cmSketch(a.toDF("v"), col("v"), depth, width)
    val skB = Sketches.cmSketch(b.toDF("v"), col("v"), depth, width)
    val summed = skA.unionByName(skB).groupBy("r", "c").agg(sum("cnt").as("cnt"))
      .orderBy("r", "c").collect().toSeq
    assert(summed === sk.orderBy("r", "c").collect().toSeq)
  }

  test("coOccurrence: pair counts exact, lift calibrated, skew cap bounds baskets deterministically") {
    // 3 users: u1 views items 1,2,3; u2 views 1,2 (twice each — dedup);
    // u3 views 2,3. Pairs: (1,2)x2, (1,3)x1, (2,3)x2
    def ev(id: Long, u: Long, item: Int) =
      (id, new java.sql.Timestamp(id * 1000), u, "view", 0.0, s"""{"k": $item}""")
    val rows = Seq(ev(1, 1, 1), ev(2, 1, 2), ev(3, 1, 3), ev(4, 2, 1),
      ev(5, 2, 2), ev(6, 2, 1), ev(7, 2, 2), ev(8, 3, 2), ev(9, 3, 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.coOccurrence(rows, "view", maxPerUser = 0, minSupport = 1)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // nUsers=3, n_1=2, n_2=3, n_3=2
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((1, 2, 2L), (1, 3, 1L), (2, 3, 2L)))
    assert(out(0)._4 === 2.0 * 3 / (2 * 3)) // lift(1,2) = 1.0
    assert(out(1)._4 === 1.0 * 3 / (2 * 2)) // lift(1,3) = 0.75
    // cap = 2: every basket shrinks to its 2 smallest-hash items; the
    // capped pair set must be a subset, counts never higher, and the
    // cut must be identical under adversarial partitioning
    val capped = Events.coOccurrence(rows.repartition(5), "view",
      maxPerUser = 2, minSupport = 1)
    val cap1 = capped.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val full = out.map(t => (t._1, t._2, t._3)).toSet
    assert(cap1.map(t => (t._1, t._2)).subsetOf(full.map(t => (t._1, t._2))))
    assert(cap1.forall { case (a, b, n) =>
      full.find(f => f._1 == a && f._2 == b).exists(_._3 >= n) })
    val cap2 = Events.coOccurrence(rows.repartition(2), "view",
      maxPerUser = 2, minSupport = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(cap1 === cap2, "cap cut must be partitioning-invariant")
  }

  test("asofJoinBucketed: identical to the plain as-of join on pseudo-random data, any bucket width") {
    // hash-derived fixture: 3 keys, 400 left rows, 60 right rows with
    // unique (ts, tie) per key; ts ranges force empty buckets, carry
    // chains across several buckets, and no-match prefixes
    val left = spark.range(400).selectExpr("id AS lid", "id % 3 AS k",
      "pmod(hash(id, 1), 1000) AS t")
    val right = spark.range(60).selectExpr("id AS rid", "id % 3 AS k",
      // ts = unique per key by construction (id DIV 3 spaced x16 + key)
      "(id DIV 3) * 16 + id % 3 AS rt", "CAST(pmod(hash(id, 2), 100) AS DOUBLE) AS v")
    val plain = Temporal.asofJoin(left, right, "k", "k", "t", "rt",
        "rid", Seq("rid", "v"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    for (w <- Seq(7L, 64L, 1000L, 100000L)) {
      val bucketed = Temporal.asofJoinBucketed(left, right, "k", "k", "t", "rt",
          "rid", Seq("rid", "v"), bucketWidth = w)
        .orderBy("lid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(bucketed.toSeq === plain.toSeq, s"bucketWidth=$w diverged")
    }
    // timestamp columns route through unix_micros bucketing
    val lts = left.selectExpr("lid", "k", "timestamp_micros(t * 1000000) AS t")
    val rts = right.selectExpr("rid", "k", "timestamp_micros(rt * 1000000) AS rt", "v")
    val bts = Temporal.asofJoinBucketed(lts, rts, "k", "k", "t", "rt",
        "rid", Seq("rid", "v"), bucketWidth = 64L * 1000000L)
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(bts.toSeq === plain.toSeq)
  }

  test("rangeJoin: half-open boundaries, bucket edges, multi-bucket spans, multiplicity") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val bucket = 100L // seconds
    val intervals = Seq(
      (1L, 10L, ts(50), ts(150)),   // spans buckets 0-1
      (1L, 11L, ts(100), ts(200)),  // starts exactly on a bucket edge; overlaps 10
      (1L, 12L, ts(300), ts(300)),  // empty — must match nothing
      (1L, 13L, ts(400), ts(701)),  // spans buckets 4,5,6,7
      (2L, 20L, ts(50), ts(150)))   // other key
      .toDF("k", "iid", "lo", "hi")
    val points = Seq(
      (100L, 1L, ts(49)),   // just before 10 → none
      (101L, 1L, ts(50)),   // start INCLUSIVE → 10
      (102L, 1L, ts(120)),  // overlap region → 10 and 11
      (103L, 1L, ts(150)),  // 10's end EXCLUSIVE → 11 only
      (104L, 1L, ts(300)),  // empty interval start → none
      (105L, 1L, ts(699)),  // deep in the multi-bucket span → 13
      (106L, 1L, ts(700)),  // last covered second of 13 (hi=701) → 13
      (107L, 1L, ts(701)),  // 13's end exclusive → none
      (108L, 2L, ts(120)),  // key isolation → 20
      (109L, 3L, ts(120))) // unknown key → none
      .toDF("pid", "k", "pts")
    val got = Temporal.rangeJoin(points, intervals, "k", "k", "pts", "lo", "hi", bucket)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(
      (101L, 10L), (102L, 10L), (102L, 11L), (103L, 11L),
      (105L, 13L), (106L, 13L), (108L, 20L)))
    // bucket width must not change the answer, only the plan
    for (w <- Seq(1L, 7L, 1000L)) {
      val g = Temporal.rangeJoin(points, intervals, "k", "k", "pts", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(g === got, s"bucketSec=$w changed the result")
    }
  }

  test("image dHash is exactly invariant under the 2x nearest-neighbor resize") {
    // unit-level: synthesize one block image, resize on raw pixels,
    // hash both — the fixed 8x8 tiny-raster grid points land one per
    // block at any block scale, so the signatures must be EQUAL
    val h = Multimodal.textHash60("image resize invariance fixture")
    val (sx, sy) = ImageDedup.blockSpec(h)
    val (w, hgt) = (8 * sx, 8 * sy)
    val px = new Array[Int](w * hgt)
    for (y <- 0 until hgt; x <- 0 until w)
      px(y * w + x) = ImageDedup.blockRgb(h, (y / sy) * 8 + (x / sx))
    val rw = w / 2; val rh = hgt / 2
    val rp = Array.tabulate(rw * rh)(i => px((2 * (i / rw)) * w + 2 * (i % rw)))
    assert(ImageDedup.dHash56(px, w, hgt) === ImageDedup.dHash56(rp, rw, rh))
  }

  test("image Hamming band join is COMPLETE: equals brute-force over signatures") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    val sigs = ImageDedup.imageDHashes(spark, ImageDedup.corpusWithCopies(spark, docs))
    val banded = key(ImageDedup.hammingPairs(sigs, 1))
    val brute = key(sigs.select(col("img_id").as("a"), col("dhash").as("ha"))
      .join(sigs.select(col("img_id").as("b"), col("dhash").as("hb")),
        col("a") < col("b"))
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= 1))
    assert(banded === brute, "pigeonhole candidates must be lossless")
    assert(banded.nonEmpty, "fixture should contain Hamming-close image hashes")
    intercept[IllegalArgumentException](ImageDedup.hammingPairs(sigs, 2)) // 56 % 3 != 0
  }

  test("image near-dup recovers every planted copy and no random pair") {
    val pairs = ImageDedup.nearDupPairs(spark, docs, maxHamming = 1)
      .as[(Long, Long, Int)].collect()
    val ids = docs.select("doc_id").as[Long].collect()
    // every resized re-encode (id -2d-1) pairs with its source at Hamming 0
    for (d <- ids if d % 25 == 0)
      assert(pairs.contains((-2 * d - 1, d, 0)),
        s"missed resized copy of doc $d")
    // every perturbed re-encode (id -2d-2) pairs with its source within 1 bit
    for (d <- ids if d % 40 == 0)
      assert(pairs.exists(p => p._1 == -2 * d - 2 && p._2 == d && p._3 <= 1),
        s"missed perturbed copy of doc $d")
    // zero random pairs: every reported pair involves a planted copy
    // (negative id) — two SOURCE images never collide at this scale
    assert(pairs.forall(_._1 < 0),
      s"unexpected source-source pair: ${pairs.filter(_._1 >= 0).toSeq}")
  }
}

class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graph-spec")
    .getOrCreate()
  import spark.implicits._

  test("triangleStats: K4 + pendant — known counts, coefficients, zero for leaves") {
    // complete graph on {1,2,3,4} plus pendant 5-1
    val k4 = for (a <- 1 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)
    val edges = (k4 :+ ((1L, 5L))).toDF("a", "b")
    val got = Graphs.triangleStats(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // each K4 node sits in C(3,2)=3 triangles; node 1 has degree 4
    assert(got(1L) === ((4L, 3L, 0.5))) // cc = 2*3/(4*3)
    assert(got(2L) === ((3L, 3L, 1.0)))
    assert(got(3L) === ((3L, 3L, 1.0)))
    assert(got(4L) === ((3L, 3L, 1.0)))
    assert(got(5L) === ((1L, 0L, 0.0)))
  }

  test("triangleStats: star graph has zero triangles; dup edges and order dedup") {
    val star = (2 to 8).map(i => (1L, i.toLong))
    val edges = (star ++ star).toDF("a", "b") // duplicated edges must dedup
    val got = Graphs.triangleStats(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.forall(_._3 === 0L))
    assert(got.find(_._1 == 1L).get._2 === 7L)
    assert(got.forall(_._4 === 0.0))
  }

  test("pageRankFixedPoint: symmetric graph stays uniform (hand-computed), star orders center first, partition-invariant") {
    import spark.implicits._
    // triangle: n=3, pr0 = 333333333333; od=2; each node receives
    // 2 * (pr0 DIV 2) = 333333333332; pr1 = (1e12*15 DIV 100) DIV 3
    //   + (333333333332*85) DIV 100 = 50000000000 + 283333333332
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val p1 = Graphs.pageRankFixedPoint(tri, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 === Map(1L -> 333333333332L, 2L -> 333333333332L, 3L -> 333333333332L))
    // star: the center accumulates all leaf mass
    val star = (2 to 9).map(i => (1L, i.toLong)).toDF("a", "b")
    val ps = Graphs.pageRankFixedPoint(star, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val center = ps.find(_._1 == 1L).get._2
    val leaves = ps.filter(_._1 != 1L).map(_._2)
    assert(leaves.forall(_ < center) && leaves.distinct.length === 1)
    // exact same bits under adversarial partitioning
    val ps2 = Graphs.pageRankFixedPoint(star.repartition(7), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(ps2.toSeq === ps.sortBy(_._1).toSeq)
  }
}

class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("bpe-spec")
    .getOrCreate()
  import spark.implicits._

  private def corpus(texts: String*): DataFrame =
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("bpeTrain: hand-computed merge sequence, overlap counting, L2R application") {
    // wf: aaab x2, ab x1
    // round 1: (a,a) counts 4 (overlaps included: aaab has it twice),
    //   (a,b) counts 3 → merge (a,a); aaab → [aa,a,b]
    // round 2: (aa,a):2, (a,b):3 → merge (a,b); aaab → [aa,ab]
    // round 3: (aa,ab):2 → merge (aa,ab)
    val m = TextOps.bpeTrain(corpus("aaab aaab ab"), 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m.toSeq === Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("bpeTrain: equal counts break ties by (lhs, rhs) ascending") {
    val m = TextOps.bpeTrain(corpus("xz xz xy xy"), 1).collect()
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(4)) === (("x", "y", 2L)))
  }

  test("bpeTrain: runs dry when no pairs remain, returning fewer rules") {
    val m = TextOps.bpeTrain(corpus("ab ab"), 5).orderBy("rank").collect()
    assert(m.length === 1)
    assert((m(0).getString(3), m(0).getLong(4)) === (("ab", 2L)))
  }
}
