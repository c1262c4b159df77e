package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ index persistence (AnnIO): a loaded index must serve
  * BIT-EQUAL top-k to the freshly trained one (codes, codebooks, and
  * coarse centroids all round-trip exactly — doubles through Parquet
  * are lossless), the bucketed code relation must come back
  * pre-partitioned (no index-side Exchange when the probe join
  * shuffles), and the lifecycle contracts hold: no-clobber on save,
  * loadOrTrain loads instead of re-training when the index exists. */
class AnnIOSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("annio_wh").toFile
    wh.deleteOnExit()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh.getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .appName("ann-io")
      .getOrCreate()
  }

  /** Table names are per-run: a complete index SEALS its table name
    * for as long as the index directory lives (r11), and the temp
    * index dirs of previous test JVMs survive /tmp (deleteOnExit
    * cannot remove non-empty dirs) — re-using a fixed name across
    * runs would trip the seal by design. */
  private val run = java.lang.Long.toHexString(System.nanoTime())
  private def tbl(base: String): String = s"${base}_$run"

  private def tmpBase(): String = {
    val d = java.nio.file.Files.createTempDirectory("annio_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Same planted-partner corpus as PipelineSpec's pqTopK test. */
  private def vecs: DataFrame = spark.range(1200L)
    .withColumn("gid", when(col("id") % 20 === 1, col("id") - 1).otherwise(col("id")))
    .selectExpr("id AS vec_id",
      """transform(sequence(0, 63), j -> CAST(
           CAST(hash(gid, j) AS DOUBLE) / 2.147483647e9 +
           CASE WHEN id % 20 = 1
                THEN 0.1e0 * CAST(hash(id, j, 7) AS DOUBLE) / 2.147483647e9
                ELSE 0.0e0 END AS FLOAT)) AS embedding""")

  private def res(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("coarse IVF-PQ index round-trips: loaded index serves bit-equal top-k, single and multi-probe") {
    val v = vecs
    val idx = Clustering.trainPqIndex(v, m = 4, codebookK = 16, iters = 2,
      coarseCells = 4)
    val trained = res(Clustering.pqQueryTopK(idx, v, "vec_id % 20 = 0", 3))
    val trainedMp = res(Clustering.pqQueryTopK(idx, v, "vec_id % 20 = 0", 3, coarseNprobe = 2))
    // the train+query composition is exactly pqTopK — the refactor must
    // not have moved the contract surface
    assert(trained === res(Clustering.pqTopK(v, "vec_id % 20 = 0", 3, 4, 16, 2, coarseCells = 4)))

    val base = tmpBase()
    AnnIO.save(idx, s"$base/idx", tbl("annio_codes_rt"))
    assert(AnnIO.exists(spark, s"$base/idx"))
    val loaded = AnnIO.load(spark, s"$base/idx")
    assert(loaded.m === 4 && loaded.codebookK === 16 && loaded.dim === 64)
    assert(res(Clustering.pqQueryTopK(loaded, v, "vec_id % 20 = 0", 3)) === trained)
    assert(res(Clustering.pqQueryTopK(loaded, v, "vec_id % 20 = 0", 3, coarseNprobe = 2)) === trainedMp)
  }

  test("filtered serving from a persisted index: metaCols round-trip, pre-filter semantics, append guard") {
    val v = vecs
    val labeled = v.withColumn("label", pmod(col("vec_id"), lit(3)).cast("int"))
    val idx = Clustering.trainPqIndex(v, m = 4, codebookK = 16, iters = 2,
      coarseCells = 4)
    val withMeta = idx.copy(
      codes = idx.codes.join(labeled.select("vec_id", "label"), "vec_id"))
    val base = tmpBase()
    AnnIO.save(withMeta, s"$base/idx", tbl("annio_codes_meta"), metaCols = Seq("label"))
    val loaded = AnnIO.load(spark, s"$base/idx")
    assert(loaded.codes.columns.contains("label"), "label must round-trip with the codes")
    val filtered = res(Clustering.pqQueryTopK(loaded, v, "vec_id % 20 = 0", 3,
      indexFilter = "label = 1"))
    // pre-filter truth: the same query against an index whose code
    // relation was filtered in memory BEFORE serving
    val want = res(Clustering.pqQueryTopK(
      withMeta.copy(codes = withMeta.codes.filter("label = 1")),
      v, "vec_id % 20 = 0", 3))
    assert(filtered === want)
    assert(filtered.nonEmpty)
    // every served neighbor satisfies the predicate
    val ok = labeled.filter("label = 1").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(filtered.forall { case (_, n, _, _) => ok.contains(n) })
    // an append missing the recorded metadata column fails loudly
    val batch = Clustering.encodePqBatch(loaded,
      v.selectExpr("vec_id + 5000 AS vec_id", "embedding"))
    val e = intercept[IllegalArgumentException] {
      AnnIO.appendCodes(loaded, batch, s"$base/idx")
    }
    assert(e.getMessage.contains("metadata column"))
    // with it, the append lands and the new vectors serve under the filter
    AnnIO.appendCodes(loaded,
      batch.withColumn("label", lit(1)), s"$base/idx")
    val after = AnnIO.load(spark, s"$base/idx")
    assert(after.codes.filter("vec_id >= 5000 AND label = 1").count() === 1200L)
  }

  test("exhaustive (no-coarse) index round-trips bit-equal") {
    val v = vecs
    val idx = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 2)
    val trained = res(Clustering.pqQueryTopK(idx, v, "vec_id % 40 = 0", 3))
    val base = tmpBase()
    AnnIO.save(idx, s"$base/idx", tbl("annio_codes_flat"))
    val loaded = AnnIO.load(spark, s"$base/idx")
    assert(loaded.coarse.isEmpty)
    assert(res(Clustering.pqQueryTopK(loaded, v, "vec_id % 40 = 0", 3)) === trained)
  }

  test("bucketed code relation reads back pre-partitioned: no Exchange above the codes scan") {
    val loaded = spark.table(tbl("annio_codes_rt"))
    // a shuffled probe join on `cell` must leave the index side alone:
    // the bucketed scan satisfies the join's distribution requirement
    val probes = spark.range(50).selectExpr("id AS query_id", "CAST(id % 4 AS INT) AS cell")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = loaded.join(probes, "cell").queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected only the probe-side Exchange, plan:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("encodePqBatch on the training corpus reproduces the trained code relation bit-for-bit") {
    val v = vecs
    val idx = Clustering.trainPqIndex(v, m = 4, codebookK = 16, iters = 2, coarseCells = 4)
    val cols = "vec_id" +: (0 until 4).map(i => s"code_$i") :+ "cell"
    val trained = rows(idx.codes.select(cols.map(col): _*))
    val encoded = rows(Clustering.encodePqBatch(idx, v).select(cols.map(col): _*))
    assert(encoded === trained)
  }

  test("appendCodes: new batch joins the serving index; reloaded results equal the unioned index") {
    val v = vecs                                    // ids 0..1199 — the trained corpus
    val fresh = spark.range(1200L, 1400L)           // the new ingest batch
      .selectExpr("id AS vec_id",
        """transform(sequence(0, 63), j -> CAST(
             CAST(hash(id, j) AS DOUBLE) / 2.147483647e9 AS FLOAT)) AS embedding""")
    val all = v.unionByName(fresh)
    val idx = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    val base = tmpBase()
    AnnIO.save(idx, s"$base/idx", tbl("annio_codes_append"))
    // files per bucketed write = non-empty (cell-hash) partitions — a
    // baseline captured from the fresh save, NOT assumed = buckets
    def bucketFiles(): Int = spark.sql(s"DESCRIBE EXTENDED ${tbl("annio_codes_append")}")
      .collect().collectFirst {
        case r if r.getString(0) == "Location" => r.getString(1)
      }.map(loc => new java.io.File(loc.stripPrefix("file:"))
        .listFiles().count(_.getName.endsWith(".parquet"))).getOrElse(-1)
    val filesAfterSave = bucketFiles()
    assert(filesAfterSave > 0)
    val batch = Clustering.encodePqBatch(idx, fresh)
    AnnIO.appendCodes(idx, batch, s"$base/idx")
    val reloaded = AnnIO.load(spark, s"$base/idx")
    assert(reloaded.codes.count() === 1400)
    // truth: the in-memory index with the union of old and new codes
    val unioned = idx.copy(codes = idx.codes.unionByName(batch), cellAsg = None)
    val got = res(Clustering.pqQueryTopK(reloaded, all, "vec_id % 40 = 0", 3))
    assert(got === res(Clustering.pqQueryTopK(unioned, all, "vec_id % 40 = 0", 3)))
    // the new vectors are genuinely servable: they appear as neighbors
    assert(got.exists(_._2 >= 1200L), "no appended vector ever surfaced as a neighbor")
    // compaction: the append added a second file set; compact returns
    // to the fresh-save layout with results untouched
    assert(bucketFiles() > filesAfterSave,
      s"expected more files after append, got ${bucketFiles()} vs $filesAfterSave")
    AnnIO.compactCodes(spark, s"$base/idx")
    assert(bucketFiles() <= filesAfterSave,
      s"expected <= $filesAfterSave files after compaction, got ${bucketFiles()}")
    assert(res(Clustering.pqQueryTopK(AnnIO.load(spark, s"$base/idx"), all,
      "vec_id % 40 = 0", 3)) === got)
  }

  test("learned-IVF index round-trips: loaded IvfIndex serves bit-equal top-k, single and multi-probe") {
    val v = vecs
    val idx = Clustering.trainIvfIndex(v, cells = 8, iters = 2)
    val trained = res(Clustering.ivfQueryTopK(idx, v, "vec_id % 20 = 0", 3)
      .select("query_id", "neighbor_id", "cos", "rank"))
    val trainedMp = res(Clustering.ivfQueryTopK(idx, v, "vec_id % 20 = 0", 3, nprobe = 2)
      .select("query_id", "neighbor_id", "cos", "rank"))
    // the train+query composition is exactly ivfLearnedTopK
    assert(trained === res(Clustering.ivfLearnedTopK(v, "vec_id % 20 = 0", 3, 8, 2)
      .select("query_id", "neighbor_id", "cos", "rank")))
    val base = tmpBase()
    AnnIO.saveIvf(idx, s"$base/ivf", tbl("annio_ivf_rt"))
    val loaded = AnnIO.loadIvf(spark, s"$base/ivf")
    assert(loaded.dim === 64 && loaded.cents.length === 8)
    assert(res(Clustering.ivfQueryTopK(loaded, v, "vec_id % 20 = 0", 3)
      .select("query_id", "neighbor_id", "cos", "rank")) === trained)
    assert(res(Clustering.ivfQueryTopK(loaded, v, "vec_id % 20 = 0", 3, nprobe = 2)
      .select("query_id", "neighbor_id", "cos", "rank")) === trainedMp)
  }

  test("no-clobber save + loadOrTrain reuse (the reuse_weights analog)") {
    val v = vecs
    val base = tmpBase()
    val idx = AnnIO.loadOrTrain(spark, v, s"$base/idx", tbl("annio_codes_reuse"),
      m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    val first = res(Clustering.pqQueryTopK(idx, v, "vec_id % 40 = 0", 3))
    // a second loadOrTrain must LOAD: poison the training source so a
    // retrain would throw — emb is by-name and must never be evaluated
    val reused = AnnIO.loadOrTrain(spark,
      { throw new RuntimeException("retrained instead of loading!") }: DataFrame,
      s"$base/idx", tbl("annio_codes_reuse"), m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    assert(res(Clustering.pqQueryTopK(reused, v, "vec_id % 40 = 0", 3)) === first)
    // and a direct save over the existing index refuses
    val e = intercept[IllegalStateException] {
      AnnIO.save(idx, s"$base/idx", tbl("annio_codes_reuse2"))
    }
    assert(e.getMessage.contains("already exists"))
  }

  private def freshBatch: DataFrame = spark.range(1200L, 1400L)
    .selectExpr("id AS vec_id",
      """transform(sequence(0, 63), j -> CAST(
           CAST(hash(id, j) AS DOUBLE) / 2.147483647e9 AS FLOAT)) AS embedding""")

  test("appendCodes refuses a batch or handle from a DIFFERENT index (fingerprint guard)") {
    val v = vecs
    val idxA = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    val idxB = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 1, coarseCells = 4)
    assert(AnnIO.fingerprint(idxA.codebooks, idxA.coarse) !==
      AnnIO.fingerprint(idxB.codebooks, idxB.coarse),
      "fixture models must differ for this test to mean anything")
    val base = tmpBase()
    AnnIO.save(idxA, s"$base/a", tbl("annio_codes_fpa"))
    // a batch encoded against the OTHER index cannot land here — its
    // codes mean different centroids and would poison served neighbors
    val wrong = intercept[IllegalArgumentException] {
      AnnIO.appendCodes(idxA, Clustering.encodePqBatch(idxB, freshBatch), s"$base/a")
    }
    assert(wrong.getMessage.contains("encoded against a different index"))
    // a mismatched index HANDLE refuses too (appending to the wrong path)
    val wrongHandle = intercept[IllegalArgumentException] {
      AnnIO.appendCodes(idxB, Clustering.encodePqBatch(idxB, freshBatch), s"$base/a")
    }
    assert(wrongHandle.getMessage.contains("different index"))
    // the matching append is unchanged
    AnnIO.appendCodes(idxA, Clustering.encodePqBatch(idxA, freshBatch), s"$base/a")
    assert(AnnIO.load(spark, s"$base/a").codes.count() === 1400L)
  }

  test("a live complete index's code table cannot be re-claimed; a retired one can") {
    val v = vecs
    val idx = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    val base = tmpBase()
    AnnIO.save(idx, s"$base/one", tbl("annio_codes_seal"))
    // same table name for a NEW index: refused while the owner lives
    val e = intercept[IllegalStateException] {
      AnnIO.save(idx, s"$base/two", tbl("annio_codes_seal"))
    }
    assert(e.getMessage.contains("COMPLETE ANN index"))
    // the refusing save must not have touched the live index
    assert(AnnIO.load(spark, s"$base/one").codes.count() === 1200L)
    // retiring the owner (deleting its index directory) makes the
    // name reclaimable — the seal is stale once the meta is gone
    val p = new org.apache.hadoop.fs.Path(s"$base/one")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    AnnIO.save(idx, s"$base/two", tbl("annio_codes_seal"))
    assert(AnnIO.load(spark, s"$base/two").codes.count() === 1200L)
  }

  test("meta_cols survives a comma-bearing column name (array round-trip)") {
    val v = vecs
    val weird = "la,bel" // legal Spark column name; the r10 string form split it
    val labeled = v.withColumn(weird, pmod(col("vec_id"), lit(2)).cast("int"))
    val idx = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    val withMeta = idx.copy(
      codes = idx.codes.join(labeled.select(col("vec_id"), col(weird)), "vec_id"))
    val base = tmpBase()
    AnnIO.save(withMeta, s"$base/idx", tbl("annio_codes_comma"), metaCols = Seq(weird))
    val loaded = AnnIO.load(spark, s"$base/idx")
    assert(loaded.codes.columns.contains(weird))
    // the append path parses the recorded name back as ONE column
    AnnIO.appendCodes(loaded,
      Clustering.encodePqBatch(loaded, freshBatch).withColumn(weird, lit(1)),
      s"$base/idx")
    assert(AnnIO.load(spark, s"$base/idx").codes
      .filter(col(weird) === 1 && col("vec_id") >= 1200L).count() === 200L)
  }

  test("refreshCentroids: decayed mini-batch update tracks drift within tolerance of a full retrain") {
    // 4 well-separated block centers; the ingest batch's centers are
    // DRIFTED by +1.0 inside each block — the refresh must move the
    // model toward the union's truth without retraining on the corpus
    def mk(ids: org.apache.spark.sql.DataFrame, shift: Double): DataFrame =
      ids.selectExpr("id AS vec_id",
        s"""transform(sequence(0, 63), j -> CAST(
             CASE WHEN j DIV 16 = CAST(id % 4 AS INT)
                  THEN ${5.0 + shift}e0 ELSE 0.0e0 END
             + 0.5e0 * CAST(hash(id, j) AS DOUBLE) / 2.147483647e9 AS FLOAT))
           AS embedding""")
    val corpus = mk(spark.range(400L).toDF("id"), 0.0)
    val batch = mk(spark.range(1000L, 1200L).toDF("id"), 1.0)
    val (_, centsA) = Clustering.kmeansFull(corpus, 4, 4)
    // priorWeight = |corpus|/k makes the refresh ≈ one Lloyd round
    // over corpus+batch — compare against the actual full retrain
    val refreshed = Clustering.refreshCentroids(centsA, batch, priorWeight = 100L)
    val (_, retrained) = Clustering.kmeansFull(corpus.unionByName(batch), 4, 4)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def sumNearest(from: Array[(Int, Array[Double])]): Double =
      from.map { case (_, c) => retrained.map { case (_, t) => math.sqrt(d2(c, t)) }.min }.sum
    val refDist = sumNearest(refreshed)
    val oldDist = sumNearest(centsA)
    // quant space: raw × 1e4; block separation ≈ 2e5 units. The
    // refresh must land each centroid within 5000 units (0.5 raw) of
    // its retrained twin AND strictly closer than the stale model was
    refreshed.foreach { case (_, c) =>
      val near = retrained.map { case (_, t) => math.sqrt(d2(c, t)) }.min
      assert(near < 5000.0, s"refreshed centroid $near quant units from retrain")
    }
    assert(refDist < oldDist, s"refresh did not track drift: $refDist !< $oldDist")
    // contracts: an empty batch is a bit-exact no-op; an untouched
    // centroid is bit-unchanged under a batch aimed at one cluster
    val empty = Clustering.refreshCentroids(centsA, corpus.limit(0), 100L)
    assert(empty.map(_._2.toSeq) === centsA.map(_._2.toSeq))
    val oneCluster = mk(spark.range(2000L, 2100L).toDF("id"), 0.5)
      .filter("vec_id % 4 = 0") // all land in cluster of block 0
    val touched = Clustering.refreshCentroids(centsA, oneCluster, 100L)
    val moved = centsA.indices.count(i =>
      touched(i)._2.toSeq != centsA(i)._2.toSeq)
    assert(moved === 1, s"expected exactly 1 centroid to move, got $moved")
  }

  test("rollover promotes a refreshed coarse model to serving; v1 retires; stale batches refuse") {
    val v = vecs
    val idx = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    val base = tmpBase()
    AnnIO.save(idx, s"$base/v1", tbl("annio_codes_roll1"))
    val v1 = AnnIO.load(spark, s"$base/v1")
    val oldFp = AnnIO.fingerprint(v1.codebooks, v1.coarse)
    // a batch encoded against v1 BEFORE the rollover — the stale-code
    // specimen (encode uses only the driver-side codebooks, so it
    // stays usable after v1 retires)
    val staleBatch = Clustering.encodePqBatch(v1, freshBatch)
    val refreshed = Clustering.refreshCentroids(
      v1.coarse.get, v.filter("vec_id % 5 = 0"), priorWeight = 20L)
    val v2 = AnnIO.rollover(spark, s"$base/v1", v, refreshed,
      s"$base/v2", tbl("annio_codes_roll2"))
    // fresh model identity; the old version is GONE (load refuses)
    assert(AnnIO.fingerprint(v2.codebooks, v2.coarse) !== oldFp)
    assert(!AnnIO.exists(spark, s"$base/v1"))
    // serving through the rolled-over index equals the hand-built
    // refreshed model (same codebooks, re-celled codes) — the r11
    // "hand-roll a new index" workaround, now reproduced by the API
    val manual = idx.copy(
      codes = idx.codes.drop("cell").join(
        Clustering.assignToCentroids(v, refreshed)
          .select(col("vec_id"), col("cluster").as("cell")), "vec_id"),
      cellAsg = None, coarse = Some(refreshed))
    assert(res(Clustering.pqQueryTopK(v2, v, "vec_id % 20 = 0", 3)) ===
      res(Clustering.pqQueryTopK(manual, v, "vec_id % 20 = 0", 3)))
    // the pre-rollover batch cannot land in v2 (fingerprint refusal) …
    val e = intercept[IllegalArgumentException] {
      AnnIO.appendCodes(v2, staleBatch, s"$base/v2")
    }
    assert(e.getMessage.contains("encoded against a different index"))
    // … and the same vectors re-encoded against v2 append cleanly
    AnnIO.appendCodes(v2, Clustering.encodePqBatch(v2, freshBatch), s"$base/v2")
    assert(AnnIO.load(spark, s"$base/v2").codes.count() === 1400L)
    // the retired v1's table name is reclaimable for a fresh save
    AnnIO.save(idx, s"$base/v1b", tbl("annio_codes_roll1"))
    assert(AnnIO.load(spark, s"$base/v1b").codes.count() === 1200L)
    // guard: an emb relation missing indexed vectors refuses loudly
    val short = intercept[IllegalStateException] {
      AnnIO.rollover(spark, s"$base/v2", v.filter("vec_id < 600"),
        refreshed, s"$base/v3", tbl("annio_codes_roll3"))
    }
    assert(short.getMessage.contains("must cover every vec_id"))
  }

  test("load backfills the ownership seal for legacy (pre-seal) indexes") {
    val v = vecs
    val idx = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    val base = tmpBase()
    val t = tbl("annio_codes_legacy")
    AnnIO.save(idx, s"$base/idx", t)
    // simulate a pre-r11 save: strip the seal the modern save planted
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val seal = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(wh, t.toLowerCase), "_graft_ann_complete")
    val fs = seal.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(seal, false)
    assert(!fs.exists(seal))
    AnnIO.load(spark, s"$base/idx")
    assert(fs.exists(seal), "load must backfill the legacy index's seal")
    // the backfilled seal protects like a native one: name re-use refuses
    val e = intercept[IllegalStateException] {
      AnnIO.save(idx, s"$base/idx2", t)
    }
    assert(e.getMessage.contains("COMPLETE ANN index"))
  }

  test("refreshCentroids raises on a batch vector that assigns to no centroid (NaN embedding)") {
    val v = vecs
    val (_, cents) = Clustering.kmeansFull(v, 4, 2)
    val nanBatch = v.limit(5).selectExpr("vec_id",
      "transform(embedding, x -> CAST('NaN' AS FLOAT)) AS embedding")
    val e = intercept[IllegalArgumentException] {
      Clustering.refreshCentroids(cents, nanBatch, priorWeight = 100L)
    }
    assert(e.getMessage.contains("assigned to NO centroid"))
  }

  test("load refuses a corrupted model (fingerprint integrity check)") {
    val v = vecs
    val idx = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    val base = tmpBase()
    AnnIO.save(idx, s"$base/idx", tbl("annio_codes_corrupt"))
    // silently replace the codebooks with scaled ones (same schema)
    val cb = spark.read.parquet(s"$base/idx/codebooks.parquet")
      .selectExpr("sub", "code", "transform(cv, x -> x * 2.0e0) AS cv")
      .collect()
    val p = new org.apache.hadoop.fs.Path(s"$base/idx/codebooks.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    import spark.implicits._
    cb.map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
        r.getAs[Seq[Double]]("cv").toArray))
      .toSeq.toDF("sub", "code", "cv")
      .coalesce(1).write.parquet(s"$base/idx/codebooks.parquet")
    val e = intercept[IllegalStateException] {
      AnnIO.load(spark, s"$base/idx")
    }
    assert(e.getMessage.contains("integrity check"))
  }
}
