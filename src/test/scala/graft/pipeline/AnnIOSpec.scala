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
    AnnIO.save(idx, s"$base/idx", "annio_codes_rt")
    assert(AnnIO.exists(spark, s"$base/idx"))
    val loaded = AnnIO.load(spark, s"$base/idx")
    assert(loaded.m === 4 && loaded.codebookK === 16 && loaded.dim === 64)
    assert(res(Clustering.pqQueryTopK(loaded, v, "vec_id % 20 = 0", 3)) === trained)
    assert(res(Clustering.pqQueryTopK(loaded, v, "vec_id % 20 = 0", 3, coarseNprobe = 2)) === trainedMp)
  }

  test("exhaustive (no-coarse) index round-trips bit-equal") {
    val v = vecs
    val idx = Clustering.trainPqIndex(v, m = 2, codebookK = 8, iters = 2)
    val trained = res(Clustering.pqQueryTopK(idx, v, "vec_id % 40 = 0", 3))
    val base = tmpBase()
    AnnIO.save(idx, s"$base/idx", "annio_codes_flat")
    val loaded = AnnIO.load(spark, s"$base/idx")
    assert(loaded.coarse.isEmpty)
    assert(res(Clustering.pqQueryTopK(loaded, v, "vec_id % 40 = 0", 3)) === trained)
  }

  test("bucketed code relation reads back pre-partitioned: no Exchange above the codes scan") {
    val loaded = spark.table("annio_codes_rt")
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

  test("no-clobber save + loadOrTrain reuse (the reuse_weights analog)") {
    val v = vecs
    val base = tmpBase()
    val idx = AnnIO.loadOrTrain(spark, v, s"$base/idx", "annio_codes_reuse",
      m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    val first = res(Clustering.pqQueryTopK(idx, v, "vec_id % 40 = 0", 3))
    // a second loadOrTrain must LOAD: poison the training source so a
    // retrain would throw — emb is by-name and must never be evaluated
    val reused = AnnIO.loadOrTrain(spark,
      { throw new RuntimeException("retrained instead of loading!") }: DataFrame,
      s"$base/idx", "annio_codes_reuse", m = 2, codebookK = 8, iters = 2, coarseCells = 4)
    assert(res(Clustering.pqQueryTopK(reused, v, "vec_id % 40 = 0", 3)) === first)
    // and a direct save over the existing index refuses
    val e = intercept[IllegalStateException] {
      AnnIO.save(idx, s"$base/idx", "annio_codes_reuse2")
    }
    assert(e.getMessage.contains("already exists"))
  }
}
