package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextOps}

/** Stage-level wall attribution + recompute-vs-persistShingles A/B for
  * the MinHash-LSH chain. The box this runs on shows 2-4x run-to-run
  * wall variance (hypervisor co-tenancy), so the A/B is INTERLEAVED
  * best-of-N — the same protocol as Bench — and the per-variant MIN is
  * the comparable number; single-shot readings are not evidence here.
  *
  * Usage: SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.MinhashParts [stages|ab|sf]..."
  */
object MinhashParts {
  def main(args: Array[String]): Unit = {
    val sections: Set[String] = if (args.isEmpty) Set("ab", "sf") else args.toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(nDocs: Long): DataFrame =
      spark.range(nDocs)
        .withColumn("gid", when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id")))
        .selectExpr("id AS doc_id",
          """concat(
               array_join(transform(sequence(0, 19),
                 t -> concat('w', pmod(hash(gid, t), 1000))), ' '),
               CASE WHEN id % 10 = 1 THEN ' dupmarker' ELSE '' END) AS text""",
          "'syn' AS source")

    def wall(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    def probeBlock(docs: DataFrame, persist: Boolean): Long = {
      val p = Dedup.minhashLsh(docs, persistShingles = persist)
        .filter(col("jaccard") >= 0.5)
      p.filter(col("b") === col("a") + 1 && col("a") % 10 === 0).count()
      p.count()
    }

    if (sections("stages")) {
      val docs = corpus(1000000L)
      val sh = TextOps.shingleSet(docs, 5)
      val mh = TextOps.minhashFromShingles(sh, 16)
      val bands = TextOps.lshBands(mh, 4)
      val joined = bands.select(col("band"), col("sig"), col("doc_id").as("a"))
        .join(bands.select(col("band"), col("sig"), col("doc_id").as("b")), Seq("band", "sig"))
        .filter(col("a") < col("b"))
        .select("a", "b")
      time("corpus text gen")(docs.count())
      time("shingleSet (distinct 5-gram)")(sh.count())
      time("minhashFromShingles (grouped 16)")(mh.count())
      time("lshBands (groupBy band md5)")(bands.count())
      time("band self-join pre-distinct")(joined.count())
      time("candidates (post-distinct)")(joined.distinct().count())
    }

    if (sections("ab")) {
      val docs = corpus(1000000L)
      val rounds = 4
      var rec = List.empty[Double]
      var per = List.empty[Double]
      for (r <- 1 to rounds) {
        rec ::= wall(probeBlock(docs, persist = false))
        per ::= wall(probeBlock(docs, persist = true))
        println(f"  1M round $r: recompute ${rec.head}%.2f s  persist ${per.head}%.2f s")
      }
      println(f"1M probe block MIN: recompute ${rec.min}%.2f s  persist ${per.min}%.2f s  " +
        f"(spread r=${rec.reverse.map(w => f"$w%.1f").mkString("/")} p=${per.reverse.map(w => f"$w%.1f").mkString("/")})")
    }

    if (sections("sf")) {
      val sfDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val rounds = 4
      var rec = List.empty[Double]
      var per = List.empty[Double]
      for (_ <- 1 to rounds) {
        rec ::= wall(Dedup.minhashLsh(sfDocs).filter(col("jaccard") >= 0.5).count())
        per ::= wall(Dedup.minhashLsh(sfDocs, persistShingles = true)
          .filter(col("jaccard") >= 0.5).count())
      }
      println(f"sf0.1 single count MIN: recompute ${rec.min}%.2f s  persist ${per.min}%.2f s  " +
        f"(spread r=${rec.reverse.map(w => f"$w%.1f").mkString("/")} p=${per.reverse.map(w => f"$w%.1f").mkString("/")})")
    }
    spark.stop()
  }
}
