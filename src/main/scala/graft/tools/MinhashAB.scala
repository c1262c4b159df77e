package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B: minhashLsh persistShingles=false vs true at the
  * contract scale, post-spread() — re-checks the r13 measurement the
  * default was chosen on. */
object MinhashAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      if (d.rdd.getNumPartitions < 32) d.repartition(32) else d
    }
    def run(persist: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.pipeline.Dedup.minhashLsh(docs, persistShingles = persist).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(false); run(true) // warmup
    val rs = (1 to 4).map { _ => (run(false), run(true)) }
    println(f"[minhashab] recompute=${rs.map(_._1).min}%.3f persist=${rs.map(_._2).min}%.3f")
    spark.stop()
  }
}
