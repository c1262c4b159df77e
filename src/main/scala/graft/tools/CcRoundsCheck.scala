package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: how many pointer-jumping rounds does the contract-scale
  * dedup-cluster pair graph actually take? (Optimization-round
  * evidence for the CC loop's per-round job cost.) */
object CcRoundsCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.pipeline.Dedup.minhashLsh(docs).filter(col("jaccard") >= 0.5)
    val (out, rounds) = graft.pipeline.Dedup.clustersWithRounds(pairs)
    println(s"[ccrounds] rows=${out.count()} rounds=$rounds")
    spark.stop()
  }
}
