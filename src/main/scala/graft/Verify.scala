package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev only — the driver passes two): comma-
    // separated query names, restricting the dump + oracle json to
    // that subset for fast single-query gate iteration
    val only: Option[Set[String]] = args.lift(2).map(_.split(',').toSet)
    def keep(name: String) = only.forall(_.contains(name))
    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // repo-local scratch: system /tmp reapers delete shuffle files
      // mid-job on long runs (observed as FileNotFoundException)
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Default dump is coalesce(1) — the driver's DuckDB compare reads
    // one file per query and the gate-scale results are tiny. For
    // SCALE rehearsals the single-task sink is a measurement artifact
    // (r13 verdict: per-doc-output queries at sf10 were write-bound —
    // q_quality_classifier 0.09 s compute vs 116.6 s wall), so
    // SPARK_GRAFT_DUMP_PARALLEL=1 writes with natural parallelism and
    // the multiset compare (scripts/compare_big.py) reads the
    // directory glob — correctness identical, walls honest.
    val singleFile = !sys.env.get("SPARK_GRAFT_DUMP_PARALLEL").contains("1")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name))
        try {
          val res = fn(spark, sfDir)
          (if (singleFile) res.coalesce(1) else res)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
