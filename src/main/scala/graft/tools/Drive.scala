package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: drive the driver-facing surface (entry + any query) and
  * dump physical plans. Usage:
  *   runMain graft.tools.Drive entry
  *   runMain graft.tools.Drive q_w_conservative /root/testdata/sf0.001 [explain]
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val name = args.headOption.getOrElse("entry")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df =
      if (name == "entry") graft.SparkEntry.entry(spark)
      else graft.SparkEntry.queries(name)(spark, sfDir)

    // plan first: inspecting a plan must not require the run to
    // succeed (a broadcast OOM at execution would otherwise hide the
    // very plan that explains it)
    if (args.contains("explain")) df.explain("formatted")
    if (!args.contains("planonly")) {
      println(s"=== $name rows=${df.count()}")
      df.show(5, truncate = false)
    }
    // `time` mode: N warm repeats of the FULL query build+run (fresh
    // DataFrame each round, like the bench), walls printed per round
    if (args.contains("time")) {
      val n = 5
      val walls = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"=== time $name: ${walls.map(w => f"$w%.2f").mkString(" ")} (min ${walls.min}%.2f)")
    }
    spark.stop()
  }
}
