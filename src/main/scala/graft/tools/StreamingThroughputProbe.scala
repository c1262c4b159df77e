package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

/** Streaming THROUGHPUT evidence (r13 verdict #6): the streaming
  * surface is correctness-pinned against its batch twins at toy scale
  * (spec parity contracts), but a 100 TB pipeline's live side is sized
  * in sustained events/second and state-store footprint — numbers a
  * correctness spec cannot give. This probe drives the three heaviest
  * stateful operators (sessionizeStream, funnelStream,
  * rollingAnomalyStream) with a deterministic synthetic event stream
  * at sf100-like key cardinality (1.5 M users — the events_user key
  * space of the 1000-copy rehearsal corpus) until `--rows` events
  * (default 100 M) have been processed, and reports per operator:
  * sustained events/s, per-micro-batch wall distribution, and the
  * state store's row count + memory at steady state.
  *
  * Source: `rate-micro-batch` (rowsPerBatch fixed, so the pipeline
  * runs back-to-back batches as fast as the operator drains them —
  * measured throughput is the OPERATOR's ceiling, not a rate limit).
  * Event time is derived from the global row index (40 events per
  * simulated second ⇒ 100 M events ≈ 29 simulated days), so the
  * watermark sweeps forward every batch and state actually evicts —
  * steady-state numbers, not an unbounded accumulation artifact. The
  * noop sink executes the full plan and discards rows.
  *
  * Usage: runMain graft.tools.StreamingThroughputProbe
  *          [--rows N] [--batch N] [--users N] [--ops a,b,c]
  * Prints one JSON line per operator; paste into PLANS.md.
  */
object StreamingThroughputProbe {

  /** Deterministic event stream from the global row index `value`:
    * sf100-like cardinalities, value column pseudo-random via a
    * Knuth-hash residue (no Math.random — reruns are identical). */
  def synthEvents(spark: SparkSession, users: Long,
                  rowsPerBatch: Long): DataFrame =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("numPartitions", 32)
      .load()
      .selectExpr(
        "value AS event_id",
        s"value % ${users}L AS user_id",
        "concat('t', CAST(value % 8 AS STRING)) AS event_type",
        // 40 events / simulated second, epoch-anchored
        "timestamp_micros(1767225600000000 + value * 25000) AS ts",
        "CAST((value * 2654435761) % 1000000 AS DOUBLE) / 1000.0 AS value")

  def main(args: Array[String]): Unit = {
    def optArg(flag: String, dflt: String): String =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }.getOrElse(dflt)
    val totalRows = optArg("--rows", "100000000").toLong
    val rowsPerBatch = optArg("--batch", "2000000").toLong
    val users = optArg("--users", "1500000").toLong
    val ops = optArg("--ops", "sessionize,funnel,anomaly").split(',').toSet

    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def probe(name: String, mode: String = "append")
             (plan: DataFrame => DataFrame): Unit = {
      val ckpt = s"/root/repo/target/spark-tmp/stream_probe_${name}_${ProcessHandle.current.pid}"
      val out = plan(synthEvents(spark, users, rowsPerBatch))
      val q = out.writeStream.format("noop")
        .outputMode(mode) // funnelStream is an Update-mode operator
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0L))
        .start()
      val t0 = System.nanoTime()
      var rows = 0L
      var walls = List.empty[Double]
      var stateRows = -1L
      var stateMem = -1L
      var lastBatch = -1L
      while (rows < totalRows && q.isActive) {
        Thread.sleep(500)
        Option(q.lastProgress).foreach { p =>
          if (p.batchId != lastBatch && p.numInputRows > 0) {
            lastBatch = p.batchId
            rows += p.numInputRows
            walls ::= p.batchDuration / 1000.0
            if (p.stateOperators.nonEmpty) {
              stateRows = p.stateOperators.map(_.numRowsTotal).sum
              stateMem = p.stateOperators.map(_.memoryUsedBytes).sum
            }
          }
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      q.stop()
      val ws = walls.sorted
      def pct(p: Double) =
        if (ws.isEmpty) 0.0 else ws(math.min(ws.size - 1, (p * ws.size).toInt))
      println(f"""{"op":"$name","events":$rows,"wall_s":$wall%.1f,""" +
        f""""events_per_s":${rows / wall}%.0f,"batches":${ws.size},""" +
        f""""batch_wall_p50_s":${pct(0.5)}%.2f,"batch_wall_p95_s":${pct(0.95)}%.2f,""" +
        f""""state_rows":$stateRows,"state_mem_mb":${stateMem / 1048576.0}%.1f}""")
      // probe hygiene: the checkpoint is throwaway
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(ckpt))
    }

    if (ops("sessionize"))
      probe("sessionizeStream")(ev =>
        StreamingOps.sessionizeStream(spark, ev, gapMinutes = 30).toDF())
    if (ops("funnel"))
      probe("funnelStream", mode = "update")(ev =>
        StreamingOps.funnelStream(spark, ev, Seq("t0", "t1", "t2")))
    if (ops("anomaly"))
      probe("rollingAnomalyStream")(ev =>
        StreamingOps.rollingAnomalyStream(spark, ev).toDF())
    spark.stop()
  }
}
