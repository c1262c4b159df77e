package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the engine's kernels. The reference
  * has no streaming story (SURVEY §2.8) — this is the Spark-native
  * extension: the same declarative transforms run unchanged on a
  * `readStream` source.
  */
object StreamingOps {

  /** Watermarked tumbling-window event aggregation. Works on a static
    * or streaming frame; on a stream it emits finalized windows 2 hours
    * after their end (late data beyond that is dropped). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))

  /** Streaming regrid: the K1 join-agg kernel applied per micro-batch.
    * Weights are a static broadcast side (the exact analog of the
    * reference's dask strategy — every chunk sees the full W,
    * `frontend.py:375-389`); each micro-batch must carry complete
    * horizontal slabs (e.g. one timestep per batch), which is the same
    * contract dask imposes by forbidding horizontal chunking. */
  def regridBatch(weights: DataFrame, fieldBatch: DataFrame,
                  extraDims: Seq[String] = Nil): DataFrame =
    fieldBatch
      .join(broadcast(weights.select(col("row"), col("col"), col("s"))),
        fieldBatch("cell_id") === col("col"))
      .groupBy(col("row").as("cell_id") +: extraDims.map(col): _*)
      .agg(sum(col("s") * col("value")).as("value"))
}
