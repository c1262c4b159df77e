package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for stateful sessionization. */
final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Open-session state kept per user between micro-batches. */
final case class SessState(startMs: Long, endMs: Long, n: Long, sum: Double)

/** Closed session emitted once the gap (or watermark timeout) passes. */
final case class SessOut(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

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

  /** Streaming exact dedup with BOUNDED state: first occurrence wins
    * within the watermark horizon, and each key's state is evicted once
    * the watermark passes it (`dropDuplicatesWithinWatermark` — plain
    * `dropDuplicates` on a non-event-time key would accumulate one
    * state entry per distinct hash forever). The streaming form of
    * [[graft.pipeline.Dedup.exact]] with the standard
    * horizon-bounded-exactness tradeoff. */
  def dedupStream(docs: DataFrame, watermarkCol: String = "ts",
                  horizon: String = "1 hour"): DataFrame =
    docs.withWatermark(watermarkCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stateful sessionization with `flatMapGroupsWithState` — the
    * streaming form of [[graft.pipeline.Events.sessions]]: per-user
    * custom state (open session), sessions close on a 30-minute event
    * gap or on event-time timeout at the watermark. Emits each closed
    * session exactly once (append mode). */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
                       gapMinutes: Int = 30): Dataset[SessOut] = {
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60 * 1000

    def run(userId: Long, evs: Iterator[SessEvent],
            state: GroupState[SessState]): Iterator[SessOut] = {
      def toOut(s: SessState) = SessOut(userId,
        new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n, s.sum)
      if (state.hasTimedOut) {
        val out = state.getOption.map(toOut).iterator
        state.remove()
        out
      } else {
        val sorted = evs.toIndexedSeq.sortBy(e => (e.ts.getTime, e.value))
        var open = state.getOption
        val closed = IndexedSeq.newBuilder[SessOut]
        sorted.foreach { e =>
          val t = e.ts.getTime
          open match {
            case Some(s) if t - s.endMs <= gapMs =>
              // min on start too: a late-but-within-watermark event can
              // precede the open session's first event
              open = Some(SessState(math.min(s.startMs, t), math.max(s.endMs, t),
                s.n + 1, s.sum + e.value))
            case Some(s) =>
              closed += toOut(s)
              open = Some(SessState(t, t, 1, e.value))
            case None =>
              open = Some(SessState(t, t, 1, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          // close when the watermark passes the session end + gap
          state.setTimeoutTimestamp(s.endMs + gapMs)
        }
        closed.result().iterator
      }
    }

    events.selectExpr("CAST(user_id AS LONG) AS user_id", "ts",
        "CAST(value AS DOUBLE) AS value")
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(run)
  }

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
