package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming parity for the rolling-anomaly monitor (X61): the
  * stream twin must reproduce the batch operator row-for-row on the
  * same events under the documented delivery contract — event-time
  * ordered across micro-batches, arbitrary order within a batch. */
class StreamingRollingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-rolling")
    .getOrCreate()

  private type Ev = (Long, Long, String, java.sql.Timestamp, Double)

  test("streaming rolling anomaly == batch Events.rollingAnomaly on sf0.01 (ordered delivery)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Events.load(spark, "/root/testdata/sf0.01")
    val static = Events.rollingAnomaly(ev).collect()
      .map(r => r.getLong(0) -> ((r.getInt(5), r.get(6), r.get(7), r.get(8),
        r.getBoolean(9)))).toMap

    val rows = ev.selectExpr("CAST(event_id AS LONG)", "CAST(user_id AS LONG)",
        "event_type", "ts", "CAST(value AS DOUBLE)")
      .as[Ev].collect()
      .sortBy(e => (e._4.getTime, e._4.getNanos, e._1))
    val stream = MemoryStream[Ev]
    val out = graft.streaming.StreamingOps.rollingAnomalyStream(spark,
      stream.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"),
      horizonMinutes = 90 * 24 * 60)
    val emitted = scala.collection.mutable.Map[Long, (Int, Any, Any, Any, Boolean)]()
    val q = out.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach { r =>
          emitted.synchronized {
            emitted(r.getLong(0)) =
              (r.getInt(5), r.get(6), r.get(7), r.get(8), r.getBoolean(9))
          }
        }
      }.start()
    rows.grouped(math.max(1, rows.length / 5 + 1)).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(emitted.size === static.size,
      s"row counts differ: streamed ${emitted.size} vs batch ${static.size}")
    val diffs = static.keys.filter(k => emitted(k) != static(k))
    assert(diffs.isEmpty, s"first diverging event_ids: ${diffs.take(5).map(k =>
      s"$k streamed=${emitted(k)} batch=${static(k)}")}")
  }

  test("streaming rolling anomaly: baseline carry across batches, std=0 silent, spike flags") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val stream = MemoryStream[Ev]
    val out = graft.streaming.StreamingOps.rollingAnomalyStream(spark,
      stream.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"),
      n = 4, zThresh = 3.0, minPrior = 4, watermark = "120 minutes")
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Int, Boolean)]()
    val q = out.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach(r => emitted.synchronized {
          emitted += ((r.getLong(0), r.getInt(5), r.getBoolean(9)))
        })
      }.start()
    // constant baseline: std = 0 — never flags, whatever the history
    stream.addData((1L to 5L).map(i => (i, 1L, "m", ts(i), 10.0)))
    q.processAllAvailable()
    assert(emitted.toSeq === (1L to 5L).map(i => (i, math.min(i - 1, 4L).toInt, false)))
    emitted.clear()
    // varied baseline in one batch, spike in the NEXT: the ring carries
    // across micro-batches and n_prior is capped at n = 4
    stream.addData(Seq[Ev]((6L, 2L, "m", ts(10), 10.0), (7L, 2L, "m", ts(11), 12.0),
      (8L, 2L, "m", ts(12), 9.0), (9L, 2L, "m", ts(13), 11.0)))
    q.processAllAvailable()
    stream.addData(Seq[Ev]((10L, 2L, "m", ts(14), 50.0)))
    q.processAllAvailable()
    q.stop()
    assert(emitted.toSeq.take(4).forall(!_._3), "baseline rows must not flag")
    assert(emitted.last === ((10L, 4, true)), s"spike row: ${emitted.last}")
    // keys are (user, metric): user 1's constant stream never flagged
    assert(!emitted.exists(e => e._1 <= 5 && e._3))
  }
}
