package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming parity for the funnel/retention family (X40/X41): the
  * stream-static twins must reproduce the batch operators on the same
  * events under the documented delivery contract — event-time-ordered
  * across micro-batches (arbitrary order within a batch), the regime
  * the watermark makes checkable. */
class StreamingFunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-funnel")
    .getOrCreate()

  private val steps = Seq("view", "click", "purchase")

  test("streaming funnel == static Events.funnel on the sf0.01 events table (ordered delivery)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Events.load(spark, "/root/testdata/sf0.01")
    val static = Events.funnel(ev, steps)
      .select("user_id", "t1", "t2", "t3").collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet

    // event-time order across batches (ts includes sub-ms nanos —
    // Timestamp.compareTo covers them); five chunks exercise the
    // cross-batch state carry
    val rows = ev.select(col("user_id").cast("long"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)].collect()
      .sortBy(_._3)(Ordering.fromLessThan[java.sql.Timestamp](_.compareTo(_) < 0))
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    // horizon past the fixture's 30-day span: the attribution window is
    // a parameter; parity needs it to cover the compared prefix
    val out = graft.streaming.StreamingOps.funnelStream(spark,
      stream.toDF().toDF("user_id", "event_type", "ts"), steps,
      horizonMinutes = 90 * 24 * 60)
    // update mode: the LATEST chain per user is the live relation —
    // capture per-batch emissions and keep each user's newest
    val latest = scala.collection.mutable.Map[Long, (Any, Any, Any)]()
    val q = out.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach { r =>
          latest.synchronized { latest(r.getLong(0)) = (r.get(1), r.get(2), r.get(3)) }
        }
      }.start()
    rows.grouped(math.max(1, rows.length / 5 + 1)).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = latest.map { case (u, (a, b, c)) => (u, a, b, c) }.toSet
    assert(streamed.size === static.size,
      s"user counts differ: streamed ${streamed.size} vs static ${static.size}")
    assert(streamed === static)
  }

  test("streaming funnel: within-batch disorder exact, late event improves chain, step-1-less users silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.funnelStream(spark,
      stream.toDF().toDF("user_id", "event_type", "ts"), steps,
      watermark = "120 minutes")
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Any, Any, Any)]()
    val q = out.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach(r => emitted.synchronized {
          emitted += ((r.getLong(0), r.get(1), r.get(2), r.get(3)))
        })
      }.start()
    // user 2's click precedes any view: no step-1, no state, no output
    stream.addData(Seq((1L, "click", ts(10)), (2L, "click", ts(1))))
    q.processAllAvailable()
    assert(emitted.isEmpty, "chain emitted before step 1 was reached")
    // late-but-within-watermark view opens user 1's chain at t=5; the
    // already-discarded click@10 is NOT revisited (documented trade)
    stream.addData(Seq((1L, "view", ts(5))))
    q.processAllAvailable()
    assert(emitted.toSeq === Seq((1L, ts(5), null, null)))
    // within-batch disorder: purchase@15 arrives with click@20 — the
    // event-time sort folds click first only if earlier, so the
    // purchase (before any click) must NOT close the funnel
    stream.addData(Seq((1L, "purchase", ts(15)), (1L, "click", ts(20))))
    q.processAllAvailable()
    stream.addData(Seq((1L, "purchase", ts(25))))
    q.processAllAvailable()
    q.stop()
    assert(emitted.last === ((1L, ts(5), ts(20), ts(25))))
    assert(!emitted.exists(_._1 == 2L))
  }

  test("streaming retention == static Events.retentionCohorts on the sf0.01 events table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Events.load(spark, "/root/testdata/sf0.01")
    val static = Events.retentionCohorts(ev, "signup").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    // cohorts are history — the static side of the stream-static join
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val rows = ev.select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)].collect()
      .sortBy(_._2)(Ordering.fromLessThan[java.sql.Timestamp](_.compareTo(_) < 0))
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.retentionStream(
      stream.toDF().toDF("user_id", "ts"), cohorts)
    val q = out.writeStream.format("memory").queryName("ret_stream")
      .outputMode("update").start()
    rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    // counts only grow, so the final triangle cell is the max emitted
    val streamed = spark.table("ret_stream").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    q.stop()
    assert(streamed === static)
  }
}
