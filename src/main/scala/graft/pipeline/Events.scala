package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Time-series operators over the `events` table.
  *
  * Money/measure sums go through DECIMAL(18,6): decimal addition is
  * exact and order-independent, so Spark's partial-agg tree and the
  * oracle's single-threaded sum agree bit-for-bit after the final cast
  * back to DOUBLE (float sums would differ by summation order).
  */
object Events {

  /** Read the events table tolerating both generator encodings of `ts`:
    * int64 epoch-nanos (Spark's parquet reader rejects nanos unless
    * read back as long, then floored to micros) and native parquet
    * `timestamp[us]` (read as TIMESTAMP_NTZ). Either way the output is
    * session-TZ TimestampType at microsecond precision — under the
    * UTC sessions used everywhere here that is value-identical to the
    * oracle's `make_timestamp(epoch_ns(ts) // 1000)`, which is equally
    * encoding-agnostic on the DuckDB side. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType           => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                  => raw
    }
  }

  /** Tumbling 1-hour window per event type: count, exact sum, users. */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count("*").as("n"),
        expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").as("sum_value"),
        countDistinct("user_id").as("n_users"))

  /** Sessionization: per-user event runs split at gaps > `gapMinutes`.
    * lag + running-sum window, then one hash-agg per session. */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("is_new", expr(
        s"CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL $gapMinutes MINUTE THEN 1 ELSE 0 END"))
      .withColumn("session_idx", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count("*").as("n_events"),
        expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").as("sum_value"))
  }
}
