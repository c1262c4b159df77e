package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Temporal joins over event/fact streams — the classic "enrich each
  * event with the most recent dimension row as of its timestamp"
  * operator (backward as-of join). Not in the xESMF reference (its
  * negative inventory has no joins at all — SURVEY §2.8); this is part
  * of the §2.7 north-star pipeline surface, where training-data
  * assembly routinely stitches point-in-time features onto examples.
  *
  * Spark-first plan, no range-join explosion and no per-row subquery:
  * tag both sides, union on the key, and take a running
  * `last(payload, ignoreNulls)` over one `(key) ORDER BY (ts, side,
  * tie)` window — every left row reads the latest right row at or
  * before its timestamp in a single pass. Cost = ONE shuffle on the
  * key + a per-key sort (the minimum any as-of semantics needs); both
  * sides' filters/projections still push to the scans because the
  * union is column-pruned per branch.
  *
  * At 100 TB: the window is per-key sequential, so a mega-key (one
  * user with 10^9 events) serializes on one task. The standard fix is
  * time-range pre-bucketing — split each key into coarse time buckets,
  * run the same union-window per (key, bucket), then carry each
  * bucket's last right row forward one bucket (a tiny per-(key,bucket)
  * relation) to seed rows that precede the bucket's first right row.
  * The single-window form here is the right default: key cardinality
  * in event streams is normally ≫ executor count and AQE balances the
  * post-shuffle partitions.
  */
object Temporal {

  /** Backward inclusive as-of join.
    *
    * For every `left` row, attach the `payload` columns of the `right`
    * row with the greatest `(rightTs, tieBreak)` such that
    * `rightTs <= leftTs` and the keys match; left rows with no such
    * right row keep NULL payloads (left-outer semantics). Equal
    * timestamps MATCH (inclusive); among right rows sharing the
    * winning timestamp the greatest `tieBreak` wins, which makes the
    * result deterministic under any physical row order.
    *
    * The whole right payload travels as ONE struct, so a right row
    * whose payload FIELD is null never lets an older right row's value
    * bleed through (`last(..., ignoreNulls)` skips only whole-row
    * nulls, i.e. left rows).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               tieBreak: String, payload: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toSeq
    unionWinner(left, right, leftKey, rightKey, leftTs, rightTs,
      tieBreak, payload, extraPart = Nil)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__pl.$c").as(s"$prefix$c")): _*)
  }

  /** Shared union-tag window core: left columns plus `__pl` — the
    * winning right payload struct (null when no right row qualifies).
    * `extraPart` columns must exist under the same names on BOTH
    * sides and join the window's partitioning key (the bucketed
    * variant passes the time bucket). */
  private def unionWinner(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTs: String, rightTs: String,
                          tieBreak: String, payload: Seq[String],
                          extraPart: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          payload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType, nullable = true)))))
    val rCols: Seq[Column] =
      Seq(col(rightKey).as("__k"), col(rightTs).as("__t"),
        lit(0).as("__side"), col(tieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__p")) ++
        extraPart.map(col) ++
        leftCols.filterNot(extraPart.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val r = right.select(rCols: _*)

    // right (side 0) sorts BEFORE the left row at an equal timestamp →
    // inclusive rightTs <= leftTs; ties among right rows resolve to the
    // greatest tieBreak because `last` reads the window bottom-up
    val w = Window.partitionBy(("__k" +: extraPart).map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.select((leftCols.map(col) ++ Seq(col("__k"), col("__t"), col("__side"),
        col("__tie"), col("__p"))): _*)
      .unionByName(r)
      .withColumn("__pl", last("__p", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
  }

  /** [[asofJoin]] for MEGA-KEYS — the time-bucket pre-split the plain
    * operator's scaladoc promises. The single-window form serializes
    * each key on one task; here both sides split into
    * `floor(ts / bucketWidth)` buckets and the same union-window runs
    * per `(key, bucket)` — a 10⁹-row key becomes ts-range/bucketWidth
    * parallel tasks. Left rows that precede their bucket's first
    * right row are seeded by CARRY-FORWARD: per (key, bucket) the
    * greatest right row is reduced to a one-row summary (hash agg,
    * map-side combined), and each left bucket looks up the latest
    * summary of any EARLIER bucket — itself a plain [[asofJoin]] on
    * the tiny summary relation (one row per key×bucket-with-rights).
    * Results are identical to [[asofJoin]] provided `(rightTs,
    * tieBreak)` is unique per key — the same uniqueness the plain
    * operator already needs for a deterministic answer.
    *
    * `bucketWidth` is in the timestamp column's native units
    * (microseconds for TIMESTAMP columns, raw units for numeric ts);
    * pick it so a bucket holds ~10⁵–10⁶ rows of the heaviest key. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       tieBreak: String, payload: Seq[String],
                       bucketWidth: Long,
                       prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "asofJoinBucketed needs at least one payload column")
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    def tsNum(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__b",
      floor(tsNum(left, leftTs) / lit(bucketWidth)).cast("long"))
    val r = right.withColumn("__b",
      floor(tsNum(right, rightTs) / lit(bucketWidth)).cast("long"))

    // pass 1: in-bucket winners (null for left rows preceding their
    // bucket's first right row)
    val inBucket = unionWinner(l, r, leftKey, rightKey, leftTs, rightTs,
      tieBreak, payload, extraPart = Seq("__b"))

    // pass 2: per (key, bucket) one-row summary of the greatest right
    // row — max over a struct ordered (ts, tie, payload)
    val sums = r.groupBy(col(rightKey).as("__sk"), col("__b").as("__sb"))
      .agg(max(struct(col(rightTs).as("__t"), col(tieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__p"))).as("__s"))

    // pass 3: carry-in per distinct left (key, bucket) = latest summary
    // of any STRICTLY earlier bucket — an as-of join on bucket - 1
    val lb = l.select(col(leftKey).as("__ck"), col("__b")).distinct()
      .withColumn("__cb", col("__b") - 1)
    val carry = asofJoin(lb, sums, "__ck", "__sk", "__cb", "__sb",
        tieBreak = "__sb", payload = Seq("__s"), prefix = "c_")
      .select(col("__ck"), col("__b").as("__jb"), col("c___s.__p").as("__carry"))

    inBucket
      .join(carry, col(leftKey) === col("__ck") && col("__b") === col("__jb"), "left")
      .withColumn("__w", coalesce(col("__pl"), col("__carry")))
      .select(leftCols.map(col) ++ payload.map(c => col(s"__w.$c").as(s"$prefix$c")): _*)
  }

  /** Interval (range) join: every `points` row matched to every
    * `intervals` row of the same key whose half-open window
    * `[start, end)` contains the point's timestamp — inner-join
    * multiplicity (0..n matches per point).
    *
    * Spark has no native range-join operator; the naive encoding
    * (equi-join on the key alone + a range filter) materializes the
    * per-key CROSS product first, which is quadratic exactly where
    * event data is skewed. This is the standard bucketed reduction:
    * intervals are exploded to the coarse time buckets they overlap,
    * points compute their single bucket, and the join becomes an
    * EQUI-join on `(key, bucket)` with the range predicate left as a
    * residual filter. With `bucketSec` ≥ the typical interval width an
    * interval lands in ~2 buckets, so the shuffle carries ~2× the
    * interval relation instead of per-key cross products, and Catalyst
    * plans a plain shuffled hash/sort-merge join. Degenerate
    * ultra-long intervals replicate across many buckets — split those
    * into a separate broadcast branch if they dominate. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointKey: String, intervalKey: String,
                pointTs: String, startTs: String, endTs: String,
                bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be > 0, got $bucketSec")
    val w = bucketSec * 1000000L // micros
    val p = points.withColumn("__b",
      floor(unix_micros(col(pointTs)) / lit(w)))
    val iv = intervals
      .filter(col(endTs) > col(startTs)) // empty intervals match nothing
      .withColumn("__b", explode(sequence(
      floor(unix_micros(col(startTs)) / lit(w)),
      // end is EXCLUSIVE: an interval ending exactly on a bucket edge
      // does not reach into that bucket
      floor((unix_micros(col(endTs)) - lit(1L)) / lit(w)))))
    p.join(iv,
        p("__b") === iv("__b") && p(pointKey) === iv(intervalKey) &&
          p(pointTs) >= iv(startTs) && p(pointTs) < iv(endTs))
      .drop("__b")
  }

  /** Orders table, `o_orderdate` normalized to micro-precision
    * session-TZ TimestampType under either generator encoding (int64
    * epoch-nanos or parquet `timestamp[us]`) — same tolerance contract
    * as [[Events.load]]. */
  def loadOrders(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/orders.parquet")
    raw.schema("o_orderdate").dataType match {
      case LongType            => raw.withColumn("o_orderdate", expr("timestamp_micros(o_orderdate DIV 1000)"))
      case _: TimestampNTZType => raw.withColumn("o_orderdate", col("o_orderdate").cast(TimestampType))
      case _                   => raw
    }
  }
}
