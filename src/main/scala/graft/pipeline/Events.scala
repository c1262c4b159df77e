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

  /** Ordered-step funnel: per user, the earliest timestamp chain
    * `t1 ≤ t2 ≤ … ≤ tn` with `t_i` an occurrence of `steps(i−1)` at or
    * after `t_{i−1}` — the conversion primitive behind "view → click →
    * purchase" product analytics. Greedy earliest-completion is exact:
    * taking the MIN valid t_i only loosens every later step's
    * constraint, so a user completes the funnel here iff ANY ordered
    * assignment of their events completes it. Returns
    * `(user_id, t1, …, tn)` for every user who performed step 1, later
    * steps NULL where the chain stops (partial funnels kept).
    *
    * Scale shape: step i is a filter (pushed into the scan) + one
    * equi-join on user_id against the (users-who-reached-i−1) relation
    * + a hash agg — never a per-user sort or a window over the events
    * table; all joins/aggs share the user_id key, so one exchange of
    * the filtered step events each. The events table is scanned once
    * per step with only (user_id, event_type, ts) read. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got $steps")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    val base = events.select("user_id", "event_type", "ts")
    var reached = base.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    var result = reached
    for (i <- 2 to steps.size) {
      // t1..t_{i-1} are constant per user, so grouping by them only
      // carries the columns through
      reached = base.filter(col("event_type") === steps(i - 1))
        .join(reached, "user_id")
        .where(col("ts") >= col(s"t${i - 1}"))
        .groupBy(col("user_id") +: (1 until i).map(j => col(s"t$j")): _*)
        .agg(min(col("ts")).as(s"t$i"))
      result = result.join(reached.select(col("user_id"), col(s"t$i")),
        Seq("user_id"), "left")
    }
    result
  }

  /** Cohort retention: users grouped by the ISO week of their first
    * `cohortEvent` (e.g. signup), counted as active in every later
    * week they produced ANY event — the `(cohort_week, week_offset,
    * n_users)` triangle behind a retention curve. Offsets are exact
    * multiples of 7 days by construction (both endpoints are
    * week-truncated).
    *
    * Scale shape: cohorts = one user_id hash agg over the filtered
    * scan; activity = distinct (user, week) — the dedup that keeps a
    * 10⁴-events/user week from counting 10⁴ times, map-side combined;
    * then one user_id equi-join and a (cohort, offset) agg where
    * count(*) suffices because (user, week) is already unique. No
    * windows, no sorts. */
  def retentionCohorts(events: DataFrame,
                       cohortEvent: String = "signup"): DataFrame = {
    val cohorts = events.filter(col("event_type") === cohortEvent)
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val activity = events.select(col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("act_week")).distinct()
    activity.join(cohorts, "user_id")
      .where(col("act_week") >= col("cohort_week"))
      .withColumn("week_offset",
        expr("CAST(datediff(act_week, cohort_week) DIV 7 AS INT)"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Funnel step summary: `(step_idx, event_type, n_users)` — users
    * reaching each step (n_users is non-increasing by construction).
    * One row per step from a single pass over [[funnel]]'s per-user
    * relation. */
  def funnelSteps(events: DataFrame, steps: Seq[String]): DataFrame = {
    val f = funnel(events, steps)
    val stack = steps.zipWithIndex.map { case (s, i) =>
      s"${i + 1}, '$s', CAST(cnt${i + 1} AS BIGINT)"
    }.mkString(", ")
    f.agg(count(col("t1")).as("cnt1"),
        (2 to steps.size).map(i => count(col(s"t$i")).as(s"cnt$i")): _*)
      .selectExpr(s"stack(${steps.size}, $stack) AS (step_idx, event_type, n_users)")
  }

  /** Rolling trailing-window anomaly detection over per-key metric
    * streams: for each event, mean/std of the PRIOR `n` values of the
    * same (user, event_type) stream and the current value's z-score
    * against them — the "is this reading off its own recent baseline"
    * monitor (trailing frame excludes the current row, so an outlier
    * never pollutes its own baseline). Flags rows with at least
    * `minPrior` history, positive spread, and |z| > `zThresh`.
    *
    * Parity AND numerical honesty share one mechanism: values quantize
    * to DECIMAL(18,6) micros, and the variance NUMERATOR
    * `n·Σm² − (Σm)²` is computed exactly in integer decimals — a
    * constant baseline yields var = EXACTLY 0 (no flag), where the
    * textbook float form `Σv²/n − mean²` leaves cancellation noise
    * (~1 ulp of Σv²) that both fabricates spurious ~1e-6 "spreads"
    * under constant baselines and, divided into a real deviation,
    * z-scores in the 1e10 range (seen at sf0.1: z = 3.6e10, where
    * Spark's LONG-returning floor() clamps the r9 quantization at
    * 2^63 and DuckDB's double floor() does not — the one divergence
    * this operator ever produced). The double mean/var/std/z chain is
    * fixed-order and mirrored verbatim in the oracle; the reported z
    * is clamped to ±1e9 identically on both engines (exact-integer
    * var bounds a nonzero numerator at ≥ 1, so z is finite, but its
    * scale is data-dependent; the clamp keeps the nano-quantization
    * in Long range for ANY input) while the flag evaluates the
    * unclamped value. Exactness contract: |value| < ~1e13/n keeps
    * n·Σm² within DECIMAL(38,0); past either that ceiling or the
    * DECIMAL(18,6) micros quantization (|value| ≥ ~1e12) the operator
    * RAISES instead of silently un-flagging (r10 advice — non-ANSI
    * decimal overflow otherwise NULLs the std and the flag).
    *
    * Scale shape: one hash exchange on (user_id, event_type) + a
    * within-partition sort, then a single WindowExec pass buffering at
    * most `n` rows per frame — no global sort, no self-join, per-key
    * work linear in that key's events. Keys are (user, metric) so
    * parallelism is corpus-wide; order-dependent stats cannot salt a
    * hot key, so the standard mitigation at retention scale is
    * processing by time slice with the streaming twin
    * ([[graft.streaming.StreamingOps.rollingAnomalyStream]]) carrying
    * the n-value baseline across slices in bounded state. */
  def rollingAnomaly(events: DataFrame, n: Int = 8, zThresh: Double = 3.0,
                     minPrior: Int = 4): DataFrame = {
    require(n >= 1 && minPrior >= 1 && minPrior <= n,
      s"need 1 <= minPrior <= n, got n=$n minPrior=$minPrior")
    // the exact-variance numerator casts n_prior to DECIMAL(3,0): past
    // n = 999 that cast itself overflows and the failure would surface
    // as a misattributed variance-overflow raise (r11 advice) — name
    // the real ceiling here instead
    require(n <= 999,
      s"rollingAnomaly supports window sizes up to n = 999 (the exact " +
        s"DECIMAL(3,0) n_prior factor in the variance numerator), got n=$n")
    val byKey = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val trail = byKey.rowsBetween(-n, -1)
    val zLit = graft.regrid.Rounding.sqlLit(zThresh)
    events
      // micros quantization overflows (|value| ≥ ~1e12) raise instead
      // of silently dropping the row from every later frame (r10
      // advice: the non-ANSI casts turn overflow into NULL, and a NULL
      // baseline value is a silent no-flag)
      .withColumn("__vu", expr(
        """CASE WHEN value IS NOT NULL
             AND CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) IS NULL
           THEN CAST(raise_error(concat(
             'rollingAnomaly: |value| too large to quantize exactly: ',
             CAST(value AS STRING))) AS BIGINT)
           ELSE CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) END"""))
      .withColumn("n_prior", count(col("__vu")).over(trail).cast("int"))
      .withColumn("__su", sum(expr("CAST(__vu AS DECIMAL(18,0))")).over(trail))
      .withColumn("__ssq", sum(expr(
        "CAST(__vu AS DECIMAL(18,0)) * CAST(__vu AS DECIMAL(18,0))")).over(trail))
      // n·Σm² − (Σm)² — exact integer decimals throughout. Σm² already
      // lands as DECIMAL(38,0) from the window sum; the n·Σm² product
      // stays at precision 38, so the true exactness ceiling is
      // n·Σm² < 1e38, i.e. |value| < ~1e13/n — and past it the decimal
      // arithmetic NULLs out, which the guard below turns into a loud
      // raise (never a silent no-flag, the scoreHistogram discipline)
      .withColumn("__num0", expr(
        """CAST(n_prior AS DECIMAL(3,0)) * __ssq
           - CAST(__su AS DECIMAL(19,0)) * CAST(__su AS DECIMAL(19,0))"""))
      .withColumn("__num", expr(
        """CASE WHEN n_prior > 0 AND __num0 IS NULL
           THEN CAST(raise_error(concat(
             'rollingAnomaly: variance numerator exceeds DECIMAL(38,0) ',
             'range (|value| too large for exact n*sum(m^2))'))
             AS DECIMAL(38,0))
           ELSE CAST(__num0 AS DECIMAL(38,0)) END"""))
      .withColumn("__mean", expr(
        "CASE WHEN n_prior > 0 THEN CAST(__su AS DOUBLE) / 1.0e6 / CAST(n_prior AS DOUBLE) END"))
      .withColumn("__var", expr(
        """CASE WHEN n_prior > 0 THEN CAST(__num AS DOUBLE)
           / (CAST(n_prior AS DOUBLE) * CAST(n_prior AS DOUBLE)) / 1.0e12 END"""))
      .withColumn("__std", expr("sqrt(__var)"))
      .withColumn("__z", expr(
        "CASE WHEN __std > 0.0e0 THEN (value - __mean) / __std END"))
      .withColumn("__zc", expr(
        "CASE WHEN __std > 0.0e0 THEN least(greatest(__z, -1.0e9), 1.0e9) END"))
      .withColumn("is_anomaly", expr(
        s"coalesce(n_prior >= $minPrior AND __std > 0.0e0 AND abs(__z) > $zLit, false)"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("value"), col("n_prior"),
        graft.regrid.Rounding.r9(col("__mean")).as("roll_mean"),
        graft.regrid.Rounding.r9(col("__std")).as("roll_std"),
        graft.regrid.Rounding.r9(col("__zc")).as("z"),
        col("is_anomaly"))
  }

  /** Item co-occurrence ("viewed together"): for every unordered item
    * pair, the number of users who interacted with BOTH, plus lift
    * `P(a,b) / (P(a)·P(b))` — the association-mining / co-view
    * recommender primitive. `item` is parsed from the `props` JSON.
    *
    * Scale shape: distinct (user, item) first — the dedup that stops a
    * user's 10⁴ views of one item from mattering, map-side combined —
    * then ONE self-equi-join on user_id and a pair hash agg (count(*)
    * suffices: inputs are per-user unique). The join is quadratic in
    * per-user basket size, which is exactly where event data is
    * skewed, so `maxPerUser > 0` caps each user's basket at the
    * maxPerUser smallest-hash items (deterministic, unbiased-ish
    * sampling by the shared 60-bit hash; a 10⁶-item crawler bot
    * contributes C(cap,2) pairs, not 10¹²). The per-item user counts
    * for lift join UNHINTED (r9, same discipline as
    * [[Graphs.triangleStats]]): the relation is O(distinct items) —
    * tiny for a shop catalog, an OOM to force-broadcast at a 10⁸-item
    * web-entity graph — so AQE picks broadcast from its true runtime
    * size and falls back to a shuffled equi-join above the threshold. */
  def coOccurrence(events: DataFrame, eventType: String = "view",
                   maxPerUser: Int = 0, minSupport: Int = 2): DataFrame = {
    val items0 = events.filter(col("event_type") === eventType)
      .select(col("user_id"),
        expr("CAST(get_json_object(props, '$.k') AS INT)").as("item"))
      .distinct()
    val items =
      if (maxPerUser <= 0) items0
      else items0
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy(Sketches.hash60(col("item").cast("string")), col("item"))))
        .filter(col("__rn") <= maxPerUser).drop("__rn")
    val nUsers = items.select("user_id").distinct().count()
    val perItem = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val a = items.toDF("user_id", "item_a")
    val b = items.toDF("user_id", "item_b")
    a.join(b, Seq("user_id"))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minSupport)
      .join(perItem.toDF("item_a", "n_a"), "item_a")
      .join(perItem.toDF("item_b", "n_b"), "item_b")
      .withColumn("lift", graft.regrid.Rounding.roundN(
        col("n_co").cast("double") * lit(nUsers.toDouble) /
          (col("n_a").cast("double") * col("n_b").cast("double")), 9))
      .select("item_a", "item_b", "n_co", "lift")
  }
}
