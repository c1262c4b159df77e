package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for stateful sessionization. */
final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Open-session state kept per user between micro-batches. Times are
  * epoch MICROS (the events tables carry sub-millisecond timestamps —
  * ms state would shift session bounds); the value sum is exact scaled
  * micros through DECIMAL(18,6)-equivalent rounding, so the streamed
  * sums equal [[graft.pipeline.Events.sessions]]' decimal sums
  * bit-for-bit regardless of event arrival order. */
final case class SessState(startUs: Long, endUs: Long, n: Long, sumMicros: Long)

/** Closed session emitted once the gap (or watermark timeout) passes. */
final case class SessOut(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

/** Running distinct-count estimate per group from the streaming KMV
  * sketch — emitted each micro-batch that touches the group. */
final case class KmvDistinctOut(g: String, n_kept: Int, est_distinct: Double)

/** Input row for the streaming funnel (step is the 1-based funnel
  * index, already resolved from event_type by the broadcast step join). */
final case class FunnelEvent(user_id: Long, step: Int, ts: java.sql.Timestamp)

/** Per-user funnel state: the earliest-chain times t1..tn in epoch
  * micros (Long.MinValue = step not reached) — FIXED SIZE (n longs)
  * per user no matter how many events they produce — plus the newest
  * event-time seen, anchoring the eviction timeout. */
final case class FunnelState(us: Seq[Long], lastMs: Long)

/** Input row for the streaming rolling-anomaly monitor. */
final case class RollEvent(event_id: Long, user_id: Long, event_type: String,
                           ts: java.sql.Timestamp, value: Double)

/** Per-(user, metric) rolling baseline: the last <= n values as exact
  * DECIMAL(18,6)-equivalent micros, oldest first — FIXED SIZE no
  * matter how many events the key produces — plus the newest event
  * time anchoring eviction. */
final case class RollState(ring: Seq[Long], lastMs: Long)

/** Scored event emitted by the streaming rolling-anomaly monitor —
  * the same row shape as [[graft.pipeline.Events.rollingAnomaly]]. */
final case class RollOut(event_id: Long, user_id: Long, event_type: String,
                         ts: java.sql.Timestamp, value: Double, n_prior: Int,
                         roll_mean: Option[Double], roll_std: Option[Double],
                         z: Option[Double], is_anomaly: Boolean)

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
    * session exactly once (append mode).
    *
    * Late-data contract (pinned by the PipelineSpec watermark test):
    * the watermark is `gapMinutes`; an event older than the current
    * watermark is DROPPED by the stateful operator before the session
    * function sees it — it neither extends an open session, nor
    * resurrects a closed one, nor opens a new one. Events late but
    * within the watermark DO merge into their session (including
    * extending `session_start` backward — see the min() in the state
    * update). Larger reorder tolerance trades linearly against state
    * lifetime: sessions cannot close before the watermark passes
    * `end + gap`. */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
                       gapMinutes: Int = 30): Dataset[SessOut] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000L

    // epoch-micros view of a java.sql.Timestamp (getTime alone floors
    // to ms; the sub-ms part lives in the nanos field)
    def toUs(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def fromUs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    // the exact cast chain of Events.sessions' CAST(value AS
    // DECIMAL(18,6)): Spark's Decimal(double) parses the SHORTEST
    // decimal repr (BigDecimal.valueOf), not the exact binary
    // expansion — new BigDecimal(7.8872335) would round the ...49999
    // expansion DOWN where Spark rounds the literal HALF_UP
    def valueMicros(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .scaleByPowerOfTen(6).longValueExact

    def run(userId: Long, evs: Iterator[SessEvent],
            state: GroupState[SessState]): Iterator[SessOut] = {
      def toOut(s: SessState) = SessOut(userId,
        fromUs(s.startUs), fromUs(s.endUs), s.n, s.sumMicros / 1.0e6)
      if (state.hasTimedOut) {
        val out = state.getOption.map(toOut).iterator
        state.remove()
        out
      } else {
        val sorted = evs.toIndexedSeq.sortBy(e => (toUs(e.ts), e.value))
        var open = state.getOption
        val closed = IndexedSeq.newBuilder[SessOut]
        sorted.foreach { e =>
          val t = toUs(e.ts)
          open match {
            case Some(s) if t - s.endUs <= gapUs =>
              // min on start too: a late-but-within-watermark event can
              // precede the open session's first event
              open = Some(SessState(math.min(s.startUs, t), math.max(s.endUs, t),
                s.n + 1, s.sumMicros + valueMicros(e.value)))
            case Some(s) =>
              closed += toOut(s)
              open = Some(SessState(t, t, 1, valueMicros(e.value)))
            case None =>
              open = Some(SessState(t, t, 1, valueMicros(e.value)))
          }
        }
        open.foreach { s =>
          state.update(s)
          // close when the watermark passes the session end + gap
          state.setTimeoutTimestamp(s.endUs / 1000L + gapUs / 1000L)
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

  /** Streaming ordered-step funnel — the in-flight form of
    * [[graft.pipeline.Events.funnel]]: per user, the earliest
    * `t1 ≤ t2 ≤ … ≤ tn` chain over the step events, updated as events
    * stream in. Output (Update mode): the user's current chain row
    * `(user_id, t1..tn)` whenever a micro-batch improves it — the
    * latest row per user is the live funnel relation.
    *
    * Plan shape: step resolution is a STATELESS broadcast equi-join of
    * the stream against the n-row step-definition relation (non-step
    * events never reach the stateful operator — the filter runs at the
    * source); chain state is n longs per user via
    * `flatMapGroupsWithState`, evicted `horizonMinutes` of EVENT TIME
    * after the user's newest event (the attribution horizon), so state
    * is bounded by (active users within horizon) × n.
    *
    * Parity contract (spec-pinned): within a micro-batch events fold
    * in event-time order, so for any prefix of batches whose
    * cross-batch delivery respects event-time order per user, the
    * latest emitted chains equal the batch [[graft.pipeline.Events
    * .funnel]] of the same events row-for-row. A LATE event (older than
    * a previous batch's, within the watermark) still folds in and can
    * improve the chain — but step events it would have unlocked that
    * were already discarded are not revisited (the standard streaming
    * trade; the batch funnel remains the retrospective truth). Events
    * older than the watermark are dropped by the stateful operator. */
  def funnelStream(spark: SparkSession, events: DataFrame,
                   steps: Seq[String], watermark: String = "30 minutes",
                   horizonMinutes: Int = 24 * 60): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got $steps")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    import spark.implicits._
    val n = steps.size
    val horizonMs = horizonMinutes.toLong * 60000L
    val stepDefs = steps.zipWithIndex.map { case (s, i) => (s, i + 1) }
      .toDF("event_type", "step")

    def toUs(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def run(userId: Long, evs: Iterator[FunnelEvent],
            state: GroupState[FunnelState]): Iterator[(Long, Seq[Long])] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // event-time order inside the batch: a step-i event must see
        // every same-batch improvement of t_{i-1} at or before it
        val sorted = evs.toIndexedSeq.sortBy(e => (toUs(e.ts), e.step))
        val us = state.getOption.map(_.us.toArray)
          .getOrElse(Array.fill(n)(Long.MinValue))
        var changed = false
        sorted.foreach { e =>
          val t = toUs(e.ts)
          val i = e.step - 1
          val prevOk = i == 0 || (us(i - 1) != Long.MinValue && t >= us(i - 1))
          if (prevOk && (us(i) == Long.MinValue || t < us(i))) {
            us(i) = t; changed = true
          }
        }
        val lastMs = math.max(
          state.getOption.map(_.lastMs).getOrElse(Long.MinValue),
          sorted.lastOption.map(_.ts.getTime).getOrElse(Long.MinValue))
        if (us(0) != Long.MinValue) {
          // only users who reached step 1 carry state — same population
          // as the batch funnel's output
          state.update(FunnelState(us.toSeq, lastMs))
          state.setTimeoutTimestamp(lastMs + horizonMs)
        }
        if (changed) Iterator.single((userId, us.toSeq)) else Iterator.empty
      }
    }

    val chains = events
      .selectExpr("CAST(user_id AS LONG) AS user_id", "event_type", "ts")
      .join(broadcast(stepDefs), "event_type")
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("step"), col("ts"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(run)
      .toDF("user_id", "us")
    // sentinel test is `< 0`: Long.MinValue is not expressible as a SQL
    // literal (the parser rejects the positive magnitude before the
    // unary minus applies), and post-epoch event times are non-negative
    chains.select(col("user_id") +: (1 to n).map(i =>
      expr(s"IF(us[${i - 1}] < 0, NULL, timestamp_micros(us[${i - 1}]))")
        .as(s"t$i")): _*)
  }

  /** Streaming rolling-anomaly monitor — the in-flight form of
    * [[graft.pipeline.Events.rollingAnomaly]]: each event is scored
    * against the mean/std of the PRIOR `n` values of its own
    * (user, event_type) stream, held as fixed-size state (<= n scaled
    * longs per live key, evicted `horizonMinutes` of event time after
    * the key's newest event). Append mode: every event emits exactly
    * one scored row when processed.
    *
    * Parity contract (spec-pinned): values fold through the SAME
    * DECIMAL(18,6)-micros quantization and the same fixed-order double
    * mean/var/std/z expressions as the batch op (BigDecimal sums are
    * exact; `BigDecimal.doubleValue` is the correctly-rounded cast
    * both engines use), and within a micro-batch events fold in
    * (event-time, event_id) order — so for any prefix of batches whose
    * cross-batch delivery respects event-time order per key, the
    * emitted rows equal the batch op's row-for-row. A late event
    * (within the watermark) is scored against the CURRENT ring rather
    * than its historical position — already-scored rows are never
    * revised (the standard streaming trade; the batch op is the
    * retrospective truth). Events older than the watermark are dropped
    * by the stateful operator. */
  def rollingAnomalyStream(spark: SparkSession, events: DataFrame,
                           n: Int = 8, zThresh: Double = 3.0, minPrior: Int = 4,
                           watermark: String = "30 minutes",
                           horizonMinutes: Int = 24 * 60): Dataset[RollOut] = {
    require(n >= 1 && minPrior >= 1 && minPrior <= n,
      s"need 1 <= minPrior <= n, got n=$n minPrior=$minPrior")
    import spark.implicits._
    val horizonMs = horizonMinutes.toLong * 60000L

    def toUs(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    // the exact cast chain of CAST(value AS DECIMAL(18,6)) — see
    // sessionizeStream's valueMicros for why BigDecimal.valueOf
    def valueMicros(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .scaleByPowerOfTen(6).longValueExact
    def r9(x: Double): Double = math.floor(x * 1.0e9 + 0.5) / 1.0e9

    def score(e: RollEvent, ring: Seq[Long]): RollOut = {
      val nPrior = ring.size
      if (nPrior == 0)
        RollOut(e.event_id, e.user_id, e.event_type, e.ts, e.value, 0,
          None, None, None, is_anomaly = false)
      else {
        // the batch op's exact-integer variance numerator n·Σm² − (Σm)²
        // (BigInt = the decimal(38,0) arithmetic — and, unlike the
        // batch side's 38-digit ceiling, unbounded: Σm over a ring of
        // extreme micros cannot wrap a Long here; toDouble below is the
        // same correctly-rounded cast as CAST(decimal AS DOUBLE)), then
        // its double expression order verbatim
        val su = ring.iterator.map(BigInt(_)).sum
        val num = BigInt(nPrior) * ring.map(m => BigInt(m) * BigInt(m)).sum -
          su * su
        val dN = nPrior.toDouble
        val mean = new java.math.BigDecimal(su.bigInteger)
          .doubleValue / 1.0e6 / dN
        val vr = new java.math.BigDecimal(num.bigInteger).doubleValue / (dN * dN) / 1.0e12
        val std = math.sqrt(vr)
        val z = if (std > 0.0) Some((e.value - mean) / std) else None
        val zc = z.map(v => math.min(math.max(v, -1.0e9), 1.0e9))
        val flag = nPrior >= minPrior && std > 0.0 && math.abs(z.get) > zThresh
        RollOut(e.event_id, e.user_id, e.event_type, e.ts, e.value, nPrior,
          Some(r9(mean)), Some(r9(std)), zc.map(r9), flag)
      }
    }

    def run(key: (Long, String), evs: Iterator[RollEvent],
            state: GroupState[RollState]): Iterator[RollOut] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = evs.toIndexedSeq.sortBy(e => (toUs(e.ts), e.event_id))
        var ring = state.getOption.map(_.ring).getOrElse(Seq.empty)
        val out = sorted.map { e =>
          val scored = score(e, ring)
          ring = (ring :+ valueMicros(e.value)).takeRight(n)
          scored
        }
        val lastMs = math.max(
          state.getOption.map(_.lastMs).getOrElse(Long.MinValue),
          sorted.lastOption.map(_.ts.getTime).getOrElse(Long.MinValue))
        state.update(RollState(ring, lastMs))
        state.setTimeoutTimestamp(lastMs + horizonMs)
        out.iterator
      }
    }

    events.selectExpr("CAST(event_id AS LONG) AS event_id",
        "CAST(user_id AS LONG) AS user_id", "event_type", "ts",
        "CAST(value AS DOUBLE) AS value")
      .withWatermark("ts", watermark)
      .as[RollEvent]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(run)
  }

  /** Streaming cohort retention against STATIC cohorts — the in-flight
    * form of [[graft.pipeline.Events.retentionCohorts]] for the live
    * side of the triangle: `cohorts` is the (user_id, cohort_week)
    * relation (from the batch op or a persisted table — signups are
    * history), and the event stream increments `(cohort_week,
    * week_offset, n_users)` as activity arrives. Per-user-week
    * first-touch dedup is `dropDuplicatesWithinWatermark` (state
    * bounded by the horizon — a user's 10⁴ events in one week count
    * once), the cohort attach is a stateless broadcast equi-join, and
    * the count is a native streaming agg over the (tiny) triangle key
    * space. Update mode; latest value per key is the triangle cell.
    * Parity (spec-pinned): for any processed prefix with per-(user,
    * week) re-deliveries inside the horizon, the latest counts equal
    * the batch op's on the same events. */
  def retentionStream(events: DataFrame, cohorts: DataFrame,
                      horizon: String = "14 days"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .select(col("user_id"), col("ts"),
        date_trunc("week", col("ts")).cast("date").as("act_week"))
      .dropDuplicatesWithinWatermark("user_id", "act_week")
      .join(broadcast(cohorts), "user_id")
      .where(col("act_week") >= col("cohort_week"))
      .withColumn("week_offset",
        expr("CAST(datediff(act_week, cohort_week) DIV 7 AS INT)"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))

  /** Streaming decontamination: flag training documents that share any
    * n-token shingle with a STATIC eval corpus as they stream in — the
    * in-flight form of [[graft.pipeline.Decontam.contamination]] for
    * pipelines that filter during ingest rather than in a later batch
    * pass. Stream-static left-semi join against the broadcast eval
    * shingle set (stateless, the 100 TB stream side never shuffles),
    * then `dropDuplicates` so each contaminated doc is flagged once.
    * State is one entry per FLAGGED doc — a tiny fraction of the
    * stream; production runs bound it further with a watermark on an
    * ingest-time column (`dropDuplicatesWithinWatermark`). */
  def decontamFlagsStream(train: DataFrame, evalDocs: DataFrame,
                          n: Int = 5): DataFrame = {
    import graft.pipeline.TextOps
    val es = TextOps.shingleSet(evalDocs, n).select("s").distinct()
    TextOps.withTokens(train)
      .filter(expr(s"size(tokens) >= $n"))
      .selectExpr("doc_id", s"explode(${TextOps.shinglesExpr(n)}) AS s")
      .join(broadcast(es), Seq("s"), "left_semi")
      .select("doc_id")
      .dropDuplicates("doc_id")
  }

  /** Streaming near-dup flags against a STATIC corpus LSH index — the
    * in-flight form of [[graft.pipeline.Dedup.minhashLshIncremental]]
    * for pipelines that drop near-duplicates during ingest: each
    * arriving doc computes its MinHash band signatures STATELESSLY
    * ([[graft.pipeline.TextOps.bandSigsStateless]] — one scan-stage
    * array projection, no per-doc aggregation, so no streaming state)
    * and left-semi joins the corpus band index
    * ([[graft.pipeline.Dedup.minhashIndex]]'s bands side, built once
    * per corpus version). Emits `doc_id` once per flagged stream doc.
    * These are LSH band-collision candidates (the same candidate
    * semantics as [[graft.pipeline.Decontam.fuzzyContamination]]);
    * pipelines wanting exact-Jaccard confirmation route the flagged
    * minority through the batch verifier.
    *
    * Join sizing is left to Spark deliberately (no `broadcast()`
    * hint): a corpus index is O(docs × bands) and at ingest scale does
    * NOT fit a broadcast — a forced hint would OOM the driver exactly
    * where this helper is pitched. Small indexes still broadcast
    * automatically under `spark.sql.autoBroadcastJoinThreshold`;
    * large ones run as a per-micro-batch shuffled stream-static join.
    *
    * Per-flagged-doc dedup state: bounded when `watermarkCol` names
    * the stream's event-time column (eviction once the watermark
    * passes, `dropDuplicatesWithinWatermark` — same horizon semantics
    * as [[dedupStream]]); with `watermarkCol = None` it falls back to
    * plain `dropDuplicates`, whose state grows with the number of
    * DISTINCT FLAGGED docs for the life of the query — acceptable for
    * bounded replays, not for an unbounded ingest. */
  def nearDupFlagsStream(stream: DataFrame, corpusBands: DataFrame,
                         k: Int = 16, rowsPerBand: Int = 4,
                         watermarkCol: Option[String] = None,
                         horizon: String = "1 hour"): DataFrame = {
    import graft.pipeline.TextOps
    val base = watermarkCol.map(c => stream.withWatermark(c, horizon)).getOrElse(stream)
    // stateless per-row signatures (no per-doc groupBy — a streaming
    // aggregation would need update mode + unbounded state); the
    // event-time column rides along so the watermark reaches the dedup
    val flagged = TextOps.bandSigsStateless(base, k, rowsPerBand, carry = watermarkCol.toSeq)
      .join(corpusBands.select("band", "sig").distinct(),
        Seq("band", "sig"), "left_semi")
    watermarkCol match {
      case Some(c) => flagged.select("doc_id", c)
        .dropDuplicatesWithinWatermark("doc_id").select("doc_id")
      case None => flagged.select("doc_id").dropDuplicates("doc_id")
    }
  }

  /** Streaming corpus-mix sampling: the stream-side half of
    * [[graft.pipeline.Sampling.temperatureMixSample]] — per-source
    * keep thresholds (computed ONCE from a static reference corpus,
    * e.g. the previous crawl snapshot) broadcast against the incoming
    * stream, whose keep decision is the same stateless hash draw. The
    * stream side is a pure filter (no state, no watermark needed), so
    * every admitted doc would also be admitted by the batch pass with
    * identical rates — the in-flight corpus-recipe filter for a crawl
    * ingest. */
  def mixSampleStream(stream: DataFrame, staticCorpus: DataFrame,
                      budgetPermille: Int, salt: String = "graft"): DataFrame = {
    import graft.pipeline.Sampling
    val rates = Sampling.temperatureMixRates(staticCorpus, budgetPermille)
      .select("source", "rate_u")
    stream.join(broadcast(rates), Seq("source"))
      .where(expr(s"${Sampling.uExpr(salt)} < rate_u"))
      .drop("rate_u")
  }

  /** Streaming AS-OF enrichment against a STATIC dimension: each
    * stream row takes the latest right row at or before its timestamp
    * (inclusive, greatest-`tieBreak` winner — the same contract as
    * [[graft.pipeline.Temporal.asofJoin]], which batch callers should
    * prefer). The union-window plan is unavailable on a stream (a
    * global per-key sort over past AND future rows), so the dimension
    * is folded ONCE into a per-key SORTED ARRAY of (ts, tie, payload)
    * structs, broadcast, and each stream row binary-searches nothing —
    * it takes `element_at(filter(history, e -> e.ts <= row.ts), -1)`,
    * an ordered-array suffix pick. Stateless per row, so any output
    * mode works and nothing accumulates; the dimension must be
    * broadcast-sized per key-history (the normal case for slowly
    * changing dimensions). */
  def asofEnrichStream(stream: DataFrame, dim: DataFrame,
                       key: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       tieBreak: String, payload: Seq[String],
                       prefix: String = "asof_"): DataFrame = {
    val hist = dim.groupBy(col(rightKey).as(key))
      .agg(sort_array(collect_list(struct(
        col(rightTs).as("__t") +: col(tieBreak).as("__tie") +:
          payload.map(col): _*))).as("__hist"))
    stream.join(broadcast(hist), Seq(key), "left")
      .withColumn("__w", expr(
        // try_element_at: an empty suffix (no right row at-or-before
        // ts, or an unknown key) is NULL, not an ANSI index error
        s"try_element_at(filter(__hist, e -> e.__t <= $leftTs), -1)"))
      .select(stream.columns.toIndexedSeq.map(col) ++
        payload.map(c => col(s"__w.$c").as(s"$prefix$c")): _*)
  }

  /** Streaming distinct-count estimation with PERMANENTLY BOUNDED
    * state: the KMV sketch ([[graft.pipeline.Sketches]]) as
    * `mapGroupsWithState` — per group the state is the ≤ k smallest
    * distinct 60-bit hashes seen over the WHOLE stream lifetime, so
    * unlike `dropDuplicates`-based distinct counting (state grows with
    * every distinct key, unbounded without a watermark horizon) the
    * sketch needs NO timeout and never evicts: k longs per group,
    * forever, with the estimate stable under replays and duplicates.
    * Because reduce/merge are the exact batch-aggregator operations,
    * the streamed estimate over any prefix equals the batch
    * [[graft.pipeline.Sketches.kmvDistinct]] estimate on the same
    * rows bit-for-bit. Input: `(g STRING, h BIGINT)` — callers hash
    * with [[graft.pipeline.Sketches.hash60]]. Update output mode. */
  def kmvDistinctStream(spark: SparkSession, hashed: DataFrame,
                        k: Int): Dataset[KmvDistinctOut] = {
    import spark.implicits._
    val agg = new graft.pipeline.Sketches.KmvAgg(k)
    hashed.selectExpr("CAST(g AS STRING) AS g", "CAST(h AS BIGINT) AS h")
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], KmvDistinctOut](GroupStateTimeout.NoTimeout) {
        case (g, rows, state) =>
          var buf = state.getOption.getOrElse(Array.emptyLongArray)
          rows.foreach { case (_, h) => buf = agg.reduce(buf, h) }
          state.update(buf)
          KmvDistinctOut(g, buf.length, graft.pipeline.Sketches.estimate(buf, k))
      }
  }

  /** Streaming Count-Min frequency sketch: the additive `(r, c)`
    * counter aggregation run as a NATIVE streaming aggregation —
    * no custom state function needed, because the grouping key space
    * is finite by construction (depth·width cells), so state is
    * permanently bounded with no watermark, timeout, or eviction, and
    * Spark's own streaming-agg state store IS the sketch. Counters
    * are additive, so after any processed prefix the latest value per
    * cell equals the batch [[graft.pipeline.Sketches.cmSketch]] of the
    * same rows bit-for-bit (spec-pinned), and the stream's sketch can
    * be merged with any batch/day sketch by elementwise sum. `weight`
    * mirrors the batch signature (ADVICE r8: it was hardwired to 1, so
    * the batch equivalence silently held only for unit weight); default
    * `lit(1L)` keeps every existing caller byte-identical. Update
    * output mode. */
  def cmSketchStream(stream: DataFrame, value: Column,
                     depth: Int, width: Int,
                     weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && depth <= graft.pipeline.Sketches.cmMaxDepth,
      s"CM needs 1 <= depth <= ${graft.pipeline.Sketches.cmMaxDepth}, got $depth")
    require(width >= 2, s"CM needs width >= 2, got $width")
    stream.select(md5(value.cast("string")).as("__d"), weight.cast("long").as("__w"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("__d"), col("__w"))
      .withColumn("c",
        graft.pipeline.Sketches.cmBucket(col("__d"), col("r"), width))
      .groupBy("r", "c").agg(sum(col("__w")).as("cnt"))
  }

  /** Streaming Bloom-filter ingestion: the set-bit relation of
    * [[graft.pipeline.Sketches.bloomBits]] maintained as a NATIVE
    * streaming aggregation — the key space is finite by construction
    * (≤ mBits positions), so state is permanently bounded with no
    * watermark. The BIT SET is the aggregation's key set: after any
    * processed prefix, the distinct `pos` values equal the batch
    * `bloomBits` of the same rows exactly (spec-pinned); `cnt` (how
    * many insertions set the bit) rides along for fill-rate
    * diagnostics. Update output mode; the filter of a union stays the
    * distinct union of filters, so a day's streamed bits merge with
    * any batch filter by plain distinct-union. */
  def bloomBitsStream(stream: DataFrame, value: Column,
                      mBits: Int, kHashes: Int): DataFrame = {
    require(kHashes >= 1 && kHashes <= graft.pipeline.Sketches.cmMaxDepth,
      s"Bloom needs 1 <= kHashes <= ${graft.pipeline.Sketches.cmMaxDepth}, got $kHashes")
    require(mBits >= 2, s"Bloom needs mBits >= 2, got $mBits")
    stream.select(md5(value.cast("string")).as("__d"))
      .select(explode(sequence(lit(0), lit(kHashes - 1))).as("r"), col("__d"))
      .select(graft.pipeline.Sketches.cmBucket(col("__d"), col("r"), mBits).as("pos"))
      .groupBy("pos").agg(count(lit(1)).as("cnt"))
  }

  /** Streaming HyperLogLog register file: like [[cmSketchStream]], a
    * NATIVE streaming aggregation whose key space is finite by
    * construction (≤ 2^p buckets), so state is permanently bounded
    * with no watermark or timeout. Registers are max-monotone, so
    * after any processed prefix the latest value per bucket equals the
    * batch [[graft.pipeline.Sketches.hllSketch]] of the same rows
    * bit-for-bit (spec-pinned), and the stream's register file merges
    * with any batch/day sketch by elementwise max. Update output
    * mode. Output columns `(bucket, r)` (single global sketch — group
    * with an outer key column upstream if needed, the key just rides
    * the groupBy). */
  def hllSketchStream(stream: DataFrame, value: Column, p: Int = 8): DataFrame = {
    require(p >= 7 && p <= 14, s"HLL needs 7 <= p <= 14, got $p")
    val m = 1 << p
    val rMax = 60 - p + 1
    stream.select(graft.pipeline.Sketches.hash60(value).as("__h"))
      .selectExpr(s"CAST(__h % $m AS INT) AS bucket", s"__h DIV $m AS __w")
      .selectExpr("bucket",
        s"CAST(CASE WHEN __w = 0 THEN $rMax ELSE $rMax - length(bin(__w)) END AS INT) AS r")
      .groupBy("bucket").agg(max("r").as("r"))
  }

  /** Streaming score histogram — the classifier-eval family's
    * streaming twin: running per-(group, score) (positive, negative)
    * counts as a NATIVE streaming aggregation. This IS
    * `Diagnostics.scoreHistogram` applied to the stream (a pure
    * select/filter/groupBy/agg plan is streaming-compatible as-is),
    * so the batch contracts hold by construction: NULL score/label
    * rows excluded, guarded non-negative-integer weights with
    * replicated-rows semantics, integer-lattice scores. State is
    * bounded by #groups × |score lattice| cells, independent of
    * stream length.
    *
    * Prefix exactness — the sink feeding
    * `Diagnostics.aucFromHistogram` / `prAtThresholds` reproduces the
    * batch evaluation of the rows seen so far EXACTLY (spec-pinned) —
    * holds in COMPLETE output mode, or against a keyed UPSERT sink.
    * An append-style sink in update mode retains stale versions of a
    * re-emitted (group, score) row, and the downstream re-aggregation
    * would sum old + new counts. */
  def scoreHistogramStream(stream: DataFrame, scoreExpr: String,
                           labelExpr: String,
                           by: Seq[String] = Nil,
                           weightExpr: String = "1L"): DataFrame =
    graft.pipeline.Diagnostics.scoreHistogram(
      stream, scoreExpr, labelExpr, by, weightExpr)

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
