package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution diagnostics for join/agg planning — the numbers you
  * want BEFORE launching a 1000-executor job, not after it straggles.
  */
object Diagnostics {

  /** Key-skew histogram: per-key counts bucketed by bit length
    * (⌊log₂ count⌋ + 1 — computed as `length(bin(count))`, exact
    * integer arithmetic, no float log edge cases), with per-bucket key
    * counts, row volume, the worst key's count, and each bucket's
    * share of all rows. A heavy tail in the high buckets is the
    * shuffle-straggler signature that motivates salting / AQE skew
    * handling; the report costs one count-agg (map-side combined) plus
    * a tiny bucket agg. Output:
    * `(bucket_bits, n_keys, total_rows, max_count, row_share)`. */
  def keySkewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkewReport needs at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").cast("long")).head().getLong(0)
    counts
      .withColumn("bucket_bits", length(bin(col("cnt"))).cast("int"))
      .groupBy("bucket_bits")
      .agg(count(lit(1)).as("n_keys"),
        sum("cnt").cast("long").as("total_rows"),
        max("cnt").as("max_count"))
      .withColumn("row_share", expr(
        s"floor((CAST(total_rows AS DOUBLE) / ${total}.0e0) * 1.0e9 + 0.5e0) / 1.0e9"))
  }

  /** Exact tie-aware ROC-AUC per group — the Mann–Whitney statistic
    * `P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)` of an integer-lattice
    * score against a boolean label, the classifier-evaluation read
    * behind every threshold decision a quality/decontam filter makes.
    * Exact (midrank tie handling, not trapezoid-approximate) with NO
    * global sort and NO corpus-sized single-partition window, the
    * [[Sampling.exactPercentilesBy]] two-level discipline:
    *
    *  1. per-distinct-score (pos, neg) counts — a hash agg, map-side
    *     combined, so a hot score (10¹⁰ identical probs) cannot
    *     straggle;
    *  2. running positive counts BELOW each score split into
    *     within-bucket (window PARTITIONED by (by…, bucket), ≤
    *     `bucketWidth` distinct scores per partition by construction —
    *     shuffle-parallel) + bucket offsets (window over the TINY
    *     per-bucket histogram, never the corpus — the
    *     exactPercentilesBy `offs` rationale), broadcast back.
    *
    * Everything stays integer until one final division:
    * `A = Σ_s neg_s·(2·cumpos_<s + pos_s)` counts discordant pairs
    * twice + ties once, so `auc = 1 − A/(2·P·N)` — exact BIGINTs both
    * engines, one identically-shaped double expression at the end
    * (rounded to the 1e-9 lattice), so estimates hash-gate.
    *
    * `scoreExpr` must already be integer-valued (quantize floats to a
    * lattice first — AUC is rank-based, so any monotone quantization
    * only merges ties it creates identically on both engines). The
    * bucket histogram the offsets window runs over has one row per
    * NONEMPTY bucket — for lattice-valued scores (quantized
    * probabilities, counts) that is range/bucketWidth rows no matter
    * the corpus; for SPARSE 64-bit scores (hash-like values) size
    * `bucketWidth` up so buckets stay populated, or the offsets
    * window degrades toward per-distinct-score size — the same
    * documented trade as [[Sampling.exactPercentilesBy]]'s histogram.
    * Returns `(by…, n_pos, n_neg, auc)`; a group with an empty class
    * has undefined AUC → NULL. */
  def aucBy(df: DataFrame, scoreExpr: String, labelExpr: String,
            by: Seq[String] = Nil, bucketWidth: Long = 1L << 16): DataFrame =
    aucFromHistogram(scoreHistogram(df, scoreExpr, labelExpr, by), by, bucketWidth)

  /** Per-distinct-score (positive, negative) counts `(by…, s, p, ng)`
    * — the PERSISTABLE, MERGEABLE summary behind cross-snapshot AUC
    * ([[aucFromHistogram]]), the [[Sampling.valueHistogram]] of
    * classifier evaluation. One agg-only scan, map-side combined;
    * counts are ADDITIVE, so the histogram of a corpus union is the
    * elementwise sum ([[mergeScoreHistograms]]) — persist one per
    * day/snapshot (`SketchIO.writeSketch`) and evaluate the classifier
    * over ANY union of snapshots without re-scanning old corpora.
    * Rows with a NULL score or label are EXCLUDED (unscored/unlabeled
    * — the standard eval convention), so every downstream statistic
    * (AUC, PR, calibration) evaluates the scored+labeled subset.
    *
    * `weightExpr` (importance-weighted evaluation — e.g. dedup
    * multiplicities or stratum correction): a NON-NEGATIVE INTEGER
    * per-row weight with exact replicated-rows semantics — the
    * weighted histogram equals the histogram of each row repeated
    * weight times (property-pinned), so weighted AUC/PR stay exact
    * integer statistics. Zero drops the row; negative or NULL weights
    * fail loudly (the weightedTopK guard discipline — a NULL weight
    * silently zeroing a row would bias every downstream statistic). */
  def scoreHistogram(df: DataFrame, scoreExpr: String, labelExpr: String,
                     by: Seq[String] = Nil,
                     weightExpr: String = "1L"): DataFrame = {
    val g = by.map(col)
    // integrality is part of the guard: CAST alone would silently
    // TRUNCATE a fractional weight (1.7 → 1, 0.4 → dropped row) — the
    // same silent-bias class the negative/NULL raise exists to stop
    val w =
      s"""CASE WHEN CAST($weightExpr AS BIGINT) = ($weightExpr)
                AND CAST($weightExpr AS BIGINT) >= 0L
               THEN CAST($weightExpr AS BIGINT)
               ELSE CAST(raise_error(concat(
                 'scoreHistogram: weight must be a non-negative integer, got ',
                 coalesce(CAST(($weightExpr) AS STRING), 'NULL'))) AS BIGINT) END"""
    // NULL contract: a NULL score or label is an UNSCORED/UNLABELED
    // row — excluded from evaluation (the standard eval convention),
    // never a silent negative or a NULL rank group (whose sort order
    // would also diverge cross-engine: Spark windows put NULLS FIRST,
    // DuckDB's LAST — the hllSketch NULL-bucket lesson).
    // the same integrality rule for the SCORE: a bare cast would
    // silently truncate a caller's un-quantized double (e.g. the raw
    // prob column), collapsing every score to one value and reading
    // AUC 0.5 with no error; NULL stays NULL (excluded below)
    val sGuard =
      s"""CASE WHEN ($scoreExpr) IS NULL THEN CAST(NULL AS BIGINT)
               WHEN CAST($scoreExpr AS BIGINT) = ($scoreExpr)
               THEN CAST($scoreExpr AS BIGINT)
               ELSE CAST(raise_error(concat(
                 'scoreHistogram: score must be integer-valued (quantize to a lattice first), got ',
                 CAST(($scoreExpr) AS STRING))) AS BIGINT) END"""
    df.select(g
        :+ expr(sGuard).as("s")
        :+ expr(s"""CASE WHEN CAST($labelExpr AS BOOLEAN) THEN 1L
                         WHEN NOT CAST($labelExpr AS BOOLEAN) THEN 0L
                         ELSE CAST(NULL AS BIGINT) END""").as("pos")
        :+ expr(w).as("w"): _*)
      .filter(col("s").isNotNull && col("pos").isNotNull && col("w") > 0L)
      .groupBy(g :+ col("s"): _*)
      // DECIMAL inside the agg, guarded downcast outside: a LongType
      // sum would WRAP before any downstream guard could see it (the
      // per-score total is bounded by the per-group BIGINT contract,
      // so the downcast only fires on contract violations — loudly)
      .agg(sum(expr("CAST(pos * w AS DECIMAL(38,0))")).as("pd"),
        sum(expr("CAST((1L - pos) * w AS DECIMAL(38,0))")).as("nd"))
      .withColumn("p", expr(Guards.guardedBigint("pd", "per-score positive weight")))
      .withColumn("ng", expr(Guards.guardedBigint("nd", "per-score negative weight")))
      .drop("pd", "nd")
  }

  /** Merge [[scoreHistogram]] relations: elementwise count sums per
    * (by…, s). EXACT — the merged histogram equals the histogram of
    * the concatenated corpora, so AUC over the merge is the true AUC
    * of the union (spec-pinned). */
  def mergeScoreHistograms(hists: Seq[DataFrame],
                           by: Seq[String] = Nil): DataFrame = {
    require(hists.nonEmpty, "mergeScoreHistograms needs at least one histogram")
    val g = by.map(col)
    hists.reduce(_.unionByName(_))
      .groupBy(g :+ col("s"): _*)
      // same decimal-then-guarded-downcast as scoreHistogram: merged
      // counts must fit BIGINT or fail loudly, never wrap
      .agg(sum(col("p").cast("decimal(38,0)")).as("pd"),
        sum(col("ng").cast("decimal(38,0)")).as("nd"))
      .withColumn("p", expr(Guards.guardedBigint("pd", "merged positive count")))
      .withColumn("ng", expr(Guards.guardedBigint("nd", "merged negative count")))
      .drop("pd", "nd")
  }

  /** Exact AUC FROM a [[scoreHistogram]] relation alone — the same
    * rank semantics and output as [[aucBy]], over a summary that may
    * be the merge of many persisted snapshots. Re-aggregates by score
    * first, so an unmerged concatenation of histograms is also
    * accepted. */
  def aucFromHistogram(hist: DataFrame, by: Seq[String] = Nil,
                       bucketWidth: Long = 1L << 16): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val g = by.map(col)
    // floor division via pmod (DIV truncates toward zero — wrong
    // bucket order for negative scores), the exactPercentilesBy rule
    val perScore = hist
      .withColumn("bucket",
        expr(s"(s - pmod(s, ${bucketWidth}L)) DIV ${bucketWidth}L"))
      .groupBy(g :+ col("bucket") :+ col("s"): _*)
      // decimal-then-guarded-downcast (the scoreHistogram rule): an
      // unmerged concatenation of histograms re-aggregates here and
      // must not wrap either
      .agg(sum(col("p").cast("decimal(38,0)")).as("pd"),
        sum(col("ng").cast("decimal(38,0)")).as("nd"))
      .withColumn("p", expr(Guards.guardedBigint("pd", "per-score positive weight")))
      .withColumn("ng", expr(Guards.guardedBigint("nd", "per-score negative weight")))
      .drop("pd", "nd")
    val within = perScore.withColumn("poff",
      coalesce(sum(col("p")).over(
        Window.partitionBy(g :+ col("bucket"): _*).orderBy(col("s"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // fresh-alias projection (new expression ids): `within` and `offs`
    // both descend from perScore, and some sources (e.g. a streaming
    // memory sink) trip the analyzer's conflicting-reference check on
    // the self-join without it
    val offs = perScore.toDF(perScore.columns: _*)
      .groupBy(g :+ col("bucket"): _*)
      .agg(sum("p").as("bp"))
      .withColumn("boff", coalesce(sum(col("bp")).over(
        Window.partitionBy(g: _*).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(g :+ col("bucket") :+ col("boff"): _*)
    within.join(broadcast(offs), by :+ "bucket")
      // the pair count reaches 2·P·N, which overflows a LongType sum
      // once P·N > 4.6e18 (inside the 10^10-row regime this claims to
      // serve) — so EVERY pair-count factor runs in DECIMAL(38,0):
      // the product, the doubled cumulative (2·cumpos can wrap long
      // once P > 4.6e18 under large weights), and the count totals,
      // which then downcast through a loud guard instead of wrapping
      .withColumn("t", expr(
        "CAST(ng AS DECIMAL(38,0)) * (2L * CAST(boff + poff AS DECIMAL(38,0)) + p)"))
      .groupBy(g: _*)
      .agg(sum(col("p").cast("decimal(38,0)")).as("pd"),
        sum(col("ng").cast("decimal(38,0)")).as("nd"),
        sum("t").cast("decimal(38,0)").as("a2"))
      .withColumn("n_pos", expr(Guards.guardedBigint("pd", "total positive weight")))
      .withColumn("n_neg", expr(Guards.guardedBigint("nd", "total negative weight")))
      .withColumn("auc", expr(
        // the P·N ceiling: past ~5e37 pairs the DECIMAL(38,0) product
        // itself would overflow (to NULL under non-ANSI, silently
        // dropping terms from a2) — raise first. 4e37 leaves margin
        // under the true 2PN ≤ 1e38−1 cliff and is unreachable for
        // any real corpus (it needs both classes near Long.Max)
        """CASE WHEN CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) > 4.0e37
             THEN CAST(raise_error(concat('aucFromHistogram: pair count ',
               'exceeds the DECIMAL(38,0) range: n_pos=', CAST(n_pos AS STRING),
               ' n_neg=', CAST(n_neg AS STRING))) AS DOUBLE)
           WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS DOUBLE)
           ELSE floor((1.0e0 - CAST(a2 AS DOUBLE)
             / (2.0e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
             * 1.0e9 + 0.5e0) / 1.0e9 END"""))
      .select(g :+ col("n_pos") :+ col("n_neg") :+ col("auc"): _*)
  }


  /** Exact precision/recall/F1 per group at every lattice threshold
    * `T = bucket·bucketWidth` — the operating-point sweep behind
    * choosing a keep-threshold, each point EXACT (`tp` = positives
    * with score ≥ T, counted, not sampled). Runs entirely over a
    * [[scoreHistogram]] relation, so it evaluates persisted/merged
    * snapshots too. Thresholds ride the bucket grid deliberately: the
    * output is bounded by #groups × (score range / bucketWidth) rows
    * at ANY corpus size (a per-distinct-score sweep would be
    * corpus-sized at 100 TB), and every cumulative runs over the tiny
    * per-bucket histogram, never the corpus — size `bucketWidth` to
    * the curve resolution you want. Rates divide once per emitted row
    * from exact BIGINTs and land on the 1e-9 lattice, so curves
    * hash-gate; a threshold with no predicted positives has undefined
    * precision → NULL. Returns
    * `(by…, threshold, tp, fp, fn, tn, precision, recall, f1)`. */
  def prAtThresholds(hist: DataFrame, by: Seq[String] = Nil,
                     bucketWidth: Long = 1L << 16): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val g = by.map(col)
    val perBucket = hist
      .withColumn("bucket",
        expr(s"(s - pmod(s, ${bucketWidth}L)) DIV ${bucketWidth}L"))
      .groupBy(g :+ col("bucket"): _*)
      // decimal-then-guarded-downcast (the scoreHistogram rule)
      .agg(sum(col("p").cast("decimal(38,0)")).as("bpd"),
        sum(col("ng").cast("decimal(38,0)")).as("bnd"))
      .withColumn("bp", expr(Guards.guardedBigint("bpd", "per-bucket positive weight")))
      .withColumn("bn", expr(Guards.guardedBigint("bnd", "per-bucket negative weight")))
      .drop("bpd", "bnd")
    // suffix sums (score >= threshold) over the tiny bucket histogram:
    // descending cumulative including the bucket itself
    val w = Window.partitionBy(g: _*).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    perBucket
      .withColumn("tp", sum(col("bp")).over(w))
      .withColumn("fp", sum(col("bn")).over(w))
      .withColumn("threshold", expr(s"bucket * ${bucketWidth}L"))
      // fresh-alias projection — same self-join lineage rule as
      // aucFromHistogram's offsets branch (streaming memory-sink
      // inputs trip the conflicting-reference check without it);
      // totals in DECIMAL with the loud downcast (the aucFromHistogram
      // overflow rule — weighted counts must fit BIGINT or fail)
      .join(perBucket.toDF(perBucket.columns: _*).groupBy(g: _*)
        .agg(sum(col("bp").cast("decimal(38,0)")).as("apd"),
          sum(col("bn").cast("decimal(38,0)")).as("npd")
        ).withColumn("all_p", expr(Guards.guardedBigint("apd", "total positive weight")))
        .withColumn("all_n", expr(Guards.guardedBigint("npd", "total negative weight")))
        .drop("apd", "npd"), by)
      .withColumn("fn", expr("all_p - tp"))
      .withColumn("tn", expr("all_n - fp"))
      .withColumn("precision", expr(
        """CASE WHEN tp + fp = 0 THEN CAST(NULL AS DOUBLE)
           ELSE floor(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
             * 1.0e9 + 0.5e0) / 1.0e9 END"""))
      .withColumn("recall", expr(
        """CASE WHEN all_p = 0 THEN CAST(NULL AS DOUBLE)
           ELSE floor(CAST(tp AS DOUBLE) / CAST(all_p AS DOUBLE)
             * 1.0e9 + 0.5e0) / 1.0e9 END"""))
      .withColumn("f1", expr(
        // the denominator doubles tp — DECIMAL so it cannot wrap at
        // the counts the guard admits (each ≤ Long.Max)
        """CASE WHEN 2 * CAST(tp AS DECIMAL(38,0)) + fp + fn = 0 THEN CAST(NULL AS DOUBLE)
           ELSE floor(2.0e0 * CAST(tp AS DOUBLE)
             / CAST(2 * CAST(tp AS DECIMAL(38,0)) + fp + fn AS DOUBLE)
             * 1.0e9 + 0.5e0) / 1.0e9 END"""))
      .select(g :+ col("threshold") :+ col("tp") :+ col("fp") :+ col("fn")
        :+ col("tn") :+ col("precision") :+ col("recall") :+ col("f1"): _*)
  }

  /** Calibration (reliability-diagram) bins per group: does a
    * predicted probability of 0.8 come true 80% of the time? Probs
    * quantized to micro-units fall into `nBins` equal-width bins
    * (top-inclusive last bin); per bin the EXACT count, positive
    * count, mean predicted prob (integer micro-unit sum, one final
    * division) and empirical positive rate. One map-side-combined agg
    * over the scan — the 100 TB shape; rates land on the 1e-9 lattice
    * so the table hash-gates. Returns
    * `(by…, bin, n, n_pos, mean_prob, pos_rate)`. */
  def calibrationBins(df: DataFrame, probExpr: String, labelExpr: String,
                      by: Seq[String] = Nil, nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val g = by.map(col)
    // NULL prob/label rows are excluded (the scoreHistogram
    // convention); a NON-NULL prob outside [0, 1] is a caller bug —
    // binning it would silently mint a negative or phantom bin, so it
    // fails loudly instead (the weightedTopK guard discipline).
    df.select(g
        :+ expr(s"""CASE WHEN ($probExpr) >= 0.0e0 AND ($probExpr) <= 1.0e0
                         THEN CAST(floor(($probExpr) * 1.0e6 + 0.5e0) AS BIGINT)
                         WHEN ($probExpr) IS NULL THEN CAST(NULL AS BIGINT)
                         ELSE CAST(raise_error(concat(
                           'calibrationBins: prob must be in [0, 1], got ',
                           CAST(($probExpr) AS STRING))) AS BIGINT) END""").as("pu")
        :+ expr(s"""CASE WHEN CAST($labelExpr AS BOOLEAN) THEN 1L
                         WHEN NOT CAST($labelExpr AS BOOLEAN) THEN 0L
                         ELSE CAST(NULL AS BIGINT) END""").as("pos"): _*)
      .filter(col("pu").isNotNull && col("pos").isNotNull)
      .withColumn("bin",
        expr(s"CAST(least((pu * ${nBins}L) DIV 1000000L, ${nBins - 1}L) AS INT)"))
      .groupBy(g :+ col("bin"): _*)
      // pu ≤ 10^6 per row, so a LongType pu_sum wraps past ~9.2e12
      // rows in one (group, bin) — DECIMAL(38,0) keeps the mean exact
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
        sum(col("pu").cast("decimal(38,0)")).as("pu_sum"))
      .withColumn("mean_prob", expr(
        """floor(CAST(pu_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e6)
           * 1.0e9 + 0.5e0) / 1.0e9"""))
      .withColumn("pos_rate", expr(
        """floor(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
           * 1.0e9 + 0.5e0) / 1.0e9"""))
      .select(g :+ col("bin") :+ col("n") :+ col("n_pos")
        :+ col("mean_prob") :+ col("pos_rate"): _*)
  }

  /** [[calibrationBins]] FROM a [[scoreHistogram]] relation alone —
    * the persisted/merged/STREAMED read path (the aucFromHistogram
    * discipline): when the histogram's score is the micro-unit
    * quantized probability (`CAST(floor(prob * 1.0e6 + 0.5e0) AS
    * BIGINT)` — exactly [[calibrationBins]]' own lattice), the
    * reliability diagram is fully recoverable from the summary,
    * because binning depends on the score alone. Bit-identical to the
    * direct call by construction: per-bin `n = Σ(p+ng)`,
    * `n_pos = Σp`, `pu_sum = Σ s·(p+ng)` are the same integers, and
    * the mean/rate divisions reuse the same fixed-order double chain.
    * Over a WEIGHTED histogram this is calibration with
    * replicated-rows semantics. A score outside the [0, 1e6] prob
    * lattice is a caller bug (wrong histogram) and raises loudly.
    * Returns `(by…, bin, n, n_pos, mean_prob, pos_rate)`. */
  def calibrationFromHistogram(hist: DataFrame, by: Seq[String] = Nil,
                               nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val g = by.map(col)
    hist.select(g
        :+ expr("""CASE WHEN s >= 0L AND s <= 1000000L THEN s
                        ELSE CAST(raise_error(concat(
                          'calibrationFromHistogram: score must be a ',
                          'micro-unit prob in [0, 1e6], got ',
                          CAST(s AS STRING))) AS BIGINT) END""").as("pu")
        :+ col("p") :+ col("ng"): _*)
      .withColumn("bin",
        expr(s"CAST(least((pu * ${nBins}L) DIV 1000000L, ${nBins - 1}L) AS INT)"))
      .groupBy(g :+ col("bin"): _*)
      // each operand casts to DECIMAL BEFORE the addition (the
      // mergeScoreHistograms discipline): p + ng as a long add could
      // wrap before the cast when both near Long.Max
      .agg(sum(expr(
          "CAST(p AS DECIMAL(38,0)) + CAST(ng AS DECIMAL(38,0))")).as("nd"),
        sum(expr("CAST(p AS DECIMAL(38,0))")).as("npd"),
        sum(expr(
          """CAST(pu AS DECIMAL(38,0))
             * (CAST(p AS DECIMAL(38,0)) + CAST(ng AS DECIMAL(38,0)))"""))
          .as("pu_sum"))
      .withColumn("n", expr(Guards.guardedBigint("nd", "per-bin count")))
      .withColumn("n_pos", expr(Guards.guardedBigint("npd", "per-bin positive count")))
      .withColumn("mean_prob", expr(
        """floor(CAST(pu_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e6)
           * 1.0e9 + 0.5e0) / 1.0e9"""))
      .withColumn("pos_rate", expr(
        """floor(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
           * 1.0e9 + 0.5e0) / 1.0e9"""))
      .select(g :+ col("bin") :+ col("n") :+ col("n_pos")
        :+ col("mean_prob") :+ col("pos_rate"): _*)
  }
}
