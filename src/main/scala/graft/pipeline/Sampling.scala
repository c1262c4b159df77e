package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing — the "data recipe" step of
  * a training pipeline: per-source (stratified) rates for mixture
  * weighting, and exact fixed-size draws per stratum for eval splits.
  *
  * Both are hash-derived from (salt, doc_id), so a re-run — or a run
  * over a corpus with rows added — keeps every previously-sampled
  * decision stable without storing any state. No RNG, no
  * `TABLESAMPLE`-style partition dependence.
  */
object Sampling {

  /** Deterministic uniform draw in [0, 1e6): the shared 60-bit md5 hash
    * of (salt, doc_id), reduced mod 10⁶. Embedded identically in the
    * SQL oracle. */
  def uExpr(salt: String): String =
    s"${TextOps.hash60(s"concat('$salt:', CAST(doc_id AS STRING))")} % 1000000"

  /** Per-stratum Bernoulli sample at the given per-source rates.
    * A codegen'd filter — zero shuffles, the 100 TB-scale shape (the
    * sample decision never leaves the scan stage). Sources absent from
    * `rates` are dropped (rate 0). */
  def stratified(docs: DataFrame, rates: Map[String, Double],
                 salt: String = "graft"): DataFrame = {
    require(rates.nonEmpty, "stratified sample needs at least one source rate")
    val thr = rates.toSeq.sortBy(_._1).map { case (src, r) =>
      require(r >= 0.0 && r <= 1.0, s"rate for '$src' outside [0, 1]: $r")
      s"WHEN '$src' THEN ${math.round(r * 1e6)}L"
    }.mkString("CASE source ", " ", " ELSE 0L END")
    docs.where(expr(s"${uExpr(salt)} < $thr"))
  }

  /** Exactly-k-per-stratum draw, deterministic rank order:
    * `(…, rank)` with rank 1..k by the hash draw (ties broken by
    * doc_id — total order, so both engines pick identical rows).
    *
    * Scale shape: a single `Window.partitionBy(source)` would sort an
    * ENTIRE stratum in one task (a 10¹⁰-doc source = one straggler), so
    * the draw runs in two exact levels: per-(input-partition, source)
    * top-k first — group sizes bounded by the scan partition size, and
    * every global top-k row survives its own subgroup's top-k — then
    * the true top-k over the ≤ k·P survivors. */
  def perStratumTopK(docs: DataFrame, k: Int,
                     salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = expr(uExpr(salt))
    val local = Window.partitionBy(col("pid"), col("source"))
      .orderBy(col("u"), col("doc_id"))
    val global = Window.partitionBy(col("source"))
      .orderBy(col("u"), col("doc_id"))
    docs
      .withColumn("u", u).withColumn("pid", spark_partition_id())
      .withColumn("lrank", row_number().over(local))
      .where(col("lrank") <= k)
      .withColumn("rank", row_number().over(global))
      .where(col("rank") <= k)
      .drop("u", "pid", "lrank")
  }

  /** Deterministic global shuffle order — the training-order permutation
    * every data loader wants: `(…, u, ord)` with `ord` = 0-based rank of
    * the document under the hash draw (ties broken by doc_id — a total
    * order, so the permutation is unique and re-run-stable).
    *
    * Scale shape: a global `row_number()` window is a single-task sort
    * of the whole corpus, so the rank is computed in two exact levels
    * over RANGE buckets of the draw: `bucket = u div (10⁶/nBuckets)`
    * makes bucket order ≡ global order, so
    * `ord = (docs in earlier buckets) + (rank within bucket) − 1`.
    * One hash exchange on the bucket key + a per-bucket sort (task size
    * ≈ corpus/nBuckets under the uniform hash) + a broadcast of the
    * nBuckets-row offset table. nBuckets is the straggler knob — set it
    * ≥ cluster cores at 100 TB. The offsets branch re-scans the corpus
    * (the classic two-pass zipWithIndex shape), but Catalyst prunes it
    * to the doc_id column — the second pass re-reads ids and re-hashes,
    * never the payload columns. */
  def shuffleOrder(docs: DataFrame, salt: String = "graft",
                   nBuckets: Int = 100): DataFrame = {
    require(nBuckets >= 1 && 1000000 % nBuckets == 0,
      s"nBuckets must divide 1e6, got $nBuckets")
    val w = 1000000L / nBuckets
    val withU = docs
      .withColumn("u", expr(uExpr(salt)))
      .withColumn("bucket", expr(s"CAST(u DIV $w AS INT)"))
    val local = Window.partitionBy(col("bucket"))
      .orderBy(col("u"), col("doc_id"))
    // offsets: nBuckets rows — the unpartitioned window runs over the
    // already-aggregated tiny relation, not the corpus
    val offsets = withU.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "off")
    withU
      .withColumn("rank", row_number().over(local))
      .join(broadcast(offsets), "bucket")
      .withColumn("ord", col("off") + col("rank") - 1)
      .drop("bucket", "rank", "off")
  }

  /** Temperature-weighted source-mixing recipe (the UniMax / multilingual
    *-sampling convention at τ = 0.5): per-source mixture shares
    * `p_s ∝ √tokens_s` — up-weighting small sources relative to
    * proportional mixing — and the per-source Bernoulli threshold that
    * spends `budgetPermille`/1000 of the corpus token budget at those
    * shares: `rate_s = min(1, budget · total_tokens · p_s / tokens_s)`.
    *
    * τ ∈ {¼, ½, ¾} (as `tauQuarters` ∈ {1, 2, 3}), all exact-IEEE via
    * nested √: x^¼ = √√x and x^¾ = √x·√√x — √ and × are
    * correctly-rounded on every engine, so the nested-sqrt FORMULA (the
    * operator contract, not a pow approximation) folds bit-identical
    * doubles everywhere. An arbitrary τ would need `pow`, whose
    * last-ULP varies by libm and would break cross-engine parity — τ is
    * therefore restricted to the quarter grid, which covers the
    * UniMax/mT5 range in practice. Intermediate sums are exact BIGINTs
    * (token counts, micro-unit weights), `p_mix` is rounded to r9
    * before the rate arithmetic, so both engines fold identical
    * doubles.
    *
    * Scale shape: one agg-only scan of the corpus (map-side combined to
    * a #sources-row relation); the corpus-wide totals are a
    * whole-relation window over that tiny relation (a single-partition
    * exchange of #sources rows, not a join), then pure scalar
    * arithmetic. Returns
    * `(source, n_docs, n_tokens, w_u, p_mix, rate_u)`. */
  /** `x^(tauQuarters/4)` via nested correctly-rounded √ — the parity
    * contract of [[temperatureMixRates]]: ¼ → √√x, ½ → √x,
    * ¾ → √x·√√x. Plain SQL text valid in both Spark SQL and DuckDB,
    * so the oracle embeds the identical formula. */
  def tauPowExpr(x: String, tauQuarters: Int): String = tauQuarters match {
    case 1 => s"sqrt(sqrt($x))"
    case 2 => s"sqrt($x)"
    case 3 => s"(sqrt($x) * sqrt(sqrt($x)))"
    case q => throw new IllegalArgumentException(
      s"tauQuarters must be 1, 2, or 3 (tau = quarters/4), got $q")
  }

  def temperatureMixRates(docs: DataFrame, budgetPermille: Int,
                          tauQuarters: Int = 2): DataFrame = {
    require(budgetPermille >= 0 && budgetPermille <= 1000,
      s"budgetPermille outside [0, 1000]: $budgetPermille")
    val bf = graft.regrid.Rounding.sqlLit(budgetPermille / 1000.0)
    val per = TextOps.withTokens(docs)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CAST(size(tokens) AS BIGINT)")).as("n_tokens"))
      .withColumn("w_u", expr(
        s"CAST(floor(${tauPowExpr("CAST(n_tokens AS DOUBLE)", tauQuarters)}" +
          " * 1.0e6 + 0.5e0) AS BIGINT)"))
    val whole = Window.partitionBy()   // #sources rows — tiny by contract
    per
      .withColumn("tot_w", sum(col("w_u")).over(whole))
      .withColumn("tot_tok", sum(col("n_tokens")).over(whole))
      .withColumn("p_mix", expr(
        "floor((CAST(w_u AS DOUBLE) / CAST(tot_w AS DOUBLE)) * 1.0e9 + 0.5e0) / 1.0e9"))
      .withColumn("rate_u", expr(
        s"""LEAST(CAST(1000000 AS BIGINT), CAST(floor(
            (($bf * CAST(tot_tok AS DOUBLE)) * p_mix / CAST(n_tokens AS DOUBLE))
            * 1.0e6 + 0.5e0) AS BIGINT))"""))
      .select("source", "n_docs", "n_tokens", "w_u", "p_mix", "rate_u")
  }

  /** Apply a [[temperatureMixRates]] recipe: the same zero-state hash
    * draw as [[stratified]], thresholded at the recipe's per-source
    * `rate_u`. The recipe side is a broadcast (#sources rows); the
    * corpus side stays a scan-stage filter — the keep decision never
    * shuffles the 100 TB side. */
  def temperatureMixSample(docs: DataFrame, budgetPermille: Int,
                           salt: String = "graft",
                           tauQuarters: Int = 2): DataFrame =
    docs.join(broadcast(
        temperatureMixRates(docs, budgetPermille, tauQuarters)
          .select("source", "rate_u")),
      Seq("source"))
      .where(expr(s"${uExpr(salt)} < rate_u"))
      .drop("rate_u")

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * exponential keys), deterministic: draw exactly `k` docs with
    * inclusion probability increasing in `weight` — the importance
    * sampler behind quality-weighted corpus carving. Each doc gets the
    * key `−ln(u′)/w` (u′ the hash draw mapped into (0,1)); the k
    * SMALLEST keys win, which is distribution-equivalent to the
    * classic largest-`u^(1/w)` formulation. Stateless and
    * re-run-stable; scale-invariant in the weights UP TO nano-unit key
    * ties — cw cancels in the exact ordering, but the integer
    * quantization happens after the division, so keys that differ by
    * < 10⁻⁹/c may reorder under a rescale by c (a rescaled weight
    * column reproduces the same sample except at such ties).
    *
    * Returns `(…, w, key_n, rank)`, rank 1..k. `weightExpr` must be
    * strictly positive — zero, negative, and NaN weights fail loudly
    * at scan time (a zero weight would otherwise produce a NULL key
    * that Spark's ascending window ranks FIRST, silently promoting
    * the doc to the top of the sample).
    *
    * Scale/parity shape: the key is a scan-stage projection; the
    * global cut is the same two-level exact top-k as
    * [[perStratumTopK]] (per-partition pre-top-k bounds every sort
    * group). Keys are quantized to integer nano-units so the only
    * transcendental (`ln`) is compared after identical rounding on
    * both engines; ties break on doc_id — a total order. */
  def weightedTopK(docs: DataFrame, weightExpr: String, k: Int,
                   salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // -ln(u')/w keyed on the GUARDED w column: w <= 0 or NaN raises
    // (NaN > 0 is false) instead of minting a NULL/garbage key
    val keyN =
      s"""CAST(floor(-ln((${uExpr(salt)} + 0.5e0) / 1.0e6)
          / w * 1.0e9 + 0.5e0) AS BIGINT)"""
    val local = Window.partitionBy(col("pid")).orderBy(col("key_n"), col("doc_id"))
    val global = Window.partitionBy().orderBy(col("key_n"), col("doc_id"))
    docs
      .withColumn("w", expr(
        // NaN needs its own test: Spark orders NaN ABOVE all doubles,
        // so NaN > 0 is true and would slip through the sign guard
        s"""CASE WHEN NOT isnan(CAST($weightExpr AS DOUBLE))
                  AND CAST($weightExpr AS DOUBLE) > 0.0D
            THEN CAST($weightExpr AS DOUBLE)
            ELSE raise_error(concat('weightedTopK: weight must be strictly positive, got ',
              CAST(CAST($weightExpr AS DOUBLE) AS STRING))) END"""))
      .withColumn("key_n", expr(keyN))
      .withColumn("pid", spark_partition_id())
      .withColumn("lrank", row_number().over(local))
      .where(col("lrank") <= k)
      .withColumn("rank", row_number().over(global).cast("int"))
      .where(col("rank") <= k)
      .drop("pid", "lrank")
  }

  /** Exact corpus percentiles — the value at rank ⌈p·n/100⌉ of an
    * integer-valued expression under ascending order — with NO global
    * sort and NO corpus-sized window. The length/token-count
    * distribution read behind packing-capacity, chunk-size and
    * truncation decisions, exact where `approxQuantile` is
    * ε-approximate.
    *
    * Scale shape — two agg-only corpus scans, every join broadcast:
    *  1. value-range histogram `bucket = floordiv(val, bucketWidth)`
    *     (order-preserving, unlike a hash), map-side combined to
    *     ~range/width rows; the cumulative offsets window and the
    *     corpus count run over that TINY relation, never the corpus.
    *  2. only the ≤ |pcts| buckets that contain a target rank are
    *     re-scanned (column-pruned to the value, filtered by the
    *     broadcast bucket list) and reduced per DISTINCT VALUE — a
    *     hash agg, so a hot value (10¹⁰ identical lengths) combines
    *     map-side and cannot straggle, which is why this beats a
    *     within-bucket `row_number()` sort at 100 TB.
    * The rank then indexes the per-value cumulative counts
    * (≤ |pcts|·bucketWidth rows, broadcast). Ties need no tiebreak:
    * every row at the target rank carries the same value by
    * construction. `bucketWidth` only trades histogram size against
    * pass-2 scan selectivity — any width is exact.
    *
    * The rank-locating branch is referenced twice (needed-bucket
    * filter + final join), so its histogram scan re-evaluates once —
    * the [[shuffleOrder]] offsets rationale: the re-run is the
    * column-pruned map-side agg, never the payload. The non-equi
    * joins are |pcts|-row × tiny-histogram broadcasts (benign BNLJs
    * by construction, like the one-row scalar cross).
    *
    * Returns `(pct, n_rank, value)`, one row per requested percentile
    * (empty input ⇒ empty result). */
  def exactPercentiles(df: DataFrame, valueExpr: String, pcts: Seq[Int],
                       bucketWidth: Long = 64): DataFrame =
    exactPercentilesBy(df, valueExpr, pcts, Nil, bucketWidth)

  /** [[exactPercentiles]] PER GROUP — the per-source length/token
    * distribution behind a corpus report card, one exact rank set per
    * distinct `by`-key. Same two-histogram shape with every relation
    * keyed by the group columns; where group keys exist the rank
    * location becomes a broadcast EQUI-join (hash on the key, range
    * residual as the join filter), so only the ungrouped call keeps
    * the tiny nested-loop lookups. The histogram must stay
    * broadcast-small: #groups × (value-range / bucketWidth) rows —
    * size `bucketWidth` accordingly for high-cardinality groupings.
    * Returns `(by…, pct, n_rank, value)`. */
  def exactPercentilesBy(df: DataFrame, valueExpr: String, pcts: Seq[Int],
                         by: Seq[String], bucketWidth: Long = 64): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val g = by.map(col)
    // floor division (DIV truncates toward zero — wrong bucket order
    // for negative values): val - pmod(val, w) is divisible by w
    val v = df
      .select(g :+ expr(valueExpr).cast("long").as("val"): _*)
      .withColumn("bucket",
        expr(s"(val - pmod(val, ${bucketWidth}L)) DIV ${bucketWidth}L"))
    val hist = v.groupBy(g :+ col("bucket"): _*).agg(count(lit(1)).as("cnt"))
    // offsets/totals: window/agg over the tiny histogram, never the
    // corpus (the shuffleOrder offsets rationale)
    val offs = hist.withColumn("off", coalesce(sum(col("cnt")).over(
      Window.partitionBy(g: _*).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // per-group counts → target ranks ceil(pct·n/100) in pure integer
    // arithmetic (a float ceil could round a representation-inexact
    // p·n/100); explode on the per-group totals relation — no cross
    // join needed
    val targets = hist.groupBy(g: _*).agg(sum(col("cnt")).as("n"))
      .withColumn("pct", explode(lit(pcts.toArray)))
      // rank in DECIMAL then integral-divide (IntegralDivide returns
      // BIGINT): p·n stays exact past n = Long.Max/100, and rk ≤ n so
      // the result always fits the BIGINT it lands in
      .withColumn("rk", expr(
        "(CAST(pct AS DECIMAL(38,0)) * n + 99) DIV 100"))
      .select(g :+ col("pct") :+ col("rk"): _*)
    // locate each rank's bucket: grouped ⇒ broadcast hash join on the
    // group key with the range residual as filter; ungrouped ⇒ the
    // |pcts|-row × tiny-histogram nested lookup (benign by
    // construction, like the one-row scalar cross)
    val joined = if (by.isEmpty) targets.crossJoin(broadcast(offs))
                 else targets.join(broadcast(offs), by)
    val located = joined
      .where(col("rk") > col("off") && col("rk") <= col("off") + col("cnt"))
      .select(g :+ col("pct") :+ col("rk") :+ col("bucket") :+ col("off"): _*)
    val needed = located.select(g :+ col("bucket"): _*).distinct()
    val perVal = v.join(broadcast(needed), by :+ "bucket")
      .groupBy(g :+ col("bucket") :+ col("val"): _*).agg(count(lit(1)).as("cnt2"))
      .withColumn("off2", coalesce(sum(col("cnt2")).over(
        Window.partitionBy(g :+ col("bucket"): _*).orderBy(col("val"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    located.join(broadcast(perVal), by :+ "bucket")
      .where(col("rk") > col("off") + col("off2") &&
        col("rk") <= col("off") + col("off2") + col("cnt2"))
      .select(g :+ col("pct") :+ col("rk").as("n_rank") :+ col("val").as("value"): _*)
  }

  /** Per-value count histogram `(by…, val, cnt)` of an integer-valued
    * expression — the PERSISTABLE, MERGEABLE summary behind
    * cross-snapshot exact percentiles ([[percentilesFromHistogram]]).
    * One agg-only scan, map-side combined; the relation is bounded by
    * #groups × |value domain|, which for the metrics this serves
    * (lengths, token counts, quality deciles) is thousands of rows per
    * group no matter the corpus size. Counts are ADDITIVE, so the
    * histogram of a corpus union is the elementwise sum
    * ([[mergeValueHistograms]]) — persist one histogram per
    * day/snapshot (e.g. [[Sketches]]-family `SketchIO.writeSketch`)
    * and answer exact rank queries over ANY union of snapshots without
    * re-scanning old corpora. For unbounded 64-bit value domains use
    * [[exactPercentilesBy]] instead (its second pass re-scans only the
    * target buckets rather than aggregating every distinct value). */
  def valueHistogram(df: DataFrame, valueExpr: String,
                     by: Seq[String] = Nil): DataFrame = {
    val g = by.map(col)
    df.select(g :+ expr(valueExpr).cast("long").as("val"): _*)
      .groupBy(g :+ col("val"): _*).agg(count(lit(1)).as("cnt"))
  }

  /** Merge [[valueHistogram]] relations: elementwise count sum per
    * (by…, val). EXACT — the merged histogram equals the histogram of
    * the concatenated corpora, so percentiles over the merge are the
    * true percentiles of the union (spec-pinned). Counts sum in
    * DECIMAL(38,0) and downcast through a loud BIGINT-range guard
    * (the [[Diagnostics]] mergeScoreHistograms discipline, r10
    * advice): a cross-snapshot merge past Long.Max fails instead of
    * wrapping and silently shifting every percentile rank. */
  def mergeValueHistograms(hists: Seq[DataFrame],
                           by: Seq[String] = Nil): DataFrame = {
    require(hists.nonEmpty, "mergeValueHistograms needs at least one histogram")
    val g = by.map(col)
    hists.reduce(_.unionByName(_))
      .groupBy(g :+ col("val"): _*)
      .agg(sum(expr("CAST(cnt AS DECIMAL(38,0))")).as("cd"))
      .withColumn("cnt", expr(Guards.guardedBigint("cd", "merged value-histogram count")))
      .select(g :+ col("val") :+ col("cnt"): _*)
  }


  /** Exact percentiles FROM a [[valueHistogram]] relation alone — the
    * same rank semantics and output as [[exactPercentilesBy]]
    * (`(by…, pct, n_rank, value)`, rank ⌈p·n/100⌉ ascending), but the
    * corpus is never touched: both ranking passes run over the
    * histogram (coarse `bucketWidth` roll-up for rank location, the
    * per-value counts for the final pick — the second corpus scan of
    * the two-pass algorithm is already materialized in the summary).
    * This is the cross-snapshot read path: load per-snapshot
    * histograms, [[mergeValueHistograms]], then this — exact
    * percentiles over a year of corpora in histogram-sized work. */
  def percentilesFromHistogram(hist: DataFrame, pcts: Seq[Int],
                               by: Seq[String] = Nil,
                               bucketWidth: Long = 64): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val g = by.map(col)
    val v = hist
      .select(g :+ col("val").cast("long").as("val") :+ col("cnt").cast("long").as("cnt"): _*)
      .withColumn("bucket",
        expr(s"(val - pmod(val, ${bucketWidth}L)) DIV ${bucketWidth}L"))
    // every count aggregation over histogram `cnt` inputs (which are
    // arbitrary persisted longs, not corpus row counts) runs in
    // DECIMAL(38,0) then downcasts through the loud BIGINT guard (r10
    // advice): a union-of-snapshots total past Long.Max fails instead
    // of wrapping and shifting every rank. Once the per-group total
    // passes the guard, the prefix-sum windows below are bounded by it
    // and cannot wrap.
    val coarse = v.groupBy(g :+ col("bucket"): _*)
      .agg(sum(expr("CAST(cnt AS DECIMAL(38,0))")).as("cd"))
      .withColumn("cnt", expr(Guards.guardedBigint("cd", "per-bucket histogram count")))
      .drop("cd")
    val offs = coarse.withColumn("off", coalesce(sum(col("cnt")).over(
      Window.partitionBy(g: _*).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val targets = coarse.groupBy(g: _*)
      .agg(sum(expr("CAST(cnt AS DECIMAL(38,0))")).as("nd"))
      .withColumn("n", expr(Guards.guardedBigint("nd", "histogram total count")))
      .withColumn("pct", explode(lit(pcts.toArray)))
      .withColumn("rk", expr(
        "(CAST(pct AS DECIMAL(38,0)) * n + 99) DIV 100"))
      .select(g :+ col("pct") :+ col("rk"): _*)
    val joined = if (by.isEmpty) targets.crossJoin(broadcast(offs))
                 else targets.join(broadcast(offs), by)
    val located = joined
      .where(col("rk") > col("off") && col("rk") <= col("off") + col("cnt"))
      .select(g :+ col("pct") :+ col("rk") :+ col("bucket") :+ col("off"): _*)
    val needed = located.select(g :+ col("bucket"): _*).distinct()
    val perVal = v.join(broadcast(needed), by :+ "bucket")
      .groupBy(g :+ col("bucket") :+ col("val"): _*)
      .agg(sum(expr("CAST(cnt AS DECIMAL(38,0))")).as("c2d"))
      .withColumn("cnt2", expr(Guards.guardedBigint("c2d", "per-value histogram count")))
      .drop("c2d")
      .withColumn("off2", coalesce(sum(col("cnt2")).over(
        Window.partitionBy(g :+ col("bucket"): _*).orderBy(col("val"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    located.join(broadcast(perVal), by :+ "bucket")
      .where(col("rk") > col("off") + col("off2") &&
        col("rk") <= col("off") + col("off2") + col("cnt2"))
      .select(g :+ col("pct") :+ col("rk").as("n_rank") :+ col("val").as("value"): _*)
  }

  /** Deterministic train/val/test split assignment: the same stateless
    * hash draw as [[stratified]], cut at per-mille thresholds —
    * `(…, u, split)` with split ∈ {train, val, test}. Assignment is a
    * pure projection (zero shuffles, the decision never leaves the scan
    * stage) and is stable under re-runs and corpus growth: adding docs
    * never reassigns an existing one, the property that keeps eval
    * sets uncontaminated across corpus versions. */
  def splitAssign(docs: DataFrame, salt: String = "graft",
                  trainPermille: Int = 980, valPermille: Int = 10): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      s"per-mille cuts must be non-negative and sum <= 1000, " +
        s"got train=$trainPermille val=$valPermille")
    docs
      .withColumn("u", expr(uExpr(salt)))
      .withColumn("split",
        when(col("u") < trainPermille * 1000L, "train")
          .when(col("u") < (trainPermille + valPermille) * 1000L, "val")
          .otherwise("test"))
  }
}
