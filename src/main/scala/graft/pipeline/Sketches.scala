package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.regrid.Rounding

/** Mergeable sketch aggregates for corpus accounting at 100 TB.
  *
  * Exact `COUNT(DISTINCT x)` per group shuffles every distinct value to
  * its group's reducer — at web-corpus scale (10¹⁰⁺ distinct shingles)
  * that exchange IS the job. A K-Minimum-Values sketch [Bar-Yossef et
  * al. 2002] caps the per-group state at `k` 8-byte hashes: each
  * partition keeps the k smallest distinct hash values it sees
  * (map-side, inside Spark's partial-aggregation tree), partial
  * buffers merge by sorted-union-truncate, and the estimate
  * `(k-1) / (h_(k) / 2⁶⁰)` is read off the final buffer. Standard
  * error ≈ 1/√(k−2) (~9% at k=128); groups with fewer than k distinct
  * values are EXACT (the buffer never fills).
  *
  * Everything is deterministic — the hash is the repo's shared 60-bit
  * md5 prefix (same bits in DuckDB), and "k smallest distinct" is
  * order-independent — so unlike engine-native `approx_count_distinct`
  * (HLL++, whose registers differ across engines) this sketch
  * hash-matches a SQL oracle bit-for-bit, double arithmetic included.
  */
object Sketches {

  /** Mergeable k-minimum-values aggregator over 60-bit hash values.
    * Buffer = sorted distinct ascending array, length ≤ k; reduce is a
    * binary-search insert (drops values ≥ the current kth min once
    * full), merge is sorted-union-truncate. Both are associative and
    * commutative on the SET of inputs, so the final buffer — and
    * everything derived from it — is partitioning-invariant. */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(b, h)
      if (i >= 0) b // already present
      else {
        val ins = -i - 1
        if (ins >= k) b // not among the k smallest
        else {
          val n = math.min(b.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1
        if (j < b.length && b(j) == v) j += 1 // dedup equal heads
        out(o) = v; o += 1
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** 2⁶⁰ as an exact double — the hash space width. */
  val HashSpace: Double = 1.152921504606846976e18

  /** Driver/executor-side estimate from a raw buffer — the same
    * arithmetic the Column-expression path computes, for callers
    * holding the sketch as a Scala array (streaming state). */
  def estimate(mins: Array[Long], k: Int): Double =
    if (mins.length < k) mins.length.toDouble
    else math.floor(((k - 1).toDouble / (mins(k - 1).toDouble / HashSpace)) * 1.0e3 + 0.5) / 1.0e3

  /** Shared 60-bit hash of a string column (same bits as the oracle's
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-group distinct-count estimate via KMV, alongside the exact
    * count for calibration. Output: `(group, n_exact, est_kmv)` —
    * `est_kmv` is EXACT (as a whole double) when the group has < k
    * distinct values, else the KMV estimate rounded to 3 decimals with
    * the shared floor-trick.
    *
    * Scale shape: ONE hash aggregation; the sketch buffer combines
    * map-side, so the exchange carries ≤ k longs per (partition,
    * group). The exact `countDistinct` rides the same groupBy only for
    * the oracle comparison — a production caller at 10¹⁰ distinct
    * values drops it and keeps the sketch-only plan. */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column, k: Int): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3, got $k") // (k-1)/frac with k-2 d.o.f.
    val kmv = udaf(new KmvAgg(k), Encoders.scalaLong)
    df.select(col(groupCol), hash60(value).as("__h"))
      .groupBy(groupCol)
      .agg(
        countDistinct(col("__h")).as("n_exact"),
        kmv(col("__h")).as("__mins"))
      .withColumn("__nk", size(col("__mins")))
      .withColumn("est_kmv",
        when(col("__nk") < k, col("__nk").cast("double"))
          .otherwise(Rounding.roundN(
            lit((k - 1).toDouble) /
              (element_at(col("__mins"), k).cast("double") / lit(HashSpace)), 3)))
      .drop("__mins", "__nk")
  }

  /** Oracle-side fragment: the same estimate in DuckDB SQL, over a
    * relation `(g, h)` of per-group distinct 60-bit hashes. */
  def kmvSql(k: Int): String =
    s"""CASE WHEN nd < $k THEN CAST(nd AS DOUBLE)
        ELSE ${Rounding.sqlRoundN(
          s"${(k - 1).toDouble}e0 / (CAST(hk AS DOUBLE) / 1.152921504606846976e18)", 3)} END"""

  /** Raw per-group KMV sketch: `(group, mins)` with `mins` the sorted
    * ≤ k smallest distinct hashes — the mergeable summary
    * [[kmvPairSimilarity]] and cross-snapshot unions consume. */
  def kmvSketchBy(df: DataFrame, groupCol: String, value: Column, k: Int): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3, got $k")
    val kmv = udaf(new KmvAgg(k), Encoders.scalaLong)
    df.select(col(groupCol), hash60(value).as("__h"))
      .groupBy(groupCol)
      .agg(kmv(col("__h")).as("mins"))
  }

  /** Pairwise set-overlap estimation from SKETCHES ALONE — the
    * corpus-overlap planning number ("how much of source A duplicates
    * source B") computed without ever joining the underlying sets.
    * KMV sketches are closed under union (the k smallest of a sorted
    * distinct merge of two sketches IS the union's sketch), so
    * |A∪B| is estimated from the merged sketch and Jaccard follows by
    * inclusion–exclusion. Each pair costs O(k) array work on
    * |groups|² broadcast-sized rows — the underlying corpus is
    * touched ONCE (one sketch agg), which is the entire point at
    * 100 TB. Estimate error compounds through the subtraction, so
    * treat small jaccard_est as "≈ 0"; the k-smallest merge is exact
    * set algebra, making the whole output bit-deterministic. */
  def kmvPairSimilarity(df: DataFrame, groupCol: String, value: Column, k: Int): DataFrame = {
    val sk = kmvSketchBy(df, groupCol, value, k)
    val a = sk.select(col(groupCol).as("ga"), col("mins").as("ma"))
    val b = sk.select(col(groupCol).as("gb"), col("mins").as("mb"))
    def est(minsCol: String) =
      s"""CASE WHEN size($minsCol) < $k THEN CAST(size($minsCol) AS DOUBLE)
          ELSE floor((${(k - 1).toDouble}e0
            / (CAST(element_at($minsCol, $k) AS DOUBLE) / 1.152921504606846976e18))
            * 1.0e3 + 0.5e0) / 1.0e3 END"""
    a.join(b, col("ga") < col("gb"))
      .withColumn("mu", expr(s"slice(array_sort(array_distinct(concat(ma, mb))), 1, $k)"))
      .withColumn("est_a", expr(est("ma")))
      .withColumn("est_b", expr(est("mb")))
      .withColumn("est_union", expr(est("mu")))
      .withColumn("jaccard_est", expr(
        """floor((greatest(est_a + est_b - est_union, 0.0e0) / est_union)
           * 1.0e6 + 0.5e0) / 1.0e6"""))
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("est_a"), col("est_b"), col("est_union"), col("jaccard_est"))
  }

  // ---- HyperLogLog distinct sketch ----

  /** HLL register relation for `2^p` buckets: per (group, bucket) the
    * MAX rank, where rank = leading zeros of the (60−p)-bit suffix of
    * the shared 60-bit hash, plus one (range [1, 61−p]; an all-zero
    * suffix takes the cap). The relation form keeps the sketch pure
    * relational algebra: ≤ 2^p rows per group no matter the input,
    * map-side combinable (max), and MERGEABLE — the sketch of a union
    * is the elementwise max of the sketches (spec-pinned), the same
    * set-algebra closure the KMV and Bloom relations enjoy. Unlike KMV
    * (k-th order statistic) the register file is FIXED SIZE per group
    * with single-long registers — the shape to ship per-day / per-split
    * distinct summaries at 100 TB.
    *
    * Bit-deterministic: ranks are integer string-length arithmetic on
    * `bin(w)` (minimal binary — identical output in Spark and DuckDB),
    * so the sketch AND its estimates hash-gate. `p` is bounded to
    * [7, 14] so the single high-range alpha formula applies (m ≥ 128)
    * and the scaled harmonic denominator stays well inside BIGINT
    * (≤ 2^p · 2^(61−p) = 2^61). */
  def hllSketch(df: DataFrame, groupCol: String, value: Column, p: Int = 8): DataFrame = {
    require(p >= 7 && p <= 14, s"HLL needs 7 <= p <= 14, got $p")
    val m = 1 << p
    val rMax = 60 - p + 1
    df.select(col(groupCol), hash60(value).as("__h"))
      // NULL values hash to NULL (md5(NULL) = NULL) and would otherwise
      // materialize a NULL-bucket register row that hllEstimate counts
      // in `present` while its NULL rank drops out of the harmonic sum,
      // silently biasing zeros AND dscaled. Sets don't contain NULL;
      // drop them here (ADVICE r9).
      .filter(col("__h").isNotNull)
      .selectExpr(groupCol, s"CAST(__h % $m AS INT) AS bucket", s"__h DIV $m AS __w")
      .selectExpr(groupCol, "bucket",
        s"CAST(CASE WHEN __w = 0 THEN $rMax ELSE $rMax - length(bin(__w)) END AS INT) AS r")
      .groupBy(col(groupCol), col("bucket")).agg(max("r").as("r"))
  }

  /** Engine-neutral estimate fragment over columns `(dscaled BIGINT,
    * zeros BIGINT)` — used verbatim by BOTH the Spark plan and the
    * DuckDB oracle, so the float path is the same expression text:
    * one literal/integer division for the raw estimate, the standard
    * linear-counting branch `m·ln(m/zeros)` when raw ≤ 2.5m with empty
    * buckets, floor-rounded to 1e-6 to absorb ln() last-ULP skew. */
  def hllEstSql(p: Int, dscaledCol: String = "dscaled",
                zerosCol: String = "zeros"): String = {
    val m = 1 << p
    val rMax = 60 - p + 1
    // alpha_m · m² · 2^rMax: raw = alpha·m²/D with D = dscaled / 2^rMax
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val numerLit = Rounding.sqlLit(alpha * m * m * math.pow(2.0, rMax))
    val raw = s"($numerLit / CAST($dscaledCol AS DOUBLE))"
    Rounding.sqlRoundN(
      s"""CASE WHEN $raw <= ${Rounding.sqlLit(2.5 * m)} AND $zerosCol > 0
          THEN ${Rounding.sqlLit(m.toDouble)} * ln(${Rounding.sqlLit(m.toDouble)} / CAST($zerosCol AS DOUBLE))
          ELSE $raw END""", 6)
  }

  /** Distinct-count estimate from an [[hllSketch]] relation:
    * `(group, est_hll)`. The harmonic denominator is computed as the
    * EXACT integer `Σ 2^(rMax − r) + zeros·2^rMax` (sum order
    * irrelevant — integer adds commute exactly, unlike the float
    * `Σ 2^(−r)` whose rounding would depend on partitioning), then
    * spent in one double division. */
  def hllEstimate(sketch: DataFrame, groupCol: String, p: Int = 8): DataFrame = {
    require(p >= 7 && p <= 14, s"HLL needs 7 <= p <= 14, got $p")
    val m = 1 << p
    val rMax = 60 - p + 1
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("present"),
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), $rMax - r))").as("__dpres"))
      .withColumn("zeros", lit(m.toLong) - col("present"))
      .withColumn("dscaled", col("__dpres") + col("zeros") * lit(1L << rMax))
      .withColumn("est_hll", expr(hllEstSql(p)))
      .select(col(groupCol), col("est_hll"))
  }

  /** Pairwise set-overlap planning from HLL REGISTER FILES ALONE — the
    * fixed-size twin of [[kmvPairSimilarity]]: register files are
    * closed under elementwise max (the max-merge of two groups'
    * registers IS the union's register file, exactly), so |A∪B| is
    * estimated from the merged file and the overlap follows by
    * inclusion–exclusion. The corpus is touched ONCE (one sketch agg);
    * each pair then costs ≤ 2·2^p register rows through one equi-join
    * on (pair, bucket) — at 10⁴ sources that is ~10⁸·2^p bounded rows
    * of pure integer max/sum work, never a second corpus pass.
    * `overlap_est = max(est_a + est_b − est_union, 0)` compounds three
    * estimate errors, so treat small overlaps as ≈ 0 (same caveat as
    * the KMV variant); every float step is the shared fragment text,
    * so the output hash-gates. Output: `(group_a, group_b, est_a,
    * est_b, est_union, overlap_est)`. */
  def hllPairOverlap(df: DataFrame, groupCol: String, value: Column,
                     p: Int = 8): DataFrame = {
    val m = 1 << p
    val rMax = 60 - p + 1
    val sk = hllSketch(df, groupCol, value, p)
    val est = hllEstimate(sk, groupCol, p)
    val pairs = est.select(col(groupCol).as("ga")).distinct()
      .join(est.select(col(groupCol).as("gb")).distinct(), col("ga") < col("gb"))
    // every group's registers, replicated to each pair it joins —
    // union max-merge per (pair, bucket) = the union's register file
    val eA = sk.toDF("ga", "bucket", "r").join(pairs, "ga")
    val eB = sk.toDF("gb", "bucket", "r").join(pairs, "gb")
    val merged = eA.select("ga", "gb", "bucket", "r")
      .unionByName(eB.select("ga", "gb", "bucket", "r"))
      .groupBy("ga", "gb", "bucket").agg(max("r").as("r"))
    val estU = merged.groupBy("ga", "gb")
      .agg(count(lit(1)).as("present"),
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), $rMax - r))").as("__dpres"))
      .withColumn("zeros", lit(m.toLong) - col("present"))
      .withColumn("dscaled", col("__dpres") + col("zeros") * lit(1L << rMax))
      .withColumn("est_union", expr(hllEstSql(p)))
      .select("ga", "gb", "est_union")
    estU
      .join(est.toDF("ga", "est_a"), "ga")
      .join(est.toDF("gb", "est_b"), "gb")
      .withColumn("overlap_est", expr(Rounding.sqlRoundN(
        "greatest(est_a + est_b - est_union, 0.0e0)", 6)))
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("est_a"), col("est_b"), col("est_union"), col("overlap_est"))
  }

  /** Per-group HLL distinct estimate alongside the exact count for
    * calibration — the HLL twin of [[kmvDistinct]]. Output:
    * `(group, n_exact, est_hll)`. The exact branch is one extra
    * aggregation joined on the (tiny, one-row-per-group) estimate
    * relation, present only for the oracle comparison; a production
    * caller at 10¹⁰ distinct values keeps the sketch-only plan. */
  def hllDistinct(df: DataFrame, groupCol: String, value: Column, p: Int = 8): DataFrame = {
    val est = hllEstimate(hllSketch(df, groupCol, value, p), groupCol, p)
    // exact branch counts distinct HASHES (same convention as
    // kmvDistinct) so the calibration number measures exactly what the
    // sketch saw
    df.select(col(groupCol), hash60(value).as("__h"))
      .groupBy(col(groupCol)).agg(countDistinct(col("__h")).as("n_exact"))
      .join(est, groupCol)
  }

  // ---- Count-Min frequency sketch ----

  /** Largest depth the single-digest bucket scheme supports: md5's 32
    * hex chars give four disjoint 8-char (32-bit) row hashes. */
  val cmMaxDepth = 4

  /** Count-Min bucket id for hash row `r` (0-based): the r-th disjoint
    * 32-bit slice of ONE md5 digest of the value, reduced mod `width`.
    * One digest serves all rows — strictly less hashing than `depth`
    * salted digests per value. Caveat (ADVICE r8): the textbook
    * Count-Min 1−2^−depth bound assumes independently drawn hash
    * functions per row; disjoint slices of ONE digest are correlated
    * by construction, so that bound is heuristic here, not proven —
    * empirically adequate (md5 slices show no detectable slice-to-slice
    * structure), and the probes/specs budget 4× slack over the ε·N
    * error line rather than leaning on the exact bound. The slice is
    * non-negative (32 bits < 63), so plain `%` is already the
    * canonical bucket. `digest` must be `md5(value)` (hex string). */
  def cmBucket(digest: Column, r: Column, width: Int): Column =
    conv(digest.substr(r * lit(8) + lit(1), lit(8)), 16, 10).cast("long") % width

  /** Oracle-side fragment: the same bucket in DuckDB SQL (`digest` an
    * md5 hex expression, `r` the hash-row column/expression). */
  def cmBucketSql(digest: String, r: String, width: Int): String =
    s"CAST('0x' || substr($digest, ($r) * 8 + 1, 8) AS BIGINT) % $width"

  /** Count-Min frequency sketch [Cormode & Muthukrishnan 2005] as a
    * RELATION: `(r, c, cnt)` — `depth` hash rows × `width` buckets,
    * `cnt` = Σ weight of the values hashing to that bucket. Point
    * estimate for x = min over rows of its bucket counter: always ≥
    * the true count (one-sided), over by ≤ 2·N/width with probability
    * 1 − 2^−depth.
    *
    * Scale shape: counters are ADDITIVE, so the groupBy combines
    * map-side and the exchange carries ≤ depth·width rows per
    * partition no matter the input size — the frequency complement of
    * [[KmvAgg]] (KMV answers "how many distinct", CM answers "how
    * often is x") with the same bounded-state discipline. Additivity
    * also makes the sketch mergeable across corpora/days (elementwise
    * sum) and bit-deterministic under any partitioning — unlike
    * sampled counters, even the ESTIMATES hash-gate against the SQL
    * oracle. */
  def cmSketch(df: DataFrame, value: Column, depth: Int, width: Int,
               weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && depth <= cmMaxDepth,
      s"CM needs 1 <= depth <= $cmMaxDepth, got $depth")
    require(width >= 2, s"CM needs width >= 2, got $width")
    df.select(md5(value.cast("string")).as("__d"), weight.cast("long").as("__w"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("__d"), col("__w"))
      .withColumn("c", cmBucket(col("__d"), col("r"), width))
      .groupBy("r", "c").agg(sum("__w").as("cnt"))
  }

  /** Point-query estimates from a CM sketch for the `itemCol` values
    * of `items`: `(item, est_cm)` with `est_cm = min_r cnt[r][h_r(x)]`
    * (0 for a value whose every bucket is empty). The sketch side is
    * ≤ depth·width rows and broadcasts; `items` can be
    * arbitrarily large — the probe never shuffles. */
  def cmEstimate(sketch: DataFrame, items: DataFrame, itemCol: String,
                 depth: Int, width: Int): DataFrame =
    items.select(col(itemCol), md5(col(itemCol).cast("string")).as("__d"))
      .select(col(itemCol), col("__d"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("c", cmBucket(col("__d"), col("r"), width))
      .join(broadcast(sketch), Seq("r", "c"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(itemCol).agg(min("cnt").as("est_cm"))

  // ---- Bloom membership filter ----

  /** Bloom filter over a value set, as a relation of SET BIT
    * positions: the distinct union of each value's `kHashes` positions
    * (disjoint 32-bit slices of one md5 digest mod `mBits` — the
    * [[cmBucket]] scheme). Bounded at ≤ min(mBits, kHashes·n) rows no
    * matter the input, and mergeable: the filter of a union is the
    * distinct union of the filters (it's a set).
    *
    * The relational form keeps positions as rows rather than a packed
    * bitset: for the sparse regime it is sized for (set bits ≪ mBits,
    * the regime where a Bloom index makes sense) the row relation is
    * within ~an order of magnitude of the packed array while staying
    * pure equi-join/distinct — no stateful aggregator, oracle-
    * replayable bit-for-bit. */
  def bloomBits(df: DataFrame, value: Column, mBits: Int, kHashes: Int): DataFrame = {
    require(kHashes >= 1 && kHashes <= cmMaxDepth,
      s"Bloom needs 1 <= kHashes <= $cmMaxDepth, got $kHashes")
    require(mBits >= 2, s"Bloom needs mBits >= 2, got $mBits")
    df.select(md5(value.cast("string")).as("__d"))
      .select(explode(sequence(lit(0), lit(kHashes - 1))).as("r"), col("__d"))
      .select(cmBucket(col("__d"), col("r"), mBits).as("pos"))
      .distinct()
  }

  /** Membership probe: each (carry…, item) row gains `maybe_present` —
    * true iff ALL `kHashes` of the item's positions are set in `bits`.
    * ZERO false negatives by construction (an inserted value's
    * positions are all set); false positives at the standard
    * `(1 − e^{−kn/m})^k` rate, and DETERMINISTIC — both engines flag
    * the same values, so even the false positives hash-gate. The bits
    * side is ≤ mBits rows and broadcasts; the probe side never
    * shuffles before the match — the 100 TB decontamination shape
    * where the eval index ships as a fixed-size filter instead of the
    * raw n-gram set. */
  def bloomMaybeContains(bits: DataFrame, items: DataFrame, itemCol: String,
                         mBits: Int, kHashes: Int,
                         carry: Seq[String] = Nil): DataFrame = {
    val keys = carry :+ itemCol
    items.select(keys.map(col) :+ md5(col(itemCol).cast("string")).as("__d"): _*)
      .select(keys.map(col) :+ col("__d") :+
        explode(sequence(lit(0), lit(kHashes - 1))).as("r"): _*)
      .select(keys.map(col) :+ cmBucket(col("__d"), col("r"), mBits).as("pos"): _*)
      .join(broadcast(bits.withColumn("__hit", lit(1))), Seq("pos"), "left")
      .groupBy(keys.map(col): _*)
      // compare hits to the GROUP'S OWN row count, not the constant
      // kHashes: a (carry, item) key appearing in j > 1 input rows
      // yields j*k probe rows in its group, and an inserted item then
      // hits all j*k of them — `=== kHashes` would read that as
      // absent, a false negative violating the zero-false-negative
      // invariant (ADVICE r8, armed for any non-distinct caller)
      .agg((count(col("__hit")) === count(lit(1))).as("maybe_present"))
  }
}
