package graft.pipeline

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the exact-AUC rank machinery and FILTERED vector
  * search against driver-side replays sharing none of the rewrite.
  * aucBy's two-level midrank ranks and ivfTopK's pre-filter bucket
  * join are both rewrites whose failure mode is a silently-shifted
  * number (a wrong cumulative offset, a post-filter where a pre-filter
  * was promised), not an error — reference replays catch exactly
  * that. */
class EvalAnnPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("eval-ann-props")
    .getOrCreate()
  import spark.implicits._

  /** Pair-counting truth: A = 2·#{(pos, neg): s⁺ < s⁻} + #ties, then
    * the operator's own final rounding — exact integer arithmetic up
    * to one double division, identical to the implementation's
    * contract but derived from the O(P·N) definition, not ranks. */
  private def naiveAuc(scores: Seq[(Long, Boolean)]): Option[Double] = {
    val pos = scores.filter(_._2).map(_._1)
    val neg = scores.filterNot(_._2).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      var a = 0L
      for (p <- pos; n <- neg) {
        if (p < n) a += 2L else if (p == n) a += 1L
      }
      Some(math.floor((1.0 - a.toDouble /
        (2.0 * pos.size * neg.size)) * 1e9 + 0.5) / 1e9)
    }
  }

  test("property: aucBy equals pair-counting truth, any bucket width, ties and negatives included") {
    (1 to 4).foreach { seed =>
      val r = new scala.util.Random(9100 + seed)
      // tie-heavy signed scores, imbalanced labels, 3 groups
      val rows = (0 until 600).map { _ =>
        (s"g${r.nextInt(3)}",
          (r.nextInt(41) - 20).toLong * (if (r.nextBoolean()) 1 else 13),
          r.nextInt(10) < 3)
      }
      val truth = rows.groupBy(_._1).map { case (g, xs) =>
        g -> naiveAuc(xs.map(t => (t._2, t._3)))
      }
      val df = rows.toDF("g", "s", "label")
      Seq(1L, 7L, 64L, 100000L).foreach { w =>
        val got = Diagnostics.aucBy(df, "s", "label", by = Seq("g"), bucketWidth = w)
          .collect().map { row =>
            row.getString(0) -> ((row.getLong(1), row.getLong(2),
              if (row.isNullAt(3)) None else Some(row.getDouble(3))))
          }.toMap
        truth.foreach { case (g, want) =>
          val (np, nn, auc) = got(g)
          assert(np === rows.count(t => t._1 == g && t._3).toLong, s"seed $seed w=$w g=$g n_pos")
          assert(nn === rows.count(t => t._1 == g && !t._3).toLong, s"seed $seed w=$w g=$g n_neg")
          assert(auc === want, s"seed $seed w=$w g=$g")
        }
      }
    }
  }

  test("aucBy: separation extremes, all-tied 0.5, single-class NULL, ungrouped global") {
    // perfect separation -> 1.0; inverted -> 0.0; one score -> 0.5
    val sep = (1 to 20).map(i => (i.toLong + 100L, true)) ++
      (1 to 30).map(i => (i.toLong, false))
    val sepDf = sep.toDF("s", "label")
    assert(Diagnostics.aucBy(sepDf, "s", "label").head().getDouble(2) === 1.0)
    assert(Diagnostics.aucBy(sepDf, "-s", "label").head().getDouble(2) === 0.0)
    val tied = Seq((5L, true), (5L, false), (5L, true), (5L, false)).toDF("s", "label")
    assert(Diagnostics.aucBy(tied, "s", "label").head().getDouble(2) === 0.5)
    val oneClass = Seq((1L, true), (2L, true)).toDF("s", "label")
    val row = Diagnostics.aucBy(oneClass, "s", "label").head()
    assert(row.getLong(0) === 2L && row.getLong(1) === 0L && row.isNullAt(2))
  }

  test("property: merged score histograms give the exact union AUC") {
    (1 to 3).foreach { seed =>
      val r = new scala.util.Random(9900 + seed)
      val rows = (0 until 500).map { i =>
        (i, s"g${r.nextInt(3)}", (r.nextInt(31) - 15).toLong, r.nextBoolean())
      }
      val df = rows.toDF("id", "g", "s", "label")
      val direct = Diagnostics.aucBy(df, "s", "label", by = Seq("g"))
        .collect().map(x => x.getString(0) -> x.toSeq.tail).toMap
      // three "snapshots" by id mod 3, histogram each, merge, rank
      val hists = (0 until 3).map(m =>
        Diagnostics.scoreHistogram(df.filter(s"id % 3 = $m"), "s", "label", Seq("g")))
      val merged = Diagnostics.aucFromHistogram(
          Diagnostics.mergeScoreHistograms(hists, Seq("g")), by = Seq("g"))
        .collect().map(x => x.getString(0) -> x.toSeq.tail).toMap
      assert(merged === direct, s"seed $seed")
      // an UNMERGED concatenation must also work (aucFromHistogram
      // re-aggregates by score first)
      val concat = Diagnostics.aucFromHistogram(
          hists.reduce(_.unionByName(_)), by = Seq("g"))
        .collect().map(x => x.getString(0) -> x.toSeq.tail).toMap
      assert(concat === direct, s"seed $seed concat")
    }
  }

  test("property: prAtThresholds equals naive >= -threshold counting at every lattice point") {
    (1 to 3).foreach { seed =>
      val r = new scala.util.Random(9700 + seed)
      val rows = (0 until 400).map { _ =>
        (s"g${r.nextInt(2)}", (r.nextInt(61) - 30).toLong, r.nextInt(5) < 2)
      }
      val df = rows.toDF("g", "s", "label")
      Seq(1L, 8L, 25L).foreach { w =>
        val hist = Diagnostics.scoreHistogram(df, "s", "label", Seq("g"))
        val got = Diagnostics.prAtThresholds(hist, Seq("g"), bucketWidth = w)
          .collect().map { x =>
            (x.getString(0), x.getLong(1)) ->
              ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
          }.toMap
        got.foreach { case ((g, thr), (tp, fp, fn, tn)) =>
          val in = rows.filter(_._1 == g)
          assert(tp === in.count(t => t._2 >= thr && t._3).toLong, s"seed $seed w=$w $g $thr tp")
          assert(fp === in.count(t => t._2 >= thr && !t._3).toLong, s"seed $seed w=$w $g $thr fp")
          assert(fn === in.count(t => t._2 < thr && t._3).toLong, s"seed $seed w=$w $g $thr fn")
          assert(tn === in.count(t => t._2 < thr && !t._3).toLong, s"seed $seed w=$w $g $thr tn")
        }
        // every nonempty bucket emits exactly one operating point
        val wantThr = rows.map(t =>
          (t._1, (t._2 - ((t._2 % w) + w) % w) / w * w)).toSet
        assert(got.keySet === wantThr, s"seed $seed w=$w thresholds")
      }
    }
  }

  test("calibrationBins: exact per-bin counts and a perfectly calibrated fixture") {
    // deterministic fixture: in bin b (prob = b/10 + 0.05), exactly
    // 2b-in-20 positives
    val exact = (0 until 10).flatMap { b =>
      (0 until 20).map { i => (b / 10.0 + 0.05, i < b * 2) }
    }
    val df = exact.toDF("prob", "label")
    val got = Diagnostics.calibrationBins(df, "prob", "label", nBins = 10)
      .collect().map(x => x.getInt(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    (0 until 10).foreach { b =>
      val (n, np, mp, pr) = got(b)
      assert(n === 20L && np === math.min(b * 2, 20).toLong, s"bin $b")
      assert(math.abs(mp - (b / 10.0 + 0.05)) < 1e-9, s"bin $b mean_prob $mp")
      assert(math.abs(pr - math.min(b * 2, 20) / 20.0) < 1e-9, s"bin $b pos_rate $pr")
    }
    // top-inclusive last bin: prob = 1.0 lands in bin 9, not 10
    val top = Seq((1.0, true)).toDF("prob", "label")
    assert(Diagnostics.calibrationBins(top, "prob", "label").head().getInt(0) === 9)
  }

  test("property: weighted scoreHistogram == replicated rows; zero drops, negative raises") {
    (1 to 3).foreach { seed =>
      val r = new scala.util.Random(9800 + seed)
      val rows = (0 until 300).map { _ =>
        (s"g${r.nextInt(2)}", (r.nextInt(15) - 7).toLong, r.nextBoolean(),
          r.nextInt(4).toLong) // weights 0..3, zero included
      }
      val wdf = rows.toDF("g", "s", "label", "w")
      val weighted = Diagnostics.scoreHistogram(wdf, "s", "label", Seq("g"), weightExpr = "w")
        .collect().map(x => (x.getString(0), x.getLong(1)) ->
          ((x.getLong(2), x.getLong(3)))).toMap
      val replicated = rows.flatMap { case (g, s, l, w) =>
        Seq.fill(w.toInt)((g, s, l))
      }.toDF("g", "s", "label")
      val want = Diagnostics.scoreHistogram(replicated, "s", "label", Seq("g"))
        .collect().map(x => (x.getString(0), x.getLong(1)) ->
          ((x.getLong(2), x.getLong(3)))).toMap
      assert(weighted === want, s"seed $seed")
      // and the downstream AUC over the weighted histogram equals the
      // replicated-rows AUC
      val aucW = Diagnostics.aucFromHistogram(
          Diagnostics.scoreHistogram(wdf, "s", "label", Seq("g"), weightExpr = "w"),
          Seq("g")).collect().map(x => x.getString(0) -> x.toSeq.tail).toMap
      val aucR = Diagnostics.aucBy(replicated, "s", "label", Seq("g"))
        .collect().map(x => x.getString(0) -> x.toSeq.tail).toMap
      assert(aucW === aucR, s"seed $seed auc")
    }
    val bad = intercept[Exception] {
      Diagnostics.scoreHistogram(
        Seq((1L, true, -2L)).toDF("s", "label", "w"),
        "s", "label", weightExpr = "w").collect()
    }
    assert(bad.getMessage.contains("non-negative"))
    // a FRACTIONAL weight must raise, not silently truncate (1.7 -> 1
    // or 0.4 -> dropped row would bias every downstream statistic)
    val frac = intercept[Exception] {
      Diagnostics.scoreHistogram(
        Seq((1L, true, 1.7)).toDF("s", "label", "w"),
        "s", "label", weightExpr = "w").collect()
    }
    assert(frac.getMessage.contains("non-negative integer"))
    // a NULL weight raises WITH the diagnostic (concat of a NULL cast
    // would otherwise null the whole message)
    val nullW = intercept[Exception] {
      Diagnostics.scoreHistogram(
        Seq((1L, true, Option.empty[Long])).toDF("s", "label", "w"),
        "s", "label", weightExpr = "w").collect()
    }
    assert(nullW.getMessage.contains("non-negative integer"))
    // per-score totals must not WRAP before the guard: two same-score
    // rows whose weights sum past Long.Max fail loudly
    val wrap = intercept[Exception] {
      Diagnostics.scoreHistogram(
        Seq((1L, true, 6000000000000000000L), (1L, true, 6000000000000000000L))
          .toDF("s", "label", "w"),
        "s", "label", weightExpr = "w").collect()
    }
    assert(wrap.getMessage.contains("exceeds BIGINT range"))
  }

  test("aucBy pair counts survive past Long range (DECIMAL accumulator)") {
    // one positive below one negative, each with weight 4e18: the pair
    // count A = 2·P·N ≈ 3.2e37 wraps a LongType sum silently; the
    // DECIMAL(38,0) accumulator must return the exact AUC 0.0
    val w = 4000000000000000000L
    val hist = Diagnostics.scoreHistogram(
      Seq((1L, true, w), (2L, false, w)).toDF("s", "label", "w"),
      "s", "label", weightExpr = "w")
    val row = Diagnostics.aucFromHistogram(hist).head()
    assert(row.getLong(0) === w && row.getLong(1) === w)
    assert(row.getDouble(2) === 0.0)
    // and the mirror-image separation still reads exactly 1.0
    val hist2 = Diagnostics.scoreHistogram(
      Seq((2L, true, w), (1L, false, w)).toDF("s", "label", "w"),
      "s", "label", weightExpr = "w")
    assert(Diagnostics.aucFromHistogram(hist2).head().getDouble(2) === 1.0)
  }

  test("NULL contract: unscored/unlabeled rows are excluded; out-of-range prob fails loudly") {
    // NULL score and NULL label rows must not shift the statistic —
    // the result equals the clean subset's
    val dirty = Seq(
      (Some(10L), Some(true)), (Some(1L), Some(false)), (Some(7L), Some(true)),
      (None, Some(true)), (Some(5L), None), (None, None))
    val df = dirty.map { case (s, l) =>
      (s.map(java.lang.Long.valueOf).orNull,
        l.map(java.lang.Boolean.valueOf).orNull)
    }.toDF("s", "label")
    val clean = dirty.collect { case (Some(s), Some(l)) => (s, l) }.toDF("s", "label")
    assert(Diagnostics.aucBy(df, "s", "label").collect().toSeq ===
      Diagnostics.aucBy(clean, "s", "label").collect().toSeq)
    val cal = Diagnostics.calibrationBins(
      Seq((0.5, true), (0.9, false)).toDF("prob", "label")
        .unionByName(Seq((Option.empty[Double], Option.empty[Boolean]))
          .toDF("prob", "label")),
      "prob", "label")
    assert(cal.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) === 2L)
    // a NON-NULL probability outside [0, 1] is a caller bug
    val bad = intercept[Exception] {
      Diagnostics.calibrationBins(
        Seq((1.5, true)).toDF("prob", "label"), "prob", "label").collect()
    }
    assert(bad.getMessage.contains("prob must be in [0, 1]"))
  }

  test("streaming score histogram: complete-mode prefix == batch, AUC over the sink == direct") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val r = new scala.util.Random(77)
    // ~10% unlabeled rows: the stream twin must EXCLUDE them exactly
    // as the batch histogram does (a silent negative would shift AUC)
    val rows = (0 until 300).map { _ =>
      (s"g${r.nextInt(2)}", (r.nextInt(21) - 10).toLong,
        if (r.nextInt(10) == 0) Option.empty[Boolean] else Some(r.nextBoolean()))
    }
    val stream = MemoryStream[(String, Long, Option[Boolean])]
    val hist = graft.streaming.StreamingOps.scoreHistogramStream(
      stream.toDF().toDF("g", "s", "label"), "s", "label", Seq("g"))
    val q = hist.writeStream.outputMode("complete")
      .format("memory").queryName("auc_hist_sink").start()
    val chunks = rows.grouped(100).toSeq
    var seen = Seq.empty[(String, Long, Option[Boolean])]
    chunks.foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
      seen = seen ++ chunk
      // at every prefix: the sink IS the batch histogram, and AUC
      // computed over it equals the direct batch AUC of the prefix
      val sink = spark.table("auc_hist_sink")
      val batchHist = Diagnostics.scoreHistogram(
          seen.toDF("g", "s", "label"), "s", "label", Seq("g"))
        .collect().map(x => (x.getString(0), x.getLong(1)) ->
          ((x.getLong(2), x.getLong(3)))).toMap
      val gotHist = sink.collect().map(x => (x.getString(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
      assert(gotHist === batchHist)
      val direct = Diagnostics.aucBy(seen.toDF("g", "s", "label"), "s", "label", Seq("g"))
        .collect().map(x => x.getString(0) -> x.toSeq.tail).toMap
      val streamed = Diagnostics.aucFromHistogram(sink, Seq("g"))
        .collect().map(x => x.getString(0) -> x.toSeq.tail).toMap
      assert(streamed === direct)
      // the PR sweep must also run straight off the sink
      val prStream = Diagnostics.prAtThresholds(sink, Seq("g"), bucketWidth = 8)
        .collect().map(x => (x.getString(0), x.getLong(1)) -> x.toSeq.drop(2)).toMap
      val prBatch = Diagnostics.prAtThresholds(
          Diagnostics.scoreHistogram(seen.toDF("g", "s", "label"), "s", "label", Seq("g")),
          Seq("g"), bucketWidth = 8)
        .collect().map(x => (x.getString(0), x.getLong(1)) -> x.toSeq.drop(2)).toMap
      assert(prStream === prBatch)
    }
    q.stop()
  }

  test("streaming calibration: bins over the streamed micro-prob histogram == batch at every prefix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val r = new scala.util.Random(78)
    // probs on the micro-unit lattice incl. both edges; ~10% unlabeled
    // rows must be excluded identically on both sides
    val rows = (0 until 300).map { _ =>
      val prob = r.nextInt(1000001) / 1e6
      (s"g${r.nextInt(2)}", prob,
        if (r.nextInt(10) == 0) Option.empty[Boolean] else Some(r.nextBoolean()))
    } ++ Seq(("g0", 0.0, Some(true)), ("g1", 1.0, Some(false)))
    val quant = "CAST(floor(prob * 1.0e6 + 0.5e0) AS BIGINT)"
    val stream = MemoryStream[(String, Double, Option[Boolean])]
    val hist = graft.streaming.StreamingOps.scoreHistogramStream(
      stream.toDF().toDF("g", "prob", "label"), quant, "label", Seq("g"))
    val q = hist.writeStream.outputMode("complete")
      .format("memory").queryName("cal_hist_sink").start()
    var seen = Seq.empty[(String, Double, Option[Boolean])]
    rows.grouped(101).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
      seen = seen ++ chunk
      val streamed = Diagnostics.calibrationFromHistogram(
          spark.table("cal_hist_sink"), Seq("g"))
        .collect().map(x => (x.getString(0), x.getInt(1)) -> x.toSeq.drop(2)).toMap
      val direct = Diagnostics.calibrationBins(
          seen.toDF("g", "prob", "label"), "prob", "label", Seq("g"))
        .collect().map(x => (x.getString(0), x.getInt(1)) -> x.toSeq.drop(2)).toMap
      assert(streamed === direct)
    }
    q.stop()
    // a histogram whose scores are NOT micro-unit probs is a caller
    // bug and raises instead of minting phantom bins
    val bad = intercept[Exception] {
      Diagnostics.calibrationFromHistogram(
        Seq(("g0", 2000000L, 1L, 1L)).toDF("g", "s", "p", "ng"), Seq("g")).collect()
    }
    assert(bad.getMessage.contains("micro-unit prob"))
  }

  // ---- filtered ANN ----

  private val annBits = 6

  /** Driver replay of [[Similarity.ivfTopK]]'s arithmetic: the same
    * left-fold dot (exact for small-integer components), the same
    * sqrt/divide shape, the same 1e-9 floor lattice — bit-equal by
    * construction, so rank comparisons cannot drift on float noise. */
  private def replayCos(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < x.length) { acc += x(i) * y(i); i += 1 }
      acc
    }
    math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      * 1e9 + 0.5) / 1e9
  }

  private def bucketOf(v: Array[Double]): Long =
    (0 until annBits).map(i => if (v(i) > 0.0) 1L << i else 0L).sum

  test("property: filtered ivfTopK equals a driver replay — pre-filter semantics, both probe modes") {
    (1 to 3).foreach { seed =>
      val r = new scala.util.Random(9400 + seed)
      val n = 250 + r.nextInt(100)
      val vecs = (0 until n).map { id =>
        val v = Array.fill(8)((r.nextInt(9) - 4).toDouble)
        if (v.forall(_ == 0.0)) v(0) = 1.0
        (id.toLong, v.map(_.toFloat), r.nextInt(4))
      }
      val df = vecs.toDF("vec_id", "embedding", "label")
      val byId = vecs.map(t => t._1 -> ((t._2.map(_.toDouble), t._3))).toMap
      Seq(false, true).foreach { mp =>
        val got = Similarity.ivfTopK(df, "vec_id % 10 = 0", 5,
            hammingProbes = mp, indexFilter = "label = 1")
          .select("query_id", "neighbor_id", "rank")
          .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet
        val want = byId.keys.filter(_ % 10 == 0).flatMap { q =>
          val (qv, _) = byId(q)
          val probes =
            if (mp) (0 until annBits).map(1L << _).toSet + 0L map (bucketOf(qv) ^ _)
            else Set(bucketOf(qv))
          byId.toSeq
            .collect { case (id, (v, lab))
              if id != q && lab == 1 && probes.contains(bucketOf(v)) =>
                (id, replayCos(qv, v)) }
            .sortBy { case (id, cos) => (-cos, id) }
            .take(5).zipWithIndex
            .map { case ((id, _), i) => (q, id, i + 1) }
        }.toSet
        assert(got === want, s"seed $seed mp=$mp")
      }
    }
  }

  test("property: filtered bruteTopK equals the exact replay over the constrained index side") {
    (1 to 2).foreach { seed =>
      val r = new scala.util.Random(9600 + seed)
      val vecs = (0 until 200).map { id =>
        val v = Array.fill(8)((r.nextInt(9) - 4).toDouble)
        if (v.forall(_ == 0.0)) v(0) = 1.0
        (id.toLong, v.map(_.toFloat), r.nextInt(3))
      }
      val df = vecs.toDF("vec_id", "embedding", "label")
      val byId = vecs.map(t => t._1 -> ((t._2.map(_.toDouble), t._3))).toMap
      val got = Similarity.bruteTopK(df, "vec_id % 10 = 0", 4, indexFilter = "label = 2")
        .select("query_id", "neighbor_id", "rank")
        .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet
      val want = byId.keys.filter(_ % 10 == 0).flatMap { q =>
        val (qv, _) = byId(q)
        byId.toSeq
          .collect { case (id, (v, lab)) if id != q && lab == 2 =>
            (id, replayCos(qv, v)) }
          .sortBy { case (id, cos) => (-cos, id) }
          .take(4).zipWithIndex
          .map { case ((id, _), i) => (q, id, i + 1) }
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("filtered ivfTopK: pre-filter, not post-filter — scarce-label neighbors still fill k") {
    // 4 label-1 vectors deliberately NOT in any query's unfiltered
    // top-5 (orthogonal-ish, low cosine): a post-filter over an
    // unfiltered top-5 would return NOTHING for label 1; the
    // pre-filter contract returns them.
    val r = new scala.util.Random(42)
    val base = (0 until 120).map { id =>
      val v = Array.fill(8)((r.nextInt(7) + 1).toDouble) // all-positive: tight cluster
      (id.toLong, v.map(_.toFloat), 0)
    }
    // same sign bucket as the cluster (first 6 dims positive) so the
    // bucket join FINDS them, but strongly negative on the unbucketed
    // dims -> low cosine to every cluster vector
    val rare = (0 until 4).map { j =>
      val v = Array.fill(8)(1.0); v(6) = -9.0 - j; v(7) = -9.0
      (1000L + j, v.map(_.toFloat), 1)
    }
    val df = (base ++ rare).toDF("vec_id", "embedding", "label")
    val unfiltered = Similarity.ivfTopK(df, "vec_id = 0", 5, hammingProbes = true)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(unfiltered.forall(_ < 1000L), "fixture: rare vectors must miss the unfiltered top-5")
    val filtered = Similarity.ivfTopK(df, "vec_id = 0", 5,
        hammingProbes = true, indexFilter = "label = 1")
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(filtered.nonEmpty && filtered.forall(_ >= 1000L))
  }
}
