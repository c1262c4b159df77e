package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the exact-percentile rank machinery and the
  * MinHash-LSH verify stage against brute-force truth on random
  * inputs (fixed seeds). The percentile operator's two-histogram
  * rank location and the LSH pipeline's candidates-first Jaccard are
  * both rewrites whose failure mode is a silently-shifted number, not
  * an error — exactly what reference replays catch. */
class SamplingDedupPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("sampling-dedup-props")
    .getOrCreate()
  import spark.implicits._

  private val cases = 4
  private val pcts = Seq(1, 25, 50, 75, 99, 100)

  private def nearestRank(sorted: Vector[Long], p: Int): (Long, Long) = {
    val n = sorted.size.toLong
    val rk = (p.toLong * n + 99L) / 100L
    (rk, sorted((rk - 1).toInt))
  }

  test("property: exactPercentiles equals nearest-rank truth, any bucket width, negatives included") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(7500 + seed)
      // skewed, tie-heavy, signed values
      val vals = Vector.fill(400 + r.nextInt(300))(
        (r.nextInt(2001) - 1000).toLong * (if (r.nextBoolean()) 1 else 7))
      val sorted = vals.sorted
      val df = vals.toDF("x")
      Seq(1L, 7L, 64L, 1000L).foreach { w =>
        val got = Sampling.exactPercentiles(df, "x", pcts, bucketWidth = w)
          .collect().map(row => row.getInt(0) -> (row.getLong(1), row.getLong(2))).toMap
        pcts.foreach { p =>
          assert(got(p) === nearestRank(sorted, p), s"seed $seed w=$w p=$p")
        }
      }
    }
  }

  test("property: exactPercentilesBy equals per-group nearest-rank truth") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(8600 + seed)
      val rows = (0 until 900).map { _ =>
        (s"g${r.nextInt(3)}", (r.nextInt(500) - 250).toLong)
      }
      val byGroup = rows.groupBy(_._1).map { case (g, xs) =>
        g -> xs.map(_._2).sorted.toVector
      }
      val got = Sampling.exactPercentilesBy(rows.toDF("g", "x"), "x", pcts,
          by = Seq("g"), bucketWidth = 16)
        .collect().map(row => (row.getString(0), row.getInt(1)) ->
          (row.getLong(2), row.getLong(3))).toMap
      byGroup.foreach { case (g, sorted) =>
        pcts.foreach { p =>
          assert(got((g, p)) === nearestRank(sorted, p), s"seed $seed g=$g p=$p")
        }
      }
    }
  }

  test("property: merged snapshot histograms give the union's exact percentiles, any split, any width") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(9100 + seed)
      val rows = (0 until 900).map { _ =>
        (s"g${r.nextInt(3)}", (r.nextInt(500) - 250).toLong)
      }
      val byGroup = rows.groupBy(_._1).map { case (g, xs) =>
        g -> xs.map(_._2).sorted.toVector
      }
      // random 3-way snapshot split — histogram additivity must hold
      // for ANY partition of the corpus, not just halves
      val tagged = rows.map(t => (t, r.nextInt(3)))
      val hists = (0 until 3).map { s0 =>
        Sampling.valueHistogram(
          tagged.filter(_._2 == s0).map(_._1).toDF("g", "x"), "x", Seq("g"))
      }
      Seq(1L, 16L, 1000L).foreach { w =>
        val got = Sampling.percentilesFromHistogram(
            Sampling.mergeValueHistograms(hists, Seq("g")), pcts,
            by = Seq("g"), bucketWidth = w)
          .collect().map(row => (row.getString(0), row.getInt(1)) ->
            (row.getLong(2), row.getLong(3))).toMap
        byGroup.foreach { case (g, sorted) =>
          pcts.foreach { p =>
            assert(got((g, p)) === nearestRank(sorted, p), s"seed $seed g=$g w=$w p=$p")
          }
        }
        // and the histogram path agrees with the two-pass corpus path
        val direct = Sampling.exactPercentilesBy(rows.toDF("g", "x"), "x", pcts,
            by = Seq("g"), bucketWidth = w)
          .collect().map(row => (row.getString(0), row.getInt(1)) ->
            (row.getLong(2), row.getLong(3))).toMap
        assert(got === direct, s"seed $seed w=$w")
      }
    }
  }

  test("property: minhashLsh reports the EXACT Jaccard for every candidate pair and recovers planted dups") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(9700 + seed)
      // 40 base docs of 20 vocab-100 tokens; every 3rd gets a planted
      // partner (same tokens + one appended → 5-gram Jaccard 16/17)
      val base = (0 until 40).map { i =>
        i.toLong -> Vector.fill(20)(s"t${r.nextInt(100)}")
      }
      val docs = base.flatMap { case (id, toks) =>
        val self = Seq((id * 2, toks.mkString(" ")))
        if (id % 3 == 0) self :+ ((id * 2 + 1, (toks :+ s"x$id").mkString(" ")))
        else self
      }
      def shingles(text: String): Set[String] =
        text.trim.split("\\s+").toVector.sliding(5).map(_.mkString(" ")).toSet
      val shMap = docs.map { case (id, t) => id -> shingles(t) }.toMap
      def exactJ(a: Long, b: Long): Double = {
        val (sa, sb) = (shMap(a), shMap(b))
        val i = (sa intersect sb).size.toDouble
        math.floor((i / (sa.size + sb.size - i)) * 1e9 + 0.5) / 1e9
      }
      val out = Dedup.minhashLsh(docs.toDF("doc_id", "text"))
        .collect().map(row => (row.getLong(0), row.getLong(1)) -> row.getDouble(2)).toMap
      // law 1: every reported jaccard is the exact set Jaccard
      out.foreach { case ((a, b), j) =>
        assert(j === exactJ(a, b), s"seed $seed pair ($a,$b)")
      }
      // law 2: planted high-jaccard partners are recovered (md5 is
      // fixed, so recovery is deterministic per seed; 4 bands of 4 at
      // j≈0.94 recalls ≈99.8% per pair — allow one miss per case)
      val planted = base.collect { case (id, _) if id % 3 == 0 =>
        (id * 2, id * 2 + 1)
      }
      val missed = planted.filterNot(out.contains)
      assert(missed.size <= 1, s"seed $seed: missed planted pairs $missed")
    }
  }

  test("histogram merges and rank sums guard BIGINT overflow loudly; near-Long.Max ranks stay exact") {
    val big = Long.MaxValue
    // a merged cross-snapshot count past Long.Max raises instead of
    // wrapping (pre-r11 a plain long sum wrapped negative and shifted
    // every percentile rank)
    val h1 = Seq((7L, big)).toDF("val", "cnt")
    val h2 = Seq((7L, big)).toDF("val", "cnt")
    val e1 = intercept[Exception] {
      Sampling.mergeValueHistograms(Seq(h1, h2)).collect()
    }
    assert(e1.getMessage.contains("exceeds BIGINT range"),
      s"wrong merge error: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      Sampling.percentilesFromHistogram(
        Seq((1L, big), (2L, big)).toDF("val", "cnt"), Seq(50)).collect()
    }
    assert(e2.getMessage.contains("exceeds BIGINT range"),
      s"wrong total error: ${e2.getMessage}")
    // n = Long.MaxValue itself is IN contract: the decimal rank
    // arithmetic must locate ranks exactly where the old
    // `pct*n` long product wrapped (100·n ≈ 9.2e20)
    val got = Sampling.percentilesFromHistogram(
        Seq((42L, big)).toDF("val", "cnt"), Seq(1, 50, 100))
      .collect().map(r => (r.getAs[Int]("pct"), r.getAs[Long]("n_rank"),
        r.getAs[Long]("value"))).sortBy(_._1)
    def rk(p: Int) = ((BigInt(p) * big + 99) / 100).toLong
    assert(got.toSeq === Seq((1, rk(1), 42L), (50, rk(50), 42L), (100, rk(100), 42L)))
  }
}
