package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the sketch family's LAWS across random value
  * sets (fixed seeds, several cases per property) — the invariants the
  * 100 TB merge strategies lean on, checked beyond the hand-built
  * fixtures of PipelineSpec:
  *
  *  - Bloom: NO false negative, ever — for any inserted set and any
  *    probe multiset (duplicates included).
  *  - KMV / HLL / Bloom / CM: MERGE CLOSURE — the sketch of a union
  *    equals the merge of the sketches (k-smallest-of-merge, elementwise
  *    max, distinct-union, elementwise sum respectively), exactly, for
  *    random disjoint and overlapping splits.
  *  - CM: ONE-SIDED error — every point estimate ≥ its exact count.
  *  - HLL/KMV: estimates land within the advertised design slack.
  */
class SketchPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("sketch-props")
    .getOrCreate()
  import spark.implicits._

  private val cases = 5

  /** Random multiset of strings: `nDistinct` values, skewed repeat
    * counts (Zipf-ish via mod), shuffled deterministically. */
  private def randValues(seed: Int, nDistinct: Int): Seq[String] = {
    val r = new scala.util.Random(seed)
    val reps = (0 until nDistinct).flatMap { i =>
      Seq.fill(1 + (if (i % 17 == 0) r.nextInt(8) else 0))(s"v${seed}_$i")
    }
    r.shuffle(reps)
  }

  test("property: bloom never false-negative, merge = distinct union, for random sets") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(900 + seed)
      val m = 2048 + r.nextInt(4096)
      val k = 1 + r.nextInt(4)
      val vals = randValues(seed, 300 + r.nextInt(500))
      val df = vals.toDF("v")
      val bits = Sketches.bloomBits(df, col("v"), m, k)
      // no false negatives, probing the RAW multiset (duplicates kept)
      val neg = Sketches.bloomMaybeContains(bits, df, "v", m, k)
        .filter(!col("maybe_present")).count()
      assert(neg === 0L, s"seed $seed m=$m k=$k: $neg false negatives")
      // merge closure over a random split
      val (a, b) = vals.distinct.splitAt(r.nextInt(vals.distinct.size max 1))
      val merged = Sketches.bloomBits(a.toDF("v"), col("v"), m, k)
        .unionByName(Sketches.bloomBits(b.toDF("v"), col("v"), m, k))
        .distinct().orderBy("pos").collect().toSeq
      assert(merged === bits.orderBy("pos").collect().toSeq, s"seed $seed")
    }
  }

  test("property: KMV and HLL merge closure + estimates inside design slack") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(1700 + seed)
      val nd = 2000 + r.nextInt(6000)
      val vals = randValues(seed, nd)
      val df = vals.map(("g", _)).toDF("g", "v")
      // KMV: k-smallest-of-merge closure over an OVERLAPPING split
      val k = 128
      val cut = r.nextInt(nd)
      val a = vals.filter(_.hashCode % 3 != 0) ++ vals.take(cut) // overlap
      val b = vals.filter(_.hashCode % 3 == 0) ++ vals.takeRight(nd - cut)
      def kmvMins(xs: Seq[String]) = Sketches.kmvSketchBy(
        xs.map(("g", _)).toDF("g", "v"), "g", col("v"), k)
        .head().getSeq[Long](1).toSeq
      val mergedK = (kmvMins(a) ++ kmvMins(b)).distinct.sorted.take(k)
      assert(mergedK === kmvMins(a ++ b), s"seed $seed KMV merge")
      // KMV estimate: 4-sigma ≈ 4/sqrt(k) = 35%
      val kmvEst = Sketches.kmvDistinct(df, "g", col("v"), k).head().getDouble(2)
      assert(math.abs(kmvEst - nd) / nd < 0.35, s"seed $seed KMV est $kmvEst vs $nd")
      // HLL: elementwise-max closure over the same split
      val p = 8
      def regs(xs: Seq[String]) = Sketches.hllSketch(
        xs.map(("g", _)).toDF("g", "v"), "g", col("v"), p)
      val mergedH = regs(a).unionByName(regs(b))
        .groupBy("g", "bucket").agg(max("r").as("r"))
        .orderBy("bucket").collect().toSeq
      assert(mergedH === regs(a ++ b).orderBy("bucket").collect().toSeq,
        s"seed $seed HLL merge")
      // HLL estimate: 4-sigma ≈ 4·1.04/sqrt(256) = 26%
      val hllEst = Sketches.hllDistinct(df, "g", col("v"), p).head().getDouble(2)
      assert(math.abs(hllEst - nd) / nd < 0.26, s"seed $seed HLL est $hllEst vs $nd")
    }
  }

  test("property: CM estimates one-sided and additive-merge exact") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(2600 + seed)
      val depth = 4
      val width = 64 + r.nextInt(192)
      val vals = randValues(seed, 400 + r.nextInt(600))
      val exact = vals.groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }
      val df = vals.toDF("v")
      val sk = Sketches.cmSketch(df, col("v"), depth, width)
      val est = Sketches.cmEstimate(sk, exact.keys.toSeq.toDF("v"), "v", depth, width)
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      exact.foreach { case (v, c) =>
        assert(est(v) >= c, s"seed $seed: CM under-estimated $v: ${est(v)} < $c")
      }
      // additive merge: sketch(a) + sketch(b) = sketch(a ++ b), cellwise
      val (a, b) = vals.splitAt(r.nextInt(vals.size max 1))
      val merged = Sketches.cmSketch(a.toDF("v"), col("v"), depth, width)
        .unionByName(Sketches.cmSketch(b.toDF("v"), col("v"), depth, width))
        .groupBy("r", "c").agg(sum("cnt").as("cnt"))
        .orderBy("r", "c").collect().toSeq
      assert(merged === sk.orderBy("r", "c").collect().toSeq, s"seed $seed CM merge")
    }
  }
}
