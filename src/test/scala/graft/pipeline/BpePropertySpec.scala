package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property test for BPE training + application against a naive
  * driver-side replay sharing NOTHING with the Spark implementation
  * (no DataFrames, no SQL folds — plain Scala maps and vectors). The
  * distributed trainer's failure modes — wrong pair weighting from
  * the word-frequency reduction, overlap handling in the adjacent-pair
  * count ("aaa" must contribute (a,a) twice) vs the NON-overlapping
  * left-to-right re-segmentation, tie-break drift in the argmax, a
  * dictionary row segmented under stale merges — all surface as a
  * merge-table or symbol-count mismatch on small random corpora where
  * ties and overlaps are dense (3-letter alphabet, short words). */
class BpePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("bpe-props")
    .getOrCreate()
  import spark.implicits._

  /** Textbook BPE [Sennrich et al. 2016] on a word-frequency dict:
    * count all adjacent symbol pairs weighted by word freq (overlaps
    * included), take (cnt desc, lhs asc, rhs asc), merge left-to-right
    * non-overlapping, repeat. */
  private def naiveBpe(dict: Map[String, Long], nMerges: Int)
      : (Vector[(Int, String, String, String, Long)], Map[String, Vector[String]]) = {
    var syms: Map[String, Vector[String]] =
      dict.map { case (w, _) => w -> w.map(_.toString).toVector }
    val merges = Vector.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= nMerges && !dry) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, f) <- dict; i <- 0 until syms(w).size - 1) {
        val p = (syms(w)(i), syms(w)(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      if (counts.isEmpty) dry = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((r, a, b, a + b, cnt))
        syms = syms.map { case (w, s) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < s.size) {
            if (i + 1 < s.size && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
            else { out += s(i); i += 1 }
          }
          w -> out.result()
        }
        r += 1
      }
    }
    (merges.result(), syms)
  }

  test("property: merge table and applied symbol counts equal the textbook replay") {
    (1 to 4).foreach { seed =>
      val r = new scala.util.Random(7400 + seed)
      def word() = Vector.fill(1 + r.nextInt(5))(('a' + r.nextInt(3)).toChar).mkString
      val vocabPool = Vector.fill(30)(word())
      val docs = (0 until 200).map { id =>
        val words = Vector.fill(1 + r.nextInt(12))(vocabPool(r.nextInt(vocabPool.size)))
        (id.toLong, words.mkString(" "), s"src${id % 3}")
      }
      val dict = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, ws) => w -> ws.size.toLong }
      val (wantMerges, wantSyms) = naiveBpe(dict, 8)

      val df = docs.toDF("doc_id", "text", "source")
      val gotMerges = TextOps.bpeTrain(df, 8).collect()
        .map(row => (row.getInt(0), row.getString(1), row.getString(2),
          row.getString(3), row.getLong(4))).toVector.sortBy(_._1)
      assert(gotMerges === wantMerges, s"seed $seed: merge tables differ")

      // the apply path: per-source symbol totals from the naive final
      // segmentation vs bpeSegmentStats through the dictionary join
      val wantStats = docs.groupBy(_._3).map { case (src, ds) =>
        val ws = ds.flatMap(_._2.split(" "))
        src -> ((ws.size.toLong, ws.map(_.length.toLong).sum,
          ws.map(w => wantSyms(w).size.toLong).sum))
      }
      val gotStats = TextOps.bpeSegmentStats(df, 8).collect()
        .map(row => row.getString(0) ->
          ((row.getLong(1), row.getLong(2), row.getLong(3)))).toMap
      assert(gotStats === wantStats, s"seed $seed: segment stats differ")
    }
  }
}
