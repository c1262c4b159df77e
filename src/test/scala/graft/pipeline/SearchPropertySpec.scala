package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property test for positional phrase search against brute-force
  * sliding-window truth on random inputs (fixed seeds). The adjacency
  * reduction (`start = i − k`, `count(*) = plen`) is a rewrite whose
  * failure modes — repeated-term phrases double-counting, boundary
  * starts, overlapping occurrences — all surface as silently wrong
  * counts, exactly what a naive replay catches. A 3-letter vocabulary
  * makes every one of those regimes dense. */
class SearchPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("search-props")
    .getOrCreate()
  import spark.implicits._

  test("property: phraseMatch equals sliding-window truth, repeated terms and overlaps included") {
    val vocab = Vector("aa", "bb", "cc")
    (1 to 4).foreach { seed =>
      val r = new scala.util.Random(9100 + seed)
      val docs = (0 until 300).map { id =>
        val toks = Vector.fill(1 + r.nextInt(12))(vocab(r.nextInt(3)))
        (id.toLong, toks)
      }
      // distinct random phrases of length 1..3: duplicates like
      // ("aa","aa") arise constantly from a 3-word vocabulary
      val phrases = Seq.fill(12)(
          Seq.fill(1 + r.nextInt(3))(vocab(r.nextInt(3))))
        .distinctBy(_.mkString(" ")).take(5)
      val want = (for {
        (id, toks) <- docs
        p <- phrases
        starts = toks.indices.filter(s =>
          s + p.size <= toks.size && toks.slice(s, s + p.size) == p.toVector)
        if starts.nonEmpty
      } yield (p.mkString(" "), id) -> ((starts.size.toLong, starts.min)))
        .toMap
      val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Search.phraseMatch(df, phrases).collect()
        .map(row => (row.getString(0), row.getLong(1)) ->
          ((row.getLong(2), row.getInt(3)))).toMap
      assert(got === want, s"seed $seed: ${got.size} got vs ${want.size} want")
    }
  }
}
