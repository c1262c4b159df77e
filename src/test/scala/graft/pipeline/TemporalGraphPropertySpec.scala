package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the temporal joins and graph operators against
  * BRUTE-FORCE truth on random inputs (fixed seeds, several cases per
  * property). These operators carry the subtlest plan rewrites in the
  * engine — union-tag windows, time-bucket splits with carry-forward
  * summaries, degree orientation, integer fixed-point — so each is
  * checked against a driver-side reference implementation that shares
  * none of the rewrite: per-row argmax scans for as-of, naive interval
  * filters for range join, triple enumeration for triangles, and a
  * literal integer replay for PageRank (bit-exact, not approximate). */
class TemporalGraphPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("temporal-graph-props")
    .getOrCreate()
  import spark.implicits._

  private val cases = 4

  test("property: asofJoin equals per-row argmax truth; bucketed equals plain at any width") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(3100 + seed)
      // coarse timestamps force plenty of ties; tie-break on rid
      val left = (0 until 300).map(i =>
        (i.toLong, (r.nextInt(5) + 1).toLong, r.nextInt(200).toLong * 5))
      val right = (0 until 200).map(i =>
        (i.toLong, (r.nextInt(5) + 1).toLong, r.nextInt(200).toLong * 5))
      val lDf = left.toDF("lid", "k", "t")
      val rDf = right.toDF("rid", "k", "rt")
      val got = Temporal.asofJoin(lDf, rDf, "k", "k", "t", "rt",
          tieBreak = "rid", payload = Seq("rid"))
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
      left.foreach { case (lid, k, t) =>
        val want = right.filter(c => c._2 == k && c._3 <= t)
          .sortBy(c => (c._3, c._1)).lastOption.map(_._1)
        assert(got(lid) === want, s"seed $seed lid $lid")
      }
      // bucketed variant: identical rows at ANY width (sub-spread,
      // spread-sized, and one-giant-bucket regimes)
      Seq(7L, 64L, 1000L, 1000000L).foreach { w =>
        val b = Temporal.asofJoinBucketed(lDf, rDf, "k", "k", "t", "rt",
            "rid", Seq("rid"), bucketWidth = w)
          .collect().map(row => row.getLong(0) ->
            (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
        assert(b === got, s"seed $seed width $w diverges from plain as-of")
      }
    }
  }

  test("property: rangeJoin equals the naive interval filter, any bucket width") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(4200 + seed)
      val pts = (0 until 250).map(i =>
        (i.toLong, (r.nextInt(4) + 1).toLong, r.nextInt(1000).toLong * 1000000L))
      val ivs = (0 until 120).map { i =>
        val s = r.nextInt(1000).toLong * 1000000L
        // includes EMPTY (len 0) and long intervals
        (i.toLong, (r.nextInt(4) + 1).toLong, s, s + r.nextInt(120).toLong * 1000000L)
      }
      val pDf = pts.toDF("pid", "k", "tu")
        .selectExpr("pid", "k", "timestamp_micros(tu) AS pt")
      val iDf = ivs.toDF("iid", "k", "su", "eu")
        .selectExpr("iid", "k", "timestamp_micros(su) AS st", "timestamp_micros(eu) AS en")
      val want = (for {
        (pid, pk, tu) <- pts
        (iid, ik, su, eu) <- ivs
        if pk == ik && tu >= su && tu < eu
      } yield (pid, iid)).toSet
      Seq(1L, 7L, 50L).foreach { bucketSec =>
        val got = Temporal.rangeJoin(pDf, iDf, "k", "k", "pt", "st", "en",
            bucketSec = bucketSec)
          .select("pid", "iid").collect().map(row => (row.getLong(0), row.getLong(1))).toSet
        assert(got === want, s"seed $seed bucketSec $bucketSec: " +
          s"${(got diff want).size} extra, ${(want diff got).size} missing")
      }
    }
  }

  test("property: triangleStats equals brute-force triple enumeration on random graphs") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(5300 + seed)
      val n = 25
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n
        if r.nextDouble() < 0.25
      } yield (a.toLong, b.toLong))
      val adj = edges.toSet
      def connected(x: Long, y: Long) = adj((x min y, x max y))
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val wantTri = nodes.map { v =>
        val nb = nodes.filter(u => u != v && connected(u, v))
        v -> nb.combinations(2).count { case Seq(x, y) => connected(x, y) }
      }.toMap
      val wantDeg = nodes.map(v => v -> nodes.count(u => u != v && connected(u, v))).toMap
      // default takes the small-graph driver path; smallMax = 0 forces
      // the distributed orientation DAG — both against brute force
      val got = Graphs.triangleStats(edges.toDF("a", "b"))
        .collect().map(row => row.getLong(0) ->
          (row.getLong(1), row.getLong(2), row.getDouble(3))).toMap
      val gotDag = Graphs.triangleStats(edges.toDF("a", "b"), smallMax = 0L)
        .collect().map(row => row.getLong(0) ->
          (row.getLong(1), row.getLong(2), row.getDouble(3))).toMap
      assert(got === gotDag, s"seed $seed: fast path != distributed DAG")
      assert(got.keySet === nodes.toSet, s"seed $seed node set")
      nodes.foreach { v =>
        val (deg, tri, clus) = got(v)
        assert(deg === wantDeg(v).toLong, s"seed $seed deg($v)")
        assert(tri === wantTri(v).toLong, s"seed $seed tri($v)")
        val wantClus = if (deg < 2) 0.0
          else math.floor((2.0 * tri / (deg.toDouble * (deg - 1))) * 1e9 + 0.5) / 1e9
        assert(clus === wantClus, s"seed $seed clustering($v)")
      }
    }
  }

  test("property: pageRankFixedPoint bit-equals a driver-side integer replay") {
    (1 to cases).foreach { seed =>
      val r = new scala.util.Random(6400 + seed)
      val n = 20
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n
        if r.nextDouble() < 0.3
      } yield (a.toLong, b.toLong))
      val iters = 3 + r.nextInt(5)
      // default takes the small-graph driver path for 20 nodes;
      // smallMax = 0 forces the distributed loop — BOTH must bit-equal
      // the literal replay below (and therefore each other)
      val fastDf = Graphs.pageRankFixedPoint(edges.toDF("a", "b"), iters)
      val loopDf = Graphs.pageRankFixedPoint(edges.toDF("a", "b"), iters,
        smallMax = 0L)
      val got = fastDf.collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      val gotLoop = loopDf.collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got === gotLoop, s"seed $seed iters $iters: fast path != loop")
      // literal replay of the documented integer recurrence
      val directed = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      val out = directed.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
      val ns = out.keys.toSeq.sorted
      val base = (Graphs.PrScale * 15L / 100L) / ns.size
      var pr = ns.map(_ -> Graphs.PrScale / ns.size).toMap
      (1 to iters).foreach { _ =>
        val contrib = directed.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (src, _) => pr(src) / out(src) }.sum
        }
        pr = ns.map(v => v -> (base + contrib.getOrElse(v, 0L) * 85L / 100L)).toMap
      }
      assert(got === pr, s"seed $seed iters $iters: fixed-point mismatch")
    }
  }
}
