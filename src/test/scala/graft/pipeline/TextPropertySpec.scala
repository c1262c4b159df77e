package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the text-analysis family against plain-Scala
  * replays sharing none of the Spark SQL: token stats, language ID's
  * priority arg-max, the quality-score formula, repetition ratios,
  * PII count/redaction (Java regex, the same engine family Spark's
  * regexp_replace uses), shingle fingerprints, and chunking. The
  * failure mode these catch is a silently-shifted ratio or an
  * off-by-one slice, not an error — exactly what reference replays
  * exist for. Random texts mix stopwords, synthetic words, digits,
  * punctuation, newlines, runs of whitespace, and embedded PII with
  * near-miss decoys. */
class TextPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("text-props")
    .getOrCreate()
  import spark.implicits._

  private val pieces: Vector[String] =
    Vector("the", "a", "of", "and", "to", "in", "is", "der", "und", "le",
      "les", "el", "y", "w1", "w2", "alpha", "Beta9", "42", "7.5", "...",
      "x@y.com", "no-reply@mail.example.org", "+1-555-0100", "+49-30-1234567",
      "10.0.0.1", "999.999.999.999", "1.2.3.4.5", "a@b", "+-", "--", "@", ".")

  private def genText(r: scala.util.Random): String = {
    val n = 1 + r.nextInt(60)
    val sb = new StringBuilder
    (0 until n).foreach { i =>
      if (i > 0) sb.append(r.nextInt(10) match {
        case 0 => "\n"
        case 1 => "  "
        case 2 => " \t "
        case _ => " "
      })
      sb.append(pieces(r.nextInt(pieces.size)))
    }
    sb.toString
  }

  private def docsOf(seed: Int, n: Int) = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, genText(r)))
  }

  private def toks(text: String): Array[String] = text.trim.split("\\s+")

  test("property: tokenStats equals a plain-Scala replay") {
    val rows = docsOf(31, 250)
    val got = TextOps.tokenStats(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    rows.foreach { case (id, text) =>
      val t = toks(text)
      val want = (t.length, t.distinct.length,
        text.trim.replaceAll("\\s+", "").length.toDouble / t.length)
      assert(got(id) === want, s"doc $id: '$text'")
    }
  }

  test("property: langId hit counts and priority arg-max equal a replay") {
    val rows = docsOf(32, 250)
    val got = TextOps.langId(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((1 to 5).map(r.getInt).toVector, r.getString(6))).toMap
    val langs = TextOps.langMarkers
    rows.foreach { case (id, text) =>
      val t = toks(text)
      val hits = langs.map { case (_, ws) => t.count(ws.contains) }.toVector
      val names = langs.map(_._1)
      val predicted = names.init.zipWithIndex
        .collectFirst { case (l, i)
          if (i + 1 until names.size).forall(j => hits(i) >= hits(j)) => l }
        .getOrElse(names.last)
      assert(got(id) === ((hits, predicted)), s"doc $id: '$text'")
    }
  }

  test("property: qualityScore ratios and score equal a bit-identical replay") {
    val rows = docsOf(33, 250)
    val got = TextOps.qualityScore(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val stop = TextOps.langMarkers.head._2
    rows.foreach { case (id, text) =>
      val t = toks(text)
      val stopRatio = t.count(stop.contains).toDouble / t.length
      val alphaRatio = text.count(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toDouble / text.length
      val score = math.floor((0.3 * stopRatio + 0.4 * alphaRatio +
        0.3 * (math.min(t.length, 100).toDouble / 100.0)) * 1e9 + 0.5) / 1e9
      assert(got(id) === ((text.length, t.length, stopRatio, alphaRatio, score)),
        s"doc $id: '$text'")
    }
  }

  test("property: repetitionStats equals a replay, duplicates planted") {
    val r = new scala.util.Random(34)
    // force real duplicate lines: half the docs repeat one line k times
    val rows = (0 until 200).map { i =>
      val base = genText(r)
      val text = if (i % 2 == 0) {
        val line = "dup line " + r.nextInt(3)
        (0 until 1 + r.nextInt(4)).map(_ => line).mkString("\n") + "\n" + base
      } else base
      (i.toLong, text)
    }
    val got = TextOps.repetitionStats(rows.toDF("doc_id", "text"))
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getDouble(3), x.getDouble(4)))).toMap
    rows.foreach { case (id, text) =>
      val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
      val nl = lines.length
      val nd = lines.distinct.length
      val tot = lines.map(_.length.toLong).sum
      val dist = lines.distinct.map(_.length.toLong).sum
      val dupLine = if (nl == 0) 0.0
        else math.floor((1.0 - nd.toDouble / nl.toDouble) * 1e9 + 0.5) / 1e9
      val dupChar = if (tot == 0) 0.0
        else math.floor((1.0 - dist.toDouble / tot.toDouble) * 1e9 + 0.5) / 1e9
      assert(got(id) === ((nl, nd, dupLine, dupChar)), s"doc $id")
    }
  }

  test("property: Pii counts and redaction equal a Java-regex replay (order-sensitive)") {
    val rows = docsOf(35, 300)
    val got = Pii.redact(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    def count(p: String, s: String): Int = {
      val m = java.util.regex.Pattern.compile(p).matcher(s)
      var c = 0; while (m.find()) c += 1; c
    }
    rows.foreach { case (id, text) =>
      val want = (count(Pii.emailPattern, text), count(Pii.phonePattern, text),
        count(Pii.ipv4Pattern, text),
        Pii.masks.foldLeft(text) { case (s, (p, msk)) => s.replaceAll(p, msk) })
      assert(got(id) === want, s"doc $id: '$text'")
    }
  }

  test("property: fingerprint is the lexicographic-min md5 over 5-shingles") {
    val rows = docsOf(36, 200)
    val got = TextOps.fingerprint(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { case (id, text) =>
      val t = toks(text)
      if (t.length >= 5) {
        val want = (0 to t.length - 5).map(i => md5hex(t.slice(i, i + 5).mkString(" "))).min
        assert(got(id) === want, s"doc $id")
      } else assert(!got.contains(id), s"doc $id should be filtered (${t.length} tokens)")
    }
  }

  test("property: chunkDocs windows equal a replay, overlapping and exact strides") {
    val rows = docsOf(37, 150)
    Seq((8, 8), (8, 5), (3, 1)).foreach { case (maxTok, stride) =>
      val got = TextOps.chunkDocs(rows.toDF("doc_id", "text"), maxTok, stride)
        .collect().map(r => (r.getLong(0), r.getInt(1)) ->
          ((r.getInt(2), r.getInt(3), r.getString(4)))).toMap
      val want = rows.flatMap { case (id, text) =>
        val t = toks(text)
        (0 until t.length by stride).zipWithIndex.map { case (st, ci) =>
          (id, ci) -> ((st, math.min(maxTok, t.length - st),
            t.slice(st, math.min(st + maxTok, t.length)).mkString(" ")))
        }
      }.toMap
      assert(got === want, s"maxTok=$maxTok stride=$stride")
    }
  }
}
