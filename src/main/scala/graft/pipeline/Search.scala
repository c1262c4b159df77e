package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus keyword search: Okapi BM25 scoring with an exact top-k cut —
  * the retrieval primitive behind quality-by-example mining and
  * targeted corpus inspection at training-data scale.
  *
  * Scale shape: the query-term filter runs inside the scan projection
  * (a codegen'd `filter` over the token array — the 100 TB corpus is
  * scanned once and only matching docs survive), document frequencies
  * are a tiny per-term aggregate broadcast back onto the matches, and
  * the global top-k is a `TakeOrdered` (never a full sort).
  *
  * Cross-engine parity is by construction: per-(doc, term) scores are
  * quantized to integer micro-units (`floor(x·10⁶ + 0.5)`) and summed
  * as BIGINTs — order-independent exact sums, the same trick as
  * [[Clustering]] — so the oracle hash-matches without tolerance. The
  * only transcendental is `ln` on identical double inputs.
  */
object Search {

  /** Render a Scala double as a DuckDB DOUBLE literal (decimal literals
    * without an exponent parse as DECIMAL there and change arithmetic). */
  def dlit(x: Double): String = {
    val s = x.toString
    if (s.contains("e") || s.contains("E")) s else s + "e0"
  }

  /** BM25 constants of the contract query — shared with the SQL oracle
    * builder so both engines fold the identical doubles. */
  val k1: Double = 1.2
  val b: Double = 0.75
  val k1p1: Double = k1 + 1.0

  /** Top-`k` documents by BM25 score over `terms`:
    * `(doc_id, score, rank)`, rank 1..k by exact integer-quantized
    * score, ties broken by doc_id — a total order, so both engines pick
    * identical rows. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = TextOps.withTokens(docs)
      .selectExpr("doc_id", "tokens", "size(tokens) AS dl")

    val termList = terms.map(t => s"'$t'").mkString(", ")
    val tf = toks
      .selectExpr("doc_id", "dl", s"filter(tokens, t -> t IN ($termList)) AS qt")
      .where("size(qt) > 0")
      .selectExpr("doc_id", "dl", "explode(qt) AS term")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // corpus scalars (N, total tokens): LAZY — no action inside query
    // construction. The corpus reduces to a per-doc-length histogram
    // (map-side combined, ~hundreds of rows), which is unioned under
    // the per-term df relation so the totals ride every term row via a
    // whole-relation window over that tiny union — the house one-row-
    // totals shape (a constant-key cross join would constant-fold into
    // a nested loop). avgdl is then ratio-of-exact-integers on both
    // engines — identical IEEE division, no rounding needed.
    val hist = toks.groupBy("dl").agg(count(lit(1)).as("c"))
    val whole = Window.partitionBy()
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"),
        lit(null).cast("long").as("dl"), lit(null).cast("long").as("c"))
      .unionByName(hist.select(lit(null).cast("string").as("term"),
        lit(null).cast("long").as("df"), col("dl").cast("long").as("dl"), col("c")))
      .withColumn("n", sum(col("c")).over(whole))
      .withColumn("tot", sum(expr("dl * c")).over(whole))
      .filter(col("term").isNotNull)
      .select("term", "df", "n", "tot")

    // unhinted (r9): df is O(vocabulary) — broadcastable for a corpus's
    // ~1e5 frequent terms, not for a 1e8-term open vocabulary; AQE
    // broadcasts when the aggregate's runtime size fits, shuffles when
    // it doesn't (plain equi-join on term either way)
    val scored = tf.join(df, "term")
      .withColumn("sq", expr(
        s"""CAST(floor((ln(1.0e0 + (CAST(n AS DOUBLE) - df + 0.5e0) / (df + 0.5e0))
            * (tf * ${dlit(k1p1)})
            / (tf + ${dlit(k1)} * (1.0e0 - ${dlit(b)} + ${dlit(b)} * dl
               / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))))
            * 1.0e6 + 0.5e0) AS BIGINT)"""))
      .groupBy("doc_id").agg(sum(col("sq")).as("score_u"))

    scored
      .orderBy(col("score_u").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_u").desc, col("doc_id"))).cast("int"))
      .selectExpr("doc_id", "CAST(score_u AS DOUBLE) / 1.0e6 AS score", "rank")
  }

  /** Exact positional phrase search over the token streams — the
    * inverted-index complement of [[bm25TopK]]'s bag-of-words scoring:
    * for every phrase, each document containing its tokens CONSECUTIVELY,
    * with occurrence count and first position. Returns
    * `(phrase, doc_id, n_matches, first_pos)`.
    *
    * Plan: ONE positional-postings projection (posexplode, filtered to
    * the union of all phrase terms while still in the scan stage — the
    * corpus is read once and only query-term positions survive), a
    * broadcast equi-join against the tiny (phrase, offset, term)
    * relation, and two hash aggs: a position `start = i − k` groups to
    * a match iff all `plen` offsets are present (each position can
    * satisfy an offset at most once, so `count(*) = plen` is exact even
    * for phrases with repeated terms), then matches group per doc. No
    * self-joins: an m-term phrase costs m posting rows per query-term
    * hit, never a postings×postings product — the standard adjacency
    * reduction over a positional inverted index. */
  def phraseMatch(docs: DataFrame, phrases: Seq[Seq[String]]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty), "need non-empty phrases")
    require(phrases.map(_.mkString(" ")).distinct.size == phrases.size,
      s"duplicate phrases: $phrases")
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = phrases.flatMap { p =>
      p.zipWithIndex.map { case (w, k) => (p.mkString(" "), k, w, p.size) }
    }.toDF("phrase", "k", "term", "plen")
    val vocab = phrases.flatten.distinct
    val postings = TextOps.withTokens(docs)
      .select(col("doc_id"), posexplode(col("tokens")).as(Seq("i", "t")))
      .filter(col("t").isin(vocab: _*))
    postings.join(broadcast(terms), col("t") === col("term"))
      .select(col("phrase"), col("plen"), col("doc_id"),
        (col("i") - col("k")).as("start"))
      .filter(col("start") >= 0)
      .groupBy("phrase", "plen", "doc_id", "start")
      .agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === col("plen"))
      .groupBy("phrase", "doc_id")
      .agg(count(lit(1)).as("n_matches"), min("start").cast("int").as("first_pos"))
  }
}
