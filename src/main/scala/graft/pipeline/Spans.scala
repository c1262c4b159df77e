package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicate-SPAN removal — substring-level dedup in the style of
  * "Deduplicating Training Data Makes Language Models Better"
  * (Lee et al. 2021): instead of dropping whole near-duplicate
  * documents, find every n-token span whose shingle occurs ≥ `minCount`
  * times anywhere in the corpus and scrub just those spans, keeping the
  * unique remainder of each document.
  *
  * The reference implementation builds a corpus-wide suffix array; at
  * 100 TB that is a single-machine structure. The distributed
  * re-expression is shingle-granular: positioned n-gram shingles →
  * corpus-wide occurrence counts (map-side combinable hash aggregate)
  * → equi-join back to positions → per-document interval merge
  * (gaps-and-islands over a `Window.partitionBy(doc_id)` — span counts
  * per doc are small, so the window never sees a large partition).
  * No theta joins anywhere; the only shuffles are the count aggregate
  * and the count→position equi-join on the 60-bit shingle hash.
  */
object Spans {

  /** Positioned n-token shingles `(doc_id, st, en, h)`: `st` is the
    * 0-based token index of the shingle start, `en = st + n - 1`, `h`
    * the shared 60-bit md5 hash of the space-joined shingle text. */
  private def positioned(docs: DataFrame, n: Int): DataFrame =
    TextOps.withTokens(docs)
      .where(expr(s"size(tokens) >= $n"))
      .selectExpr("doc_id", s"posexplode(${TextOps.shinglesExpr(n)}) AS (st, s)")
      .selectExpr("doc_id", "st", s"st + ${n - 1} AS en",
        s"${TextOps.hash60("s")} AS h")

  /** Merged duplicated spans per document:
    * `(doc_id, tok_start, tok_end, span_toks)` — every maximal run of
    * token positions covered by shingles occurring ≥ `minCount` times
    * corpus-wide (multiplicity counted, so within-document repetition
    * qualifies too). Overlapping AND adjacent spans merge into one
    * island, so spans are disjoint with ≥ 1 unique token between them. */
  def duplicateSpans(docs: DataFrame, n: Int, minCount: Long = 2L): DataFrame = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val pos = positioned(docs, n)
    val dup = pos.groupBy("h").count()
      .where(col("count") >= minCount).select("h")
    val spans = pos.join(dup, "h").select("doc_id", "st", "en")
    val before = Window.partitionBy(col("doc_id")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy(col("doc_id")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans
      .withColumn("prev_max", max(col("en")).over(before))
      .withColumn("is_new",
        when(col("prev_max").isNull || col("st") > col("prev_max") + 1, 1)
          .otherwise(0))
      .withColumn("grp", sum(col("is_new")).over(upTo))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("st")).as("tok_start"), max(col("en")).as("tok_end"))
      .withColumn("span_toks", col("tok_end") - col("tok_start") + 1)
      .select("doc_id", "tok_start", "tok_end", "span_toks")
  }

  /** Scrubbed corpus: every document with its duplicated spans removed
    * — `(doc_id, n_tokens, n_removed, clean_text)`, ALL documents
    * retained (zero spans ⟹ `n_removed = 0`, text normalized to
    * single-space token joins on both engines). The span relation is
    * grouped to one array per doc and removal runs as a codegen'd
    * indexed `filter` over the token array — no per-token join. */
  def scrub(docs: DataFrame, n: Int, minCount: Long = 2L): DataFrame = {
    val spanArr = duplicateSpans(docs, n, minCount)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("tok_start"), col("tok_end"))).as("spans"))
    TextOps.withTokens(docs)
      .join(spanArr, Seq("doc_id"), "left")
      .selectExpr("doc_id", "tokens",
        """CASE WHEN spans IS NULL THEN tokens
           ELSE filter(tokens, (t, i) ->
             NOT exists(spans, sp -> i >= sp.tok_start AND i <= sp.tok_end))
           END AS kept""")
      .selectExpr("doc_id",
        "size(tokens) AS n_tokens",
        "size(tokens) - size(kept) AS n_removed",
        "array_join(kept, ' ') AS clean_text")
  }
}
