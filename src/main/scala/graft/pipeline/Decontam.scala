package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that
  * share n-token shingles with an evaluation corpus — the standard
  * contamination filter a training-data pipeline runs before any eval
  * set is trusted (GPT-3 appendix C / Llama-style n-gram overlap).
  *
  * Scale shape: the eval corpus is small relative to training data
  * (10³–10⁶ benchmark docs vs ~10¹⁰ training docs), so its shingle set
  * is broadcast and the training side is scanned ONCE with a map-side
  * hash join — the 100 TB side is never shuffled; only the matched
  * survivors (a tiny fraction) reach the per-doc aggregate. If the
  * eval shingle set ever outgrows the broadcast threshold Spark falls
  * back to a shuffled hash join on the shingle key, which remains an
  * equi-join — no plan cliff.
  */
object Decontam {

  /** Contaminated training docs with overlap evidence:
    * `(doc_id, n_shared, n_eval_docs)` — distinct shared n-gram count
    * and the number of distinct eval documents hit. Inputs follow the
    * `documents` schema (`doc_id`, `text`). */
  def contamination(train: DataFrame, eval: DataFrame, n: Int = 5): DataFrame = {
    val ts = TextOps.shingleSet(train, n)
    val es = TextOps.shingleSet(eval, n)
      .select(col("s"), col("doc_id").as("eval_id"))
    ts.join(broadcast(es), "s")
      .groupBy("doc_id")
      .agg(countDistinct(col("s")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** The decontaminated corpus: training docs with NO shared n-gram
    * against the eval corpus (left-anti join on the flagged ids — the
    * usual "any overlap → drop" policy; threshold policies filter
    * [[contamination]] first instead). The flagged-id set skips
    * [[contamination]]'s per-doc overlap aggregates — the anti-join
    * needs only distinct ids, not evidence counts. */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int = 5): DataFrame = {
    val es = TextOps.shingleSet(eval, n).select("s")
    val flagged = TextOps.shingleSet(train, n)
      .join(broadcast(es), Seq("s"), "left_semi")
      .select("doc_id").distinct()
    train.join(flagged, Seq("doc_id"), "left_anti")
  }

  /** FUZZY (near-duplicate) decontamination: training docs whose
    * MinHash-LSH band signature collides with any eval doc's. A band
    * collision indicates high *estimated whole-document Jaccard* — the
    * "training doc IS a benchmark copy" signal — complementing
    * [[contamination]]'s any-shared-n-gram filter, which is more
    * sensitive but fires on a single common phrase (and whose eval
    * shingle set can be too large to broadcast; signatures are
    * constant-size per doc). The standard report runs both
    * (GPT-3/Llama n-gram overlap + near-dup pass). Returns
    * `(doc_id, n_bands, n_eval_docs)`: distinct colliding bands (of
    * k/rowsPerBand total — collision strength) and distinct eval
    * partners.
    *
    * Scale shape: both sides run the one-pass signature aggregate
    * ([[TextOps.minhashFromShingles]] — the train side's only shuffle,
    * map-side combined from the shingle scan); the eval band relation
    * is tiny and broadcast, so candidates are a map-side equi-join on
    * `(band, sig)` exactly like [[Dedup.minhashLsh]]'s in-corpus
    * variant. */
  def fuzzyContamination(train: DataFrame, eval: DataFrame, k: Int = 16,
                         rowsPerBand: Int = 4): DataFrame = {
    val tb = TextOps.lshBands(TextOps.minhash(train, k), rowsPerBand)
    val eb = TextOps.lshBands(TextOps.minhash(eval, k), rowsPerBand)
      .select(col("band"), col("sig"), col("doc_id").as("eval_id"))
    tb.join(broadcast(eb), Seq("band", "sig"))
      .groupBy("doc_id")
      .agg(countDistinct(col("band")).as("n_bands"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }
}
