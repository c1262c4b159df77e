package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a cleaned corpus and a training
  * run: concatenate documents into fixed-capacity context windows
  * ("bins") so the trainer sees dense batches instead of one padded
  * sequence per document.
  *
  * Deterministic greedy next-fit, sharded:
  *  - every doc lands in a shard by a salted hash of `doc_id`
  *    (re-run-stable, like [[Sampling]]);
  *  - within a shard, docs are scanned in `doc_id` order and appended
  *    to the current bin while they fit; a doc that would overflow
  *    `capacity` opens the next bin. A doc longer than `capacity`
  *    occupies a bin of its own (it overflows whatever is open, and the
  *    next doc overflows it in turn) — packing never truncates.
  *
  * Scale shape: greedy packing is inherently sequential *within* a
  * shard, so the shard count is the parallelism knob (pick ≫ executor
  * count at 100 TB; shard size stays O(corpus / nShards)). The plan is
  * one hash exchange on `shard` + a sort within partitions + a single
  * O(1)-memory streaming pass — no per-shard materialization, no
  * window over a whole stratum, so a shard never has to fit in memory
  * and a hot shard cannot OOM a task.
  */
object Packing {

  /** Salted shard id in [0, nShards) — same md5-derived 60-bit hash the
    * sampling/minhash contracts embed in their oracles. */
  def shardExpr(salt: String, nShards: Int): String =
    s"CAST(${TextOps.hash60(s"concat('$salt:', CAST(doc_id AS STRING))")} % $nShards AS INT)"

  /** Pack `docs` (must carry `doc_id`; token count taken from
    * `n_tok` if present, else whitespace tokens of `text`) into bins of
    * `capacity` tokens. Returns one row per doc:
    * `(doc_id, shard, n_tok, bin_id, bin_offset)` with `bin_id`
    * numbered from 0 per shard and `bin_offset` the token position the
    * doc starts at inside its bin. */
  def packGreedy(docs: DataFrame, capacity: Long, nShards: Int,
                 salt: String = "graft"): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    val nTok =
      if (docs.columns.contains("n_tok")) col("n_tok").cast("long")
      else size(split(trim(col("text")), "\\s+")).cast("long")
    docs
      .select(col("doc_id").cast("long"), nTok.as("n_tok"),
        expr(shardExpr(salt, nShards)).as("shard"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // streaming next-fit: state is (shard, bin, fill) — O(1) memory
        var curShard = -1
        var bin = 0L
        var fill = 0L
        it.map { case (docId, n, shard) =>
          if (shard != curShard) { curShard = shard; bin = 0L; fill = 0L }
          val off = if (fill > 0 && fill + n > capacity) {
            bin += 1; fill = 0L; 0L
          } else fill
          fill = off + n
          (docId, shard, n, bin, off)
        }
      }
      .toDF("doc_id", "shard", "n_tok", "bin_id", "bin_offset")
  }

  /** Packing audit per shard: bin count, doc count, token sum, and the
    * bin-capacity utilization `sum(n_tok) / (n_bins · capacity)` —
    * the number a data engineer watches to size `capacity`. */
  def packStats(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy("shard")
      .agg(
        (max("bin_id") + 1).as("n_bins"),
        count("*").as("n_docs"),
        sum("n_tok").as("n_tok"))
      .withColumn("utilization",
        graft.regrid.Rounding.r9(col("n_tok") / (col("n_bins") * lit(capacity))))
}
