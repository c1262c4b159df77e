package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution diagnostics for join/agg planning — the numbers you
  * want BEFORE launching a 1000-executor job, not after it straggles.
  */
object Diagnostics {

  /** Key-skew histogram: per-key counts bucketed by bit length
    * (⌊log₂ count⌋ + 1 — computed as `length(bin(count))`, exact
    * integer arithmetic, no float log edge cases), with per-bucket key
    * counts, row volume, the worst key's count, and each bucket's
    * share of all rows. A heavy tail in the high buckets is the
    * shuffle-straggler signature that motivates salting / AQE skew
    * handling; the report costs one count-agg (map-side combined) plus
    * a tiny bucket agg. Output:
    * `(bucket_bits, n_keys, total_rows, max_count, row_share)`. */
  def keySkewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkewReport needs at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").cast("long")).head().getLong(0)
    counts
      .withColumn("bucket_bits", length(bin(col("cnt"))).cast("int"))
      .groupBy("bucket_bits")
      .agg(count(lit(1)).as("n_keys"),
        sum("cnt").cast("long").as("total_rows"),
        max("cnt").as("max_count"))
      .withColumn("row_share", expr(
        s"floor((CAST(total_rows AS DOUBLE) / ${total}.0e0) * 1.0e9 + 0.5e0) / 1.0e9"))
  }
}
