package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two paths, mirroring the candidate-join pattern used everywhere in
  * this engine:
  *  - brute-force cosine (exact; probe set × corpus — fine when the
  *    probe side is small or broadcastable; the correctness baseline);
  *  - sign-bucket IVF (approximate; equi-join on a coarse quantization
  *    bucket — the 100 TB path: each probe only scans its own bucket).
  *
  * All arithmetic in double after an explicit element cast, folded
  * left-to-right, so the SQL oracle reproduces the exact bits.
  */
object Similarity {

  /** Spark SQL: dot product of two DOUBLE array columns, sequential fold. */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  /** Spark SQL: cast ARRAY<FLOAT> to ARRAY<DOUBLE>. */
  def toDouble(e: String): String = s"transform($e, x -> CAST(x AS DOUBLE))"

  /** Rounded cosine from a pair dot product and precomputed norms.
    * Norm precompute matters: it turns 3 array folds per PAIR into one
    * fold per pair + one per VECTOR (sqrt(dot(v,v)) is the same double
    * either way, so oracle parity is unaffected). */
  def cosFromNorms(dot: String, na: String, nb: String): String =
    s"floor((($dot) / ($na * $nb)) * 1.0e9 + 0.5e0) / 1.0e9"

  private def vecs(emb: DataFrame, as: String): DataFrame =
    emb.selectExpr(s"vec_id AS ${as}_id", s"${toDouble("embedding")} AS ${as}_v")
      .selectExpr(s"${as}_id", s"${as}_v",
        s"sqrt(${dotExpr(s"${as}_v", s"${as}_v")}) AS ${as}_nrm")

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Exact but quadratic — the oracle-checkable baseline; use
    * [[ivfTopK]] for corpus-scale. */
  def nearDupPairs(emb: DataFrame, minCos: Double): DataFrame =
    vecs(emb, "a").join(vecs(emb, "b"), col("a_id") < col("b_id"))
      .selectExpr("a_id AS a", "b_id AS b",
        s"${cosFromNorms(dotExpr("a_v", "b_v"), "a_nrm", "b_nrm")} AS cos")
      .filter(col("cos") >= minCos)

  /** Exact cosine top-k for a probe subset against the full corpus. */
  def bruteTopK(emb: DataFrame, probeFilter: String, k: Int): DataFrame = {
    val cand = vecs(emb.filter(expr(probeFilter)), "q")
      .join(vecs(emb, "n"), col("q_id") =!= col("n_id"))
      .selectExpr("q_id AS query_id", "n_id AS neighbor_id",
        s"${cosFromNorms(dotExpr("q_v", "n_v"), "q_nrm", "n_nrm")} AS cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sign-bucket expression: the first `bits` dims quantized to their
    * sign bit — a 2^bits-cell coarse IVF partition of the sphere. */
  def bucketExpr(v: String, bits: Int): String =
    (0 until bits).map(i =>
      s"CASE WHEN element_at($v, ${i + 1}) > 0.0 THEN ${1L << i} ELSE 0 END")
      .mkString("(", " + ", ")")

  /** Approximate top-k: probes only scan their own sign bucket.
    * Equi-join on the bucket id → shuffle-partitioned, corpus-scale.
    * Recall loss is the standard IVF nprobe=1 tradeoff. */
  def ivfTopK(emb: DataFrame, probeFilter: String, k: Int, bits: Int = 6): DataFrame = {
    val withB = (as: String) => vecs(emb, as)
      .withColumn("bucket", expr(bucketExpr(s"${as}_v", bits)))
    val cand = withB("q").filter(expr(probeFilter.replace("vec_id", "q_id")))
      .join(withB("n").withColumnRenamed("bucket", "n_bucket"),
        col("bucket") === col("n_bucket") && col("q_id") =!= col("n_id"))
      .selectExpr("q_id AS query_id", "n_id AS neighbor_id",
        s"${cosFromNorms(dotExpr("q_v", "n_v"), "q_nrm", "n_nrm")} AS cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
