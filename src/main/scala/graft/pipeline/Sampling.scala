package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing — the "data recipe" step of
  * a training pipeline: per-source (stratified) rates for mixture
  * weighting, and exact fixed-size draws per stratum for eval splits.
  *
  * Both are hash-derived from (salt, doc_id), so a re-run — or a run
  * over a corpus with rows added — keeps every previously-sampled
  * decision stable without storing any state. No RNG, no
  * `TABLESAMPLE`-style partition dependence.
  */
object Sampling {

  /** Deterministic uniform draw in [0, 1e6): the shared 60-bit md5 hash
    * of (salt, doc_id), reduced mod 10⁶. Embedded identically in the
    * SQL oracle. */
  def uExpr(salt: String): String =
    s"${TextOps.hash60(s"concat('$salt:', CAST(doc_id AS STRING))")} % 1000000"

  /** Per-stratum Bernoulli sample at the given per-source rates.
    * A codegen'd filter — zero shuffles, the 100 TB-scale shape (the
    * sample decision never leaves the scan stage). Sources absent from
    * `rates` are dropped (rate 0). */
  def stratified(docs: DataFrame, rates: Map[String, Double],
                 salt: String = "graft"): DataFrame = {
    require(rates.nonEmpty, "stratified sample needs at least one source rate")
    val thr = rates.toSeq.sortBy(_._1).map { case (src, r) =>
      require(r >= 0.0 && r <= 1.0, s"rate for '$src' outside [0, 1]: $r")
      s"WHEN '$src' THEN ${math.round(r * 1e6)}L"
    }.mkString("CASE source ", " ", " ELSE 0L END")
    docs.where(expr(s"${uExpr(salt)} < $thr"))
  }

  /** Exactly-k-per-stratum draw, deterministic rank order:
    * `(…, rank)` with rank 1..k by the hash draw (ties broken by
    * doc_id — total order, so both engines pick identical rows).
    *
    * Scale shape: a single `Window.partitionBy(source)` would sort an
    * ENTIRE stratum in one task (a 10¹⁰-doc source = one straggler), so
    * the draw runs in two exact levels: per-(input-partition, source)
    * top-k first — group sizes bounded by the scan partition size, and
    * every global top-k row survives its own subgroup's top-k — then
    * the true top-k over the ≤ k·P survivors. */
  def perStratumTopK(docs: DataFrame, k: Int,
                     salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = expr(uExpr(salt))
    val local = Window.partitionBy(col("pid"), col("source"))
      .orderBy(col("u"), col("doc_id"))
    val global = Window.partitionBy(col("source"))
      .orderBy(col("u"), col("doc_id"))
    docs
      .withColumn("u", u).withColumn("pid", spark_partition_id())
      .withColumn("lrank", row_number().over(local))
      .where(col("lrank") <= k)
      .withColumn("rank", row_number().over(global))
      .where(col("rank") <= k)
      .drop("u", "pid", "lrank")
  }

  /** Deterministic train/val/test split assignment: the same stateless
    * hash draw as [[stratified]], cut at per-mille thresholds —
    * `(…, u, split)` with split ∈ {train, val, test}. Assignment is a
    * pure projection (zero shuffles, the decision never leaves the scan
    * stage) and is stable under re-runs and corpus growth: adding docs
    * never reassigns an existing one, the property that keeps eval
    * sets uncontaminated across corpus versions. */
  def splitAssign(docs: DataFrame, salt: String = "graft",
                  trainPermille: Int = 980, valPermille: Int = 10): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      s"per-mille cuts must be non-negative and sum <= 1000, " +
        s"got train=$trainPermille val=$valPermille")
    docs
      .withColumn("u", expr(uExpr(salt)))
      .withColumn("split",
        when(col("u") < trainPermille * 1000L, "train")
          .when(col("u") < (trainPermille + valPermille) * 1000L, "val")
          .otherwise("test"))
  }
}
