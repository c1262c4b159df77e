package graft.regrid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

/** The one dataflow kernel of the reference: sparse matrix–vector apply,
  * `out[d] = Σ_s W[d,s] · in[s]` (reference `xesmf/smm.py:44-95`, dot at
  * `:90`) — re-expressed as join + hash-aggregate.
  *
  * Relational form makes the reference's three kernel features free:
  *  - K2 unmapped→0: left join from the destination frame + coalesce
  *    (`unmapped_action=IGNORE`, reference `backend.py:275-280`);
  *  - K3 extra-dim broadcasting (time, lev, …): extra dims are just
  *    additional groupBy keys carried through (reference `smm.py:89-94`);
  *  - R6 multi-variable Datasets: one pass aggregating several value
  *    columns at once (reference `frontend.py:448-511`).
  *
  * Scale shape: the weights side is `broadcast()` when small (the exact
  * analog of the reference's dask strategy "replicate W to every chunk,
  * partition the field over extra dims", `frontend.py:375-389`); for
  * huge grids pass `broadcastWeights = false` and the plan becomes a
  * shuffled hash join keyed on source cell, with map-side partial
  * aggregation before the groupBy shuffle.
  */
object Apply {

  /** @param weights   (row, col, s)
    * @param field     (cell_id, [extraDims...], [valueCols...])
    * @param destCells destination relation with a `cell_id` column; one
    *                  output row per destination (× extra-dim combo)
    * @param extraDims names of extra dimension columns in `field`
    * @param valueCols names of value columns to regrid (≥ 1)
    * @param roundDigits decimals kept on output values (oracle parity);
    *                    pass 0 to disable rounding
    */
  def regrid(weights: DataFrame, field: DataFrame, destCells: DataFrame,
             extraDims: Seq[String] = Nil,
             valueCols: Seq[String] = Seq("value"),
             broadcastWeights: Boolean = true,
             roundDigits: Int = 9,
             validate: Boolean = false): DataFrame = {
    // V4 shape contract (reference `smm.py:77-86`): every weight column
    // must reference a source cell present in the field; a mismatched
    // field would otherwise silently contribute zeros. Opt-in — costs
    // one anti-join count at plan time.
    if (validate) {
      val dangling = Validate.danglingWeightCols(weights, field.select(col("cell_id")))
      require(dangling == 0,
        s"weights reference $dangling source cells absent from the field " +
          "(shape contract, reference smm.py:77-86)")
    }
    val w0 = weights.select(col("row"), col("col"), col("s"))

    // K2 (unmapped → 0) at WEIGHTS cardinality, not output cardinality:
    // destinations with no weights get one zero-weight triplet against
    // an arbitrary existing source cell, so the join-agg below emits
    // every (dest × extra-dim combo) with value 0.0 — no outer join
    // against the (dest × slabs)-sized output frame. At 500 slabs that
    // turns a 60M-row join into a 120k-row anti-join at plan time.
    // Assumes a dense field (every source cell present per slab), which
    // is the reference's own data model (flattened dense arrays,
    // smm.py:89).
    // any existing source cell works as the zero-weight anchor; take it
    // from the weights relation (small) rather than scanning the field.
    // An EMPTY weights relation (fully non-overlapping grids) would
    // yield a NULL anchor and an empty output instead of the promised
    // all-zero frame — fall back to one arbitrary field cell (limit(1)
    // reads a single partition, not the whole field).
    val anyCol = broadcast(
      w0.select(col("col"))
        .unionByName(field.select(col("cell_id").as("col")).limit(1))
        .select(min(col("col")).as("col")))
    val padding = destCells.select(col("cell_id").as("row"))
      .join(w0.select("row").distinct(), Seq("row"), "left_anti")
      .crossJoin(anyCol)
      .withColumn("s", lit(0.0))
    val padded = w0.unionByName(padding)
    val w = if (broadcastWeights) broadcast(padded) else padded

    def finish(c: Column): Column = {
      val r = if (roundDigits > 0) Rounding.roundN(c, roundDigits) else c
      coalesce(r, lit(0.0))
    }

    // No pre-shuffle of the field: an earlier variant repartitioned by
    // the extra dims so the groupBy's partial agg combined fully, but
    // interleaved best-of-3 measurement at the bench workload (500
    // slabs × 240k cells, local[32]) showed the extra full-field
    // shuffle is a consistent ~40% net loss vs letting the partial agg
    // under-combine (7.2 s vs 10.2 s) — the broadcast join itself needs
    // no shuffle at all, so the repartition was pure added cost. For
    // dense raster fields the slab path ([[regridSlabbed]]) remains the
    // fast route (same workload: 1.0 s, +0.5 s to explode back to
    // relational rows).
    field
      .join(w, field("cell_id") === w("col"))
      .groupBy(col("row") +: extraDims.map(col): _*)
      .agg(
        sum(col("s") * col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(v => sum(col("s") * col(v)).as(v)): _*)
      .select(
        (col("row").as("cell_id") +: extraDims.map(col)) ++
          valueCols.map(v => finish(col(v)).as(v)): _*)
  }

  /** Convert a tall field `(cell_id, extraDims..., value)` to slab-major
    * dense layout: one row per extra-dim combo carrying the whole
    * horizontal field as `values ARRAY<DOUBLE>` (index = cell_id).
    *
    * This is the Spark-native analog of the dense arrays the reference
    * operates on (and of Spark ML's vector columns): for raster data the
    * per-value relational row is the WRONG storage at scale — 500 slabs
    * × 240k cells is 120M rows but only 500 × 1.9 MB arrays. The
    * conversion is one shuffle; do it once and cache. */
  def toSlabs(field: DataFrame, nIn: Int, extraDims: Seq[String]): DataFrame = {
    require(extraDims.nonEmpty, "slab layout needs at least one extra dim")
    field
      .groupBy(extraDims.map(col): _*)
      .agg(collect_list(struct(col("cell_id"), col("value"))).as("kv"))
      .select(extraDims.map(c => col(c).cast("long")) :+
        expr(s"transform(array_sort(kv), x -> x.value)").as("values"): _*)
  }

  /** Slab-vectorized apply — the reference's own distribution strategy
    * (O6/P1, `frontend.py:375-389`: partition over extra dims, replicate
    * the full W to every chunk, run a dense local kernel per chunk).
    *
    * Weights are collected once into primitive COO arrays and broadcast
    * (1M triplets ≈ 24 MB — the same "every dask chunk sees all of W"
    * memory bar the reference sets). Each task then scatters
    * `out[row] += s·in[col]` over its slabs at memory speed — the exact
    * kernel and layout of the reference's scipy path (`smm.py:90`).
    *
    * Use for dense raster fields with many slabs; use [[regrid]] when
    * the field is genuinely sparse/relational or W is too large to
    * replicate.
    *
    * @param slabs output of [[toSlabs]]: (extraDims..., values)
    * @return same layout on the destination grid; unmapped dests 0.0
    */
  /** @param slabs (slab_id LONG, values ARRAY<DOUBLE>) — pack multiple
    *              extra dims into `slab_id` relationally (cheap: one
    *              projection over #slabs rows)
    * @return (slab_id, values) on the destination grid */
  def regridSlabbed(weights: DataFrame, slabs: DataFrame, nOut: Int): DataFrame =
    new SlabApplier(weights, nOut).apply(slabs)
}

/** Reusable dense-slab regrid kernel: the weights relation is collected
  * into primitive COO arrays ONCE, at construction, and broadcast for
  * the applier's lifetime — exactly the reference's model, where
  * `Regridder.__init__` loads the scipy COO matrix into RAM once
  * (`smm.py:34-41`) and every apply is just the dot (`smm.py:90`).
  *
  * The replicate-W memory bar is the same one the reference's dask path
  * sets ("every chunk sees the full W", `frontend.py:375-389`):
  * ~20 bytes/triplet, asserted below so the ceiling is explicit rather
  * than an executor OOM. For weights beyond the bar, use the shuffled
  * relational [[Apply.regrid]].
  */
object SlabApplier {
  /** Replicate-W ceiling derived from the driver's max heap instead of
    * a fixed constant: the COO arrays cost 20 B/triplet resident plus a
    * transient per-partition copy during collect, so cap at ~25% of max
    * heap at 24 B/triplet (64 GiB heap → ~700 M triplets; default sbt
    * 8 GiB → ~90 M). Overridable per instance for testing. */
  def defaultMaxTriplets: Long = Runtime.getRuntime.maxMemory / 4 / 24
}

final class SlabApplier(weights: DataFrame, val nOut: Int,
                        maxTriplets: Long = SlabApplier.defaultMaxTriplets) {
  private val spark = weights.sparkSession

  private val bw = {
    // one aggregate pass yields the triplet count AND the index-range
    // contract: rows must land in [0, nOut), row/col must fit in Int —
    // otherwise the non-ANSI int cast below would silently wrap and the
    // scatter kernel would either throw a bare ArrayIndexOutOfBounds or
    // write the wrong destination cell
    val st = weights.agg(
      count(lit(1)), min(col("row").cast("long")), max(col("row").cast("long")),
      min(col("col").cast("long")), max(col("col").cast("long"))).head()
    val nW = st.getLong(0)
    require(nW <= math.min(maxTriplets, Int.MaxValue.toLong),
      s"weights relation has $nW triplets > replicate-W ceiling $maxTriplets " +
        "(~25% of driver heap at 24 B/triplet, and Int-indexed arrays cap at 2^31); " +
        "use the shuffled relational Apply.regrid instead")
    val parts: Array[(Array[Int], Array[Int], Array[Double])] =
      if (nW == 0) Array.empty
      else {
        require(st.getLong(1) >= 0 && st.getLong(2) < nOut,
          s"weights reference destination rows [${st.getLong(1)}, ${st.getLong(2)}] " +
            s"outside [0, $nOut) (shape contract, reference smm.py:77-86)")
        require(st.getLong(3) >= 0 && st.getLong(4) <= Int.MaxValue,
          s"weights reference source cols [${st.getLong(3)}, ${st.getLong(4)}] " +
            "outside [0, 2^31) — the dense slab kernel indexes slabs with Int")
        import spark.implicits._
        // per-partition primitive arrays: the collect moves 20 B/triplet,
        // not millions of boxed Row objects
        weights.select(col("row").cast("int"), col("col").cast("int"), col("s"))
          .as[(Int, Int, Double)]
          .mapPartitions { it =>
            val rb = Array.newBuilder[Int]
            val cb = Array.newBuilder[Int]
            val sb = Array.newBuilder[Double]
            it.foreach { t => rb += t._1; cb += t._2; sb += t._3 }
            Iterator.single((rb.result(), cb.result(), sb.result()))
          }
          .collect()
      }
    val rowA = new Array[Int](nW.toInt)
    val colA = new Array[Int](nW.toInt)
    val sA = new Array[Double](nW.toInt)
    var off = 0
    parts.foreach { case (r, c, s) =>
      System.arraycopy(r, 0, rowA, off, r.length)
      System.arraycopy(c, 0, colA, off, c.length)
      System.arraycopy(s, 0, sA, off, s.length)
      off += r.length
    }
    spark.sparkContext.broadcast((rowA, colA, sA))
  }

  private var closed = false

  /** Release the broadcast weight arrays (the analog of the reference's
    * `esmf_regrid_finalize`, `backend.py:333-357` — it too frees the
    * native regrid object once the weights are extracted). The applier
    * is unusable afterwards; closing twice is a no-op (Closeable
    * convention) rather than a broadcast-validity error. */
  def close(): Unit = if (!closed) { closed = true; bw.destroy() }

  /** @param slabs (slab_id LONG, values ARRAY<DOUBLE>)
    * @return (slab_id, values) on the destination grid; unmapped 0.0 */
  def apply(slabs: DataFrame): DataFrame = {
    import spark.implicits._
    val n = nOut
    val b = bw
    // typed Dataset: ArrayType decodes to primitive Array[Double]
    // (no per-element boxing, unlike Row.getSeq)
    slabs.select(col("slab_id").cast("long"), col("values"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (rw, cl, sv) = b.value
        // V4 shape contract for the dense path: every weight column
        // must index into the slab (reference smm.py:77-86); report the
        // offending slab instead of a bare ArrayIndexOutOfBounds
        var maxCol = -1
        var m = 0
        while (m < cl.length) { if (cl(m) > maxCol) maxCol = cl(m); m += 1 }
        it.map { case (k, inA) =>
          if (inA.length <= maxCol)
            throw new IllegalArgumentException(
              s"slab $k has ${inA.length} values but weights reference source cell $maxCol " +
                "(shape contract, reference smm.py:77-86)")
          val out = new Array[Double](n)
          var j = 0
          while (j < rw.length) { out(rw(j)) += sv(j) * inA(cl(j)); j += 1 }
          (k, out)
        }
      }
      .toDF("slab_id", "values")
  }
}
