package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual IMAGE near-duplicate detection — the visual analog of
  * [[Dedup.simhashNearDup]] (r15 verdict #4): re-encoded or resized
  * copies of an image carry different BYTES (exact dedup, X1, is
  * blind to them) but the same low-frequency CONTENT, so a tiny
  * fixed-size raster sampled from the decoded pixels hashes to the
  * same (or nearly the same) signature.
  *
  * Pipeline shape (all REAL codec work — ImageIO PNG encode/decode,
  * nearest-neighbor resampling on actual pixel arrays):
  *
  *  1. decode the payload (one reader per partition, the
  *     [[Multimodal]] batch discipline);
  *  2. DOWNSAMPLE to a fixed 8×8 tiny raster by nearest-neighbor at
  *     the grid points `(⌊j·w/8⌋, ⌊i·h/8⌋)` — scale-invariant by
  *     construction: any image of the same content at any resolution
  *     samples to (approximately) the same raster;
  *  3. dHash the raster: 56 bits, bit `i·7+j` = [gray(i,j+1) >
  *     gray(i,j)] — gradient SIGNS, robust to uniform brightness
  *     shifts, cheap to compare;
  *  4. pigeonhole band join: the 56-bit signature splits into 2
  *     bands × 28 bits; two signatures within Hamming distance 1
  *     MUST agree on one whole band (1 differing bit cannot touch
  *     both), so the per-band chunk equi-join provably misses
  *     nothing — the [[Dedup.simhashNearDup]] machinery on the
  *     image-hash domain;
  *  5. Hamming verify on the candidate pairs (`bit_count(xor)`,
  *     codegen'd — pixels are never touched again).
  *
  * Scale shape: encode/decode/hash are one per-partition batch pass
  * each (linear, no shuffle); the only shuffles are the 2-row-per-
  * image band exchange and the candidate join — at 10⁹ images the
  * candidate volume is the planted-near-dup density times corpus
  * size, never all-pairs, because random 28-bit band agreement is
  * ~4·10⁻⁹ (measured zero random candidates at the bench scale —
  * pinned in scalatest).
  *
  * Fixture (the q_multimodal_gradient discipline — deterministic
  * pixels make the oracle closed-form): each document synthesizes an
  * 8×8 BLOCK-pattern PNG — block (i,j) solid-filled with the Knuth
  * mix `(h + (8i+j+1)·2654435761) mod 2²⁴` of the doc's content hash
  * — at hash-derived block scale (sx, sy ∈ {2,4,6} pixels), so the
  * tiny-raster grid points land exactly one per block and the
  * perceptual hash is EXACTLY invariant under the 2× resize. Planted
  * copies:
  *  - every 25th doc: a RESIZED re-encode (decode → 2× nearest-
  *    neighbor downscale on real pixels → PNG re-encode), id
  *    −2·doc_id−1 — different bytes, identical signature (Hamming 0);
  *  - every 40th doc: a PERTURBED re-encode (decode → +128 mod 256 on
  *    the blue channel of block (h mod 8, 0) → re-encode), id
  *    −2·doc_id−2 — a one-block edit that moves at most the single
  *    dHash bit (h mod 8)·7, the Hamming-≤1 regime the band join's
  *    radius is sized for.
  *
  * Reference analog: xESMF has no image operators — this extends the
  * LLM-training-data surface (SURVEY §2.7) beside X35's SimHash text
  * near-dup; the band-join completeness argument is the same
  * pigeonhole statement as `Dedup.simhashNearDup` (Dedup.scala:181).
  */
object ImageDedup {

  /** Solid fill of block `b` (row-major, b = 8·i + j) for content
    * hash `h`: the Knuth mix reduced mod the prime 1000003, then
    * SQUARED mod the same prime — mirrored literally by the SQL
    * oracle. Gray for hashing is the BLUE channel (`rgb & 0xff`).
    *
    * Why the square: the bare mix `(h + (b+1)·K) mod 2²⁴` is an
    * arithmetic progression whose residue mod 256 (the gray channel)
    * depends only on `h mod 256` — measured: 500 distinct-hash docs
    * produced only ~256 distinct dHashes and 2,725 spurious
    * hamming-0 pairs. Reducing mod a prime then squaring mixes the
    * high bits of the progression into the low byte (quadratic
    * residues scatter mod 256), so images collide only when
    * `h mod 1000003` collides — identical IMAGES, which a near-dup
    * pass rightly reports, at ~10⁻⁶ per pair. */
  def blockRgb(h: Long, b: Int): Int = {
    val v = (h + (b + 1).toLong * 2654435761L) % 1000003L
    ((v * v) % 1000003L).toInt
  }

  /** Hash-derived block scale `(sx, sy)` ∈ {2,4,6}² — even, so the 2×
    * downscale keeps whole blocks and the tiny-raster grid points stay
    * exactly one per block on both the source and the resized copy. */
  def blockSpec(h: Long): (Int, Int) =
    ((2 + 2 * ((h / 64) % 3)).toInt, (2 + 2 * ((h / 192) % 3)).toInt)

  /** Render the 8×8 block pattern into pixels (w = 8·sx, h = 8·sy). */
  private def fillBlocks(h: Long, sx: Int, sy: Int)(px: Array[Int]): Unit = {
    val w = 8 * sx
    var y = 0
    while (y < 8 * sy) {
      var x = 0
      while (x < w) {
        px(y * w + x) = blockRgb(h, (y / sy) * 8 + (x / sx))
        x += 1
      }
      y += 1
    }
  }

  /** 2× nearest-neighbor downscale — `out(x,y) = in(2x,2y)`, the
    * [[Multimodal.resizePng]] kernel on a raw pixel array. */
  private def downscale2(px: Array[Int], w: Int, h: Int): (Array[Int], Int, Int) = {
    val rw = math.max(1, w / 2)
    val rh = math.max(1, h / 2)
    val out = new Array[Int](rw * rh)
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) { out(y * rw + x) = px(2 * y * w + 2 * x); x += 1 }
      y += 1
    }
    (out, rw, rh)
  }

  /** The one-block edit of the perturbed copy: +128 mod 256 on the
    * blue channel of every pixel of block (h mod 8, 0) — red/green
    * untouched, so only the hashed (blue) plane moves. */
  private def perturb(px: Array[Int], w: Int, h: Long, sx: Int, sy: Int): Array[Int] = {
    val i0 = (h % 8).toInt
    val out = px.clone()
    var y = i0 * sy
    while (y < (i0 + 1) * sy) {
      var x = 0
      while (x < sx) {
        val p = out(y * w + x)
        out(y * w + x) = (p & 0xffff00) | (((p & 0xff) + 128) % 256)
        x += 1
      }
      y += 1
    }
    out
  }

  /** The image corpus WITH its planted near-duplicate copies:
    * `(img_id, png)` — sources under their doc_id, resized copies at
    * −2·doc_id−1 (every 25th), perturbed re-encodes at −2·doc_id−2
    * (every 40th). One encoder+decoder pair per partition; the copies
    * go through a genuine decode → transform → re-encode cycle, so
    * their BYTES share nothing with the source payload. */
  def corpusWithCopies(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = Multimodal.mkPixelEncoder()
        val dec = Multimodal.mkDecoder()
        it.flatMap { case (id, text) =>
          val h = Multimodal.textHash60(text)
          val (sx, sy) = blockSpec(h)
          val (w, hgt) = (8 * sx, 8 * sy)
          val src = enc(w, hgt, fillBlocks(h, sx, sy))
          val copies = Iterator(
            if (id % 25 == 0) {
              val (px, dw, dh) = dec(src)
              val (rp, rw, rh) = downscale2(px, dw, dh)
              Some((-2 * id - 1, enc(rw, rh, p => System.arraycopy(rp, 0, p, 0, rp.length))))
            } else None,
            if (id % 40 == 0) {
              val (px, dw, _) = dec(src)
              val pp = perturb(px, dw, h, sx, sy)
              Some((-2 * id - 2, enc(dw, hgt, p => System.arraycopy(pp, 0, p, 0, pp.length))))
            } else None).flatten
          Iterator((id, src)) ++ copies
        }
      }
      .toDF("img_id", "png")
  }

  /** 56-bit dHash of a decoded pixel array: 8×8 nearest-neighbor tiny
    * raster (gray = blue channel), bit i·7+j = [gray(i,j+1) >
    * gray(i,j)]. Public for the scalatest brute-force cross-check. */
  def dHash56(px: Array[Int], w: Int, h: Int): Long = {
    val g = new Array[Int](64)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        g(i * 8 + j) = px((i * h / 8) * w + (j * w / 8)) & 0xff
        j += 1
      }
      i += 1
    }
    var bits = 0L
    i = 0
    while (i < 8) {
      var j = 0
      while (j < 7) {
        if (g(i * 8 + j + 1) > g(i * 8 + j)) bits |= 1L << (i * 7 + j)
        j += 1
      }
      i += 1
    }
    bits
  }

  /** Decode + perceptual-hash pass: `(img_id, dhash)` — one decoder
    * per partition, binary in / one BIGINT out. */
  def imageDHashes(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("img_id").cast("long"), col("png"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = Multimodal.mkDecoder()
        it.map { case (id, bytes) =>
          val (px, w, h) = dec(bytes)
          (id, dHash56(px, w, h))
        }
      }
      .toDF("img_id", "dhash")
  }

  /** Pigeonhole band join + Hamming verify over `(img_id, dhash)`
    * signatures: all pairs within Hamming distance `maxHamming`,
    * EXACT over the signature space (56 bits split into
    * maxHamming + 1 bands — ≤ maxHamming differing bits must leave
    * one band untouched). Returns `(a, b, hamming)`, ordered ids.
    * `56 % (maxHamming + 1)` must be 0 (maxHamming ∈ {1, 3, 6, 7, 13, …}). */
  def hammingPairs(sigs0: DataFrame, maxHamming: Int = 1): DataFrame = {
    val bands = maxHamming + 1
    require(maxHamming >= 1 && 56 % bands == 0,
      s"56 bits must split into maxHamming + 1 = $bands equal bands")
    val width = 56 / bands
    val mask = (1L << width) - 1
    // checkpoint: the decode+hash pass feeds both join sides
    val sigs = sigs0.localCheckpoint()
    val banded = sigs
      .withColumn("band", explode(expr(s"sequence(0, ${bands - 1})")))
      .withColumn("chunk", expr(s"shiftright(dhash, band * $width) & $mask"))
    banded.select(col("band"), col("chunk"), col("img_id").as("a"), col("dhash").as("ha"))
      .join(banded.select(col("band"), col("chunk"), col("img_id").as("b"),
        col("dhash").as("hb")), Seq("band", "chunk"))
      .filter(col("a") < col("b"))
      .select("a", "b", "ha", "hb")
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  /** The full operator: synthesize corpus + planted copies, decode,
    * perceptual-hash, band-join, verify. */
  def nearDupPairs(spark: SparkSession, docs: DataFrame,
                   maxHamming: Int = 1): DataFrame =
    hammingPairs(imageDHashes(spark, corpusWithCopies(spark, docs)), maxHamming)
}
