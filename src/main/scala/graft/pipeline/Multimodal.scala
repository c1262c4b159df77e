package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-media metadata row produced by the (stubbed) decoder. */
final case class MediaMeta(
    doc_id: Long, n_bytes: Int, width: Int, height: Int,
    format: String, mean_byte: Double, entropy_q: Double)

/** Multimodal-column plumbing: media as opaque `BINARY` payloads with
  * typed, deterministic metadata derivation.
  *
  * Three payload families, two with REAL codecs: PNG images and
  * frame-array video round-trip through JVM ImageIO, and audio
  * round-trips through an in-repo RIFF/WAV PCM codec — only the
  * generic-container path keeps the clearly-marked deterministic STUB
  * (`fakeDecode`, shape/format pseudo-fields from a content hash) for
  * formats the container has no codec for. The Spark-side plumbing is
  * identical in all three and is the part that matters at 100 TB:
  * binary columns survive parquet round-trips, the per-partition batch
  * iteration (`mapPartitions` over a typed Dataset, the JVM analog of
  * `mapInPandas`) keeps one decoder instance per partition, and the
  * derived features land in ordinary columns for downstream relational
  * filtering.
  */
object Multimodal {

  /** Attach a binary payload column. In production this is the raw
    * media column read from parquet; here it's synthesized from text so
    * the pipeline is runnable on the shipped testdata. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Pure-relational metadata: SQL-expressible subset (hash-derived
    * pseudo shape + byte length), usable as an oracle-checked contract
    * for the binary plumbing. */
  def metaRelational(docs: DataFrame): DataFrame =
    withPayload(docs).selectExpr(
      "doc_id",
      "CAST(length(payload) AS INT) AS n_bytes",
      s"${TextOps.hash60("payload")} AS h")
      .selectExpr(
        "doc_id", "n_bytes",
        "CAST(64 + h % 448 AS INT) AS width",
        "CAST(64 + (h DIV 448) % 448 AS INT) AS height",
        "element_at(array('jpeg', 'png', 'webp'), CAST(h % 3 AS INT) + 1) AS format")

  /** STUB decoder — deterministic fake in place of a real codec.
    * Real byte-level statistics; shape/format from the content hash. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val h = java.lang.Long.parseLong(
      md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    val hist = new Array[Long](256)
    payload.foreach(b => hist(b & 0xff) += 1)
    val n = payload.length.toDouble
    val mean = if (payload.isEmpty) 0.0 else payload.map(b => (b & 0xff).toDouble).sum / n
    val entropy = if (payload.isEmpty) 0.0 else -hist.filter(_ > 0)
      .map(c => (c / n) * math.log(c / n) / math.log(2.0)).sum
    MediaMeta(
      doc_id = docId,
      n_bytes = payload.length,
      width = (64 + h % 448).toInt,
      height = (64 + (h / 448) % 448).toInt,
      format = Seq("jpeg", "png", "webp")((h % 3).toInt),
      mean_byte = math.floor(mean * 1e9 + 0.5) / 1e9,
      entropy_q = math.floor(entropy * 1e9 + 0.5) / 1e9)
  }

  /** Batch "decode" over the binary column: one decoder per partition,
    * iterator-to-iterator (no per-row setup, constant memory) — the
    * shape a real codec UDF must take at scale. */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (real codec handle)
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  // ---- REAL codec path (JVM ImageIO — PNG codec ships with the JDK) ----

  /** 15-hex-char content hash, identical to the SQL
    * `CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)`. */
  def textHash60(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(md.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Per-partition PNG encoder over a caller-supplied pixel fill: ONE
    * ImageIO writer reused for every image the task encodes (the
    * service lookup + stream setup in `ImageIO.write` costs ~1 ms per
    * call — ruinous per record). The fill writes row-major into the
    * provided buffer. */
  def mkPixelEncoder(): (Int, Int, Array[Int] => Unit) => Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    // per-encoder (= per-partition, single-threaded) buffer reuse: the
    // BufferedImage + pixel array are cached while dims repeat (video
    // frames share one size, so this hits every call) and the output
    // buffer is reset instead of reallocated — the per-call alloc +
    // stream setup was a visible slice of the ~4 ms/encode cost
    var cw = -1; var ch = -1
    var img: java.awt.image.BufferedImage = null
    var px: Array[Int] = null
    val baos = new java.io.ByteArrayOutputStream()
    (w: Int, h: Int, fill: Array[Int] => Unit) => {
      if (w != cw || h != ch) {
        cw = w; ch = h
        img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        px = new Array[Int](w * h)
      }
      fill(px)
      img.setRGB(0, 0, w, h, px, 0, w)    // bulk transfer — per-pixel setRGB is ~10× slower
      baos.reset()
      // EXPLICIT memory-cache stream (r8 verdict #1): the convenience
      // factory ImageIO.createImageOutputStream honors the global
      // useCache=true default and backs even this pure in-memory
      // ByteArrayOutputStream with a DISK temp file (create/write/
      // read/delete in java.io.tmpdir per image, names from a
      // JVM-global SecureRandom) — ~40k temp-file cycles per
      // q_multimodal_frames round from 32 concurrent tasks in one
      // directory. That made the whole image family's bench cost a
      // property of the host's /tmp (1.09 s builder vs 10.5–18.2 s
      // driver, same binary). MultimodalProbe measures the two paths:
      // 32-thread encode+decode of 40k frames 1.58 s file-cache vs
      // 0.21 s memory-cache on a FAST /tmp — 7.6×, unboundedly worse
      // on a contended one. Bytes produced are identical.
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      writer.setOutput(ios)
      writer.write(img)
      ios.close()
      baos.toByteArray
    }
  }

  /** Solid-fill specialization of [[mkPixelEncoder]]. */
  def mkEncoder(): (Int, Int, Int) => Array[Byte] = {
    val enc = mkPixelEncoder()
    (w: Int, h: Int, rgb: Int) => enc(w, h, px => java.util.Arrays.fill(px, rgb))
  }

  /** Per-partition PNG decoder factory: one reused ImageIO reader;
    * undecodable payloads raise an informative error instead of the
    * bare NullPointerException `ImageIO.read` would cause (it returns
    * null, not an exception, for corrupt bytes). */
  def mkDecoder(): Array[Byte] => (Array[Int], Int, Int) = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    (bytes: Array[Byte]) => {
      // explicit memory-cache stream — see mkPixelEncoder: the
      // ImageIO.createImageInputStream factory would wrap this
      // in-memory source in a disk-backed FileCacheImageInputStream
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val img =
        try {
          reader.setInput(iis)
          reader.read(0)
        } catch {
          case e: Exception => throw new IllegalArgumentException(
            s"undecodable PNG payload (${bytes.length} bytes): ${e.getMessage}", e)
        } finally iis.close()
      if (img == null)
        throw new IllegalArgumentException(
          s"undecodable PNG payload (${bytes.length} bytes)")
      (img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth),
        img.getWidth, img.getHeight)
    }
  }

  /** Solid-color PNG encoder, one-shot form (tests/ad-hoc). */
  def encodeSolidPng(w: Int, h: Int, rgb: Int): Array[Byte] = mkEncoder()(w, h, rgb)

  /** Decode PNG bytes → (pixels, width, height), one-shot form. */
  def decodePixels(bytes: Array[Byte]): (Array[Int], Int, Int) = mkDecoder()(bytes)

  /** Per-channel pixel means of an RGB pixel array. */
  def channelMeans(px: Array[Int]): (Double, Double, Double) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      i += 1
    }
    val n = px.length.toDouble
    (sr / n, sg / n, sb / n)
  }

  /** Hash-derived PNG spec `(width, height, fill)` — the single source
    * of truth for the synthesized payloads, mirrored by the SQL
    * oracles. */
  def pngSpec(h: Long): (Int, Int, Int) =
    ((16 + h % 48).toInt, (16 + (h / 48) % 48).toInt, (h % 16777216).toInt)

  /** Deterministic solid-color PNG: shape and fill derived from the
    * content hash. A REAL encoder (ImageIO), so the downstream decode
    * exercises a genuine codec rather than a stub. */
  def synthesizePng(h: Long): Array[Byte] = {
    val (w, hgt, rgb) = pngSpec(h)
    encodeSolidPng(w, hgt, rgb)
  }

  /** Documents with a real PNG payload column (encode stage). One
    * encoder instance per partition — the setup cost a real codec
    * pipeline amortizes across its batch. */
  def withPngPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      // codec work is CPU-bound and the source is often a single
      // parquet split — spread it across the cluster first
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = mkEncoder()
        it.map { case (id, text) =>
          val (w, hgt, rgb) = pngSpec(textHash60(text))
          (id, enc(w, hgt, rgb))
        }
      }
      .toDF("doc_id", "png")
  }

  /** REAL image decode + feature extraction: ImageIO parse of the PNG
    * bytes, per-channel pixel means — one decoder per partition,
    * iterator-to-iterator, binary in / relational columns out. The
    * oracle recomputes the expected shape/means from the same content
    * hash, so a broken codec round-trip fails the hash compare. */
  def decodePng(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("png"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = mkDecoder()
        it.map { case (id, bytes) =>
          val (px, w, h) = dec(bytes)
          val (mr, mg, mb) = channelMeans(px)
          (id, bytes.length, w, h, mr, mg, mb)
        }
      }
      .toDF("doc_id", "n_bytes", "img_w", "img_h", "mean_r", "mean_g", "mean_b")
  }

  /** REAL resize: decode, 2× nearest-neighbor downscale on actual
    * pixels (`out(x,y) = in(2x, 2y)`), features of the RESIZED image —
    * the decode→transform→extract chain of a production thumbnailer. */
  def resizePng(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("png"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = mkDecoder()
        it.map { case (id, bytes) =>
        val (px, w, h) = dec(bytes)
        val rw = math.max(1, w / 2)
        val rh = math.max(1, h / 2)
        val out = new Array[Int](rw * rh)
        var y = 0
        while (y < rh) {
          var x = 0
          while (x < rw) { out(y * rw + x) = px(2 * y * w + 2 * x); x += 1 }
          y += 1
        }
        val (mr, mg, mb) = channelMeans(out)
        (id, rw, rh, mr, mg, mb)
        }
      }
      .toDF("doc_id", "rw", "rh", "mean_r", "mean_g", "mean_b")
  }

  /** Per-partition gradient-PNG encoder: pixel (x, y) carries
    * (r = x, g = y, b = (x + y) mod 256). With the hash-derived dims
    * capped below 64, x and y never wrap, so the channel means have
    * closed forms — mean_r = (w−1)/2, mean_g = (h−1)/2,
    * mean_b = (w−1)/2 + (h−1)/2 — and after the 2× nearest-neighbor
    * downscale the sampled values are 2x′, 2y′, giving rw−1, rh−1,
    * rw+rh−2. Unlike the solid-color fixture, ANY pixel-order, stride,
    * or sampling-offset fault shifts these means and breaks the hash
    * (a transposed decode swaps mean_r/mean_g, an off-by-one stride
    * smears the ramp). */
  def mkGradientEncoder(): (Int, Int) => Array[Byte] = {
    val enc = mkPixelEncoder()
    (w: Int, h: Int) => enc(w, h, { px =>
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = (x << 16) | (y << 8) | ((x + y) & 0xff); x += 1 }
        y += 1
      }
    })
  }

  /** Documents with a gradient PNG payload (dims from the content
    * hash, same as [[pngSpec]]; fill ramp instead of solid color). */
  def withGradientPngPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = mkGradientEncoder()
        it.map { case (id, text) =>
          val (w, hgt, _) = pngSpec(textHash60(text))
          (id, enc(w, hgt))
        }
      }
      .toDF("doc_id", "png")
  }

  /** Per-frame fill color of the synthesized "video" (Knuth-hash frame
    * mixing, mirrored literally by the SQL oracle). */
  def frameRgb(h: Long, i: Long): Int = ((h + i * 2654435761L) % 16777216L).toInt

  /** Synthesized multi-frame "video" column: `ARRAY<BINARY>` of real
    * PNG frames (frame count and per-frame fill from the content hash)
    * — the container-of-frames layout a video column carries at rest. */
  def withVideoPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = mkEncoder()
        it.map { case (id, text) =>
          val h = textHash60(text)
          val nf = (3 + h % 5).toInt
          (id, (0 until nf).map(i => enc(32, 24, frameRgb(h, i))).toArray)
        }
      }
      .toDF("doc_id", "frames")
  }

  /** Frame sampling + decode: every `step`-th frame of the video column
    * is decoded (real codec) and reduced to per-channel means —
    * decode / frame-sample / feature-extract in one per-partition
    * batch pass. */
  def sampleFrames(spark: SparkSession, videos: DataFrame, step: Int = 2): DataFrame = {
    import spark.implicits._
    videos.select(col("doc_id").cast("long"), col("frames"))
      .as[(Long, Array[Array[Byte]])]
      .mapPartitions { it =>
        val dec = mkDecoder()
        it.flatMap { case (id, frames) =>
          frames.iterator.zipWithIndex.collect { case (bytes, i) if i % step == 0 =>
            val (px, _, _) = dec(bytes)
            val (mr, mg, mb) = channelMeans(px)
            (id, i, mr, mg, mb)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "mean_r", "mean_g", "mean_b")
  }

  // ---- audio: RIFF/WAV PCM, in-repo codec (no audio libs needed) ----

  /** Hash-derived WAV spec `(sampleRate, nSamples, hm)` — the single
    * source of truth for the synthesized audio payloads, mirrored by
    * the SQL oracles. `hm` is the hash reduced mod 1000003 so the
    * sample recurrence `hm·31 + i·2654435761` stays far from BIGINT
    * overflow on both engines. */
  def wavSpec(h: Long): (Int, Int, Long) = {
    val rate = (h % 4) match {
      case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
    }
    (rate, (256 + (h / 4) % 1792).toInt, h % 1000003L)
  }

  /** Deterministic 16-bit PCM samples: integer hash recurrence, exact
    * on any engine (no trig, no floats). */
  def synthSamples(hm: Long, ns: Int): Array[Short] = {
    val out = new Array[Short](ns)
    var i = 0
    while (i < ns) {
      out(i) = ((hm * 31 + i.toLong * 2654435761L) % 65536 - 32768).toShort
      i += 1
    }
    out
  }

  /** REAL RIFF/WAVE PCM encoder: canonical 44-byte header (fmt chunk
    * 16, PCM = 1, mono, 16-bit little-endian) + the sample data —
    * byte-compatible with any standard WAV reader. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL WAV decoder: validates the RIFF/WAVE magic and the PCM fmt
    * fields, then parses the little-endian 16-bit samples. Fails
    * loudly on a corrupt container — a stub would not. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF container")
    bb.getInt()
    require(tag() == "WAVE" && tag() == "fmt ", "not a WAVE/fmt stream")
    require(bb.getInt() == 16 && bb.getShort() == 1, "not canonical PCM")
    val channels = bb.getShort()
    require(channels == 1, s"expected mono, got $channels channels")
    val rate = bb.getInt()
    bb.getInt(); bb.getShort() // byte rate, block align
    require(bb.getShort() == 16, "expected 16-bit samples")
    require(tag() == "data", "missing data chunk")
    val n = bb.getInt() / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = bb.getShort(); i += 1 }
    (rate, out)
  }

  /** Documents with a real WAV payload column (encode stage) — the
    * audio twin of [[withPngPayload]]: per-partition batch encode of
    * hash-derived PCM. */
  def withWavPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val (rate, ns, hm) = wavSpec(textHash60(text))
        (id, encodeWav(rate, synthSamples(hm, ns)))
      })
      .toDF("doc_id", "wav")
  }

  /** Integer audio features of a PCM window: all exactly
    * reproducible cross-engine (no float RMS ULP risk) and each a
    * real signal statistic — peak |amplitude| (clipping check),
    * Σ|amplitude| (energy), zero-crossing count (the classic cheap
    * speech/music discriminator). */
  def pcmFeatures(s: Array[Short]): (Long, Long, Long) = {
    var (peak, sumAbs, zc) = (0L, 0L, 0L)
    var i = 0
    while (i < s.length) {
      val a = math.abs(s(i).toLong)
      if (a > peak) peak = a
      sumAbs += a
      if (i > 0 && ((s(i - 1) < 0) != (s(i) < 0))) zc += 1
      i += 1
    }
    (peak, sumAbs, zc)
  }

  /** REAL audio decode + feature extraction: parse the WAV container,
    * reduce the PCM to integer signal statistics — one pass per
    * partition, binary in / relational columns out. The oracle
    * recomputes every field from the same content hash (the sample
    * recurrence is pure integer arithmetic), so a broken codec
    * round-trip breaks the hash compare. */
  def decodeWavFeatures(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (rate, s) = decodeWav(bytes)
        val (peak, sumAbs, zc) = pcmFeatures(s)
        (id, rate, s.length.toLong, s.length.toLong * 1000 / rate, peak, sumAbs, zc)
      })
      .toDF("doc_id", "sample_rate", "n_samples", "duration_ms",
        "peak_abs", "sum_abs", "n_zero_cross")
  }

  /** REAL resample: decode, decimate by `factor` (keep every
    * factor-th sample — the audio twin of the 2× nearest-neighbor
    * image downscale), features of the RESAMPLED signal. */
  def resampleWav(spark: SparkSession, payloads: DataFrame,
                  factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (rate, s) = decodeWav(bytes)
        val kept = Array.range(0, s.length, factor).map(s)
        val (peak, sumAbs, zc) = pcmFeatures(kept)
        (id, rate / factor, kept.length.toLong, peak, sumAbs, zc)
      })
      .toDF("doc_id", "out_rate", "n_samples", "peak_abs", "sum_abs", "n_zero_cross")
  }
}
