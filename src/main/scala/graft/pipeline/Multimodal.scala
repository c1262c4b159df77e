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
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`): it derives shape/
  * format pseudo-fields from a content hash and summary statistics from
  * the raw bytes. The Spark-side plumbing is real and is the part that
  * matters at 100 TB: binary columns survive parquet round-trips, the
  * per-partition batch iteration (`mapPartitions` over a typed Dataset,
  * the JVM analog of `mapInPandas`) keeps one decoder instance per
  * partition, and the derived metadata lands in ordinary columns for
  * downstream relational filtering.
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

  /** Deterministic solid-color PNG: shape and fill derived from the
    * content hash. A REAL encoder (ImageIO), so the downstream decode
    * exercises a genuine codec rather than a stub. */
  def synthesizePng(h: Long): Array[Byte] = {
    val w = (16 + h % 48).toInt
    val hgt = (16 + (h / 48) % 48).toInt
    val rgb = (h % 16777216).toInt
    val img = new java.awt.image.BufferedImage(w, hgt,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * hgt)
    java.util.Arrays.fill(px, rgb)
    img.setRGB(0, 0, w, hgt, px, 0, w)    // bulk transfer — per-pixel setRGB is ~10× slower
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Documents with a real PNG payload column (encode stage). One
    * encoder instance per partition — the setup cost a real codec
    * pipeline amortizes across its batch. */
  def withPngPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        it.map { case (id, text) =>
          val h = textHash60(text)
          val w = (16 + h % 48).toInt
          val hgt = (16 + (h / 48) % 48).toInt
          val rgb = (h % 16777216).toInt
          val img = new java.awt.image.BufferedImage(w, hgt,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val px = new Array[Int](w * hgt)
          java.util.Arrays.fill(px, rgb)
          img.setRGB(0, 0, w, hgt, px, 0, w)
          val baos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          writer.setOutput(ios)
          writer.write(img)
          ios.close()
          (id, baos.toByteArray)
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
      .mapPartitions(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)    // bulk transfer
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        val n = (w.toLong * h).toDouble
        (id, bytes.length, w, h, sr / n, sg / n, sb / n)
      })
      .toDF("doc_id", "n_bytes", "img_w", "img_h", "mean_r", "mean_g", "mean_b")
  }
}
