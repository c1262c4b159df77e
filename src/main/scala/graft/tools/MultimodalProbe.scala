package graft.tools

import graft.pipeline.Multimodal

/** Attribution probe for the r8 multimodal bench regression (VERDICT r8
  * "What's wrong #1": `q_multimodal_frames` 10.49 s min-of-3 in the
  * driver artifact vs 1.09 s in the builder-pinned run, same code, same
  * fixture — a 3–9× swing across the whole image family with no
  * in-artifact cause).
  *
  * Named cause under test: `javax.imageio.ImageIO.createImageOutputStream`
  * / `createImageInputStream` honor the global `ImageIO.getUseCache()`
  * default of TRUE, which wraps even a pure in-memory
  * ByteArray{Input,Output}Stream in a File-Cache image stream — every
  * single encode/decode creates, writes, reads back, and deletes a temp
  * file in `java.io.tmpdir`. `q_multimodal_frames` encodes ~27k frames
  * and decodes ~15k per round, so one round is ~40k temp-file
  * create/delete cycles, concurrent from 32 tasks in ONE directory,
  * each name drawn from a JVM-global SecureRandom. The cost of that is
  * entirely a property of the host's /tmp (tmpfs vs overlay/disk, dentry
  * cache pressure, co-tenant fs traffic) — which is why the same binary
  * read 1.09 s on the builder box and 10.5–18.2 s on the driver box and
  * why the regression tracked the environment, not the code diff.
  *
  * The probe times the frames-shape codec work (encode + sample-decode
  * of 32×24 PNGs) both ways — file-cache streams (the pre-r9 behavior)
  * vs explicit MemoryCache image streams (the r9 fix, no fs dependency)
  * — single-threaded and at 32-way parallelism, and prints one JSON
  * line. Run: `sbt "runMain graft.tools.MultimodalProbe [nImages]"`.
  */
object MultimodalProbe {

  private def mkEncoderWith(memCache: Boolean): (Int, Int, Int) => Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    var cw = -1; var ch = -1
    var img: java.awt.image.BufferedImage = null
    var px: Array[Int] = null
    val baos = new java.io.ByteArrayOutputStream()
    (w: Int, h: Int, rgb: Int) => {
      if (w != cw || h != ch) {
        cw = w; ch = h
        img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        px = new Array[Int](w * h)
      }
      java.util.Arrays.fill(px, rgb)
      img.setRGB(0, 0, w, h, px, 0, w)
      baos.reset()
      val ios =
        if (memCache) new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        else javax.imageio.ImageIO.createImageOutputStream(baos) // useCache default
      writer.setOutput(ios)
      writer.write(img)
      ios.close()
      baos.toByteArray
    }
  }

  private def mkDecoderWith(memCache: Boolean): Array[Byte] => Int = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    (bytes: Array[Byte]) => {
      val bais = new java.io.ByteArrayInputStream(bytes)
      val iis =
        if (memCache) new javax.imageio.stream.MemoryCacheImageInputStream(bais)
        else javax.imageio.ImageIO.createImageInputStream(bais)
      try {
        reader.setInput(iis)
        val img = reader.read(0)
        img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth).length
      } finally iis.close()
    }
  }

  /** One worker's share: encode `n` 32×24 frames, decode every 2nd
    * (the q_multimodal_frames sampling), reusing one encoder+decoder
    * pair exactly like the per-partition mapPartitions closures. */
  private def work(n: Int, seed: Int, memCache: Boolean): Long = {
    val enc = mkEncoderWith(memCache)
    val dec = mkDecoderWith(memCache)
    var acc = 0L
    var i = 0
    while (i < n) {
      val bytes = enc(32, 24, Multimodal.frameRgb(seed.toLong * 7919, i.toLong))
      if (i % 2 == 0) acc += dec(bytes)
      i += 1
    }
    acc
  }

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40000)
    val threads = 32
    def par(memCache: Boolean): Unit = {
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { work(n / threads, t, memCache); () })
        th.start(); th
      }
      ts.foreach(_.join())
    }
    // warm-up both paths (JIT + ImageIO service lookup)
    work(2000, 99, memCache = true); work(2000, 99, memCache = false)
    val r = Seq(
      "n_images" -> n,
      "tmpdir" -> 0, // placeholder index; printed separately below
      "filecache_1t_sec" -> timed(work(n, 1, memCache = false)),
      "memcache_1t_sec" -> timed(work(n, 1, memCache = true)),
      "filecache_32t_sec" -> timed(par(memCache = false)),
      "memcache_32t_sec" -> timed(par(memCache = true)))
    val kv = r.collect { case (k, v: Double) => s""""$k":${math.round(v * 1000) / 1000.0}""" }
    println(s"""{"n_images":$n,"tmpdir":"${sys.props("java.io.tmpdir")}",""" +
      s""""imageio_usecache_default":${javax.imageio.ImageIO.getUseCache},""" +
      kv.mkString(",") + "}")
  }
}
