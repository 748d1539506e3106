package graft.tools

/** Measurement probe for the r12 opening-bench confirm cluster: the
  * three javax.imageio faces (q_image_decode / q_image_resize /
  * q_jpeg_decode) confirmed 2-6x over their floors on UNCHANGED code
  * in an otherwise-quiet window (suite_drift 1.17, contemporaneous
  * sentinels 1.0-1.11). Hypothesis: ImageIO's default stream cache
  * writes a TEMP FILE per ImageInputStream/ImageOutputStream
  * (FileCacheImageInput/OutputStream), so decode cost is dominated by
  * tmp-volume latency on hosts where that volume is slow — pure
  * overhead when every source is an in-memory byte array.
  *
  * Pure-JVM A/B (no Spark): encode N small PNGs + JPEGs to byte
  * arrays, then decode the whole batch with useCache=true vs false.
  * Prints one JSON line with both wall times.
  */
object ImageIoCacheProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    javax.imageio.ImageIO.setUseCache(true)
    // synthesize: 32x32 RGB PNGs (deterministic gradient + id salt)
    def img(id: Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) {
          im.setRGB(x, y, (x * 8 + y * 2048 + id * 31) & 0xffffff)
          x += 1
        }
        y += 1
      }
      im
    }
    def enc(fmt: String, id: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img(id), fmt, bos)
      bos.toByteArray
    }
    val pngs = (0 until n).map(enc("png", _)).toArray
    val jpgs = (0 until n).map(enc("jpg", _)).toArray
    def decodeAll(): Long = {
      var acc = 0L
      var i = 0
      while (i < n) {
        val a = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(pngs(i)))
        val b = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(jpgs(i)))
        acc += a.getRGB(1, 1) + b.getRGB(1, 1)
        i += 1
      }
      acc
    }
    def encodeAll(): Long = {
      var acc = 0L
      var i = 0
      while (i < n) { acc += enc("png", i).length; i += 1 }
      acc
    }
    def timed(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f()
      ((System.nanoTime() - t0) / 1e9, r)
    }
    // warm both paths once before measuring
    javax.imageio.ImageIO.setUseCache(true); decodeAll(); encodeAll()
    javax.imageio.ImageIO.setUseCache(false); decodeAll(); encodeAll()
    javax.imageio.ImageIO.setUseCache(true)
    val (dOn, c1) = timed(decodeAll)
    val (eOn, c2) = timed(encodeAll)
    javax.imageio.ImageIO.setUseCache(false)
    val (dOff, c3) = timed(decodeAll)
    val (eOff, c4) = timed(encodeAll)
    require(c1 == c3 && c2 == c4, "cache mode changed pixel content?!")
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    println(s"""{"n":$n,"decode_cache_on_sec":${r3(dOn)},""" +
      s""""decode_cache_off_sec":${r3(dOff)},""" +
      s""""encode_cache_on_sec":${r3(eOn)},""" +
      s""""encode_cache_off_sec":${r3(eOff)},""" +
      s""""decode_speedup":${r3(dOn / math.max(dOff, 1e-9))},""" +
      s""""encode_speedup":${r3(eOn / math.max(eOff, 1e-9))}}""")
  }
}
