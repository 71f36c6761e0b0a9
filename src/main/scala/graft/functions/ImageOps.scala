package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Decoded-image metadata row (public top-level: Spark needs a public
  * case class to derive the struct encoder for the UDF return type).
  * `lumSum` is the integer Rec.601 luminance sum — per pixel
  * 299*R + 587*G + 114*B (the ×1000 fixed-point weights) accumulated
  * exactly in Long arithmetic, so cross-engine comparison never rides
  * on float rounding. */
case class ImageMeta(width: Int, height: Int, channels: Int, lumSum: Long)

/** Multimodal binary-column operators (SURVEY.md §2.7 F16, §2.8 M1–M8
  * contracts; builder north-star "multimodal columns").
  *
  * Images/audio/video live in the lake as opaque `binary` columns with
  * typed metadata alongside (the `binaryFile` source provides path,
  * length, content). Two layers:
  *
  *  - byte-plane transforms (invert/resizeHalf/meanByte) — pure
  *    per-row byte ops, no codec involved;
  *  - REAL codec ops via the JDK's built-in `javax.imageio`
  *    (PNG/JPEG/GIF/BMP — zero external deps): [[decode]],
  *    [[decodeMeta]], [[resizeHalfPng]]. These replace the r3/r4
  *    `decodeStub`. The reference's originals: invert via bitwise_not
  *    (ocr.py:42-44), enhance/sharpen (ocr.py:91-99), resize by
  *    fractional factors (graphData.py:132-142).
  *
  * All of these are per-row transforms — embarrassingly parallel, no
  * shuffle, and at cluster scale they run where the bytes live. In a
  * real deployment the codec would read the raster buffer directly and
  * initialize per-partition (like the reference's module-level model
  * loads); per-pixel getRGB here keeps the code obvious at fixture
  * scale.
  */
object ImageOps {

  /** Grayscale invert: bitwise NOT per byte (cv2.bitwise_not). */
  def invert(bytes: Array[Byte]): Array[Byte] =
    bytes.map(b => (~b).toByte)

  /** Nearest-neighbor 1-D downsample by 2: every other byte — the
    * fx=0.5 resize stand-in for raw byte planes. */
  def resizeHalf(bytes: Array[Byte]): Array[Byte] =
    bytes.zipWithIndex.collect { case (b, i) if i % 2 == 0 => b }

  /** Mean unsigned byte value — the corner-patch brightness probe that
    * gates inversion in the reference (ocr.py:80-89, threshold 100). */
  def meanByte(bytes: Array[Byte]): Double =
    if (bytes.isEmpty) 0d else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length

  /** Codec decode via javax.imageio; None for null, undecodable, or
    * TRUNCATED bytes (ImageIO.read returns null for unknown formats
    * but THROWS on data that dies mid-chunk — at corpus scale a total
    * decode is the difference between a quarantined row and a dead
    * job). */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null) None
    else scala.util.Try(Option(ImageIO.read(new ByteArrayInputStream(bytes))))
      .toOption.flatten

  /** Decode + measure: dimensions, channel count, and the exact
    * integer luminance sum (see [[ImageMeta]]). */
  def decodeMeta(bytes: Array[Byte]): Option[ImageMeta] =
    decode(bytes).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      ImageMeta(w, h, img.getColorModel.getNumComponents, sum)
    }

  /** Real fx=0.5 resize (graphData.py:132-142): decode, scale to half
    * dimensions (floor, min 1), re-encode PNG. None if undecodable. */
  def resizeHalfPng(bytes: Array[Byte]): Option[Array[Byte]] =
    decode(bytes).map { img =>
      val w = math.max(img.getWidth / 2, 1)
      val h = math.max(img.getHeight / 2, 1)
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      encodePng(out)
    }

  /** 64-bit perceptual difference hash (dHash) over the decoded
    * luminance plane, returned as a 64-char '0'/'1' fingerprint — the
    * same bit-string alphabet as SimHash, so the codegen'd
    * `hamming_distance` expression and the Manku pigeonhole block join
    * apply to images unchanged (VERDICT r7 next #2: make multimodal
    * columns feed the dedup stack).
    *
    * Deterministic by construction — no interpolation anywhere: sample
    * a 9×8 grid at nearest pixels (x = gx·W/9, y = gy·H/8, integer
    * floor), take the exact integer Rec.601 luminance at each sample,
    * and emit bit (gy·8 + gx) = 1 iff lum(gx+1, gy) > lum(gx, gy).
    * Integer sampling + integer luminance means the hash is exactly
    * reproducible by any engine from the raw pixels (the q145 oracle
    * recomputes it in SQL), unlike the usual area-averaged resize whose
    * rounding is library-private. Robust to exactly what dHash is
    * robust to: re-encoding, brightness-preserving noise between
    * samples, small gradient shifts. None for undecodable bytes. */
  def dHash64(bytes: Array[Byte]): Option[String] =
    decode(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val lum = Array.ofDim[Long](8, 9)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          val rgb = img.getRGB(gx * w / 9, gy * h / 8)
          lum(gy)(gx) = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)
          gx += 1
        }
        gy += 1
      }
      val sb = new java.lang.StringBuilder(64)
      gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          sb.append(if (lum(gy)(gx + 1) > lum(gy)(gx)) '1' else '0')
          gx += 1
        }
        gy += 1
      }
      sb.toString
    }

  /** Encode a BufferedImage as PNG bytes (fixture staging + re-encode). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Solid-color PNG fixture: every pixel (r, g, b). */
  def solidPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  // Column-function registrations (Scala UDFs over binary; a custom
  // Expression would only pay off if these became hot-path filters)
  val invertUdf = udf(invert _)
  val resizeHalfUdf = udf(resizeHalf _)
  val meanByteUdf = udf(meanByte _)
  val isDark: Column => Column = c => meanByteUdf(c) < 100d
  val decodeMetaUdf = udf(decodeMeta _)
  val resizeHalfPngUdf = udf(resizeHalfPng _)
  val dHash64Udf = udf(dHash64 _)
}
