package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ImageOps

class ImageOpsSpec extends AnyFunSuite {

  test("invert is an involution") {
    val bytes = Array[Byte](0, 1, 127, -128, -1, 42)
    assert(ImageOps.invert(ImageOps.invert(bytes)).toSeq === bytes.toSeq)
  }

  test("invert flips dark to bright") {
    assert(ImageOps.meanByte(ImageOps.invert(Array.fill[Byte](10)(0))) === 255.0)
  }

  test("resizeHalf keeps every other byte, ceil length") {
    assert(ImageOps.resizeHalf(Array[Byte](1, 2, 3, 4, 5)).toSeq === Seq[Byte](1, 3, 5))
    assert(ImageOps.resizeHalf(Array[Byte](1, 2, 3, 4)).toSeq === Seq[Byte](1, 3))
    assert(ImageOps.resizeHalf(Array.empty[Byte]).isEmpty)
  }

  test("meanByte treats bytes as unsigned (brightness probe)") {
    assert(ImageOps.meanByte(Array[Byte](-1)) === 255.0) // 0xff
    assert(ImageOps.meanByte(Array[Byte](0, -2)) === 127.0) // (0 + 254) / 2
  }

  /** A real 4x4 RGB PNG written by an INDEPENDENT encoder (python
    * zlib/struct, not our own encodePng): rows of red, green, blue,
    * white. Proves javax.imageio decodes foreign PNG bytes, not just
    * its own output. */
  private val png4x4: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAQAAAAECAIAAAAmkwkpAAAAFElEQVR4nGP4z8AAR0hM" +
      "dN5/JAAA0m8X6YFvxBYAAAAASUVORK5CYII=")

  test("decodeMeta decodes a real externally-encoded 4x4 PNG") {
    val m = ImageOps.decodeMeta(png4x4).get
    assert(m.width === 4 && m.height === 4 && m.channels === 3)
    // rows red/green/blue/white, 4 px each, Rec.601 x1000 weights:
    // 4*(299*255 + 587*255 + 114*255 + (299+587+114)*255) = 2_040_000
    assert(m.lumSum === 2040000L)
  }

  test("decodeMeta returns None for undecodable, truncated, or null bytes") {
    assert(ImageOps.decodeMeta("not a png".getBytes).isEmpty)
    // PNG magic + IHDR start, then EOF mid-chunk: ImageIO throws here
    // rather than returning null — decode must swallow it
    assert(ImageOps.decodeMeta(png4x4.take(20)).isEmpty)
    assert(ImageOps.decodeMeta(null).isEmpty)
  }

  test("resizeHalfPng halves dimensions and preserves solid color") {
    val src = ImageOps.solidPng(6, 4, 10, 20, 30)
    val half = ImageOps.resizeHalfPng(src).get
    val m = ImageOps.decodeMeta(half).get
    assert(m.width === 3 && m.height === 2)
    assert(m.lumSum === (299L * 10 + 587L * 20 + 114L * 30) * 3 * 2)
    // 1x1 floor: dimensions never reach zero
    val tiny = ImageOps.resizeHalfPng(ImageOps.solidPng(1, 1, 5, 5, 5)).get
    assert(ImageOps.decodeMeta(tiny).get.width === 1)
  }

  test("solidPng round-trips exact pixel values through the codec") {
    val m = ImageOps.decodeMeta(ImageOps.solidPng(3, 5, 255, 0, 128)).get
    assert(m.width === 3 && m.height === 5 && m.channels === 3)
    assert(m.lumSum === (299L * 255 + 114L * 128) * 15)
  }
}
