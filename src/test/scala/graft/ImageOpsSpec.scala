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

  test("decodeStub returns deterministic positive dimensions") {
    val d1 = ImageOps.decodeStub(Array.fill[Byte](1000)(7))
    assert(d1 === ImageOps.decodeStub(Array.fill[Byte](1000)(9)))
    assert(d1._1 > 0 && d1._2 > 0 && d1._3 === 3)
  }
}
