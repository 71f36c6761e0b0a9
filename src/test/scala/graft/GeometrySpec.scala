package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geometry
import graft.functions.Geometry.Box

/** Unit tests for the M6/J1 geometry core (fixtures hand-computed from
  * tableExtract.py:171-197 semantics). Property-based coverage lives in
  * GeometryProps (ScalaCheck). */
class GeometrySpec extends AnyFunSuite {

  test("iou of a box with itself is 1") {
    val b = Box(2, 3, 10, 8)
    assert(Geometry.iou(b, b) === 1.0)
  }

  test("iou of disjoint boxes is 0") {
    assert(Geometry.iou(Box(0, 0, 5, 5), Box(6, 6, 10, 10)) === 0.0)
    // touching edges: zero-width intersection is still 0 (reference
    // returns 0 on inter_area == 0)
    assert(Geometry.iou(Box(0, 0, 5, 5), Box(5, 0, 10, 5)) === 0.0)
  }

  test("iou hand-computed fixture: half-overlapping squares") {
    // a=[0,0,10,10], b=[5,0,15,10]: inter 50, union 150 -> 1/3
    assert(math.abs(Geometry.iou(Box(0, 0, 10, 10), Box(5, 0, 15, 10)) - 1.0 / 3) < 1e-12)
  }

  test("intersection cell takes x from the vertical, y from the horizontal strip") {
    val h = Box(0, 40, 400, 70)
    val v = Box(100, 0, 190, 330)
    assert(Geometry.intersectionCell(h, v) === Box(100, 40, 190, 70))
  }

  test("nms keeps the top-score member of an exact clique") {
    val clique = Seq(
      (1L, Box(0, 0, 10, 10), 0.5),
      (2L, Box(0, 0, 10, 10), 0.9),
      (3L, Box(0, 0, 10, 10), 0.7))
    assert(Geometry.nms(clique) === Seq(2L))
  }

  test("nms keeps all members of disjoint cliques") {
    val boxes = Seq(
      (1L, Box(0, 0, 10, 10), 0.5),
      (2L, Box(20, 0, 30, 10), 0.9),
      (3L, Box(40, 0, 50, 10), 0.1))
    assert(Geometry.nms(boxes).sorted === Seq(1L, 2L, 3L))
  }

  test("nms breaks score ties by ascending id (TF stable order)") {
    val tied = Seq(
      (7L, Box(0, 0, 10, 10), 0.5),
      (3L, Box(0, 0, 10, 10), 0.5))
    assert(Geometry.nms(tied) === Seq(3L))
  }

  test("nms honors maxOutputSize") {
    val boxes = (0 until 10).map(i => (i.toLong, Box(i * 20, 0, i * 20 + 10, 10), 1.0 - i * 0.01))
    assert(Geometry.nms(boxes, maxOutputSize = 3).size === 3)
  }
}
