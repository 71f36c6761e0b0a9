package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkAnalysis

class LinkAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkAnalysis.pageRankInt(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a ring is the fixed point: every score stays at the 10^12 scale") {
    // A->B->C->A, outdeg 1 everywhere: 150e9 + 85% of 10^12 = 10^12
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 4)
    assert(out === Map(1L -> LinkAnalysis.Scale, 2L -> LinkAnalysis.Scale,
      3L -> LinkAnalysis.Scale))
  }

  test("star graph matches the hand-computed integer rounds") {
    // A->{B,C}: round 1: B=C = 150e9 + (85 * 5e11) DIV 100 = 575e9,
    // A (no in-edges) = 150e9; round 2: A contributes 150e9 DIV 2 =
    // 75e9 each, so B=C = 150e9 + (85 * 75e9) DIV 100 = 213.75e9
    val r1 = run(Seq((1L, 2L), (1L, 3L)), iters = 1)
    assert(r1 === Map(1L -> 150000000000L, 2L -> 575000000000L, 3L -> 575000000000L))
    val r2 = run(Seq((1L, 2L), (1L, 3L)), iters = 2)
    assert(r2 === Map(1L -> 150000000000L, 2L -> 213750000000L, 3L -> 213750000000L))
  }

  test("an in-hub accumulates strictly more score than its spokes") {
    val spokes = (2L to 6L)
    val out = run(spokes.map(s => (s, 1L)) ++ Seq((1L, 2L)), iters = 3)
    assert(spokes.forall(s => out(1L) > out(s)))
  }
}
