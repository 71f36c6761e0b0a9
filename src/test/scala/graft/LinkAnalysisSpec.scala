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

  test("tol: converges to the exact integer fixpoint within budget") {
    // star A->{B,C}: leaves hit the fixpoint at round 2 (A's score is
    // the base term from round 1 on), proven at round 3 — within an
    // 8-round budget, and the result is the true fixpoint
    val out = LinkAnalysis.pageRankInt(
      Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"), iters = 8, tol = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 150000000000L, 2L -> 213750000000L, 3L -> 213750000000L))
  }

  test("tol: exhausting the budget unconverged fails loud") {
    // round 1 changes every score on this star (leaves leave Scale),
    // so a 1-round budget cannot prove a fixpoint
    val e = intercept[IllegalStateException] {
      LinkAnalysis.pageRankInt(
        Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"), iters = 1, tol = Some(0L))
        .count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("fixed-round and tol runs agree once both are past the fixpoint") {
    // disjoint ring {1,2,3} (fixpoint from the start) + chain 4->5
    // (exact fixpoint at round 2, proven at round 3)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("src", "dst")
    val fixed = LinkAnalysis.pageRankInt(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val conv = LinkAnalysis.pageRankInt(edges, iters = 8, tol = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv === fixed)
    assert(conv(5L) === 150000000000L + 85L * 150000000000L / 100L)
  }
}
