package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties behind `Corpus.tokenWindows`, stated on the
  * pure window arithmetic (starts = 1, 1+S, 1+2S, ... ≤ n; window i
  * covers [start_i, min(start_i + W - 1, n)]):
  *  - totality: every token position is covered by at least one window
  *    whenever S <= W (the operator's useful regime; S > W legally
  *    SKIPS tokens, which the third property pins as exactly the gap
  *    arithmetic says);
  *  - budget: no window exceeds W tokens;
  *  - stride: consecutive windows start exactly S apart.
  * The Spark implementation is the same arithmetic via
  * sequence/slice; `CorpusSpec` pins it on concrete fixtures and the
  * q124 oracle pins it against DuckDB — these properties justify the
  * arithmetic for ALL (n, W, S), not just the fixtures. */
object CorpusProps extends Properties("TokenWindows") {

  private case class Win(start: Int, end: Int)

  private def windows(n: Int, w: Int, s: Int): Seq[Win] =
    (1 to n by s).map(st => Win(st, math.min(st + w - 1, n)))

  private val gen = for {
    n <- Gen.chooseNum(1, 300)
    w <- Gen.chooseNum(1, 64)
    s <- Gen.chooseNum(1, 64)
  } yield (n, w, s)

  property("coverage is total when stride <= window") = forAll(gen) {
    case (n, w, s0) =>
      val s = math.min(s0, w) // restrict to the covering regime
      val ws = windows(n, w, s)
      (1 to n).forall(p => ws.exists(win => win.start <= p && p <= win.end))
  }

  property("no window exceeds the token budget") = forAll(gen) {
    case (n, w, s) =>
      windows(n, w, s).forall(win => win.end - win.start + 1 <= w)
  }

  property("consecutive windows start exactly stride apart") = forAll(gen) {
    case (n, w, s) =>
      val starts = windows(n, w, s).map(_.start)
      starts.zip(starts.drop(1)).forall { case (a, b) => b - a == s }
  }

  property("stride > window skips exactly (stride - window) tokens per step") = forAll(gen) {
    case (n, w, s0) =>
      val s = s0 + w // force the skipping regime
      val ws = windows(n, w, s)
      val uncovered = (1 to n).count(p => !ws.exists(win => win.start <= p && p <= win.end))
      val betweenGaps = ws.zip(ws.drop(1)).map { case (a, b) =>
        math.max(0, b.start - a.end - 1)
      }.sum
      val tailGap = math.max(0, n - ws.last.end)
      uncovered == betweenGaps + tailGap
  }
}
