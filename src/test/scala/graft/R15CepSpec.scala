package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Differential pins for CEP ALTERNATION (matchStepsAlt, r15).
  *
  * Three independent angles, per the R14DifferentialSpec stance:
  *  1. DEGENERATE SETS: singleton sets must reproduce matchSteps
  *     row-for-row on seeded random data — the delegation is real,
  *     not parallel code paths.
  *  2. BRUTE FORCE: an in-memory greedy-backtracking replay of the
  *     documented set semantics (set membership for matches and run
  *     extension, include-before-skip at the earliest optional step)
  *     — structurally independent of the operator's carries/joins.
  *  3. DIRECTED CASES: mixed-member (A|B)+ runs, where per-TYPE run
  *     encoding and per-SET run encoding genuinely disagree. */
class R15CepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // seeded random fixture: few types, heavy ts collisions (ties matter)
  private val rnd = new scala.util.Random(1115)
  private val types = Vector("a", "b", "c", "g", "h")
  private val evRows: Seq[(Long, String, Long, Long)] =
    (1L to 500L).map { id =>
      val user = 1L + rnd.nextInt(12)
      val t = types(rnd.nextInt(types.size))
      val ts = (1L + rnd.nextInt(40)) * 1000000L
      (user, t, ts, id)
    }
  private def evDf = evRows.toDF("user_id", "event_type", "ts_us", "event_id")

  /** In-memory replay of matchStepsAlt's documented set semantics. */
  private def refMatchAlt(steps: Seq[(Seq[String], String)],
                          guards: Map[Int, Seq[String]],
                          withinSec: Long,
                          contiguous: Boolean): Set[(Long, Long, Long, Long)] = {
    val alphabet = (steps.flatMap(_._1) ++ guards.values.flatten).distinct.sorted
    val byUser = evRows.filter(r => alphabet.contains(r._2))
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, r._4)).toVector).toMap
    def expand(i: Int): Seq[Seq[(Int, Set[String], Boolean)]] =
      if (i == steps.size) Seq(Vector.empty)
      else {
        val (s, q) = steps(i)
        val incl = expand(i + 1)
          .map(rest => (i, s.toSet, q == "plus" || q == "star") +: rest)
        if (q == "opt" || q == "star") incl ++ expand(i + 1) else incl
      }
    val variants = expand(0).filter(_.size >= 2)
    def transGuards(c: Seq[(Int, Set[String], Boolean)], j: Int): Seq[String] = {
      val span = (c(j)._1 + 1) to c(j + 1)._1
      val explicit = span.flatMap(k => guards.getOrElse(k, Nil))
      val auto = if (contiguous) alphabet.filterNot(c(j + 1)._2.contains) else Nil
      (explicit ++ auto).distinct
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
    for ((user, seq) <- byUser; anchorIdx <- seq.indices) {
      val anchor = seq(anchorIdx)
      var matched = false
      for (c <- variants if !matched) {
        if (c.head._2.contains(anchor._2)) {
          // run end from a position: extend while the next row stays
          // IN THE SET (members may interleave — the (A|B)+ reading)
          def runEnd(i: Int, set: Set[String]): Int = {
            var j = i
            while (j + 1 < seq.size && set.contains(seq(j + 1)._2)) j += 1
            j
          }
          var pos = if (c.head._3) runEnd(anchorIdx, c.head._2) else anchorIdx
          var ok = true
          for (j <- 1 until c.size if ok) {
            val (_, sj, plusJ) = c(j)
            val mIdx = (pos + 1 until seq.size).find(i => sj.contains(seq(i)._2))
            mIdx match {
              case None => ok = false
              case Some(mi) =>
                val guardsOk = transGuards(c, j - 1).forall { g =>
                  (pos + 1 until seq.size).find(seq(_)._2 == g) match {
                    case Some(gi) => seq(gi)._3 >= seq(mi)._3
                    case None => true
                  }
                }
                if (!guardsOk) ok = false
                else pos = if (plusJ) runEnd(mi, sj) else mi
            }
          }
          if (ok && seq(pos)._3 - anchor._3 <= withinSec * 1000000L) {
            out += ((user, anchor._4, seq(pos)._4,
              (seq(pos)._3 - anchor._3) / 1000000L))
            matched = true
          }
        }
      }
    }
    out.toSet
  }

  private def runAlt(steps: Seq[(Seq[String], String)],
                     guards: Map[Int, Seq[String]],
                     withinSec: Long, contiguous: Boolean): Unit = {
    val got = EventAnalytics.matchStepsAlt(evDf, steps, guards, withinSec,
      contiguous).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = refMatchAlt(steps, guards, withinSec, contiguous)
    assert(want.nonEmpty, "fixture must produce matches")
    assert(got === want)
  }

  test("degenerate singleton sets ≡ matchSteps, several patterns") {
    val patterns: Seq[(Seq[(String, String)], Map[Int, Seq[String]], Long, Boolean)] =
      Seq(
        (Seq("a" -> "one", "b" -> "plus", "c" -> "one"), Map(2 -> Seq("g")), 100L, false),
        (Seq("a" -> "one", "b" -> "opt", "c" -> "opt"), Map.empty, 100L, false),
        (Seq("a" -> "plus", "g" -> "star", "b" -> "one"), Map.empty, 12L, true))
    patterns.foreach { case (steps, g, w, cont) =>
      val viaAlt = EventAnalytics.matchStepsAlt(evDf,
        steps.map { case (t, q) => (Seq(t), q) }, g, w, cont).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val viaSingle = EventAnalytics.matchSteps(evDf, steps, g, w, cont)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(viaAlt === viaSingle, s"pattern $steps")
    }
  }

  test("alternation ≡ brute force: (a|b) then c, guard g") {
    runAlt(Seq(Seq("a", "b") -> "one", Seq("c") -> "one"),
      Map(1 -> Seq("g")), withinSec = 100L, contiguous = false)
  }

  test("alternation ≡ brute force: (a|b)+ run then c — mixed-member runs") {
    runAlt(Seq(Seq("a", "b") -> "plus", Seq("c") -> "one"),
      Map.empty, withinSec = 100L, contiguous = false)
    runAlt(Seq(Seq("a", "b") -> "plus", Seq("c", "g") -> "one"),
      Map(1 -> Seq("h")), withinSec = 30L, contiguous = false)
  }

  test("alternation ≡ brute force: optional set step + contiguity") {
    runAlt(Seq(Seq("a") -> "one", Seq("b", "g") -> "opt", Seq("c") -> "one"),
      Map.empty, withinSec = 100L, contiguous = false)
    runAlt(Seq(Seq("a") -> "one", Seq("b", "g") -> "star", Seq("c") -> "one"),
      Map.empty, withinSec = 100L, contiguous = true)
  }

  test("directed: mixed (a|b)+ run consumes across member changes") {
    // user 1: a b a c  — the (a|b)+ run from the first a must extend
    // through b AND the second a, ending the match at c with the run
    // end at the SECOND a (per-type runs would stop at the first a)
    val ev = Seq(
      (1L, "a", 1000000L, 10L),
      (1L, "b", 2000000L, 11L),
      (1L, "a", 3000000L, 12L),
      (1L, "c", 4000000L, 13L)
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val got = EventAnalytics.matchStepsAlt(ev,
      Seq(Seq("a", "b") -> "plus", Seq("c") -> "one"), withinSec = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // anchors: every in-set event (per-anchor granularity)
    assert(got === Set((1L, 10L, 13L, 3L), (1L, 11L, 13L, 2L),
      (1L, 12L, 13L, 1L)))
  }

  test("matchStepsLocal ≡ matchStepsAlt per user (the streaming " +
    "processor's re-derivation kernel)") {
    // the q288 processor re-derives matches per batch with the local
    // matcher; if its greedy enumeration ever diverged from the
    // distributed operator's priority encoding, stream and batch
    // would disagree — pin them against each other on every pattern
    val patterns: Seq[(Seq[(Seq[String], String)], Map[Int, Seq[String]], Long, Boolean)] =
      Seq(
        (Seq(Seq("a", "b") -> "plus", Seq("c") -> "one"), Map(1 -> Seq("g")), 100L, false),
        (Seq(Seq("a") -> "one", Seq("b", "g") -> "opt", Seq("c") -> "one"), Map.empty, 100L, false),
        (Seq(Seq("a") -> "one", Seq("b") -> "star", Seq("c", "h") -> "one"), Map.empty, 30L, true))
    patterns.foreach { case (steps, g, w, cont) =>
      val dist = EventAnalytics.matchStepsAlt(evDf, steps, g, w, cont)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val local = evRows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
        EventAnalytics.matchStepsLocal(
          rs.map(r => (r._2, r._3, r._4)), steps, g, w * 1000000L, cont)
          .map { case (a, b, gap) => (u, a, b, gap) }
      }.toSet
      assert(local === dist, s"pattern $steps")
    }
  }

  test("directed: match_len measures count the mapped events") {
    // user 1: a b a c — (a|b)+ c with withLen: anchor at the first a
    // maps the 3-event run plus c = 4; later anchors map shorter runs
    val ev = Seq(
      (1L, "a", 1000000L, 10L),
      (1L, "b", 2000000L, 11L),
      (1L, "a", 3000000L, 12L),
      (1L, "c", 4000000L, 13L),
      // user 2: a g c — the one-step pattern a then c maps 2 events
      // regardless of the intervening g (skip-liberal)
      (2L, "a", 1000000L, 20L),
      (2L, "g", 2000000L, 21L),
      (2L, "c", 3000000L, 22L)
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val got = EventAnalytics.matchStepsAlt(ev,
      Seq(Seq("a", "b") -> "plus", Seq("c") -> "one"), withinSec = 100L,
      withLen = true).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("match_len"))).toSet
    assert(got === Set((1L, 10L, 4L), (1L, 11L, 3L), (1L, 12L, 2L),
      (2L, 20L, 2L)))
    // and the default path still omits the column
    val cols = EventAnalytics.matchStepsAlt(ev,
      Seq(Seq("a", "b") -> "plus", Seq("c") -> "one"),
      withinSec = 100L).columns.toSeq
    assert(!cols.contains("match_len"))
  }

  test("directed: adjacent overlapping sets refuse loudly") {
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.matchStepsAlt(evDf,
        Seq(Seq("a", "b") -> "one", Seq("b", "c") -> "one"))
    }
    assert(e.getMessage.contains("share types"))
  }
}
