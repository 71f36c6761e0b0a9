package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics, Stats}

/** Brute-force differential replays of the r14 analytics operators on
  * SEEDED RANDOM data (the R13DifferentialSpec stance): each operator
  * runs against a straight-line in-memory implementation of its
  * documented semantics, with timestamp ties and degenerate shapes
  * deliberately present. The random fixtures are small enough to
  * enumerate and adversarial enough to catch tie-order, guard, and
  * edge-window bugs the curated oracles might miss. */
class R14DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- seeded random event fixture: few types, heavy ts collisions
  private val rnd = new scala.util.Random(42)
  private val types = Vector("a", "b", "c", "g")
  private val evRows: Seq[(Long, String, Long, Long)] =
    (1L to 400L).map { id =>
      val user = 1L + rnd.nextInt(12)
      val t = types(rnd.nextInt(types.size))
      val ts = (1L + rnd.nextInt(40)) * 1000000L // collisions guaranteed
      (user, t, ts, id)
    }
  private def evDf = evRows.toDF("user_id", "event_type", "ts_us", "event_id")

  /** In-memory replay of matchSteps' documented semantics. */
  private def refMatchSteps(steps: Seq[(String, String)],
                            guards: Map[Int, Seq[String]],
                            withinSec: Long,
                            contiguous: Boolean): Set[(Long, Long, Long, Long)] = {
    val alphabet = (steps.map(_._1) ++ guards.values.flatten).distinct.sorted
    val byUser = evRows.filter(r => alphabet.contains(r._2))
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, r._4)).toVector).toMap
    // genuine greedy-backtracking enumeration (MATCH_RECOGNIZE order):
    // recurse left-to-right, trying INCLUDE before SKIP at each
    // optional step — structurally independent of the operator's
    // priority bit math, so a wrong tie-break there fails here
    def expand(i: Int): Seq[Seq[(Int, String, Boolean)]] =
      if (i == steps.size) Seq(Vector.empty)
      else {
        val (t, q) = steps(i)
        val incl = expand(i + 1)
          .map(rest => (i, t, q == "plus" || q == "star") +: rest)
        if (q == "opt" || q == "star") incl ++ expand(i + 1) else incl
      }
    val variants = expand(0).filter(_.size >= 2)
    def transGuards(c: Seq[(Int, String, Boolean)], j: Int): Seq[String] = {
      val span = (c(j)._1 + 1) to c(j + 1)._1
      val explicit = span.flatMap(k => guards.getOrElse(k, Nil))
      val auto = if (contiguous) alphabet.filterNot(_ == c(j + 1)._2) else Nil
      (explicit ++ auto).distinct
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
    for ((user, seq) <- byUser; anchorIdx <- seq.indices) {
      val anchor = seq(anchorIdx)
      var matched = false
      for (c <- variants if !matched) {
        if (anchor._2 == c.head._2) {
          // run end from a position: extend while the next row repeats
          // the type
          def runEnd(i: Int): Int = {
            var j = i
            while (j + 1 < seq.size && seq(j + 1)._2 == seq(j)._2) j += 1
            j
          }
          var pos = if (c.head._3) runEnd(anchorIdx) else anchorIdx
          var ok = true
          for (j <- 1 until c.size if ok) {
            val (_, tj, plusJ) = c(j)
            val mIdx = (pos + 1 until seq.size).find(seq(_)._2 == tj)
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
                else pos = if (plusJ) runEnd(mi) else mi
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

  private def runMatch(steps: Seq[(String, String)],
                       guards: Map[Int, Seq[String]],
                       withinSec: Long, contiguous: Boolean): Unit = {
    val got = EventAnalytics.matchSteps(evDf, steps, guards, withinSec,
      contiguous).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = refMatchSteps(steps, guards, withinSec, contiguous)
    assert(want.nonEmpty, "fixture must produce matches")
    assert(got === want)
  }

  test("matchSteps ≡ brute force: one/plus with a guard, skip-liberal") {
    runMatch(Seq("a" -> "one", "b" -> "plus", "c" -> "one"),
      Map(2 -> Seq("g")), withinSec = 100L, contiguous = false)
  }

  test("matchSteps ≡ brute force: opt under contiguity (backtracking)") {
    runMatch(Seq("a" -> "one", "b" -> "opt", "c" -> "one"),
      Map.empty, withinSec = 100L, contiguous = true)
  }

  test("matchSteps ≡ brute force: star + plus mixed, within bound biting") {
    runMatch(Seq("a" -> "plus", "g" -> "star", "b" -> "one"),
      Map.empty, withinSec = 12L, contiguous = false)
  }

  test("matchSteps ≡ brute force: TWO optional steps (priority order)") {
    runMatch(Seq("a" -> "one", "b" -> "opt", "c" -> "opt"),
      Map.empty, withinSec = 100L, contiguous = false)
    runMatch(Seq("a" -> "one", "b" -> "star", "g" -> "opt", "c" -> "one"),
      Map(3 -> Seq("b")), withinSec = 100L, contiguous = false)
  }

  test("matchSteps greedy tie-break: A B? C? on 'A C B' backtracks C?, " +
    "keeping B (r15 ADVICE fix)") {
    // include-beats-skip at the EARLIEST optional step: the full
    // A B C variant fails (no C after the B), so greed backtracks the
    // LATER optional (C?) first and matches A B (end = B at ts 3),
    // never A C (end = C at ts 2).
    val ev = Seq(
      (1L, "a", 1000000L, 10L),
      (1L, "c", 2000000L, 11L),
      (1L, "b", 3000000L, 12L)
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val got = EventAnalytics.matchSteps(ev,
      Seq("a" -> "one", "b" -> "opt", "c" -> "opt"),
      withinSec = 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 10L, 12L, 2L)))
  }

  // ---- daily-grid fixtures for the stats family
  private val dayRows: Seq[(String, java.sql.Timestamp)] = {
    val r2 = new scala.util.Random(7)
    (1 to 600).map { _ =>
      val g = Vector("x", "y", "z")(r2.nextInt(3))
      val day = r2.nextInt(30) // gaps guaranteed per group
      (g, java.sql.Timestamp.valueOf(f"2020-01-${day + 1}%02d 12:00:00"))
    }
  }
  private def dayDf = dayRows.toDF("event_type", "ts")

  private def grids: Map[String, Vector[Long]] =
    dayRows.groupBy(_._1).map { case (g, rs) =>
      val counts = rs.groupBy(r => r._2.toLocalDateTime.getDayOfMonth - 1)
        .view.mapValues(_.size.toLong).toMap
      val (lo, hi) = (counts.keys.min, counts.keys.max)
      g -> (lo to hi).map(d => counts.getOrElse(d, 0L)).toVector
    }

  test("madAnomalyDaily ≡ brute force doubled medians") {
    def med2(xs: Vector[Long]): Long = {
      val s = xs.sorted; val n = s.size
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val got = Stats.madAnomalyDaily(dayDf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    val want = grids.flatMap { case (g, xs) =>
      val m2 = med2(xs)
      val dev2 = xs.map(x => math.abs(2 * x - m2))
      val m4 = med2(dev2)
      val lo = dayRows.filter(_._1 == g)
        .map(_._2.toLocalDateTime.getDayOfMonth - 1).min
      xs.zipWithIndex.map { case (x, i) =>
        (g, (lo + i).toLong, x, m2, m4, 2 * math.abs(2 * x - m2) > 3 * m4)
      }
    }.toSet
    assert(got === want && want.exists(_._6))
  }

  test("holtDaily ≡ brute force integer fold") {
    val (aD, bD) = (8L, 4L)
    val res = EventAnalytics.holtDaily(dayDf, alphaDen = 8, betaDen = 4)
      .select("event_type", "day", "level", "trend").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    def floorDiv(a: Long, b: Long): Long = a / b // both engines truncate
    val want = grids.flatMap { case (g, xs) =>
      val lo = dayRows.filter(_._1 == g)
        .map(_._2.toLocalDateTime.getDayOfMonth - 1).min
      var l = 0L; var b = 0L
      xs.zipWithIndex.map { case (x, i) =>
        if (i == 0) { l = x * 1000000L; b = 0L }
        else {
          val delta = floorDiv(x * 1000000L - (l + b), aD)
          l = l + b + delta
          b = b + floorDiv(delta, bD)
        }
        (g, (lo + i).toLong, l.toDouble / 1e6, b.toDouble / 1e6)
      }
    }.toSet
    assert(res === want)
  }

  test("acfDaily ≡ brute force exact deviations") {
    val got = EventAnalytics.acfDaily(dayDf, maxLag = 3).collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    val want = grids.flatMap { case (g, xs) =>
      val n = xs.size.toLong
      val s = xs.sum
      val dev = xs.map(x => BigInt(x * n - s))
      val d0 = dev.map(d => d * d).sum
      (1 to 3).map { k =>
        val nk = (0 until xs.size - k).map(t => dev(t) * dev(t + k)).sum
        (g, k.toLong,
          if (xs.size <= k) None
          else Some(nk.toDouble / d0.toDouble))
      }
    }.toSet
    assert(got === want)
  }

  test("exactRankStats ≡ sorted-index reference, negatives and ties included") {
    val r3 = new scala.util.Random(11)
    val rows = (1 to 3000).map { _ =>
      val g = Vector("x", "y", "z")(r3.nextInt(3))
      // heavy ties + negatives + one wide-range group
      val v = if (g == "z") r3.nextLong() % 1000000L
              else (r3.nextInt(41) - 20).toLong
      (g, v)
    }
    val got = Stats.exactRankStats(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val s = rs.map(_._2).sorted.toVector
      val n = s.size.toLong
      def at(a: Long, b: Long) =
        s((math.max(1L, (a * (n + 1)) / b) - 1).toInt)
      g -> (n, s.head, at(1, 4), at(1, 2), at(3, 4), at(9, 10), s.last)
    }
    assert(got === want)
  }

  test("exactRankStats fails loud, never garbage, on a range past ±2⁶²") {
    // ANSI mode (the engine default) raises ARITHMETIC_OVERFLOW on the
    // width subtraction itself — the operator cannot silently select
    // wrong values from wrapped buckets
    val bad = Seq(("g", Long.MinValue + 1), ("g", Long.MaxValue - 1))
      .toDF("g", "v")
    val e = intercept[Exception] {
      Stats.exactRankStats(bad, "g", "v").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("ARITHMETIC_OVERFLOW"))
  }

  test("walkForwardSplit ≡ brute force role assignment") {
    val ev = evDf
    val got = EventAnalytics.walkForwardSplit(ev, folds = 4, embargoSec = 3L)
      .select("event_id", "fold", "role").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val lo = evRows.map(_._3).min
    val hi = evRows.map(_._3).max
    val span = (hi - lo) / 4 + 1
    val want = (for {
      r <- evRows; fold <- 1 to 3
    } yield {
      val tLo = lo + fold * span
      val role =
        if (r._3 >= tLo && r._3 < tLo + span) "test"
        else if (r._3 < tLo - 3L * 1000000L) "train"
        else "excluded"
      (r._4, fold, role)
    }).toSet
    assert(got === want)
  }
}
