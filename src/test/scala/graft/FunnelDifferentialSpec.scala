package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Differential: the join-chain funnel must agree with a direct
  * per-user reference computed driver-side, across randomized event
  * sets (seeded — reproducible) covering the edge cases the join
  * mechanics could get wrong: users missing early steps, later-step
  * events BEFORE the earlier step (must not count), duplicate
  * timestamps (strictly-after excludes ties), step types absent
  * entirely (must still emit a 0 row), and — for the windowed form —
  * events after the earlier step but OUTSIDE its conversion window.
  */
class FunnelDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val steps = Seq("view", "click", "purchase")

  /** Reference semantics, computed directly: t0 = min ts of step 0;
    * tk = min ts of step k strictly after t(k-1) and, when windowed,
    * at most within(k-1) seconds after it. Emits every step, 0 when
    * nobody reached it. */
  private def reference(rows: Seq[(Long, String, Long)],
                        within: Seq[Long] = Seq.empty): Map[String, Long] = {
    val byUser = rows.groupBy(_._1)
    val perUserDepth: Iterable[Int] = byUser.values.map { evs =>
      var prev = Option.empty[Long]
      var depth = 0
      var continue = true
      steps.zipWithIndex.foreach { case (st, i) =>
        if (continue) {
          val cand = evs.filter { e =>
            e._2 == st && prev.forall { p =>
              e._3 > p &&
                (within.isEmpty || e._3 <= p + within(i - 1) * 1000000L)
            }
          }.map(_._3)
          if (cand.isEmpty) continue = false
          else { prev = Some(cand.min); depth += 1 }
        }
      }
      depth
    }
    steps.indices.map { i =>
      s"${i + 1}_${steps(i)}" -> perUserDepth.count(_ > i).toLong
    }.toMap
  }

  private def run(rows: Seq[(Long, String, Long)],
                  within: Seq[Long]): Map[String, Long] = {
    import spark.implicits._
    val ev = rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    EventAnalytics.funnelSteps(ev, steps, within)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def trials(within: Seq[Long], seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val types = steps ++ Seq("noise", "error")
    (1 to 12).foreach { trial =>
      val n = 30 + rnd.nextInt(120)
      val rows = Seq.fill(n)((
        (rnd.nextInt(8) + 1).toLong,
        types(rnd.nextInt(types.size)),
        // coarse timestamps force duplicate (user, ts) collisions so
        // the strictly-after tie behavior is actually exercised
        (rnd.nextInt(40) * 60L) * 1000000L))
      assert(run(rows, within) === reference(rows, within),
        s"trial $trial diverged (n=$n, within=$within)")
    }
  }

  test("funnel join-chain agrees with the per-user reference on seeded random data") {
    trials(Seq.empty, seed = 421112)
  }

  test("windowed funnel agrees with the per-user reference (tight windows)") {
    // 10-minute windows against 1-minute-grid timestamps: most
    // transitions are out of window, so the bound genuinely bites
    trials(Seq(600L, 600L), seed = 421113)
  }

  test("windowed funnel with a huge window equals the unwindowed funnel") {
    val rnd = new scala.util.Random(421114)
    val types = steps ++ Seq("noise")
    val rows = Seq.fill(150)((
      (rnd.nextInt(10) + 1).toLong,
      types(rnd.nextInt(types.size)),
      (rnd.nextInt(60) * 60L) * 1000000L))
    assert(run(rows, Seq(86400L * 365, 86400L * 365)) === run(rows, Seq.empty))
  }

  test("windowed conversions are a subset of unwindowed at every step") {
    val rnd = new scala.util.Random(421115)
    val types = steps ++ Seq("noise")
    val rows = Seq.fill(200)((
      (rnd.nextInt(12) + 1).toLong,
      types(rnd.nextInt(types.size)),
      (rnd.nextInt(80) * 60L) * 1000000L))
    val bounded = run(rows, Seq(900L, 900L))
    val free = run(rows, Seq.empty)
    free.foreach { case (step, n) =>
      assert(bounded(step) <= n, s"$step: windowed ${bounded(step)} > unwindowed $n")
    }
  }

  test("every step emits a row even when nobody reaches it") {
    import spark.implicits._
    // views only — click and purchase stages are empty relations
    val ev = Seq((1L, "view", 1000000L), (2L, "view", 2000000L))
      .toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val got = EventAnalytics.funnelSteps(ev, steps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_view" -> 2L, "2_click" -> 0L, "3_purchase" -> 0L))
  }

  test("labels zero-pad past nine steps so lexical order is funnel order") {
    import spark.implicits._
    val manySteps = (1 to 11).map(i => s"s$i")
    val ev = Seq((1L, "s1", 1000000L)).toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val labels = EventAnalytics.funnelSteps(ev, manySteps)
      .collect().map(_.getString(0)).sorted
    assert(labels.head === "01_s1" && labels.last === "11_s11")
    assert(labels === manySteps.indices.map(i => f"${i + 1}%02d_s${i + 1}"))
  }
}
