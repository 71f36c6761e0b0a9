package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Differential: the join-chain funnel must agree with a direct
  * per-user reference computed driver-side, across randomized event
  * sets (seeded — reproducible) covering the edge cases the join
  * mechanics could get wrong: users missing early steps, later-step
  * events BEFORE the earlier step (must not count), duplicate
  * timestamps (strictly-after excludes ties), and step types absent
  * entirely.
  */
class FunnelDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val steps = Seq("view", "click", "purchase")

  /** Reference semantics, computed directly: t0 = min ts of step 0;
    * tk = min ts of step k strictly after t(k-1). */
  private def reference(rows: Seq[(Long, String, Long)]): Map[String, Long] = {
    val byUser = rows.groupBy(_._1)
    val perUserDepth: Iterable[Int] = byUser.values.map { evs =>
      var prev = Option.empty[Long]
      var depth = 0
      var continue = true
      steps.foreach { st =>
        if (continue) {
          val cand = evs.filter(e => e._2 == st && prev.forall(e._3 > _)).map(_._3)
          if (cand.isEmpty) continue = false
          else { prev = Some(cand.min); depth += 1 }
        }
      }
      depth
    }
    steps.indices.map { i =>
      s"${i + 1}_${steps(i)}" -> perUserDepth.count(_ > i).toLong
    }.filter(_._2 > 0).toMap
  }

  test("funnel join-chain agrees with the per-user reference on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(421112)
    val types = steps ++ Seq("noise", "error")
    (1 to 12).foreach { trial =>
      val n = 30 + rnd.nextInt(120)
      val rows = Seq.fill(n)((
        (rnd.nextInt(8) + 1).toLong,
        types(rnd.nextInt(types.size)),
        // coarse timestamps force duplicate (user, ts) collisions so
        // the strictly-after tie behavior is actually exercised
        (rnd.nextInt(40) * 60L) * 1000000L))
      val ev = rows.toDF("user_id", "event_type", "us")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("us")).as("ts"))
      val got = EventAnalytics.funnelSteps(ev, steps)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === reference(rows), s"trial $trial diverged (n=$n)")
    }
  }
}
