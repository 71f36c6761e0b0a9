package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

/** Round-17 pins: the watermark-buffered SCD2 contract (disordered
  * drains fold to the batch interval build bit-exactly, bounded
  * disorder keeps state bounded — eviction asserted from the engine's
  * own state stats), and the FromCounts histogram domain budget
  * (VERDICT r16 watch item — a deliberately-unquantized input fails
  * loud with the named contract instead of silently funneling a
  * distinct-value-sized window partition). */
class R17Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---------------- watermark-buffered SCD2 ----------------

  test("q382/q383 disordered drains ≡ q376 batch SCD2 (sf0.001)") {
    val batch = graft.queries.R16Q.queries("q376_scd2_intervals")(spark, sf)
      .collect().map(_.toSeq).toSeq
    Seq("q382_stream_scd2_ooo", "q383_stream_scd2_jitter").foreach { q =>
      val got = graft.queries.R17Q.queries(q)(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(got == batch, s"$q drain diverged from the batch build")
    }
  }

  test("bounded disorder evicts buffered SCD2 state MID-drain") {
    import graft.streaming.{MicroBatch, Stateful}
    def drain(in: java.nio.file.Path, delay: String): Seq[Long] = {
      val t = MicroBatch.updateRunTable(spark, sf, inDir = Some(in),
        conf = Stateful.rocksDBConf) { stream =>
        import spark.implicits._
        Stateful.scd2Buffered(
          graft.Tables.toEventTime(stream)
            .withWatermark("ts", delay)
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")), col("event_id"))
            .as[(Long, String, Long, Long)].groupByKey(_._1))
          .toDF("user_id", "event_type", "ts_us", "event_id")
      }
      // per-commit emission counts: every micro-batch is one version
      val vs = t.versions.sorted
      val counts = vs.map(v => t.snapshot(v).count())
      counts.zip(0L +: counts.init).map { case (a, b) => a - b }
    }
    // full-range delay (q382 shape): the watermark never passes a real
    // row mid-drain, so EVERYTHING flushes at the sentinel-driven final
    // timer batch — the honest worst case of unbounded disorder
    val full = drain(MicroBatch.stageEventsSplitSentinel(
      spark, sf, parts = 4, sentinelInterval = "46 DAYS"), "45 days")
    assert(full.sum > 0 && full.takeWhile(_ == 0L).length == full.length - 1
      && full.last == full.sum,
      s"full-range drain should emit only at the final flush: $full")
    // bounded 6h jitter under a 7h delay (q383 shape): the watermark
    // genuinely advances mid-drain, so buffered rows flush (and state
    // evicts) incrementally across commits, not just at the sentinel
    val bounded = drain(MicroBatch.stageEventsJitteredSentinel(
      spark, sf, parts = 6, maxJitterSecs = 21600L,
      sentinelInterval = "8 HOURS"), "7 hours")
    val midEmitting = bounded.dropRight(1).count(_ > 0L)
    assert(midEmitting >= 2,
      s"bounded-disorder drain must emit mid-drain (eviction), got $bounded")
    assert(bounded.last < bounded.sum,
      s"final flush should carry only the tail: $bounded")
  }

  // ---------------- FromCounts histogram domain budget ----------------

  private def unquantized(n: Int) =
    (1 to n).map(i => ("g", i.toLong, 1L)).toDF("g", "value", "c")

  test("FromCounts folds fail loud past the histogram domain budget") {
    Seq[(String, org.apache.spark.sql.DataFrame)](
      "giniFromCounts" -> Stats.giniFromCounts(unquantized(200), "g",
        domainBudget = 100L),
      "decilesFromCounts" -> Stats.decilesFromCounts(unquantized(200), "g",
        domainBudget = 100L),
      "modeFromCounts" -> Stats.modeFromCounts(unquantized(200), "g",
        domainBudget = 100L)
    ).foreach { case (who, df) =>
      val e = intercept[Exception] { df.collect() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains(
        s"$who: per-group distinct-value count exceeds the histogram " +
          "domain budget (100) for group g")),
        s"$who guard did not fire loudly: ${messages(e).mkString(" | ")}")
    }
  }

  test("FromCounts folds unchanged inside the domain budget") {
    val frags = Seq(("g", 10L, 3L), ("g", 20L, 5L), ("g", 30L, 2L),
      ("h", 10L, 4L), ("h", 40L, 4L)).toDF("g", "value", "c")
    val mode = Stats.modeFromCounts(frags, "g").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mode("g") == ((20L, 5L)))
    assert(mode("h") == ((10L, 4L))) // tie 4/4 → smallest value
    val gini = Stats.giniFromCounts(frags, "g").collect()
    assert(gini.length == 2 && gini.forall(!_.isNullAt(3)))
    val dec = Stats.decilesFromCounts(frags, "g").collect()
    assert(dec.length == 18) // 9 deciles × 2 groups
  }
}
