package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 pins: the dynamic-session replay face and the jittered
  * funnel face fold to their batch builds bit-exactly on the engine
  * path (RocksDB + file source), the jittered funnel flushes its
  * Seq-typed replay state MID-drain (per-commit eviction, the R17Spec
  * discipline), and the sentinel-survival contract fails LOUD instead
  * of silently truncating when a pre-processor filter drops the
  * sentinel (VERDICT r18 wrong #2 — found by hand in r18, now a
  * guard). */
class R19Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q408 disordered drain ≡ q190 batch dynamic sessions (sf0.001)") {
    val batch = graft.queries.ExtendedQ.queries("q190_dynamic_sessions")(
      spark, sf).collect().map(_.toSeq).toSeq
    val got = graft.queries.R19Q.queries("q408_stream_sessions_ooo")(
      spark, sf).collect().map(_.toSeq).toSeq
    assert(got == batch, "q408 drain diverged from the batch session build")
  }

  test("q409 jittered drain ≡ q204 batch windowed funnel (sf0.001)") {
    val batch = graft.queries.ExtendedQ.queries("q204_windowed_funnel")(
      spark, sf).collect().map(_.toSeq).toSeq
    val got = graft.queries.R19Q.queries("q409_stream_funnel_jitter")(
      spark, sf).collect().map(_.toSeq).toSeq
    assert(got == batch, "q409 drain diverged from the batch funnel build")
  }

  test("bounded jitter flushes buffered funnel state MID-drain " +
      "(per-commit eviction of the Seq-typed replay state)") {
    import graft.streaming.{MicroBatch, Stateful}
    val in = MicroBatch.stageEventsJitteredSentinel(spark, sf, parts = 6,
      maxJitterSecs = 21600L, sentinelInterval = "8 HOURS")
    val t = MicroBatch.updateRunTable(spark, sf, inDir = Some(in),
      conf = Stateful.rocksDBConf) { stream =>
      import spark.implicits._
      Stateful.funnelBuffered(
        graft.Tables.toEventTime(stream)
          .withWatermark("ts", "7 hours")
          .filter(col("event_type").isin(
            "view", "click", "purchase", "__sentinel__"))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")), col("event_id"))
          .as[(Long, String, Long, Long)].groupByKey(_._1),
        steps = Seq("view", "click", "purchase"),
        withinUs = Seq(86400L * 1000000L, 86400L * 1000000L))
        .toDF("user_id", "depth")
    }
    // per-commit emission counts: every micro-batch is one version
    val vs = t.versions.sorted
    val counts = vs.map(v => t.snapshot(v).count())
    val deltas = counts.zip(0L +: counts.init).map { case (a, b) => a - b }
    val midEmitting = deltas.dropRight(1).count(_ > 0L)
    assert(midEmitting >= 2,
      s"jittered funnel drain must emit mid-drain (eviction), got $deltas")
    assert(deltas.last < deltas.sum,
      s"final flush should carry only the tail: $deltas")
  }

  test("dropping the sentinel from a buffered replay drain fails LOUD " +
      "(sentinel-survival guard)") {
    import graft.streaming.{MicroBatch, Stateful}
    val in = MicroBatch.stageEventsSplitSentinel(spark, sf, parts = 4,
      sentinelInterval = "46 DAYS")
    assert(MicroBatch.sentinelBoundaryUs(in).nonEmpty,
      "sentinel staging must register the real-max boundary")
    // the q399 shape with the sentinel FILTERED OUT of the
    // pre-processor — Catalyst pushes the filter below the watermark
    // node, the final watermark never advances past the real rows, and
    // before r19 the buffered tail silently vanished from the result
    val e = intercept[IllegalArgumentException] {
      MicroBatch.updateRun(spark, sf, inDir = Some(in),
        conf = Stateful.rocksDBConf) { stream =>
        import spark.implicits._
        Stateful.funnelBuffered(
          graft.Tables.toEventTime(stream)
            .withWatermark("ts", "45 days")
            .filter(col("event_type").isin("view", "click", "purchase"))
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")), col("event_id"))
            .as[(Long, String, Long, Long)].groupByKey(_._1),
          steps = Seq("view", "click", "purchase"),
          withinUs = Seq(86400L * 1000000L, 86400L * 1000000L))
          .toDF("user_id", "depth")
      }
    }
    assert(e.getMessage.contains("sentinel-survival violated"),
      s"guard did not name the contract: ${e.getMessage}")
  }

  test("SessionBuffered rejects non-positive gaps (the funnel " +
      "positivity contract, ADVICE r18)") {
    Seq(
      (Map.empty[String, Long], 0L),
      (Map("a" -> -1L), 3600000000L)
    ).foreach { case (byType, dflt) =>
      val e = intercept[IllegalArgumentException] {
        new graft.streaming.Stateful.SessionBuffered(byType, dflt)
      }
      assert(e.getMessage.contains("strictly positive"))
    }
    val e2 = intercept[IllegalArgumentException] {
      new graft.streaming.Stateful.FunnelBuffered(Seq("a", "b"), Seq(0L))
    }
    assert(e2.getMessage.contains("strictly positive"))
  }
}
