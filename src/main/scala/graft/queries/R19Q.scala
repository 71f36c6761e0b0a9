package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Qx._

/** Round-19 additions — the replay skeleton's FIFTH face (dynamic-gap
  * sessionization under disorder, the first whose batch semantics are
  * not append-monotone in arrival order), and the bounded-jitter
  * treatment for the funnel face (VERDICT r18 next #4/#6). All
  * oracle-gated against the BATCH queries' SQL, unchanged. */
object R19Q {

  /** Shared read side of the streaming funnel faces (q399's shape):
    * depth is monotone under ordered replay, so max(depth) per user is
    * the final funnel depth; each step row is a scalar count so
    * zero-converted steps still emit (the q200/q204 shape rule). */
  private def funnelRollup(sink: DataFrame,
                           steps: Seq[String]): DataFrame = {
    val depths = sink.filter(col("user_id") >= 0)
      .groupBy(col("user_id")).agg(max(col("depth")).as("depth"))
      .localCheckpoint(true)
    steps.zipWithIndex.map { case (name, i) =>
      depths.filter(col("depth") >= i + 1)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$name").as("step"),
          col("n_users").cast("long").as("n_users"))
    }.reduce(_ unionByName _).orderBy("step")
  }

  val queries: Map[String, Q] = Map(

    // OUT-OF-ORDER STREAMING DYNAMIC SESSIONS (r19 — VERDICT r18 next
    // #6, the FIFTH replay face): q190's dynamic-gap session windows
    // (clicks/views cool off in 10 minutes, everything else holds the
    // session an hour) under the q382 arrival contract. This is the
    // face the skeleton exists to make possible: in ARRIVAL order a
    // late row can MERGE two sessions an incremental builder already
    // closed — non-monotone state no append-only fold can express —
    // but under watermark-ordered replay rows reach the step in exact
    // (ts, id) event order, the merge case is structurally impossible,
    // and per-key state is O(1): (session start, running max ts+gap,
    // count). Hash-interleaved 4-batch drain + sentinel; the replayed
    // (user, session_start, n) emissions fold by max(n) — a session's
    // start is immutable and its count monotone under ordered replay —
    // and must hash-match the BATCH dynamic session_window oracle
    // (q190's SQL, unchanged). `Stateful.SessionBuffered`.
    "q408_stream_sessions_ooo" -> ((s, d) => {
      val in = graft.streaming.MicroBatch.stageEventsSplitSentinel(
        s, d, parts = 4, sentinelInterval = "46 DAYS")
      val sink = graft.streaming.MicroBatch.updateRun(s, d, inDir = Some(in),
        conf = graft.streaming.Stateful.rocksDBConf) { stream =>
        import s.implicits._
        graft.streaming.Stateful.sessionBuffered(
          graft.Tables.toEventTime(stream)
            .withWatermark("ts", "45 days")
            // pushes BELOW the watermark node; keeps the sentinel
            // (user −1 < 30) — guard-enforced since r19
            .filter(col("user_id") < 30)
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")), col("event_id"))
            .as[(Long, String, Long, Long)].groupByKey(_._1),
          gapUsByType = Map("click" -> 600L * 1000000L,
            "view" -> 600L * 1000000L),
          defaultGapUs = 3600L * 1000000L)
          .toDF("user_id", "start_us", "n")
      }
      sink.filter(col("user_id") >= 0)
        .groupBy(col("user_id"), col("start_us"))
        .agg(max(col("n")).as("n"))
        .select(col("user_id"),
          date_format(timestamp_micros(col("start_us")),
            "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n"))
        .orderBy("user_id", "session_start")
    }),

    // BOUNDED-JITTER STREAMING WINDOWED FUNNEL (r19 — VERDICT r18 next
    // #4): q399's processor under the steady-state production arrival
    // pattern — per-event jitter ≤ 6 h, 6 chronological-by-ARRIVAL
    // batches, watermark delay 7 h ≥ the jitter bound (the q383
    // treatment). The watermark genuinely ADVANCES mid-drain, so the
    // Seq-typed replay state (the entry timestamps reached so far)
    // survives REPEATED PARTIAL flushes with per-flush prefix deletion
    // and re-arms — the one engine-level combination the full-disorder
    // q399 never exercises (everything there buffers to the sentinel;
    // the many-flush unit property covers it only on MemoryStream).
    // R19Spec asserts the mid-drain emissions from per-commit sink
    // versions. Same batch oracle as q204, bit-exact.
    "q409_stream_funnel_jitter" -> ((s, d) => {
      val in = graft.streaming.MicroBatch.stageEventsJitteredSentinel(
        s, d, parts = 6, maxJitterSecs = 21600L,
        sentinelInterval = "8 HOURS")
      val sink = graft.streaming.MicroBatch.updateRun(s, d, inDir = Some(in),
        conf = graft.streaming.Stateful.rocksDBConf) { stream =>
        import s.implicits._
        graft.streaming.Stateful.funnelBuffered(
          graft.Tables.toEventTime(stream)
            .withWatermark("ts", "7 hours")
            // keep the sentinel (guard-enforced since r19)
            .filter(col("event_type").isin(
              "view", "click", "purchase", "__sentinel__"))
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")), col("event_id"))
            .as[(Long, String, Long, Long)].groupByKey(_._1),
          steps = Seq("view", "click", "purchase"),
          withinUs = Seq(86400L * 1000000L, 86400L * 1000000L))
          .toDF("user_id", "depth")
      }
      funnelRollup(sink, Seq("view", "click", "purchase"))
    })
  )

  val oracles: Map[String, String] = Map(
    // q408 drains to exactly the sessions q190's batch dynamic
    // session_window derives — disorder inside the watermark is
    // re-sorted away before the step ever sees a row
    "q408_stream_sessions_ooo" -> ExtendedQ.oracles("q190_dynamic_sessions"),

    // q409: bounded jitter changes WHEN state flushes, never WHAT
    // replays — same batch windowed-funnel oracle as q204/q399
    "q409_stream_funnel_jitter" -> ExtendedQ.oracles("q204_windowed_funnel")
  )
}
