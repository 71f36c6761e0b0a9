package graft

/** Round-22 OPTIMIZATION probe — decompose the streaming-drain family's
  * per-query cost (the bench's largest remaining block: 62 drains,
  * ~168 s/run after r21) into its actual constituents, per guide §1
  * ("measure first"): for each probed query the probe times
  *
  *   - the QUERY-FUNCTION call (staging memo hit + sink create +
  *     stream start + every micro-batch + awaitTermination), and
  *   - the returned relation's `.count()` (sink snapshot read +
  *     read-side fold — the only part that is a *batch plan*),
  *
  * then prints each micro-batch's `durationMs` map from the engine's
  * own progress reports (`MicroBatch.lastRunProgress`): `addBatch` is
  * plan execution incl. the foreachBatch sink commit, `latestOffset` +
  * `getBatch` are file-source bookkeeping, `queryPlanning` is the
  * incremental planner, `walCommit`/`commitOffsets` are the
  * checkpoint's two fsync'd log writes. The gap between the summed
  * trigger durations and the drain wall clock is query start/stop
  * overhead. This is the breakdown that decides WHERE the next lever
  * is (sink commit vs state store vs fixed per-batch bookkeeping) —
  * numbers land in OPTIMIZATION_r22.md.
  *
  * Usage: `sbt "runMain graft.ProbeR22 [query-prefix ...]"` (defaults
  * to a representative face/contract spread).
  */
object ProbeR22 {

  private val defaults = Seq(
    "q356_stream_mode",          // slowest drain: appendRunPerBatch, 4 splits
    "q383_stream_scd2_jitter",   // jittered replay face (transformWithState)
    "q420_stream_rate_ooo",      // full-disorder rate face
    "q42_stream_orders",         // minimal stateless append drain
    "q188_stateful_v2",          // transformWithState running totals
    "q193_stream_join_window")   // stream-stream join

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val names = (if (args.nonEmpty) args.toSeq else defaults)
      .flatMap(p => SparkEntry.queries.keys.filter(_.startsWith(p)).toSeq.sorted)
    // warm-up: JVM + codegen + the shared staged landing dirs, so the
    // probed numbers match a bench rep (which also runs memo-warm)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[probe] warmup $n failed: ${e.getMessage}") }
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      val ps = streaming.MicroBatch.lastRunProgress
      println(f"[probe] $n: drain ${(t1 - t0) / 1e9}%6.2f s, fold+count ${(t2 - t1) / 1e9}%6.2f s, ${ps.size}%d batches")
      var sums = Map.empty[String, Long].withDefaultValue(0L)
      ps.foreach { p =>
        val d = p.durationMs
        val keys = d.keySet.toArray(Array.empty[String]).toSeq.sorted
        keys.foreach(k => sums = sums.updated(k, sums(k) + d.get(k)))
        println("[probe]   batch " + p.batchId + ": " +
          keys.map(k => s"$k=${d.get(k)}").mkString(" "))
      }
      if (ps.nonEmpty) {
        val trig = sums("triggerExecution")
        println("[probe]   SUM: " + sums.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ") +
          f"  (trigger total ${trig / 1e3}%.2f s of ${(t1 - t0) / 1e9}%.2f s drain)")
        // state-store side of addBatch: per-operator update/removal/commit
        // wall (summed over batches; tasks run in parallel, so these are
        // upper bounds on the store's contribution to the critical path)
        ps.flatMap(_.stateOperators.toSeq).groupBy(_.operatorName).foreach {
          case (op, os) =>
            println("[probe]   state " + op +
              s": updates=${os.map(_.allUpdatesTimeMs).sum}ms " +
              s"removals=${os.map(_.allRemovalsTimeMs).sum}ms " +
              s"commit=${os.map(_.commitTimeMs).sum}ms")
            var cm = Map.empty[String, Long].withDefaultValue(0L)
            os.foreach(_.customMetrics.forEach((k, v) =>
              cm = cm.updated(k, cm(k) + v.longValue)))
            val interesting = cm.toSeq.filter(_._2 > 0).sortBy(-_._2).take(14)
            if (interesting.nonEmpty)
              println("[probe]   custom " +
                interesting.map { case (k, v) => s"$k=$v" }.mkString(" "))
        }
      }
    }
    spark.stop()
  }
}
