package graft

import org.apache.spark.sql.functions._

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

  /** ×1/×4/×8 corpus-multiplication probe for the r22 q373 rewrite
    * (PERF.md scaling-probe convention): the OLD shape ran both exact
    * selection passes over RAW rows (three scans + two raw-row
    * shuffles); the NEW shape counts once into (group, value)
    * fragments and selects over the merged counts. Multiplying the
    * corpus multiplies duplicate density — the fragment relation stays
    * the SAME SIZE while the raw relation grows ×k, so the gap must
    * widen with k. Timed action = noop sink (guide §1.4). */
  private def q373Scale(spark: org.apache.spark.sql.SparkSession,
                        sfDir: String): Unit = {
    import org.apache.spark.sql.DataFrame
    def noop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val S = graft.operators.Stats
    def madOld(ev: DataFrame): DataFrame = {
      val med = S.exactRankStats(ev, "event_type", "cents")
        .select(col("event_type"), col("p50").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("absdev", abs(col("cents") - col("med")))
      val mad = S.exactRankStats(dev, "event_type", "absdev")
        .select(col("event_type"), col("p50").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
          count(lit(1)).as("n"),
          sum(when(col("absdev") > lit(3L) * col("mad"), 1L)
            .otherwise(0L)).cast("long").as("n_outliers"))
    }
    def madNew(ev: DataFrame): DataFrame = {
      val counts = ev.groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("c"))
      val med = S.exactRankStatsWeighted(counts, "event_type", "cents", "c")
        .select(col("event_type"), col("p50").as("med"))
      val dev = counts.join(broadcast(med), "event_type")
        .withColumn("absdev", abs(col("cents") - col("med")))
      val mad = S.exactRankStatsWeighted(
          dev.select(col("event_type"), col("absdev"), col("c")),
          "event_type", "absdev", "c")
        .select(col("event_type"), col("p50").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
          sum(col("c")).cast("long").as("n"),
          sum(when(col("absdev") > lit(3L) * col("mad"), col("c"))
            .otherwise(0L)).cast("long").as("n_outliers"))
    }
    println("[probe] Q373 SHAPE A/B under corpus multiplication (noop sink)")
    Seq(1, 4, 8).foreach { k =>
      // stage ×k to PARQUET and read it back like the query does — the
      // rewrite's claim is pass-count over the stored base data (old:
      // three scans + two raw-row selection passes; new: one scan into
      // one count shuffle), so the input must live behind a scan, not
      // a localCheckpoint that would hand both shapes a free cache
      val one = Tables.events(spark, sfDir)
      val dir = graft.lake.TempDirs.create("graft-q373-scale")
      (1 to k).map(_ => one).reduce(_ union _)
        .write.mode("overwrite").parquet(dir.toString)
      val ev = spark.read.parquet(dir.toString).select(col("event_type"),
        floor(col("value") * lit(100.0)).cast("long").as("cents"))
      noop(madNew(ev)); noop(madOld(ev)) // JIT/codegen warm-up, untimed
      val tNew = Seq.fill(3)(noop(madNew(ev))).min
      val tOld = Seq.fill(3)(noop(madOld(ev))).min
      println(f"[probe]   ×$k%d: raw-row shape $tOld%6.2f s, " +
        f"fragment shape $tNew%6.2f s  (${tOld / tNew}%4.2f× )")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    if (args.headOption.contains("q373scale")) {
      q373Scale(spark, sfDir); spark.stop(); return
    }
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
