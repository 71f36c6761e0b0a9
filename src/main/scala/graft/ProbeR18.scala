package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 scale probes (VERDICT r17 next #1 and #6) — a diagnostic
  * main in the Explain/SchemaLint family; results land in PERF.md.
  *
  *  - `state`: the buffered-replay family on the STATE axis — drain
  *    q382/q383/q398-shaped pipelines at ×1/×4/×8 events and (for the
  *    jittered face) ×1/×2/×4 disorder windows, recording drain wall
  *    time, micro-batch count, and the PEAK state-store rows/memory
  *    from the engine's own progress reports. This prices the r17
  *    what's-wrong #3 hazard (the ListState full-buffer rewrite —
  *    restructured to a (ts, id)-keyed MapState with prefix deletion
  *    in r18) with measurements instead of argument.
  *  - `bm25`: the maintained BM25 index (q392's machinery) at ×1/×4/×8
  *    documents with per-copy token suffixes (vocabulary grows with
  *    the corpus — the adversarial axis for a per-term index) and
  *    batch count 4k, recording build (bootstrap + appends), as-of
  *    probe time, and index row count.
  *
  * Usage: `sbt "runMain graft.ProbeR18 [state|bm25] [sfDir]"`.
  * Events are scaled with SHIFTED event ids and +k·1s shifted
  * timestamps so every (ts, id) stays unique — the r18 keyed buffer
  * fails loud on genuine duplicates by design. */
object ProbeR18 {

  private[graft] def scaledEvents(s: SparkSession, d: String, k: Int): DataFrame = {
    val ev = Tables.events(s, d)
    (0 until k).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
        .withColumn("user_id", col("user_id")) // same keys: density axis
        .withColumn("ts", col("ts") + expr(s"INTERVAL $i SECOND"))
    }.reduce(_ unionByName _)
  }

  /** The stageEventsSplitSentinel / stageEventsJitteredSentinel shapes
    * over an arbitrary (scaled) events frame — probe-only, un-memoized. */
  private[graft] def stage(s: SparkSession, ev: DataFrame, parts: Int,
                    jitterSecs: Option[Long],
                    sentinelIntervalHours: Long): Path = {
    val in = graft.lake.TempDirs.create("graft-probe-in")
    val tmp = graft.lake.TempDirs.create("graft-probe-tmp")
    val parted = jitterSecs match {
      case Some(j) =>
        val jit = (conv(substring(md5(col("event_id").cast("string")),
          1, 8), 16, 10).cast("long") % j).cast("double")
        ev.withColumn("__arr", col("ts") +
            make_dt_interval(lit(0), lit(0), lit(0), jit))
          .repartitionByRange(parts, col("__arr"))
          .sortWithinPartitions(col("__arr")).drop("__arr")
      case None =>
        ev.repartition(parts, col("event_id"))
    }
    parted.write.mode("overwrite").parquet(tmp.toString)
    val mx = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = ev.limit(1).select(
      lit(-1L).as("event_id"),
      (lit(mx) + expr(s"INTERVAL $sentinelIntervalHours HOURS")).as("ts"),
      lit(-1L).as("user_id"), lit("__sentinel__").as("event_type"),
      lit(0.0d).as("value"), lit("{}").as("props"))
    val tmpS = graft.lake.TempDirs.create("graft-probe-sent")
    sentinel.coalesce(1).write.mode("overwrite").parquet(tmpS.toString)
    // Files.list streams hold directory descriptors until closed
    def parquetsIn(dir: Path): Seq[Path] =
      scala.util.Using.resource(Files.list(dir))(
        _.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
    val files = parquetsIn(tmp).sortBy(_.getFileName.toString) :+
      parquetsIn(tmpS).head
    val base = System.currentTimeMillis()
    files.zipWithIndex.foreach { case (p, i) =>
      val dst = in.resolve(f"part_${i + 1}%03d.parquet")
      Files.move(p, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(base + (i + 1) * 1000L))
    }
    in
  }

  private def drainScd2(s: SparkSession, d: String, in: Path,
                        delay: String): Long = {
    val out = graft.streaming.MicroBatch.updateRun(s, d, inDir = Some(in),
      conf = graft.streaming.Stateful.rocksDBConf) { stream =>
      import s.implicits._
      graft.streaming.Stateful.scd2Buffered(
        graft.Tables.toEventTime(stream)
          .withWatermark("ts", delay)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")), col("event_id"))
          .as[(Long, String, Long, Long)].groupByKey(_._1))
        .toDF("user_id", "event_type", "ts_us", "event_id")
    }
    out.count()
  }

  private def drainTransitions(s: SparkSession, d: String, in: Path,
                               delay: String): Long = {
    val out = graft.streaming.MicroBatch.updateRun(s, d, inDir = Some(in),
      conf = graft.streaming.Stateful.rocksDBConf) { stream =>
      import s.implicits._
      graft.streaming.Stateful.transitionBuffered(
        graft.Tables.toEventTime(stream)
          .withWatermark("ts", delay)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")), col("event_id"))
          .as[(Long, String, Long, Long)].groupByKey(_._1))
        .toDF("from_type", "to_type")
    }
    out.count()
  }

  private[graft] def report(label: String, t0: Long, outRows: Long): Unit = {
    val secs = (System.nanoTime() - t0) / 1e9
    val st = graft.streaming.MicroBatch.lastRunStateStats
    val peakRows = if (st.isEmpty) 0L else st.map(_.peakRows).max
    val peakMb = if (st.isEmpty) 0.0 else st.map(_.peakMemBytes).max / 1e6
    val batches = if (st.isEmpty) 0 else st.map(_.batches).max
    println(f"[probe] $label%-42s ${secs}%7.1f s  out=$outRows%8d  " +
      f"batches=$batches%3d  peakStateRows=$peakRows%9d  peakStateMem=${peakMb}%8.1f MB")
  }

  private def probeState(s: SparkSession, d: String): Unit = {
    println(s"[probe] STATE AXIS over $d (events ×1/×4/×8; jitter ×1/×2/×4)")
    for (k <- Seq(1, 4, 8)) {
      val ev = scaledEvents(s, d, k).localCheckpoint(true)
      // q382 shape: full disorder, everything buffers to the sentinel
      val inFull = stage(s, ev, parts = 4, jitterSecs = None,
        sentinelIntervalHours = 46L * 24L)
      var t0 = System.nanoTime()
      report(s"scd2 full-disorder ×$k",
        t0, drainScd2(s, d, inFull, "45 days"))
      // q398 shape on the same staging
      t0 = System.nanoTime()
      report(s"transitions full-disorder ×$k",
        t0, drainTransitions(s, d, inFull, "45 days"))
      // q383 shape: bounded 6h jitter under a 7h delay
      val inJit = stage(s, ev, parts = 6, jitterSecs = Some(21600L),
        sentinelIntervalHours = 8L)
      t0 = System.nanoTime()
      report(s"scd2 jitter 6h ×$k", t0, drainScd2(s, d, inJit, "7 hours"))
    }
    // disorder-window axis at fixed ×4 events
    val ev4 = scaledEvents(s, d, 4).localCheckpoint(true)
    for ((j, delay) <- Seq((21600L, "7 hours"), (43200L, "13 hours"),
      (86400L, "25 hours"))) {
      val in = stage(s, ev4, parts = 6, jitterSecs = Some(j),
        sentinelIntervalHours = j / 3600L + 2L)
      val t0 = System.nanoTime()
      report(s"scd2 ×4 jitter ${j / 3600L}h", t0, drainScd2(s, d, in, delay))
    }
  }

  private def probeBm25(s: SparkSession, d: String): Unit = {
    println(s"[probe] MAINTAINED BM25 over $d (docs+vocab ×1/×4/×8, batches 4k)")
    for (k <- Seq(1, 4, 8)) {
      val docs0 = Tables.documents(s, d)
      val docs = (0 until k).map { i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text",
            if (i == 0) col("text")
            else regexp_replace(col("text"), lit(" "), lit(s"_$i ")))
      }.reduce(_ unionByName _).localCheckpoint(true)
      val batches = 4 * k
      // the PRODUCTION fragment builder (q392's), not a copy — the
      // probe must price exactly the index shape production maintains
      def frag(b: Int) = graft.queries.R17Q.bm25Fragment(
        docs.filter(col("doc_id") % batches === b))
      var t0 = System.nanoTime()
      val idx = graft.lake.LakeTable.createTemp(s, frag(0), "graft-probe-bm25")
      (1 until batches).foreach(b => idx.append(frag(b)))
      val buildS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val folded = idx.snapshot().groupBy(col("kind"), col("term"))
        .agg(sum(col("v")).cast("long").as("v"))
      val rows = folded.count()
      val probeS = (System.nanoTime() - t0) / 1e9
      println(f"[probe] bm25 ×$k ($batches batches)  build=${buildS}%6.1f s  " +
        f"asOfFold=${probeS}%5.2f s  indexTerms=$rows%8d")
    }
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("state")
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    which match {
      case "state" => probeState(s, d)
      case "bm25"  => probeBm25(s, d)
      case other   => sys.error(s"unknown probe $other (state|bm25)")
    }
  }
}
