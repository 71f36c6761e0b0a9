package graft

import java.nio.file.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 scale probes (VERDICT r19 next #3/#5) — closes the state-
  * axis probe gaps (the GAP face shipped unprobed in r19; sessions and
  * as-of had no jittered rows) and adds the new RATE face on both
  * arrival contracts, so every shipped replay face × contract has a
  * measured peak-state row. Also prices the maintained-index
  * COMPACTION story (q419's machinery at sf0.1): file count collapsed,
  * served read flat. Results land in PERF.md.
  *
  * Usage: `sbt "runMain graft.ProbeR20 [state|compaction] [sfDir]"`.
  * Event scaling reuses ProbeR18's shifted (ts, id) discipline. */
object ProbeR20 {

  private def drainGap(s: SparkSession, d: String, in: Path,
                       delay: String): Long = {
    val out = graft.streaming.MicroBatch.updateRun(s, d, inDir = Some(in),
      conf = graft.streaming.Stateful.rocksDBConf) { stream =>
      import s.implicits._
      graft.streaming.Stateful.gapBuffered(
        graft.Tables.toEventTime(stream)
          .withWatermark("ts", delay)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")), col("event_id"))
          .as[(Long, String, Long, Long)].groupByKey(_._1))
        .toDF("event_type", "value")
    }
    out.count()
  }

  private def drainRate(s: SparkSession, d: String, in: Path,
                        delay: String): Long = {
    val out = graft.streaming.MicroBatch.updateRun(s, d, inDir = Some(in),
      conf = graft.streaming.Stateful.rocksDBConf) { stream =>
      import s.implicits._
      graft.streaming.Stateful.rateBuffered(
        graft.Tables.toEventTime(stream)
          .withWatermark("ts", delay)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")), col("event_id"))
          .as[(Long, String, Long, Long)].groupByKey(_._1),
        windowUs = 86400L * 1000000L)
        .toDF("user_id", "event_id", "n")
    }
    out.count()
  }

  private def drainSessions(s: SparkSession, d: String, in: Path,
                            delay: String): Long = {
    val out = graft.streaming.MicroBatch.updateRun(s, d, inDir = Some(in),
      conf = graft.streaming.Stateful.rocksDBConf) { stream =>
      import s.implicits._
      graft.streaming.Stateful.sessionBuffered(
        graft.Tables.toEventTime(stream)
          .withWatermark("ts", delay)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")), col("event_id"))
          .as[(Long, String, Long, Long)].groupByKey(_._1),
        gapUsByType = Map("click" -> 600L * 1000000L,
          "view" -> 600L * 1000000L),
        defaultGapUs = 3600L * 1000000L)
        .toDF("user_id", "start_us", "n")
    }
    out.count()
  }

  private def drainAsOf(s: SparkSession, d: String, in: Path,
                        delay: String): Long = {
    val out = graft.streaming.MicroBatch.updateRun(s, d, inDir = Some(in),
      conf = graft.streaming.Stateful.rocksDBConf) { stream =>
      import s.implicits._
      graft.streaming.Stateful.asOfBuffered(
        graft.Tables.toEventTime(stream)
          .withWatermark("ts", delay)
          .filter(col("event_type").isin(
            "click", "purchase", "__sentinel__"))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")), col("event_id"))
          .as[(Long, String, Long, Long)].groupByKey(_._1),
        dimType = "click", obsType = "purchase")
        .toDF("user_id", "purchase_id", "click_id")
    }
    out.count()
  }

  private def probeState(s: SparkSession, d: String): Unit = {
    println(s"[probe] STATE AXIS r20 gaps over $d (events ×1/×4/×8)")
    for (k <- Seq(1, 4, 8)) {
      val ev = ProbeR18.scaledEvents(s, d, k).localCheckpoint(true)
      val inFull = ProbeR18.stage(s, ev, parts = 4, jitterSecs = None,
        sentinelIntervalHours = 46L * 24L)
      var t0 = System.nanoTime()
      ProbeR18.report(s"gap full-disorder ×$k",
        t0, drainGap(s, d, inFull, "45 days"))
      t0 = System.nanoTime()
      ProbeR18.report(s"rate full-disorder ×$k",
        t0, drainRate(s, d, inFull, "45 days"))
      val inJit = ProbeR18.stage(s, ev, parts = 6, jitterSecs = Some(21600L),
        sentinelIntervalHours = 8L)
      t0 = System.nanoTime()
      ProbeR18.report(s"sessions jitter 6h ×$k",
        t0, drainSessions(s, d, inJit, "7 hours"))
      t0 = System.nanoTime()
      ProbeR18.report(s"asof jitter 6h ×$k",
        t0, drainAsOf(s, d, inJit, "7 hours"))
      t0 = System.nanoTime()
      ProbeR18.report(s"rate jitter 6h ×$k",
        t0, drainRate(s, d, inJit, "7 hours"))
    }
  }

  /** The q419 machinery at probe scale: a maintained positional
    * postings index accrues one small-file commit per ingest batch;
    * OPTIMIZE must collapse the files while the SERVED phrase read
    * stays flat and byte-identical. Uses the PRODUCTION fragment
    * builder and the production phrase operator — the probe cannot
    * drift from what ships. */
  private def probeCompaction(s: SparkSession, d: String): Unit = {
    println(s"[probe] MAINTAINED-INDEX COMPACTION over $d " +
      "(16 ingest commits x 4-way writes)")
    val docs = Tables.documents(s, d).localCheckpoint(true)
    val batches = 16
    def frag(b: Int) = graft.queries.R19Q.positionalFragment(
      docs.filter(col("doc_id") % batches === b)).repartition(4)
    var t0 = System.nanoTime()
    val idx = graft.lake.LakeTable.createTemp(s, frag(0), "graft-probe-pc")
    (1 until batches).foreach(b => idx.append(frag(b)))
    val buildS = (System.nanoTime() - t0) / 1e9
    val dest = graft.lake.TempDirs.create("graft-probe-pcd").resolve("t")
    t0 = System.nanoTime()
    val nCommits = graft.lake.DeltaInterop.exportHistory(idx, dest)
    val exportS = (System.nanoTime() - t0) / 1e9
    val phrase = Seq("order", "scan")
    def serve(tag: String): Long = {
      val tt0 = System.nanoTime()
      val n = graft.operators.TextMining.phraseMatch(
        graft.lake.DeltaInterop.readDelta(s, dest), phrase).count()
      val label = s"($tag)"
      println(f"[probe] served phrase read $label%-18s " +
        f"${(System.nanoTime() - tt0) / 1e9}%6.2f s  (docs=$n%7d)")
      n
    }
    val pre = serve("pre-compaction")
    t0 = System.nanoTime()
    val res = graft.lake.DeltaInterop.optimize(s, dest)
    val optS = (System.nanoTime() - t0) / 1e9
    val post = serve("post-compaction")
    t0 = System.nanoTime()
    val vacuumed = graft.lake.DeltaInterop.vacuumDelta(s, dest)
    val vacS = (System.nanoTime() - t0) / 1e9
    val posted = serve("post-vacuum")
    require(pre == post && post == posted, "served read drifted")
    println(f"[probe] compaction: commits=$nCommits  build=${buildS}%6.1f s  " +
      f"export=${exportS}%6.1f s  optimize=${optS}%6.1f s " +
      f"(${res.compactedFiles} files -> ${res.newFiles})  " +
      f"vacuum=${vacS}%5.1f s (reclaimed $vacuumed)")
  }

  /** The POSITIONAL index growth twin of ProbeR19's frequency-postings
    * probe: docs ×1/×4/×8 with per-copy token suffixes (vocabulary AND
    * corpus grow), batches 4k through the production fragment builder,
    * then the three positional retrieval faces timed over the
    * maintained artifact — exact phrase, sloppy phrase (k = 5), and
    * min covering span. Their cost must track the query terms'
    * postings, never the index size (the term-pruned claim, on the
    * position axis). */
  private def probeRetrieval(s: SparkSession, d: String): Unit = {
    println(s"[probe] POSITIONAL RETRIEVAL over $d (docs+vocab ×1/×4/×8)")
    for (k <- Seq(1, 4, 8)) {
      val docs0 = Tables.documents(s, d)
      val docs = (0 until k).map { i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text",
            if (i == 0) col("text")
            else regexp_replace(col("text"), lit(" "), lit(s"_$i ")))
      }.reduce(_ unionByName _).localCheckpoint(true)
      val batches = 4 * k
      def frag(b: Int) = graft.queries.R19Q.positionalFragment(
        docs.filter(col("doc_id") % batches === b))
      var t0 = System.nanoTime()
      val idx = graft.lake.LakeTable.createTemp(s, frag(0), "graft-probe-pos")
      (1 until batches).foreach(b => idx.append(frag(b)))
      val buildS = (System.nanoTime() - t0) / 1e9
      val pos = idx.snapshot()
      t0 = System.nanoTime()
      val rows = pos.count()
      val countS = (System.nanoTime() - t0) / 1e9
      def timed(label: String)(body: => Long): Unit = {
        val tt0 = System.nanoTime()
        val n = body
        println(f"[probe] ×$k $label%-22s ${(System.nanoTime() - tt0) / 1e9}%6.2f s" +
          f"  (docs=$n%7d)")
      }
      println(f"[probe] positional ×$k ($batches batches)  " +
        f"build=${buildS}%6.1f s  rows=$rows%10d (count ${countS}%5.2f s)")
      timed("phrase (3-term)") {
        graft.operators.TextMining
          .phraseMatch(pos, Seq("big", "order", "scan")).count()
      }
      timed("sloppy phrase (k=5)") {
        graft.operators.TextMining
          .orderedWithin(pos, Seq("data", "join", "spark"), 5L).count()
      }
      timed("min span (3-term)") {
        graft.operators.Retrieval
          .minSpan(pos, Seq("data", "join", "spark")).count()
      }
      // the layout lever: hash-cluster by term, serve bloom-pruned
      t0 = System.nanoTime()
      idx.optimizeClusterBy("term", buckets = 64)
      val clusterS = (System.nanoTime() - t0) / 1e9
      val (kept, total) = idx.prunedDirsEq("term", "big")
      println(f"[probe] ×$k clusterBy(term,64)      ${clusterS}%6.2f s" +
        f"  (probe 'big' keeps ${kept.size}/$total dirs)")
      timed("phrase CLUSTERED") {
        graft.operators.TextMining.phraseMatchVia(
          t => idx.scanPrunedEq("term", t),
          Seq("big", "order", "scan")).count()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("state")
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    which match {
      case "state"      => probeState(s, d)
      case "compaction" => probeCompaction(s, d)
      case "retrieval"  => probeRetrieval(s, d)
      case other        => sys.error(s"unknown probe $other " +
        "(state|compaction|retrieval)")
    }
  }
}
