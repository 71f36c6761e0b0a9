package graft

import java.nio.file.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 scale probes (VERDICT r18 next #5) — extends the ProbeR18
  * state axis to the two r18 replay faces it did not cover (the
  * windowed FUNNEL with Seq-typed replay state, the keyed AS-OF) plus
  * the new r19 SESSION face, and adds the postings-index growth row
  * (`R18Q.postingsArtifact` was the one maintained artifact without a
  * PERF.md growth verdict). Results land in PERF.md.
  *
  *  - `state`: drain q399/q404/q408-shaped pipelines at ×1/×4/×8
  *    events (full-disorder hash split + sentinel — the honest worst
  *    case where everything buffers), and the q409 jittered funnel at
  *    ×1/×4/×8, recording wall, micro-batches, and PEAK state rows/MB
  *    from the engine's own progress reports.
  *  - `postings`: the maintained postings index at ×1/×4/×8 documents
  *    with per-copy token suffixes (vocabulary AND corpus grow — the
  *    postings relation is corpus-bounded by design: it IS the
  *    inverted corpus), batches 4k, recording build, index rows, and
  *    the SERVED 3-term read (filter + broadcast-stats fold) which
  *    must track the query terms' matching postings, never the index.
  *
  * Usage: `sbt "runMain graft.ProbeR19 [state|postings] [sfDir]"`.
  * Event scaling reuses ProbeR18's shifted (ts, id) discipline. */
object ProbeR19 {

  private def drainFunnel(s: SparkSession, d: String, in: Path,
                          delay: String): Long = {
    val out = graft.streaming.MicroBatch.updateRun(s, d, inDir = Some(in),
      conf = graft.streaming.Stateful.rocksDBConf) { stream =>
      import s.implicits._
      graft.streaming.Stateful.funnelBuffered(
        graft.Tables.toEventTime(stream)
          .withWatermark("ts", delay)
          .filter(col("event_type").isin(
            "view", "click", "purchase", "__sentinel__"))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")), col("event_id"))
          .as[(Long, String, Long, Long)].groupByKey(_._1),
        steps = Seq("view", "click", "purchase"),
        withinUs = Seq(86400L * 1000000L, 86400L * 1000000L))
        .toDF("user_id", "depth")
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

  private def probeState(s: SparkSession, d: String): Unit = {
    println(s"[probe] STATE AXIS r19 faces over $d (events ×1/×4/×8)")
    for (k <- Seq(1, 4, 8)) {
      val ev = ProbeR18.scaledEvents(s, d, k).localCheckpoint(true)
      // q399/q404/q408 shape: full disorder, everything buffers
      val inFull = ProbeR18.stage(s, ev, parts = 4, jitterSecs = None,
        sentinelIntervalHours = 46L * 24L)
      var t0 = System.nanoTime()
      ProbeR18.report(s"funnel full-disorder ×$k",
        t0, drainFunnel(s, d, inFull, "45 days"))
      t0 = System.nanoTime()
      ProbeR18.report(s"asof full-disorder ×$k",
        t0, drainAsOf(s, d, inFull, "45 days"))
      t0 = System.nanoTime()
      ProbeR18.report(s"sessions full-disorder ×$k",
        t0, drainSessions(s, d, inFull, "45 days"))
      // q409 shape: bounded 6h jitter under a 7h delay
      val inJit = ProbeR18.stage(s, ev, parts = 6, jitterSecs = Some(21600L),
        sentinelIntervalHours = 8L)
      t0 = System.nanoTime()
      ProbeR18.report(s"funnel jitter 6h ×$k",
        t0, drainFunnel(s, d, inJit, "7 hours"))
    }
  }

  private def probePostings(s: SparkSession, d: String): Unit = {
    println(s"[probe] MAINTAINED POSTINGS over $d (docs+vocab ×1/×4/×8, batches 4k)")
    for (k <- Seq(1, 4, 8)) {
      val docs0 = Tables.documents(s, d)
      val docs = (0 until k).map { i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text",
            if (i == 0) col("text")
            else regexp_replace(col("text"), lit(" "), lit(s"_$i ")))
      }.reduce(_ unionByName _).localCheckpoint(true)
      val batches = 4 * k
      // the PRODUCTION fragment builder (q405's), not a copy
      def frag(b: Int) = graft.queries.R18Q.postingsFragment(
        docs.filter(col("doc_id") % batches === b))
      var t0 = System.nanoTime()
      val idx = graft.lake.LakeTable.createTemp(s, frag(0), "graft-probe-post")
      (1 until batches).foreach(b => idx.append(frag(b)))
      val buildS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val postings = idx.snapshot()
      val rows = postings.count()
      val countS = (System.nanoTime() - t0) / 1e9
      // the q405 served read: the query terms' postings only — its
      // cost tracks the terms' matching postings (which grow mildly:
      // the suffix scheme replaces spaces, so each copy's FINAL token
      // stays un-suffixed and contributes some matches), never the
      // index size — the term-pruned-point-read claim
      t0 = System.nanoTime()
      val qterms = Seq("data", "join", "spark")
      val servedRows = postings
        .filter(col("term").isin(qterms.map(x => x: Any): _*))
        .groupBy(col("doc_id")).agg(sum(col("tf")).as("m"))
        .count()
      val serveS = (System.nanoTime() - t0) / 1e9
      println(f"[probe] postings ×$k ($batches batches)  build=${buildS}%6.1f s  " +
        f"rows=$rows%10d (count ${countS}%5.2f s)  " +
        f"served 3-term read=${serveS}%5.2f s (docs=$servedRows%7d)")
    }
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("state")
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    which match {
      case "state"    => probeState(s, d)
      case "postings" => probePostings(s, d)
      case other      => sys.error(s"unknown probe $other (state|postings)")
    }
  }
}
