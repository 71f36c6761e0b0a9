package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Qx._

/** Round-17 additions — the production-contract faces of the r16
  * machinery: out-of-order-tolerant streaming SCD2 (watermark-
  * buffered change detection under genuinely disordered drains — the
  * contract a real Kafka CDC feed offers, where q381's chronological
  * requirement becomes the strict-mode option), and the maintained
  * incremental novelty index (the q362 corpus shingle relation as a
  * lake artifact appended per admitted batch, read as-of N−1 and
  * proven equal to the from-scratch rebuild in-query). All
  * oracle-gated. */
object R17Q {

  private val stagedIndex =
    new java.util.concurrent.ConcurrentHashMap[String, graft.lake.LakeTable]()

  /** The MAINTAINED corpus novelty index (r17 — VERDICT r16 #6): the
    * q362 distinct-shingle relation as a lake artifact built the way
    * a continuously-fed lake actually maintains it — bootstrap from
    * ingest batch 0, then ONE anti-join + txn-log append per admitted
    * batch (only never-seen shingles land, the q209/q360 incremental
    * shape), so version k+1 is exactly the index as-of batch k.
    * Memoized per (session, sf); the consumers time-travel it. */
  private def noveltyIndexArtifact(s: org.apache.spark.sql.SparkSession,
                                   d: String): graft.lake.LakeTable =
    stagedIndex.computeIfAbsent(s"${Qx.sessionKey(s)}|$d", _ => {
      val docs = Tables.documents(s, d)
      def batchShingles(k: Int) =
        graft.operators.Dedup.shingles(docs.filter(col("doc_id") % 4 === k), 3)
          .select(col("shingle")).distinct()
      val idx = graft.lake.LakeTable.createTemp(s, batchShingles(0),
        "graft-novelty-idx")
      (1 to 3).foreach { k =>
        idx.append(batchShingles(k)
          .join(idx.snapshot(), Seq("shingle"), "left_anti"))
      }
      idx
    })

  val queries: Map[String, Q] = Map(

    // OUT-OF-ORDER STREAMING SCD2 (r17 — VERDICT r16 #2): q381's
    // change detection under the arrival contract a production CDC
    // feed actually has. The drain is HASH-interleaved (4 batches,
    // each spanning the full event-time range — genuine disorder) +
    // one far-future sentinel control record staged last; the
    // watermark delay (45 days) covers the full 30-day event range so
    // nothing is dropped, rows buffer in ListState until the
    // watermark passes them, and the sentinel advances the final
    // watermark past every real row so the buffer flushes
    // deterministically. Change rows re-sort inside the watermark, so
    // the multi-batch RocksDB drain must reproduce the BATCH interval
    // build BIT-EXACTLY — the oracle is q376's SQL, unchanged.
    // `Stateful.Scd2Buffered`.
    "q382_stream_scd2_ooo" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val in = graft.streaming.MicroBatch.stageEventsSplitSentinel(
        s, d, parts = 4, sentinelInterval = "46 DAYS")
      val changes = graft.streaming.MicroBatch.updateRun(s, d,
        inDir = Some(in),
        conf = graft.streaming.Stateful.rocksDBConf) { stream =>
        import s.implicits._
        graft.streaming.Stateful.scd2Buffered(
          graft.Tables.toEventTime(stream)
            .withWatermark("ts", "45 days")
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")), col("event_id"))
            .as[(Long, String, Long, Long)].groupByKey(_._1))
          .toDF("user_id", "event_type", "ts_us", "event_id")
      }
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      changes.filter(col("user_id") >= 0)
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .select(col("user_id"), col("version"), col("event_type"),
          col("ts_us").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "version")
    }),

    // BOUNDED-DISORDER STREAMING SCD2 (r17): the same buffered
    // detector under the steady-state production arrival pattern —
    // per-event jitter ≤ 6 h on a 30-day stream, 6 chronological-
    // by-ARRIVAL batches, watermark delay 7 h ≥ the jitter bound. The
    // watermark genuinely ADVANCES mid-drain here, so buffered state
    // flushes incrementally (peak state ≪ corpus — R17Spec asserts
    // the eviction via the engine's own state stats); the sentinel
    // flushes only the final tail. Same batch oracle, bit-exact.
    "q383_stream_scd2_jitter" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val in = graft.streaming.MicroBatch.stageEventsJitteredSentinel(
        s, d, parts = 6, maxJitterSecs = 21600L, sentinelInterval = "8 HOURS")
      val changes = graft.streaming.MicroBatch.updateRun(s, d,
        inDir = Some(in),
        conf = graft.streaming.Stateful.rocksDBConf) { stream =>
        import s.implicits._
        graft.streaming.Stateful.scd2Buffered(
          graft.Tables.toEventTime(stream)
            .withWatermark("ts", "7 hours")
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")), col("event_id"))
            .as[(Long, String, Long, Long)].groupByKey(_._1))
          .toDF("user_id", "event_type", "ts_us", "event_id")
      }
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      changes.filter(col("user_id") >= 0)
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .select(col("user_id"), col("version"), col("event_type"),
          col("ts_us").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "version")
    }),

    // MAINTAINED NOVELTY INDEX (r17 — VERDICT r16 #6): q362's
    // admission readout at STEADY-STATE cost — the corpus
    // distinct-shingle relation is a maintained lake artifact (one
    // anti-join + append per admitted batch, `noveltyIndexArtifact`),
    // and batch 3's novelty scores probe the index AS-OF batch 2
    // (time travel to the pre-admission version). The query PROVES
    // both legs in-query: the final index equals the from-scratch
    // distinct-shingle rebuild, and the as-of scores equal q362's
    // from-scratch computation against batches 0–2. Returns the
    // scored admission batch. `TextAnalysis.noveltyScoreAgainst`.
    "q384_novelty_index_maintained" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = noveltyIndexArtifact(s, d)
      val vs = idx.versions.sorted
      val asOfPrev = idx.snapshot(vs(vs.length - 2))
      val got = graft.operators.TextAnalysis.noveltyScoreAgainst(
        docs.filter(col("doc_id") % 4 === 3), asOfPrev)
        .localCheckpoint(true)
      val fullIdx = graft.operators.Dedup.shingles(docs, 3)
        .select(col("shingle")).distinct()
      require(idx.snapshot().except(fullIdx).isEmpty &&
        fullIdx.except(idx.snapshot()).isEmpty,
        "maintained novelty index must equal the from-scratch rebuild")
      val scratch = graft.operators.TextAnalysis.noveltyScore(
        docs.filter(col("doc_id") % 4 === 3),
        docs.filter(col("doc_id") % 4 =!= 3))
      require(got.except(scratch).isEmpty && scratch.except(got).isEmpty,
        "as-of index scores must equal the from-scratch novelty scores")
      got.orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // q382/q383 drain to the same change rows q376 lag-detects
    // one-shot — disorder inside the watermark is re-sorted away
    "q382_stream_scd2_ooo" -> R16Q.scd2Sql,
    "q383_stream_scd2_jitter" -> R16Q.scd2Sql,

    // mirrors q384: batch 3 scored against the distinct shingles of
    // batches 0–2 (the index as-of the pre-admission version)
    "q384_novelty_index_maintained" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS s
        |  FROM toks, UNNEST(generate_series(1, len(l) - 2)) AS g(i)
        |), corpus AS (
        |  SELECT DISTINCT s FROM sh WHERE doc_id % 4 <> 3
        |), i AS (
        |  SELECT doc_id, s FROM sh WHERE doc_id % 4 = 3
        |)
        |SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(SUM(CASE WHEN c.s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unseen,
        |  CAST(SUM(CASE WHEN c.s IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS novelty
        |FROM i LEFT JOIN corpus c ON i.s = c.s
        |GROUP BY i.doc_id ORDER BY doc_id""".stripMargin
  )
}
