package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.MicroBatch
import Qx._

/** Oracle-checked streaming queries: AvailableNow drains the staged
  * events table, so the sink's final contents must hash-match the
  * equivalent batch SQL in DuckDB. */
object StreamingQ {

  val queries: Map[String, Q] = Map(
    // T1/T2/P1 — the reference pipeline shape: CAST projection →
    // foreachBatch append sink (spark_stream.py:206-226)
    "q42_stream_append" -> ((s, d) =>
      MicroBatch.appendRun(s, d)(
        _.selectExpr("CAST(event_id AS STRING) AS key", "CAST(props AS STRING) AS value"))
        .orderBy("key")),

    // T3/P2 — from_json with a declared schema + struct flatten
    // (spark_stream.py:159-171) running inside the stream
    "q43_stream_json_flatten" -> ((s, d) =>
      MicroBatch.appendRun(s, d)(
        _.select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .as("data"))
          .select(col("event_id"), col("data.k").as("k")))
        .orderBy("event_id")),

    // Engine extension — event-time tumbling window + watermark over
    // the stream (complete mode, so the final table equals the batch
    // group-by and stays oracle-checkable)
    "q44_stream_window" -> ((s, d) =>
      MicroBatch.aggRun(s, d) { stream =>
        stream
          .withColumn("ts", timestamp_micros(graft.Tables.nsToUs))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .count()
      }
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("count").as("n"))
        .orderBy("day", "event_type"))
  )

  val oracles: Map[String, String] = Map(
    "q42_stream_append" ->
      "SELECT CAST(event_id AS VARCHAR) AS key, CAST(props AS VARCHAR) AS value FROM events ORDER BY key",
    "q43_stream_json_flatten" ->
      "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events ORDER BY event_id",
    "q44_stream_window" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |       count(*) AS n
        |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin
  )
}
