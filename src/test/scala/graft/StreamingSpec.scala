package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.MicroBatch

/** T1–T3 integration at sf0.001: the drained streaming pipeline must
  * equal the equivalent batch query (same engine, same session). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("foreachBatch append sink reproduces the batch projection") {
    val streamed = MicroBatch.appendRun(spark, sf)(
      _.selectExpr("CAST(event_id AS STRING) AS key", "CAST(props AS STRING) AS value"))
      .orderBy("key").collect()
    val batch = Tables.events(spark, sf)
      .selectExpr("CAST(event_id AS STRING) AS key", "CAST(props AS STRING) AS value")
      .orderBy("key").collect()
    assert(streamed.length > 0)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("windowed aggregation over the stream equals the batch group-by") {
    val streamed = MicroBatch.aggRun(spark, sf) { s =>
      s.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .count()
    }
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("count"))
      .orderBy("day", "event_type").collect()
    val batch = Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .count()
      .orderBy("day", "event_type").collect()
    assert(streamed.length > 0)
    assert(streamed.toSeq === batch.toSeq)
  }
}
