package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable
import graft.streaming.MicroBatch

/** A Kafka record as the connector presents it: binary key/value plus
  * topic metadata (public top-level so the MemoryStream encoder can
  * reach it). */
case class KafkaRecord(key: Array[Byte], value: Array[Byte],
                       topic: String, partition: Int, offset: Long)

/** VERDICT r5 #7: the S1 Kafka seam, exercised WITHOUT Kafka. q42/q43
  * drain file sources; this spec drives the exact wire lifecycle of
  * the reference's only Spark program (spark_stream.py:206-226) — a
  * stream of (key BINARY, value BINARY, topic, partition, offset)
  * records through the binary→string cast, the from_json order parse,
  * and the foreachBatch lake sink — over a MemoryStream, so the
  * one-line swap to `.format("kafka")` changes nothing downstream. */
class KafkaShapedStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rec(id: Int, qty: Int, off: Long): KafkaRecord =
    KafkaRecord(s"k$id".getBytes(UTF_8),
      s"""{"id":"$id","order_date":"2024-01-0$id","product_name":"p$id","quantity":"$qty"}"""
        .getBytes(UTF_8),
      "topic-1", 0, off)

  test("binary (key, value) records parse and land exactly-once in the lake sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KafkaRecord]
    // the wire contract (names + types; nullability is encoder detail)
    assert(input.toDF().schema.map(f => (f.name, f.dataType)) ===
      MicroBatch.kafkaRecordSchema.map(f => (f.name, f.dataType)))
    val sink = LakeTable.createEmpty(spark,
      Files.createTempDirectory("graft-kafka-sink").resolve("t"))
    val ckpt = Files.createTempDirectory("graft-kafka-ckpt")
    val q = MicroBatch.parseKafkaOrders(input.toDF()).writeStream
      .foreachBatch(MicroBatch.batchWriter(sink, "kafka-app"))
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      input.addData(rec(1, 10, 0L), rec(2, 20, 1L))
      q.processAllAvailable()
      input.addData(rec(3, 30, 2L))
      q.processAllAvailable()
      val rows = sink.snapshot()
        .select("id", "order_date", "product_name", "quantity")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet
      assert(rows === Set(
        ("1", "2024-01-01", "p1", "10"),
        ("2", "2024-01-02", "p2", "20"),
        ("3", "2024-01-03", "p3", "30")))
      // each micro-batch is one txn-marked lake commit: replaying a
      // batchId against the same sink is a no-op (exactly-once)
      val before = sink.latestVersion
      sink.commitBatch(spark.range(1).toDF(), "kafka-app", 0L)
      assert(sink.latestVersion === before)
    } finally q.stop()
  }

  test("a poison (malformed JSON) message nulls its fields instead of killing the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KafkaRecord]
    val sink = LakeTable.createEmpty(spark,
      Files.createTempDirectory("graft-kafka-sink2").resolve("t"))
    val ckpt = Files.createTempDirectory("graft-kafka-ckpt2")
    val q = MicroBatch.parseKafkaOrders(input.toDF()).writeStream
      .foreachBatch(MicroBatch.batchWriter(sink, "kafka-app2"))
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      input.addData(
        rec(1, 10, 0L),
        KafkaRecord("k".getBytes(UTF_8), "not json at all".getBytes(UTF_8), "topic-1", 0, 1L))
      q.processAllAvailable()
      val rows = sink.snapshot().collect()
      assert(rows.length === 2)             // the stream survived the poison row
      assert(rows.count(_.isNullAt(0)) === 1) // ...which parsed to null fields
    } finally q.stop()
  }
}
