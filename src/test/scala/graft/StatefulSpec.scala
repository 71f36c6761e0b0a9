package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Stateful

/** Arbitrary stateful streaming (flatMapGroupsWithState) over a
  * MemoryStream: state must persist across micro-batches. */
class StatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("runningCount accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val counts = Stateful.runningCount(input.toDS().groupByKey(_._1))
    val q = counts.writeStream.format("memory").queryName("stateful_counts")
      .outputMode("update").start()
    try {
      input.addData(("a", 1L), ("a", 2L), ("b", 1L))
      q.processAllAvailable()
      input.addData(("a", 3L))
      q.processAllAvailable()
      val rows = spark.table("stateful_counts").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // batch 1 emits a->2, b->1; batch 2 emits a->3 (state carried)
      assert(rows.contains(("a", 2L)) && rows.contains(("b", 1L)))
      assert(rows.contains(("a", 3L)))
    } finally q.stop()
  }

  test("state-V2 runningTotals accumulates across micro-batches (transformWithState)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Stateful.withRocksDBStateStore(spark) {
      val input = MemoryStream[(Long, Long)]
      val totals = Stateful.runningTotals(input.toDS().groupByKey(_._1))
      val q = totals.writeStream.format("memory").queryName("twstate_totals")
        .outputMode("update").start()
      try {
        input.addData((1L, 10L), (1L, 20L), (2L, 5L))
        q.processAllAvailable()
        input.addData((1L, 30L))
        q.processAllAvailable()
        val rows = spark.table("twstate_totals").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // batch 1: key 1 -> (2, 30), key 2 -> (1, 5); batch 2 reopens
        // key 1's ValueState -> (3, 60)
        assert(rows.contains((1L, 2L, 30L)) && rows.contains((2L, 1L, 5L)))
        assert(rows.contains((1L, 3L, 60L)))
      } finally q.stop()
    }
  }

  test("streaming funnel: a late earlier view disqualifies a converted click, last update wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Stateful.withRocksDBStateStore(spark) {
      val input = MemoryStream[(Long, Int, Long)] // (user, step, us)
      val W = 1000L // 1000 µs conversion window
      val funnel = Stateful.streamingFunnel(input.toDS().groupByKey(_._1), W)
      val q = funnel.writeStream.format("memory").queryName("stream_funnel")
        .outputMode("update").start()
      try {
        // batch 1: view @5000, click @5500 → depth 2
        input.addData((7L, 0, 5000L), (7L, 1, 5500L))
        q.processAllAvailable()
        // batch 2: an EARLIER view @1000 arrives late — t1 moves to
        // 1000, the click @5500 is now outside (1000, 2000] → depth 1.
        // Non-monotone by design; the seq ordering carries the truth.
        input.addData((7L, 0, 1000L))
        q.processAllAvailable()
        // batch 3: click @1500 and purchase @2400 → full depth 3
        input.addData((7L, 1, 1500L), (7L, 2, 2400L))
        q.processAllAvailable()
        val rows = spark.table("stream_funnel").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
        assert(rows === Array((7L, 1L, 2L), (7L, 2L, 1L), (7L, 3L, 3L)))
      } finally q.stop()
    }
  }

  test("state-V2 event-time timers close idle sessions and clear state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Stateful.withRocksDBStateStore(spark) {
      val input = MemoryStream[(Long, Long)]
      val t0 = 1700000000000L // any fixed epoch-millis base
      val sessions = Stateful.idleSessions(
        input.toDS().toDF("key", "tsMs")
          .withColumn("ts", (col("tsMs") / 1000).cast("timestamp"))
          .withWatermark("ts", "0 seconds")
          .select(col("key"), col("tsMs"))
          .as[(Long, Long)].groupByKey(_._1),
        gapMs = 60000L) // 1-minute idle gap
      val q = sessions.writeStream.format("memory").queryName("idle_sessions")
        .outputMode("update").start()
      try {
        // key 1: two events close together; key 2: one event
        input.addData((1L, t0), (1L, t0 + 10000L), (2L, t0 + 5000L))
        q.processAllAvailable()
        assert(spark.table("idle_sessions").isEmpty) // nothing closed yet
        // an unrelated late-clock event pushes the watermark far past
        // both idle deadlines -> both sessions close with final counts
        input.addData((3L, t0 + 3600000L))
        q.processAllAvailable()
        val closed = spark.table("idle_sessions").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(closed === Set((1L, 2L), (2L, 1L)))
        // key 1 reopens FROM ZERO (state was cleared at close)
        input.addData((1L, t0 + 3600000L + 1000L))
        q.processAllAvailable()
        input.addData((4L, t0 + 7200000L))
        q.processAllAvailable()
        val after = spark.table("idle_sessions").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(after.contains((1L, 1L)), s"reopened session must count from zero, got $after")
      } finally q.stop()
    }
  }

  test("highWaterMark emits only on new maxima") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val marks = Stateful.highWaterMark(input.toDS().groupByKey(_._1).mapValues(_._2))
    val q = marks.writeStream.format("memory").queryName("hwm")
      .outputMode("update").start()
    try {
      input.addData(("a", 5L))
      q.processAllAvailable()
      input.addData(("a", 3L)) // below the mark: no emission
      q.processAllAvailable()
      input.addData(("a", 9L))
      q.processAllAvailable()
      val rows = spark.table("hwm").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.toSeq.sorted === Seq(("a", 5L), ("a", 9L)))
    } finally q.stop()
  }
}
