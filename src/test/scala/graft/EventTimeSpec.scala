package graft

import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins BOTH physical encodings of `events.ts` through
  * `Tables.eventTimeCol` (VERDICT r11 #1: the driver has regenerated
  * the testdata with either INT64 TIMESTAMP(NANOS)-read-as-long or
  * timestamp[us]-read-as-NTZ; a future regen in either direction must
  * not zero the correctness gate again).
  */
class EventTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def usOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val out = Tables.toEventTime(df)
    assert(out.schema("ts").dataType === TimestampType)
    out.select(unix_micros(col("ts"))).collect().toSeq.map(_.getLong(0))
  }

  test("LongType branch: raw nanos floor to microseconds (incl. pre-epoch)") {
    import spark.implicits._
    // floor, not truncate-toward-zero: -1 ns lands in microsecond -1
    val nanos = Seq(0L, 1L, 999L, 1000L, 1001L, -1L, -999L, -1000L, -1001L,
      1700000000123456789L)
    val got = usOf(nanos.toDF("ts"))
    val want = nanos.map(n => Math.floorDiv(n, 1000L))
    assert(got === want)
  }

  test("TimestampNTZType branch: wall-clock-preserving cast under the UTC session") {
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(LocalDateTime.of(2024, 3, 1, 12, 30, 15, 123456000)),
        Row(LocalDateTime.of(1969, 12, 31, 23, 59, 59, 999999000))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    // NTZ wall clock == UTC instant in this session, so the micros are
    // exactly what DuckDB computes from the same naive timestamp
    assert(usOf(df) === Seq(1709296215123456L, -1L))
  }

  test("TimestampType branch is a no-op") {
    import spark.implicits._
    val df = Seq(1700000000123456L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(usOf(df) === Seq(1700000000123456L))
  }

  test("an unexpected encoding fails loud, naming the type") {
    import spark.implicits._
    val e = intercept[IllegalStateException] {
      Tables.eventTimeCol(Seq("2024-01-01").toDF("ts"))
    }
    assert(e.getMessage.contains("StringType"))
  }

  test("the LEGACY nanos encoding reads end-to-end through the adaptive path") {
    // a committed TIMESTAMP(NANOS) fixture in the exact physical shape
    // the driver generated through round 10: under nanosAsLong the scan
    // yields LongType raw nanos, and toEventTime must floor to the
    // microsecond exactly the way DuckDB casts the same file down
    val path = getClass.getResource("/events_nanos.parquet").getPath
    val raw = spark.read.parquet(path)
    assert(raw.schema("ts").dataType === LongType,
      s"fixture must read as raw nanos — got ${raw.schema.toDDL}")
    val got = Tables.toEventTime(raw)
      .orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().toSeq.map(_.getLong(0))
    assert(got === Seq(1700000000123456L, 1700000000123456L,
      1699999999999999L, 1700000086400000L, 1700000172800000L))
  }

  test("Tables.events adapts to whatever the driver generated") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
    // the exact microsecond survives the read (q74's contract): max(ts)
    // formatted to µs equals DuckDB's view of the same file
    val last = ev.agg(date_format(max(col("ts")),
      "yyyy-MM-dd HH:mm:ss.SSSSSS")).head().getString(0)
    assert(last.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{6}"""))
  }
}
