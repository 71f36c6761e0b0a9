package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Lake-table loaders over the driver-generated parquet testdata
  * (see /root/repo/TESTDATA.md). One parquet file per table; at cluster
  * scale these become partitioned/ bucketed table roots — the read path
  * is identical (`spark.read.parquet(dir)` over many files).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** ns→µs as FLOOR division (`div` alone truncates toward zero, which
    * would differ for pre-epoch timestamps — ADVICE r2). Integer-only:
    * ns-since-epoch ≈ 1.7e18 exceeds 2^53, so a double `floor(ts/1000)`
    * would corrupt the low bits. */
  def nsToUsOf(c: String): Column =
    expr(s"$c div 1000 + CASE WHEN $c % 1000 < 0 THEN -1 ELSE 0 END")

  val nsToUs: Column = nsToUsOf("ts")

  /** Event-time column normalized to TimestampType (µs instants, UTC
    * session) regardless of the parquet writer's physical encoding —
    * the driver has shipped `events.ts` both as INT64 TIMESTAMP(NANOS)
    * (which Spark reads as raw nanos under `nanosAsLong`, see
    * GraftSession) and as timestamp[us] (which Spark reads as
    * TIMESTAMP_NTZ). Both map to the instants DuckDB sees on the same
    * file: floor ns→µs for the former, a wall-clock-preserving NTZ
    * cast (UTC session) for the latter. Branches on the frame's
    * STATIC schema, so it works on batch and streaming reads alike. */
  def eventTimeCol(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType         => timestamp_micros(nsToUsOf(c))
      case TimestampNTZType => col(c).cast(TimestampType)
      case TimestampType    => col(c)
      case other => throw new IllegalStateException(
        s"events.$c: unexpected physical type $other — expected INT64 " +
          "nanos, TIMESTAMP_NTZ, or TIMESTAMP; regenerated testdata? " +
          "Teach eventTimeCol the new encoding instead of patching call sites.")
    }

  /** [[eventTimeCol]] applied in place. */
  def toEventTime(df: DataFrame, c: String = "ts"): DataFrame =
    df.withColumn(c, eventTimeCol(df, c))

  def events(s: SparkSession, d: String): DataFrame =
    toEventTime(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
