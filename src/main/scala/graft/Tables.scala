package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  val nsToUs: Column =
    expr("ts div 1000 + CASE WHEN ts % 1000 < 0 THEN -1 ELSE 0 END")

  /** `ts` is TIMESTAMP(NANOS) parquet; Spark reads it as raw nanos
    * (`nanosAsLong`, see GraftSession) and we floor ns→µs exactly the
    * way DuckDB does when it casts the same file's TIMESTAMP_NS down,
    * so oracle comparisons see identical values. */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events").withColumn("ts", timestamp_micros(nsToUs))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
