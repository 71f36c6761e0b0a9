package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scan-efficiency regression guard: filters must reach the parquet
  * scan (`PushedFilters`) and projections must prune the read schema
  * (`ReadSchema`). At 100 TB a scan that reads all columns for a
  * two-column projection, or filters only after the scan, is the
  * difference between touching terabytes and touching gigabytes —
  * these were hand-checked in earlier rounds; this spec pins them. */
class PushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def scanString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("comparison filters push down to the parquet scan") {
    val plan = scanString(
      Tables.lineitem(spark, sf)
        .filter(col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_quantity")))
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    assert(plan.contains("GreaterThan(l_quantity"), plan.take(2000))
  }

  test("projection prunes the read schema to the referenced columns") {
    val plan = scanString(
      Tables.orders(spark, sf)
        .select(col("o_custkey"), col("o_totalprice")))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_custkey") && readSchema.contains("o_totalprice"),
      readSchema)
    // a 9-column table read for a 2-column projection must not ship
    // the untouched columns through the scan
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_orderstatus"),
      readSchema)
  }

  test("q181 (TPC-H Q6 shape): every predicate reaches the scan, schema pruned to 4 columns") {
    // the pure scan-aggregate lives or dies on pushdown — at 100 TB
    // this is the difference between reading 4 columns of the
    // date-matching row groups and reading the whole fact table.
    // (toString elides long PushedFilters lists, so read the scan
    // node's metadata, which carries the full strings.)
    val df = SparkEntry.queries("q181_forecast_revenue")(spark, sf)
    val scan = df.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no parquet scan in the plan"))
    val pushed = scan.metadata("PushedFilters")
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
      "LessThan(l_quantity").foreach(p => assert(pushed.contains(p), pushed))
    val readSchema = scan.metadata("ReadSchema")
    Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice").foreach(c =>
      assert(readSchema.contains(c), readSchema))
    Seq("l_orderkey", "l_partkey", "l_returnflag").foreach(c =>
      assert(!readSchema.contains(c), readSchema))
  }

  test("equality filter on a join key pushes down on both join sides") {
    val o = Tables.orders(spark, sf).filter(col("o_orderkey") < 1000)
    val l = Tables.lineitem(spark, sf).filter(col("l_orderkey") < 1000)
    val plan = scanString(
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n")))
    assert(plan.contains("LessThan(o_orderkey,1000)"), plan.take(3000))
    assert(plan.contains("LessThan(l_orderkey,1000)"), plan.take(3000))
  }
}
