package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Output-representation lint (VERDICT r15 #2): walks every
  * plan-buildable query's ANALYZED output schema at sf0.001 and fails
  * on any driver-unhashable column — currently any decimal at the
  * 38-digit precision cap, the one type the correctness driver's hash
  * canonicalizes differently from both engines (r15: q292/q297/q300
  * were exactly the DECIMAL(38,0)-emitting queries and exactly the
  * hash-red set on values proven bit-identical). Side-effecting /
  * checkpointed queries are skipped here (building them executes the
  * pipeline); [[Verify]] applies the same lint to 100% of the
  * registry at every gate run, so the class cannot ship either way. */
class OutputSchemaLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("no plan-buildable query emits a driver-unhashable output column") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(PlanAuditSets.sideEffecting)
    val bad = names.flatMap { name =>
      SchemaLint.unhashable(SparkEntry.queries(name)(spark, sf).schema)
        .map(c => s"$name -> $c")
    }
    assert(bad.isEmpty,
      s"driver-unhashable output columns (re-represent as canonical " +
        s"string or hi/lo BIGINTs):\n${bad.mkString("\n")}")
    assert(names.size > 250) // the lint actually covered the surface
  }

  test("the lint fires on the exact r15 failure shape") {
    // the deliberately-reverted q292 projection: a DECIMAL(38,0)
    // final column (and a nested one, which must also be caught)
    val df = spark.range(1).select(
      col("id").cast(DecimalType(38, 0)).as("tv_scaled"),
      array(col("id").cast(DecimalType(38, 2))).as("nested"),
      col("id").cast(DecimalType(37, 0)).as("fine"),
      col("id").cast("string").as("also_fine"))
    val hits = SchemaLint.unhashable(df.schema)
    assert(hits.size == 2 && hits.exists(_.startsWith("tv_scaled")) &&
      hits.exists(_.startsWith("nested[]")), hits.toString)
  }
}
