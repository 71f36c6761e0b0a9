package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Deplot

/** M12 parse: well-formed rows + the malformed-row fixture the survey
  * requires (the reference crashes there; ours is total). */
class DeplotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parses header-skipped year/value body with decimal-comma normalization") {
    val df = Seq((1L,
      "Titre du graphe <0x0A> annee | valeur <0x0A> 2019 | 3,5 <0x0A> 2020 | 4,25"))
      .toDF("doc_id", "lin")
    val out = Deplot.parseYearValue(df, col("lin"), col("doc_id"))
      .orderBy("row_idx")
      .select("row_idx", "annee", "valeur").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, "2019", 3.5), (2L, "2020", 4.25)))
  }

  test("malformed rows yield nulls instead of crashing (total parse)") {
    val df = Seq((1L,
      "T <0x0A> annee | valeur <0x0A> 2019 | 1,0 <0x0A> garbage-no-pipe <0x0A> a | b | c"))
      .toDF("doc_id", "lin")
    val out = Deplot.parseYearValue(df, col("lin"), col("doc_id"))
      .orderBy("row_idx").collect()
    assert(out.length === 3)
    assert(!out(0).isNullAt(2) && out(0).getString(2) === "2019")
    assert(out(1).isNullAt(2) && out(1).isNullAt(3)) // no pipe
    assert(out(2).isNullAt(2) && out(2).isNullAt(3)) // three fields
  }

  test("non-numeric value parses to null, year still extracted") {
    val df = Seq((1L, "T <0x0A> annee | valeur <0x0A> 2021 | n/a"))
      .toDF("doc_id", "lin")
    val out = Deplot.parseYearValue(df, col("lin"), col("doc_id")).collect()
    assert(out(0).getString(2) === "2021")
    assert(out(0).isNullAt(3))
  }
}
