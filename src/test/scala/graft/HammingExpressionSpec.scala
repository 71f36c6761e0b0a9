package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native hamming_distance expression: registered as a SQL
  * built-in via GraftExtensions, codegen'd, total on unequal lengths. */
class HammingExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ham(a: String, b: String): Long = {
    Seq((a, b)).toDF("a", "b").createOrReplaceTempView("ham_in")
    spark.sql("SELECT hamming_distance(a, b) FROM ham_in").first().getLong(0)
  }

  test("registered via extensions and computes known fixtures") {
    assert(ham("0101", "0101") === 0L)
    assert(ham("0101", "0111") === 1L)
    assert(ham("0000", "1111") === 4L)
    assert(ham("", "") === 0L)
  }

  test("total on unequal lengths: common prefix + length difference") {
    assert(ham("0101", "01") === 2L)
    assert(ham("01", "0111") === 2L)
  }

  test("null inputs propagate null") {
    val r = spark.sql(
      "SELECT hamming_distance(CAST(NULL AS STRING), '01')").first()
    assert(r.isNullAt(0))
  }

  test("codegen agrees with a local loop on simhash fingerprints") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 30)
    val sims = graft.operators.Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = sims.keys.toSeq.sorted.combinations(2).take(50).toSeq
    val df = pairs.map { case Seq(a, b) => (sims(a), sims(b)) }.toDF("a", "b")
    df.createOrReplaceTempView("ham_pairs")
    val engine = spark.sql("SELECT hamming_distance(a, b) FROM ham_pairs")
      .collect().map(_.getLong(0)).toSeq
    val local = pairs.map { case Seq(a, b) =>
      sims(a).zip(sims(b)).count { case (x, y) => x != y }.toLong
    }
    assert(engine === local)
  }
}
