package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Unit tests for the corpus-analysis operators (the oracle gate
  * covers them end-to-end; these pin the local invariants). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("count-min estimate upper-bounds the exact count, exactly for lone buckets") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = TextAnalysis.countMinTopK(docs, topK = 30).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(out.nonEmpty)
    // CMS never undercounts
    assert(out.forall { case (_, exact, est) => est >= exact })
    // with 16 distinct tokens over 4x256 buckets collisions are
    // overwhelmingly unlikely -> estimates are exact here
    assert(out.forall { case (_, exact, est) => est === exact })
    assert(out.find(_._1 == "a").get._2 === 4L)
  }

  test("piiScrub redacts emails before phones and counts each once") {
    val docs = Seq(
      (1L, "write to bob99@corp.io or call 0612345678 today"),
      (2L, "no contact info here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean") ===
      "write to <EMAIL> or call <PHONE> today")
    assert(out(0).getAs[Long]("n_emails") === 1L)
    assert(out(0).getAs[Long]("n_phones") === 1L)
    assert(out(1).getAs[String]("clean") === "no contact info here at all")
    assert(out(1).getAs[Long]("n_emails") === 0L && out(1).getAs[Long]("n_phones") === 0L)
  }

  test("repetition signals: dup fraction and deterministic top bigram") {
    val docs = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs).collect().head
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Long]("n_distinct") === 3L)
    assert(r.getAs[Double]("dup_tok_frac") === (1.0 - 3.0 / 5.0))
    // bigrams: "x y"(2), "y x"(1), "y z"(1) -> top is "x y"
    assert(r.getAs[String]("top_bigram") === "x y")
    assert(r.getAs[Long]("top_bigram_n") === 2L)
  }

  test("classifierEval: tp/precision/recall/f1 incl. one-sided classes") {
    val pairs = Seq(
      ("en", "en"), ("en", "en"), ("en", "fr"), // en: 3 predicted, 2 right
      ("fr", "fr"),                             // fr: 1 predicted right, 2 true
      ("und", "de"))                            // und never true; de never predicted
      .toDF("pred", "truth")
    val out = TextAnalysis.classifierEval(pairs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double])))).toMap
    assert(out("en") === ((3L, 2L, 2L, Some(2.0 / 3), Some(1.0),
      Some((2 * (2.0 / 3) * 1.0) / (2.0 / 3 + 1.0))))) // f1 = 0.8
    assert(out("fr") === ((1L, 2L, 1L, Some(1.0), Some(0.5),
      Some((2 * 1.0 * 0.5) / 1.5))))
    assert(out("und") === ((1L, 0L, 0L, Some(0.0), None, None)))
    assert(out("de") === ((0L, 1L, 0L, None, Some(0.0), None)))
  }
}
