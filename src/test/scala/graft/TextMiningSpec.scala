package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextMining

/** Unit tests for the M11 text-mining operators against hand-built
  * fixtures (semantics from texteExtract.py:10-17, 28-38, 66-71,
  * 95-129). */
class TextMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("sentences split after . ! ? .. ... tokens") {
    val out = TextMining.sentences(docs(
      1L -> "premiere phrase . deuxieme ! troisieme ... quatrieme ? la fin"))
      .orderBy("sent_idx")
      .select("sentence").as[String].collect()
    assert(out === Array("premiere phrase", "deuxieme", "troisieme", "quatrieme", "la fin"))
  }

  test("values recognize pct tokens and NUM+unit pairs; years are 4-digit tokens") {
    val toks = TextMining.tokens(TextMining.sentences(docs(
      1L -> "une hausse de 3,5% et 12 millions en 2021")))
    val vals = TextMining.values(toks).orderBy("v_pos")
      .select("value", "v_pos", "v_end").collect()
    assert(vals.map(_.getString(0)).toSeq === Seq("3,5%", "12 millions"))
    // two-token value spans its unit: v_end = v_pos + 1
    assert(vals.map(r => r.getLong(2) - r.getLong(1)).toSeq === Seq(0L, 1L))
    val yrs = TextMining.years(toks).select("year").as[String].collect()
    assert(yrs.toSeq === Seq("2021"))
  }

  test("as-of joins each value to the closest strictly-following year, NAN default") {
    val toks = TextMining.tokens(TextMining.sentences(docs(
      1L -> "en 1999 une hausse de 3% en 2020 puis en 2021 et 5% sans annee")))
    val out = TextMining.asOfYear(TextMining.values(toks), TextMining.years(toks))
      .orderBy("v_pos").select("value", "year").collect()
    // 3% -> 2020 (1999 precedes it, 2021 is farther); 5% -> NAN
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("3%", "2020"), ("5%", "NAN")))
  }

  test("sign context picks the nearest lexicon word within 25 tokens back") {
    val toks = TextMining.tokens(TextMining.sentences(docs(
      1L -> "une baisse puis une hausse de 3%",
      2L -> "un deficit de 2%",
      3L -> "la valeur atteint 4%")))
    val out = TextMining.signContext(TextMining.values(toks), toks)
      .orderBy("doc_id").select("doc_id", "sign").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "+"), (2L, "-"), (3L, "")))
  }

  test("sign context ignores words more than 25 tokens back") {
    val far = ("hausse " + Seq.fill(25)("mot").mkString(" ") + " 3%")
    val toks = TextMining.tokens(TextMining.sentences(docs(1L -> far)))
    val out = TextMining.signContext(TextMining.values(toks), toks)
      .select("sign").as[String].collect()
    assert(out.toSeq === Seq(""))
  }

  test("mine() groups signed values per (doc, year) sorted") {
    val out = TextMining.mine(docs(
      1L -> "une hausse de 3% en 2020 . une baisse de 2% en 2020 . un montant de 9%"))
      .orderBy("year").select("year", "vals").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("2020", "+3%,-2%"), ("NAN", "9%")))
  }

  test("keyword trim starts 3 words before the keyword (clamped at start)") {
    val sents = TextMining.sentences(docs(
      1L -> "un deux trois quatre cinq taux de chomage reste stable",
      2L -> "taux de chomage en tete"))
    val out = TextMining.keywordTrim(sents, "taux de chomage")
      .orderBy("doc_id").select("trimmed").as[String].collect()
    assert(out(0) === "trois quatre cinq taux de chomage reste stable")
    assert(out(1) === "taux de chomage en tete")
  }

  test("extract_data composition: reverse page pick -> trim -> mine") {
    // The q106 chain on a hand-built 3-page doc (extract_data,
    // texteExtract.py:40-93 with reverse=True): the keyword appears on
    // pages 1 and 2 — the REVERSE scan must pick page 2, the trim must
    // cut to 3 words before the keyword, and mining must see only the
    // trimmed sentence (so page 1's values and the same page's
    // post-sentence content never leak into the result).
    val kw = "taux de chomage"
    val pages = Seq(
      (1L, 1L, "intro . le taux de chomage etait de 9% en 2001 . fin"),
      (1L, 2L, "ensuite selon le rapport le taux de chomage marque une hausse de 4,2% en 2024 . annexe"),
      (1L, 3L, "page sans indicateur")).toDF("doc_id", "page_no", "page_text")
    val found = pages.filter(lower(col("page_text")).contains(kw))
      .groupBy(col("doc_id"))
      .agg(max(col("page_no")).as("page_no"),
        max_by(col("page_text"), col("page_no")).as("text"))
    assert(found.select("page_no").as[Long].head() === 2L)
    val trimmed = TextMining.keywordTrim(
      TextMining.sentences(found.select(col("doc_id"), col("text"))), kw)
      .groupBy(col("doc_id"))
      .agg(min_by(col("trimmed"), col("sent_idx")).as("text"))
    assert(trimmed.select("text").as[String].head() ===
      "le rapport le taux de chomage marque une hausse de 4,2% en 2024")
    val mined = TextMining.mine(trimmed).select("year", "vals").collect()
    assert(mined.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("2024", "+4,2%"))) // page 1's 9%/2001 must not appear
  }
}
