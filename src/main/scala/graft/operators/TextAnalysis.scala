package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-analysis operators for a training-data pipeline (builder
  * north-star "text analysis", generalizing the reference's M11 text
  * machinery to corpus hygiene): language identification, quality
  * scoring, and tokenizer-style token counting.
  *
  * All operators are single-pass projections or one-shuffle aggregates
  * over the documents table — no UDFs, no collect, codegen-friendly —
  * so they stream at scan speed at any corpus size.
  */
object TextAnalysis {

  /** Stopword lexicons for the n-gram/stopword language heuristic.
    * Broadcast-literal `isin` sets (J5 shape, texteExtract.py:117). */
  val EnStop = Seq("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")
  val FrStop = Seq("le", "la", "les", "de", "des", "du", "un", "une", "en", "et")

  /** Language ID: conditional stopword counts in one groupBy; guess is
    * 'fr'/'en' by majority, 'und' when neither lexicon hits. */
  def langId(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tok").isin(EnStop: _*), 1).otherwise(0)).as("n_en"),
        sum(when(col("tok").isin(FrStop: _*), 1).otherwise(0)).as("n_fr"))
      .withColumn("lang_guess",
        when(col("n_fr") > col("n_en"), lit("fr"))
          .when(col("n_en") > 0, lit("en"))
          .otherwise(lit("und")))

  /** Quality signals per document: length, token stats, alphabetic and
    * distinct-token ratios, and a fixed-weight score. Ratios are
    * int/int double divisions (deterministic); the score is one fixed
    * expression tree, so it is bit-stable across engines and
    * partitionings. */
  def qualityScore(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(
        max(length(col("text"))).cast("long").as("n_chars"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        sum(length(col("tok"))).as("sum_tok_len"),
        sum(when(col("tok").rlike("^[a-z]+$"), 1).otherwise(0)).as("n_alpha"))
      .select(
        col("doc_id"), col("n_chars"), col("n_tokens"), col("n_distinct"),
        (col("sum_tok_len") / col("n_tokens")).as("mean_tok_len"),
        (col("n_alpha") / col("n_tokens")).as("alpha_ratio"),
        (col("n_distinct") / col("n_tokens")).as("ttr"))
      .withColumn("quality",
        (col("alpha_ratio") * lit(0.5)) + (col("ttr") * lit(0.3)) +
          (when(col("n_tokens") >= 20 && col("n_tokens") <= 1000, lit(0.2))
            .otherwise(lit(0.0))))

  /** Tokenizer-style token counting: a BPE-ish regex lexer (letter
    * runs, digit runs, single non-alnum marks) counted per doc — the
    * "how many tokens will the model see" estimator. The pattern is
    * RE2-safe (no lookaround) so the oracle runs it verbatim. */
  val BpeIshRe = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9 ]"

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(s"($BpeIshRe)")))
        .cast("long").as("bpe_tokens"))

  /** Corpus-frequency quality proxy (the LM-perplexity stand-in that
    * needs no model): score a document by the average corpus frequency
    * of its token occurrences. Two shuffles — the unigram count and
    * the per-doc sum; the unigram table is vocabulary-sized and
    * broadcast back. Integer sums + one final IEEE division keep it
    * bit-reproducible (a log-prob variant would hit libm divergence
    * across engines). */
  def unigramQuality(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    toks.join(broadcast(freq), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("freq")).as("sum_freq"))
      .withColumn("mean_freq",
        col("sum_freq").cast("double") / col("n_tokens").cast("double"))
  }
}
