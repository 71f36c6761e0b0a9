package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextAnalysis
import Qx._

/** Oracle-checked text-analysis queries. q39 mixes the (English-ish)
  * documents table with the French synthetic report corpus so the
  * language guess exercises both branches. */
object TextAnalysisQ {

  val queries: Map[String, Q] = Map(
    // Language ID via stopword lexicons
    "q39_lang_id" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val fr = TextMiningQ.corpus(s, d).filter(col("doc_id") < 500)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      TextAnalysis.langId(docs.unionByName(fr))
        .select(col("doc_id"), col("n_tokens"), col("n_en"), col("n_fr"),
          col("lang_guess"))
        .orderBy("doc_id")
    }),

    // Quality scoring: length/alpha/type-token signals + fixed-weight score
    "q40_quality_score" -> ((s, d) =>
      TextAnalysis.qualityScore(Tables.documents(s, d))
        .orderBy("doc_id")),

    // Bigram-LM fluency (r13): mean MLE transition probability of a
    // doc's bigrams under counts trained on the full corpus — the
    // log-free perplexity proxy (libm log diverges across engines;
    // ratios round through DECIMAL(28,6) so the per-doc sum is
    // order-independent). Scored docs are a subset of the training
    // corpus, so every bigram resolves.
    "q216_bigram_fluency" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.bigramFluency(docs, docs.filter(col("doc_id") < 100))
        .orderBy("doc_id")
    }),

    // Unicode canonicalization — the pass that runs before tokenization
    // and dedup. Each doc gets a deterministic adversarial suffix
    // (TAB, decomposed e+U+0301, precomposed é, double space, the ﬁ
    // ligature, BEL, and the C1 control NEL U+0085): NFC must compose
    // e+combining-acute to é, keep the ligature (that's NFKC's job),
    // turn C0 AND C1 controls into spaces and collapse runs — the
    // oracle replays it with DuckDB's nfc_normalize, so the hash gate
    // pins the whole normal form; neither engine's \s matches U+0085,
    // so an unstripped NEL would survive into the tail and diverge
    // the hash (pinning the C1 widening, ADVICE r10)
    "q198_unicode_normalize" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit("\te\u0301 \u00e9  \uFB01nal\u0007\u0085end")).as("text"))
      TextAnalysis.normalizeText(docs, "NFC")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          substring(col("text"), -12, 12).as("tail"))
        .orderBy("doc_id")
    }),

    // Evaluation harness: per-class precision/recall/F1 of the langId
    // heuristic against the documents table's ground-truth lang column
    // — the metrics stage every classifier-shaped pipeline op needs;
    // classes only predicted (und) or only true (de/es/zh) still
    // appear with null precision/recall respectively
    "q142_langid_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextAnalysis.langId(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("lang_guess").as("pred"))
        .join(docs.select(col("doc_id"), col("lang").as("truth")), "doc_id")
      TextAnalysis.classifierEval(pairs).orderBy("cls")
    }),

    // Token counting: whitespace vs BPE-ish lexer counts + per-source rollup
    "q41_token_counts" -> ((s, d) =>
      TextAnalysis.tokenCounts(Tables.documents(s, d))
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).as("ws_total"),
          sum(col("bpe_tokens")).as("bpe_total"))
        .orderBy("source")),

    // Corpus-frequency quality proxy (LM-free perplexity stand-in)
    "q88_unigram_quality" -> ((s, d) =>
      TextAnalysis.unigramQuality(Tables.documents(s, d))
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), col("n_tokens"), col("sum_freq"), col("mean_freq"))
        .orderBy("doc_id")),

    // Vocabulary build + per-doc OOV rate: top-30 vocab by (freq desc,
    // token) — bounded by construction, broadcastable at any scale
    "q125_oov_rate" -> ((s, d) =>
      TextAnalysis.oovRate(Tables.documents(s, d), vocabSize = 30)
        .orderBy("doc_id")),

    // BM25-style keyword relevance (log-free rational idf), top 20
    "q102_bm25_rank" -> ((s, d) =>
      TextAnalysis.bm25Rank(Tables.documents(s, d), Seq("spark", "join"), topK = 20)),

    // Gopher-style repetition quality filters: duplicate-token
    // fraction + most-frequent bigram per doc
    "q108_repetition" -> ((s, d) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, d))
        .orderBy("doc_id")),

    // Count-min heavy-hitter sketch vs exact counts for the corpus's
    // top-20 tokens (estimate must upper-bound exact by construction)
    "q111_countmin" -> ((s, d) =>
      TextAnalysis.countMinTopK(Tables.documents(s, d))
        .orderBy("tok")),

    // PII scrubbing over a synthesized contact-bearing corpus (the
    // lake's documents are digit-free, so emails/phones are derived
    // from events ints — identically in the oracle)
    "q114_pii_scrub" -> ((s, d) =>
      TextAnalysis.piiScrub(piiCorpus(s, d))
        .orderBy("doc_id")),

    // χ² distinctive terms per source (r13): the keyword-extraction
    // op behind per-domain curation reports — 2×2 term/slice
    // contingency scored over exact counts, top 5 per source.
    "q223_distinctive_terms" -> ((s, d) =>
      TextAnalysis.distinctiveTerms(Tables.documents(s, d), "source")
        .orderBy("slice", "rk")),

    // Inverted-index build (r13): top-50 tokens by document frequency
    // with df, total tf and the first-10 posting list — the search
    // primitive next to BM25, lists assembled per token partition.
    "q232_inverted_index" -> ((s, d) =>
      TextAnalysis.invertedIndex(Tables.documents(s, d))
        .orderBy("rank"))
  )

  /** Contact-bearing corpus for q114/q127: one email, one phone-shaped
    * number, and one safe numeric ref per doc, all derived from
    * events integer columns. Pure projection, so it applies unchanged
    * to the BATCH events table and the STREAMING events source. */
  def piiCorpusFrom(events: DataFrame): DataFrame =
    events.filter(col("event_id") < 2000).select(
      col("event_id").as("doc_id"),
      concat(
        lit("contact user"), col("user_id").cast("string"),
        lit("@mail"), (col("event_id") % 7).cast("string"),
        lit(".com tel 0"),
        lpad(((col("event_id") * 37) % 1000000000).cast("string"), 9, "0"),
        lit(" ref "), col("event_id").cast("string"),
        lit(" fin")).as("text"))

  def piiCorpus(s: SparkSession, d: String): DataFrame =
    piiCorpusFrom(Tables.events(s, d))

  val oracles: Map[String, String] = Map(
    "q216_bigram_fluency" ->
      """WITH toks AS (
        |  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        |        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |        WHERE len(l) >= 2)
        |),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM toks GROUP BY 1, 2),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM toks GROUP BY 1),
        |j AS (
        |  SELECT t.doc_id,
        |         CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE) AS r
        |  FROM toks t JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |  WHERE t.doc_id < 100
        |)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |       CAST(SUM(CAST(r AS DECIMAL(28,6))) AS DOUBLE) AS sum_p,
        |       CAST(SUM(CAST(r AS DECIMAL(28,6))) AS DOUBLE) /
        |         CAST(COUNT(*) AS DOUBLE) AS fluency
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q39_lang_id" ->
      s"""WITH ${TextMiningQ.corpusSql},
         |mixed AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM corpus WHERE doc_id < 500
         |),
         |toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM mixed
         |),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum(CASE WHEN tok IN ('the','a','of','and','in','to','is','on','for','with') THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         |         CAST(sum(CASE WHEN tok IN ('le','la','les','de','des','du','un','une','en','et') THEN 1 ELSE 0 END) AS BIGINT) AS n_fr
         |  FROM toks GROUP BY doc_id
         |)
         |SELECT doc_id, n_tokens, n_en, n_fr,
         |       CASE WHEN n_fr > n_en THEN 'fr' WHEN n_en > 0 THEN 'en' ELSE 'und' END AS lang_guess
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q142_langid_eval" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |agg AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN tok IN ('the','a','of','and','in','to','is','on','for','with') THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |         CAST(sum(CASE WHEN tok IN ('le','la','les','de','des','du','un','une','en','et') THEN 1 ELSE 0 END) AS BIGINT) AS n_fr
        |  FROM toks GROUP BY doc_id
        |),
        |pt AS (
        |  SELECT d.doc_id,
        |         CASE WHEN a.n_fr > a.n_en THEN 'fr'
        |              WHEN a.n_en > 0 THEN 'en' ELSE 'und' END AS pred,
        |         d.lang AS truth
        |  FROM documents d JOIN agg a ON d.doc_id = a.doc_id
        |),
        |bp AS (
        |  SELECT pred AS cls, COUNT(*) AS n_pred,
        |         CAST(SUM(CASE WHEN pred = truth THEN 1 ELSE 0 END) AS BIGINT) AS tp
        |  FROM pt GROUP BY pred
        |),
        |bt AS (SELECT truth AS cls, COUNT(*) AS n_true FROM pt GROUP BY truth),
        |j AS (
        |  SELECT COALESCE(bp.cls, bt.cls) AS cls,
        |         COALESCE(bp.n_pred, 0) AS n_pred,
        |         COALESCE(bt.n_true, 0) AS n_true,
        |         COALESCE(bp.tp, 0) AS tp
        |  FROM bp FULL OUTER JOIN bt ON bp.cls = bt.cls
        |)
        |SELECT cls, n_pred, n_true, tp,
        |       CASE WHEN n_pred > 0 THEN tp / n_pred END AS precision,
        |       CASE WHEN n_true > 0 THEN tp / n_true END AS recall,
        |       CASE WHEN n_pred > 0 AND n_true > 0
        |                 AND (tp / n_pred) + (tp / n_true) > 0
        |            THEN (2 * (tp / n_pred) * (tp / n_true)) /
        |                 ((tp / n_pred) + (tp / n_true)) END AS f1
        |FROM j ORDER BY cls""".stripMargin,

    "q198_unicode_normalize" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(
        |    nfc_normalize(text || chr(9) || 'e' || chr(769) || ' ' || chr(233)
        |                  || '  ' || chr(64257) || 'nal' || chr(7) || chr(133) || 'end'),
        |    '[\x00-\x1f\x7f-\x9f]', ' ', 'g'), '\s+', ' ', 'g')) AS t
        |  FROM documents
        |)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars, right(t, 12) AS tail
        |FROM norm ORDER BY doc_id""".stripMargin,

    "q40_quality_score" ->
      """WITH toks AS (
        |  SELECT doc_id, text, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |agg AS (
        |  SELECT doc_id,
        |         CAST(max(len(text)) AS BIGINT) AS n_chars,
        |         count(*) AS n_tokens,
        |         count(DISTINCT tok) AS n_distinct,
        |         sum(len(tok)) AS sum_tok_len,
        |         sum(CASE WHEN regexp_matches(tok, '^[a-z]+$') THEN 1 ELSE 0 END) AS n_alpha
        |  FROM toks GROUP BY doc_id
        |),
        |ratios AS (
        |  SELECT doc_id, n_chars, n_tokens, n_distinct,
        |         sum_tok_len / n_tokens AS mean_tok_len,
        |         n_alpha / n_tokens AS alpha_ratio,
        |         n_distinct / n_tokens AS ttr
        |  FROM agg
        |)
        |SELECT *,
        |       (alpha_ratio * 0.5) + (ttr * 0.3) +
        |       (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.2 ELSE 0.0 END) AS quality
        |FROM ratios ORDER BY doc_id""".stripMargin,

    "q41_token_counts" ->
      s"""WITH per_doc AS (
         |  SELECT doc_id, source,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
         |         CAST(len(regexp_extract_all(text, '(${TextAnalysis.BpeIshRe})', 1)) AS BIGINT) AS bpe_tokens
         |  FROM documents
         |)
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(ws_tokens) AS BIGINT) AS ws_total,
         |       CAST(sum(bpe_tokens) AS BIGINT) AS bpe_total
         |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,

    "q88_unigram_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |freq AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok)
        |SELECT t.doc_id AS doc_id, COUNT(*) AS n_tokens,
        |       CAST(SUM(f.freq) AS BIGINT) AS sum_freq,
        |       CAST(CAST(SUM(f.freq) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_freq
        |FROM toks t JOIN freq f ON t.tok = f.tok
        |WHERE t.doc_id < 500
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    "q125_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
        |    ORDER BY freq DESC, tok LIMIT 30
        |  )
        |)
        |SELECT t.doc_id AS doc_id, COUNT(*) AS n_tokens,
        |       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |       CAST(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        |         / COUNT(*) AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    // arithmetic mirrored term-by-term against TextAnalysis.bm25Rank:
    // same literals, same parenthesization, score = s0 + s1
    "q102_bm25_rank" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS len,
        |         CAST(len(list_filter(string_split(text, ' '), w -> w = 'spark')) AS DOUBLE) AS tf0,
        |         CAST(len(list_filter(string_split(text, ' '), w -> w = 'join')) AS DOUBLE) AS tf1
        |  FROM documents
        |),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |         SUM(len) / COUNT(*) AS avg_len,
        |         SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        |         SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1
        |  FROM base
        |)
        |SELECT doc_id,
        |       ((n_docs - df0 + 0.5) / (df0 + 0.5)) *
        |       ((tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * len / avg_len))) +
        |       ((n_docs - df1 + 0.5) / (df1 + 0.5)) *
        |       ((tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * len / avg_len))) AS score
        |FROM base, stats
        |WHERE ((n_docs - df0 + 0.5) / (df0 + 0.5)) *
        |      ((tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * len / avg_len))) +
        |      ((n_docs - df1 + 0.5) / (df1 + 0.5)) *
        |      ((tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * len / avg_len))) > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "q108_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |),
        |b0 AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct, toks
        |  FROM t
        |),
        |bg AS (
        |  SELECT doc_id, n_tokens, n_distinct, toks[i] || ' ' || toks[i + 1] AS bigram
        |  FROM (SELECT doc_id, n_tokens, n_distinct, toks,
        |               unnest(generate_series(1, len(toks) - 1)) AS i FROM b0)
        |),
        |bc AS (
        |  SELECT doc_id, n_tokens, n_distinct, bigram, COUNT(*) AS cnt
        |  FROM bg GROUP BY doc_id, n_tokens, n_distinct, bigram
        |),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY cnt DESC, bigram) AS rn
        |  FROM bc
        |)
        |SELECT doc_id, n_tokens, n_distinct,
        |       CAST(1 AS DOUBLE) - (n_distinct / n_tokens) AS dup_tok_frac,
        |       bigram AS top_bigram, cnt AS top_bigram_n
        |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q111_countmin" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |stacked AS (
        |  SELECT tok, i AS row_i,
        |         substring(md5(tok || '#' || CAST(i AS VARCHAR)), 1, 2) AS bucket
        |  FROM (SELECT tok, unnest([0, 1, 2, 3]) AS i FROM toks)
        |),
        |counters AS (
        |  SELECT row_i, bucket, COUNT(*) AS cnt FROM stacked GROUP BY row_i, bucket
        |),
        |probes AS (
        |  SELECT tok, COUNT(*) AS exact_n FROM toks GROUP BY tok
        |  ORDER BY exact_n DESC, tok LIMIT 20
        |),
        |pb AS (
        |  SELECT tok, exact_n, i AS row_i,
        |         substring(md5(tok || '#' || CAST(i AS VARCHAR)), 1, 2) AS bucket
        |  FROM (SELECT tok, exact_n, unnest([0, 1, 2, 3]) AS i FROM probes)
        |)
        |SELECT p.tok AS tok, p.exact_n AS exact_n,
        |       MIN(COALESCE(c.cnt, 0)) AS cms_est
        |FROM pb p LEFT JOIN counters c ON p.row_i = c.row_i AND p.bucket = c.bucket
        |GROUP BY p.tok, p.exact_n
        |ORDER BY tok""".stripMargin,

    "q114_pii_scrub" ->
      """WITH corpus AS (
        |  SELECT event_id AS doc_id,
        |    'contact user' || CAST(user_id AS VARCHAR) ||
        |    '@mail' || CAST(event_id % 7 AS VARCHAR) ||
        |    '.com tel 0' ||
        |    lpad(CAST((event_id * 37) % 1000000000 AS VARCHAR), 9, '0') ||
        |    ' ref ' || CAST(event_id AS VARCHAR) || ' fin' AS text
        |  FROM events WHERE event_id < 2000
        |),
        |redacted AS (
        |  SELECT doc_id, text,
        |         regexp_replace(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g')
        |           AS no_email
        |  FROM corpus
        |)
        |SELECT doc_id,
        |       regexp_replace(no_email, '0[0-9]{9}', '<PHONE>', 'g') AS clean,
        |       CAST(len(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS BIGINT)
        |         AS n_emails,
        |       CAST(len(regexp_extract_all(no_email, '0[0-9]{9}')) AS BIGINT) AS n_phones
        |FROM redacted ORDER BY doc_id""".stripMargin,

    // mirrors TextAnalysis.distinctiveTerms: exact BIGINT contingency
    // cells, one fixed IEEE op tree for the χ² score
    "q223_distinctive_terms" ->
      """WITH toks AS (
        |  SELECT source AS slice, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents
        |), t AS (
        |  SELECT slice, tok FROM toks WHERE regexp_matches(tok, '^[a-z]+$')
        |), st AS (
        |  SELECT slice, tok, COUNT(*) AS a FROM t GROUP BY slice, tok
        |), stot AS (
        |  SELECT slice, SUM(a) AS s_tot FROM st GROUP BY slice
        |), ttot AS (
        |  SELECT tok, SUM(a) AS t_tot FROM st GROUP BY tok
        |), n AS (
        |  SELECT SUM(s_tot) AS n_tot FROM stot
        |), cells AS (
        |  SELECT st.slice, st.tok,
        |         CAST(st.a AS BIGINT) AS a,
        |         CAST(ttot.t_tot - st.a AS BIGINT) AS b,
        |         CAST(stot.s_tot - st.a AS BIGINT) AS c,
        |         CAST(n.n_tot - ttot.t_tot - stot.s_tot + st.a AS BIGINT) AS d,
        |         CAST(n.n_tot AS BIGINT) AS n_tot
        |  FROM st JOIN stot USING (slice) JOIN ttot USING (tok) CROSS JOIN n
        |), scored AS (
        |  SELECT slice, tok, a,
        |         CAST(n_tot AS DOUBLE) *
        |         ((CAST(a AS DOUBLE) * CAST(d AS DOUBLE) -
        |           CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) *
        |          (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) -
        |           CAST(b AS DOUBLE) * CAST(c AS DOUBLE))) /
        |         (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) *
        |          CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)) AS chi2
        |  FROM cells
        |), ranked AS (
        |  SELECT slice, tok, a, chi2,
        |         CAST(row_number() OVER (PARTITION BY slice
        |             ORDER BY chi2 DESC, tok) AS BIGINT) AS rk
        |  FROM scored
        |)
        |SELECT slice, rk, tok, a AS tf_in_slice, chi2
        |FROM ranked WHERE rk <= 5 ORDER BY slice, rk""".stripMargin,

    "q232_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT tok, doc_id, COUNT(*) AS tf FROM toks
        |  WHERE regexp_matches(tok, '^[a-z]+$') GROUP BY tok, doc_id
        |), stats AS (
        |  SELECT tok, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
        |  FROM tf GROUP BY tok
        |), heads AS (
        |  SELECT tok, doc_id,
        |         row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rk
        |  FROM tf
        |), postings AS (
        |  SELECT tok, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |           AS postings_head
        |  FROM heads WHERE rk <= 10 GROUP BY tok
        |), ranked AS (
        |  SELECT CAST(row_number() OVER (ORDER BY s.df DESC, s.tok) AS BIGINT) AS rank,
        |         s.tok, s.df, s.total_tf, p.postings_head
        |  FROM stats s JOIN postings p USING (tok)
        |)
        |SELECT rank, tok, df, total_tf, postings_head
        |FROM ranked WHERE rank <= 50 ORDER BY rank""".stripMargin
  )
}
