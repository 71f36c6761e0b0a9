package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextMining
import Qx._

/** Oracle-checked queries for the M11 text-mining pipeline
  * (texteExtract.py:20-129). The lake's `documents` table is
  * punctuation- and digit-free, so a deterministic French-report corpus
  * is derived from `events` integer columns — identically on both
  * engines (pure int->string concat, no float formatting) — and the
  * pipeline runs on that. Each doc has 4 sentences exercising: multiple
  * values sharing one as-of year, a trailing year with no value, a
  * two-token `NUM unit` value with no year (NAN path), sign words
  * (hausse/baisse/deficit) and a sign-free value.
  */
object TextMiningQ {

  /** Spark-side corpus: one doc per event. */
  def corpus(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id").as("doc_id"),
      concat(
        lit("le rapport indique une "),
        when(col("event_id") % 2 === 0, lit("hausse")).otherwise(lit("baisse")),
        lit(" de "),
        (col("user_id") % 90 + 1).cast("string"), lit(","),
        (col("event_id") % 10).cast("string"),
        lit("% contre "), (col("event_id") % 80 + 1).cast("string"),
        lit("% en "), (col("event_id") % 30 + 1990).cast("string"),
        lit(" puis en "), (col("event_id") % 5 + 2020).cast("string"),
        lit(" . selon les analystes le taux de chomage et sous-emploi reste stable"
          + " . on note un deficit de "),
        (col("event_id") % 50).cast("string"), lit(","),
        (col("user_id") % 10).cast("string"),
        lit(" millions . la croissance atteint "),
        (col("event_id") % 7).cast("string"), lit("%")).as("text"))

  /** DuckDB-side corpus CTE — the exact same derivation in SQL. */
  val corpusSql: String =
    """corpus AS (
      |  SELECT event_id AS doc_id,
      |    'le rapport indique une ' ||
      |    CASE WHEN event_id % 2 = 0 THEN 'hausse' ELSE 'baisse' END ||
      |    ' de ' || CAST(user_id % 90 + 1 AS VARCHAR) || ',' ||
      |    CAST(event_id % 10 AS VARCHAR) ||
      |    '% contre ' || CAST(event_id % 80 + 1 AS VARCHAR) ||
      |    '% en ' || CAST(event_id % 30 + 1990 AS VARCHAR) ||
      |    ' puis en ' || CAST(event_id % 5 + 2020 AS VARCHAR) ||
      |    ' . selon les analystes le taux de chomage et sous-emploi reste stable' ||
      |    ' . on note un deficit de ' || CAST(event_id % 50 AS VARCHAR) || ',' ||
      |    CAST(user_id % 10 AS VARCHAR) ||
      |    ' millions . la croissance atteint ' || CAST(event_id % 7 AS VARCHAR) || '%'
      |    AS text
      |  FROM events
      |)""".stripMargin

  /** Token relation CTE (sentences + positions) shared by the SQL
    * oracles: sentence split on ` [.!?]+ `, then 1-based token
    * positions via generate_series. */
  val tokensSql: String =
    s"""$corpusSql,
       |sents0 AS (
       |  SELECT doc_id, regexp_split_to_array(text, ' [.!?]+ ') AS ss FROM corpus
       |),
       |sents1 AS (
       |  SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS sent_idx FROM sents0
       |),
       |sents AS (
       |  SELECT doc_id, sent_idx, ss[sent_idx] AS sentence FROM sents1
       |),
       |toks0 AS (
       |  SELECT doc_id, sent_idx, string_split(sentence, ' ') AS ws FROM sents
       |),
       |toks1 AS (
       |  SELECT doc_id, sent_idx, ws, unnest(generate_series(1, len(ws))) AS pos FROM toks0
       |),
       |toks AS (
       |  SELECT doc_id, sent_idx, pos, ws[pos] AS tok FROM toks1
       |),
       |vals AS (
       |  SELECT doc_id, sent_idx, pos AS v_pos,
       |         CASE WHEN regexp_matches(tok, '^[0-9]+(,[0-9]+)?%$$') THEN pos ELSE pos + 1 END AS v_end,
       |         CASE WHEN regexp_matches(tok, '^[0-9]+(,[0-9]+)?%$$') THEN tok
       |              ELSE tok || ' ' || next_tok END AS value
       |  FROM (
       |    SELECT *, lead(tok) OVER (PARTITION BY doc_id, sent_idx ORDER BY pos) AS next_tok
       |    FROM toks
       |  )
       |  WHERE regexp_matches(tok, '^[0-9]+(,[0-9]+)?%$$')
       |     OR (regexp_matches(tok, '^[0-9]+(,[0-9]+)?$$')
       |         AND next_tok IN ('millions', 'dollars', 'bbl', '%', '$$'))
       |),
       |yrs AS (
       |  SELECT doc_id, sent_idx, pos AS y_pos, tok AS year
       |  FROM toks WHERE regexp_matches(tok, '^[0-9]{4}$$')
       |)""".stripMargin

  val queries: Map[String, Q] = Map(
    // F17 — sentence segmentation generator
    "q27_sentences" -> ((s, d) =>
      TextMining.sentences(corpus(s, d).filter(col("doc_id") < 300))
        .orderBy("doc_id", "sent_idx")),

    // F9 — token classification (VALUE/YEAR/NUM/WORD) with positions
    "q28_token_classes" -> ((s, d) =>
      TextMining.classified(
        TextMining.tokens(TextMining.sentences(corpus(s, d).filter(col("doc_id") < 100))))
        .select(col("doc_id"), col("sent_idx"), col("pos"), col("tok"), col("cls"))
        .orderBy("doc_id", "sent_idx", "pos")),

    // J2 — as-of nearest-following-year association, NAN default
    "q29_asof_year" -> ((s, d) => {
      val toks = TextMining.tokens(TextMining.sentences(
        corpus(s, d).filter(col("doc_id") < 1000)))
      TextMining.asOfYear(TextMining.values(toks), TextMining.years(toks))
        .orderBy("doc_id", "sent_idx", "v_pos")
    }),

    // J3 — sign from 25-token lookback context
    "q30_sign_context" -> ((s, d) => {
      val toks = TextMining.tokens(TextMining.sentences(
        corpus(s, d).filter(col("doc_id") < 1000)))
      TextMining.signContext(TextMining.values(toks), toks)
        .select(col("doc_id"), col("sent_idx"), col("v_pos"), col("value"),
          coalesce(col("sign_word"), lit("")).as("sign_word"), col("sign"))
        .orderBy("doc_id", "sent_idx", "v_pos")
    }),

    // M11 — full pipeline: {year: [signed values]} per doc
    "q31_mining_collect" -> ((s, d) =>
      TextMining.mine(corpus(s, d).filter(col("doc_id") < 2000))
        .orderBy("doc_id", "year")),

    // F8 — keyword sentence + 3-words-before trim
    "q32_keyword_trim" -> ((s, d) =>
      TextMining.keywordTrim(
        TextMining.sentences(corpus(s, d).filter(col("doc_id") < 300)),
        "taux de chomage")
        .orderBy("doc_id", "sent_idx")),

    // End-to-end extract_data composition (budgetEco.py:81-88 →
    // texteExtract.py:40-93): reverse-scan pages for the keyword
    // (find_KPI_page, reverse=True ⇒ LAST matching page wins), take the
    // first keyword sentence on that page trimmed 3 words before the
    // keyword, then mine ONLY the trimmed sentence for signed values
    // and as-of years. Chains the q57/q32/q27-q31 stages through one
    // plan — the reference's most-used interactive journey — with no
    // re-tokenization drift between stages.
    "q106_extract_data" -> ((s, d) => {
      val kw = "taux de chomage"
      val pages = extractPages(s, d)
      // stage 1 — find_KPI_page: highest page_no containing the keyword
      val found = pages
        .filter(lower(col("page_text")).contains(kw))
        .groupBy(col("doc_id"))
        .agg(max(col("page_no")).as("page_no"),
          max_by(col("page_text"), col("page_no")).as("text"))
      // stage 2 — first keyword sentence on the found page, trimmed
      val trimmed = TextMining.keywordTrim(
        TextMining.sentences(found.select(col("doc_id"), col("text"))), kw)
        .groupBy(col("doc_id"))
        .agg(min_by(col("trimmed"), col("sent_idx")).as("text"))
      // stage 3 — mine the trimmed sentence only (the reference mines
      // trimmed_sent, never the whole page)
      TextMining.mine(trimmed)
        .join(found.select(col("doc_id"), col("page_no")), Seq("doc_id"))
        .select(col("doc_id"), col("page_no"), col("year"), col("vals"))
        .orderBy("doc_id", "year")
    })
  )

  /** Paged corpus for the composed extract_data query: 3 pages per doc.
    * Page 1 mentions the keyword with no values (a wrong-direction scan
    * would mine nothing), page 2 carries the keyword sentence with
    * values, page 3 carries the keyword with DIFFERENT values for every
    * third doc — so the reverse scan's last-match choice is visible in
    * the mined output. */
  def extractPages(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("event_id") < 2000).select(
      col("event_id").as("doc_id"),
      array(
        lit("resume . le taux de chomage reste un sujet central . fin"),
        concat(lit("selon le rapport le taux de chomage affiche une "),
          when(col("event_id") % 2 === 0, lit("hausse")).otherwise(lit("baisse")),
          lit(" de "), (col("user_id") % 90 + 1).cast("string"), lit(","),
          (col("event_id") % 10).cast("string"),
          lit("% en "), (col("event_id") % 30 + 1990).cast("string"),
          lit(" contre "), (col("event_id") % 80 + 1).cast("string"),
          lit("% auparavant")),
        when(col("event_id") % 3 === 0,
          concat(lit("en annexe le taux de chomage recule a "),
            (col("event_id") % 40 + 1).cast("string"), lit(","),
            (col("user_id") % 10).cast("string"),
            lit("% en "), (col("event_id") % 8 + 2000).cast("string")))
          .otherwise(lit("annexe statistique sans indicateur particulier"))
      ).as("pages"))
      .select(col("doc_id"), posexplode(col("pages")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("page_no"),
        col("col").as("page_text"))

  val oracles: Map[String, String] = Map(
    "q27_sentences" ->
      s"""WITH $corpusSql,
         |s AS (
         |  SELECT doc_id, regexp_split_to_array(text, ' [.!?]+ ') AS ss
         |  FROM corpus WHERE doc_id < 300
         |),
         |e AS (SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS sent_idx FROM s)
         |SELECT doc_id, sent_idx, ss[sent_idx] AS sentence FROM e
         |ORDER BY doc_id, sent_idx""".stripMargin,

    "q28_token_classes" ->
      s"""WITH $tokensSql
         |SELECT doc_id, sent_idx, pos, tok,
         |       CASE WHEN regexp_matches(tok, '^[0-9]{4}$$') THEN 'YEAR'
         |            WHEN regexp_matches(tok, '^[0-9]+(,[0-9]+)?%$$') THEN 'VALUE'
         |            WHEN regexp_matches(tok, '^[0-9]+(,[0-9]+)?$$') THEN 'NUM'
         |            ELSE 'WORD' END AS cls
         |FROM toks WHERE doc_id < 100
         |ORDER BY doc_id, sent_idx, pos""".stripMargin,

    "q29_asof_year" ->
      s"""WITH $tokensSql
         |SELECT v.doc_id AS doc_id, v.sent_idx AS sent_idx, v.v_pos AS v_pos, v.value AS value,
         |       COALESCE(min_by(y.year, y.y_pos - v.v_end), 'NAN') AS year
         |FROM vals v
         |LEFT JOIN yrs y
         |  ON v.doc_id = y.doc_id AND v.sent_idx = y.sent_idx AND y.y_pos > v.v_end
         |WHERE v.doc_id < 1000
         |GROUP BY v.doc_id, v.sent_idx, v.v_pos, v.value
         |ORDER BY v.doc_id, v.sent_idx, v.v_pos""".stripMargin,

    "q30_sign_context" ->
      s"""WITH $tokensSql,
         |signs AS (
         |  SELECT doc_id, sent_idx, pos, tok FROM toks
         |  WHERE tok IN ('hausse','augmentation','appreciation','excedent',
         |                'accroissement','baisse','diminution','deficit')
         |),
         |picked AS (
         |  SELECT v.doc_id, v.sent_idx, v.v_pos, v.value,
         |         min_by(s.tok, v.v_pos - s.pos) AS sw
         |  FROM vals v
         |  LEFT JOIN signs s
         |    ON v.doc_id = s.doc_id AND v.sent_idx = s.sent_idx
         |   AND s.pos BETWEEN v.v_pos - 25 AND v.v_pos - 1
         |  WHERE v.doc_id < 1000
         |  GROUP BY v.doc_id, v.sent_idx, v.v_pos, v.value
         |)
         |SELECT doc_id, sent_idx, v_pos, value,
         |       COALESCE(sw, '') AS sign_word,
         |       CASE WHEN sw IN ('hausse','augmentation','appreciation','excedent','accroissement') THEN '+'
         |            WHEN sw IN ('baisse','diminution','deficit') THEN '-'
         |            ELSE '' END AS sign
         |FROM picked ORDER BY doc_id, sent_idx, v_pos""".stripMargin,

    "q31_mining_collect" ->
      s"""WITH $tokensSql,
         |with_year AS (
         |  SELECT v.doc_id, v.sent_idx, v.v_pos, v.value,
         |         COALESCE(min_by(y.year, y.y_pos - v.v_end), 'NAN') AS year
         |  FROM vals v
         |  LEFT JOIN yrs y
         |    ON v.doc_id = y.doc_id AND v.sent_idx = y.sent_idx AND y.y_pos > v.v_end
         |  WHERE v.doc_id < 2000
         |  GROUP BY v.doc_id, v.sent_idx, v.v_pos, v.value
         |),
         |with_sign AS (
         |  SELECT v.doc_id, v.sent_idx, v.v_pos, v.value,
         |         CASE WHEN min_by(s.tok, v.v_pos - s.pos)
         |                   IN ('hausse','augmentation','appreciation','excedent','accroissement') THEN '+'
         |              WHEN min_by(s.tok, v.v_pos - s.pos)
         |                   IN ('baisse','diminution','deficit') THEN '-'
         |              ELSE '' END AS sign
         |  FROM vals v
         |  LEFT JOIN (
         |    SELECT doc_id, sent_idx, pos, tok FROM toks
         |    WHERE tok IN ('hausse','augmentation','appreciation','excedent',
         |                  'accroissement','baisse','diminution','deficit')
         |  ) s
         |    ON v.doc_id = s.doc_id AND v.sent_idx = s.sent_idx
         |   AND s.pos BETWEEN v.v_pos - 25 AND v.v_pos - 1
         |  WHERE v.doc_id < 2000
         |  GROUP BY v.doc_id, v.sent_idx, v.v_pos, v.value
         |)
         |SELECT a.doc_id AS doc_id, a.year AS year,
         |       array_to_string(list_sort(list(b.sign || a.value)), ',') AS vals
         |FROM with_year a
         |JOIN with_sign b
         |  ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx
         | AND a.v_pos = b.v_pos AND a.value = b.value
         |GROUP BY a.doc_id, a.year ORDER BY a.doc_id, a.year""".stripMargin,

    "q32_keyword_trim" ->
      s"""WITH $corpusSql,
         |s AS (
         |  SELECT doc_id, regexp_split_to_array(text, ' [.!?]+ ') AS ss
         |  FROM corpus WHERE doc_id < 300
         |),
         |e AS (SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS sent_idx FROM s),
         |sents AS (SELECT doc_id, sent_idx, ss[sent_idx] AS sentence FROM e),
         |hits AS (
         |  SELECT doc_id, sent_idx, string_split(sentence, ' ') AS words,
         |         list_position(string_split(lower(sentence), ' '), 'taux') AS kpos
         |  FROM sents WHERE contains(lower(sentence), 'taux de chomage')
         |)
         |SELECT doc_id, sent_idx,
         |       array_to_string(words[greatest(kpos - 3, 1):], ' ') AS trimmed
         |FROM hits WHERE kpos > 0 ORDER BY doc_id, sent_idx""".stripMargin,

    "q106_extract_data" ->
      """WITH base AS (
        |  SELECT event_id AS doc_id, user_id FROM events WHERE event_id < 2000
        |),
        |pages AS (
        |  SELECT doc_id, CAST(1 AS BIGINT) AS page_no,
        |         'resume . le taux de chomage reste un sujet central . fin' AS page_text
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id, CAST(2 AS BIGINT),
        |         'selon le rapport le taux de chomage affiche une ' ||
        |         CASE WHEN doc_id % 2 = 0 THEN 'hausse' ELSE 'baisse' END ||
        |         ' de ' || CAST(user_id % 90 + 1 AS VARCHAR) || ',' ||
        |         CAST(doc_id % 10 AS VARCHAR) ||
        |         '% en ' || CAST(doc_id % 30 + 1990 AS VARCHAR) ||
        |         ' contre ' || CAST(doc_id % 80 + 1 AS VARCHAR) || '% auparavant'
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id, CAST(3 AS BIGINT),
        |         CASE WHEN doc_id % 3 = 0 THEN
        |           'en annexe le taux de chomage recule a ' ||
        |           CAST(doc_id % 40 + 1 AS VARCHAR) || ',' ||
        |           CAST(user_id % 10 AS VARCHAR) ||
        |           '% en ' || CAST(doc_id % 8 + 2000 AS VARCHAR)
        |         ELSE 'annexe statistique sans indicateur particulier' END
        |  FROM base
        |),
        |found AS (
        |  SELECT doc_id, max(page_no) AS page_no,
        |         max_by(page_text, page_no) AS text
        |  FROM pages WHERE contains(lower(page_text), 'taux de chomage')
        |  GROUP BY doc_id
        |),
        |sents0 AS (
        |  SELECT doc_id, regexp_split_to_array(text, ' [.!?]+ ') AS ss FROM found
        |),
        |sents1 AS (
        |  SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS sent_idx FROM sents0
        |),
        |sents AS (SELECT doc_id, sent_idx, ss[sent_idx] AS sentence FROM sents1),
        |hits AS (
        |  SELECT doc_id, sent_idx, string_split(sentence, ' ') AS words,
        |         list_position(string_split(lower(sentence), ' '), 'taux') AS kpos
        |  FROM sents WHERE contains(lower(sentence), 'taux de chomage')
        |),
        |trimmed AS (
        |  SELECT doc_id,
        |         min_by(array_to_string(words[greatest(kpos - 3, 1):], ' '), sent_idx) AS text
        |  FROM hits WHERE kpos > 0 GROUP BY doc_id
        |),
        |toks0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM trimmed),
        |toks1 AS (
        |  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS pos FROM toks0
        |),
        |toks AS (SELECT doc_id, pos, ws[pos] AS tok FROM toks1),
        |vals AS (
        |  SELECT doc_id, pos AS v_pos,
        |         CASE WHEN regexp_matches(tok, '^[0-9]+(,[0-9]+)?%$') THEN pos ELSE pos + 1 END AS v_end,
        |         CASE WHEN regexp_matches(tok, '^[0-9]+(,[0-9]+)?%$') THEN tok
        |              ELSE tok || ' ' || next_tok END AS value
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS next_tok FROM toks)
        |  WHERE regexp_matches(tok, '^[0-9]+(,[0-9]+)?%$')
        |     OR (regexp_matches(tok, '^[0-9]+(,[0-9]+)?$')
        |         AND next_tok IN ('millions', 'dollars', 'bbl', '%', '$'))
        |),
        |yrs AS (
        |  SELECT doc_id, pos AS y_pos, tok AS year
        |  FROM toks WHERE regexp_matches(tok, '^[0-9]{4}$')
        |),
        |with_year AS (
        |  SELECT v.doc_id, v.v_pos, v.value,
        |         COALESCE(min_by(y.year, y.y_pos - v.v_end), 'NAN') AS year
        |  FROM vals v
        |  LEFT JOIN yrs y ON v.doc_id = y.doc_id AND y.y_pos > v.v_end
        |  GROUP BY v.doc_id, v.v_pos, v.value
        |),
        |with_sign AS (
        |  SELECT v.doc_id, v.v_pos, v.value,
        |         CASE WHEN min_by(s.tok, v.v_pos - s.pos)
        |                   IN ('hausse','augmentation','appreciation','excedent','accroissement') THEN '+'
        |              WHEN min_by(s.tok, v.v_pos - s.pos)
        |                   IN ('baisse','diminution','deficit') THEN '-'
        |              ELSE '' END AS sign
        |  FROM vals v
        |  LEFT JOIN (
        |    SELECT doc_id, pos, tok FROM toks
        |    WHERE tok IN ('hausse','augmentation','appreciation','excedent',
        |                  'accroissement','baisse','diminution','deficit')
        |  ) s ON v.doc_id = s.doc_id AND s.pos BETWEEN v.v_pos - 25 AND v.v_pos - 1
        |  GROUP BY v.doc_id, v.v_pos, v.value
        |)
        |SELECT a.doc_id AS doc_id, f.page_no AS page_no, a.year AS year,
        |       array_to_string(list_sort(list(b.sign || a.value)), ',') AS vals
        |FROM with_year a
        |JOIN with_sign b ON a.doc_id = b.doc_id AND a.v_pos = b.v_pos AND a.value = b.value
        |JOIN found f ON a.doc_id = f.doc_id
        |GROUP BY a.doc_id, f.page_no, a.year
        |ORDER BY doc_id, year""".stripMargin
  )
}
