package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Qx._

/** Round-15 additions: N-dimensional z-order layout (q284), CEP
  * alternation — type SETS per step (q285), incremental grouped
  * exact quantiles under appends (q286), golden-record entity
  * resolution (q287), the full streaming step-pattern language
  * (q288), and MATCH_RECOGNIZE-style match measures (q289). */
object R15Q {

  val queries: Map[String, Q] = Map(

    // lake — 3-D OPTIMIZE ZORDER (r15, VERDICT r14 next #8): q178
    // proves the 2-D grid; this gates the generalized k-dim Morton
    // chain end-to-end. Three DECORRELATED derived dimensions, one
    // unclustered directory, z-optimized into 64 directories (4
    // strips per dimension); pruning must then work on ALL THREE
    // columns — the property no single- or two-column sort gives the
    // third dimension. The query answers a 3-D range predicate
    // through the pruned scan; the oracle replays the predicate over
    // the raw rows — hash identity proves the rewrite was
    // layout-only AND that pruning lost no matching row.
    "q284_zorder3d" -> ((s, d) => {
      val base = Tables.events(s, d).select(
        col("event_id"), (col("event_id") % 1000).as("a"),
        ((col("user_id") * 48271 + col("event_id")) % 1000).as("b"),
        ((col("event_id") * 40503 + col("user_id")) % 1000).as("c"),
        col("event_type"), col("value"))
      val t = graft.lake.LakeTable.createTemp(s, base, "graft-zo3")
      t.optimizeZOrder(Seq("a", "b", "c"), buckets = 64)
      val (keptA, total) = t.prunedDirs("a", 100, 349)
      val (keptB, _) = t.prunedDirs("b", 100, 349)
      val (keptC, _) = t.prunedDirs("c", 100, 349)
      require(keptA.size < total && keptB.size < total && keptC.size < total,
        s"3-D z-order pruning ineffective: a ${keptA.size}/$total, " +
          s"b ${keptB.size}/$total, c ${keptC.size}/$total")
      t.scanPrunedWhere(Seq(("a", 100, 349), ("b", 100, 349), ("c", 100, 349)))
        .filter(col("a").between(100, 349) && col("b").between(100, 349) &&
          col("c").between(100, 349))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("event_type")
    }),

    // CEP ALTERNATION (r15, VERDICT r14 next #7): the MATCH_RECOGNIZE
    // `(view|click)+ purchase` shape — per-step type SETS on top of
    // q268's quantified step machinery. The anchor's (view|click)+
    // run consumes a maximal contiguous IN-SET stretch (members may
    // interleave — per-SET run encoding, not per-type), then one
    // user+id equi-join lands the purchase, error-guarded. The oracle
    // replays the set-membership run encoding in SQL windows.
    // `EventAnalytics.matchStepsAlt`; R15CepSpec holds the
    // brute-force and degenerate-singleton differentials.
    "q285_cep_alternation" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.EventAnalytics.matchStepsAlt(ev,
        Seq(Seq("view", "click") -> "plus", Seq("purchase") -> "one"),
        guards = Map(1 -> Seq("error")), withinSec = 604800L)
        .orderBy("user_id", "a_id")
    }),

    // INCREMENTAL GROUPED EXACT QUANTILES (r15, VERDICT r14 next #6)
    // — the two r14 wins composed: q283's distributed exact selection
    // maintained under a MULTI-BATCH streaming drain without full
    // recompute. Each micro-batch commits only its per-(group, value)
    // count FRAGMENT (the q149 sketch-commit idiom — kilobytes per
    // batch, additive, exact); the read side merges fragments by
    // summation and runs the SAME weighted selection
    // (`Stats.exactRankStatsWeighted`, which `exactRankStats` itself
    // delegates through — the paths cannot drift). The oracle is
    // q283's: a 4-batch drain must reproduce the batch answer
    // BIT-EXACTLY. Plan-pinned no-unpartitioned-window in R15PlanSpec.
    "q286_stream_quantile_exact" -> ((s, d) => {
      val frags = graft.streaming.MicroBatch.appendRunPerBatch(s, d,
        maxFilesPerTrigger = Some(1), splitParts = Some(4)) { ev =>
        ev.select(col("event_type"),
            floor(col("value") * lit(100.0)).cast("long").as("cents"))
          .groupBy(col("event_type"), col("cents"))
          .agg(count(lit(1)).as("c"))
      }
      graft.operators.Stats.exactRankStatsWeighted(
        frags, "event_type", "cents", "c")
        .orderBy("event_type")
    }),

    // GOLDEN RECORDS (r15): q278's pairwise fuzzy matches completed
    // into entities — connected components over the distinct-name
    // graph (pointer-jumping min-label CC), then survivorship: most
    // frequent name wins (ties by name), entity id = min member id.
    // The oracle replays CC as a recursive reachability CTE (the q103
    // idiom) and the majority vote as a windowed rank.
    // `TextAnalysis.goldenRecords`.
    "q287_golden_record" -> ((s, d) =>
      graft.operators.TextAnalysis.goldenRecords(
        Tables.part(s, d), "p_partkey", "p_name", maxDist = 3,
        blockExprs = Seq(
          split(col("p_name"), " ").getItem(0),
          element_at(split(col("p_name"), " "), -1)))
        .orderBy("entity_id")),

    // STREAMING CEP ALTERNATION (r15): q285's (view|click)+ purchase
    // pattern matched IN-STREAM — the full step-pattern language
    // (quantifiers, sets, guards) over an unbounded keyed stream via
    // `Stateful.StreamingSteps` (per-user capped history, per-batch
    // re-derivation with the single-key greedy matcher). A 3-batch
    // RocksDB drain must converge to EXACTLY the batch operator's
    // answer: the oracle is q285's SQL verbatim, so batch, stream,
    // and DuckDB all hash-agree.
    "q288_stream_cep_alternation" -> ((s, d) => {
      val sink = graft.streaming.MicroBatch.updateRun(s, d,
        splitParts = Some(3),
        conf = graft.streaming.Stateful.rocksDBConf) { stream =>
        import s.implicits._
        graft.streaming.Stateful.streamingSteps(
          graft.Tables.toEventTime(stream)
            .filter(col("event_type").isin("view", "click", "purchase", "error"))
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("us"), col("event_id"))
            .as[(Long, String, Long, Long)].groupByKey(_._1),
          steps = Seq(Seq("view", "click") -> "plus",
            Seq("purchase") -> "one"),
          guards = Map(1 -> Seq("error")),
          withinUs = 604800L * 1000000L)
          .toDF("user_id", "seq", "a_id", "b_id", "gap_sec")
      }
      // converged matches: the last emission set per user
      val last = sink.groupBy(col("user_id"))
        .agg(max(col("seq")).as("seq"))
      sink.join(last, Seq("user_id", "seq"))
        .select(col("user_id"), col("a_id"), col("b_id"), col("gap_sec"))
        .orderBy("user_id", "a_id")
    }),

    // CEP MEASURES (r15): MATCH_RECOGNIZE's COUNT(B.*) analog —
    // match_len counts the events MAPPED to the match (run length for
    // plus/star steps via rn arithmetic over the carried run-end
    // structs, 1 per one/opt step; computed in the same staged pass,
    // no extra shuffle). Same pattern as q285 with the measure
    // exposed; the oracle carries rn through its run encoding and
    // emits rl.rn − a.rn + 2 (the (view|click)+ run plus the
    // purchase).
    "q289_cep_measures" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.EventAnalytics.matchStepsAlt(ev,
        Seq(Seq("view", "click") -> "plus", Seq("purchase") -> "one"),
        guards = Map(1 -> Seq("error")), withinSec = 604800L,
        withLen = true)
        .orderBy("user_id", "a_id")
    }),

    // INCREMENTAL GOLDEN RECORDS (r15): fold a new record batch into
    // q287's entity clustering at DELTA cost — the DP runs only for
    // pairs involving a genuinely new name; prior entities enter the
    // delta CC as contracted min-label nodes, so bridging merges are
    // exact. The query PROVES bit-identity to the full recompute
    // in-query (both directions of except), then returns the
    // incremental result; the oracle is q287's full-table replay
    // verbatim. `TextAnalysis.goldenRecordsIncremental`.
    "q290_incremental_entities" -> ((s, d) => {
      val part = Tables.part(s, d)
      val blocks = Seq(
        split(col("p_name"), " ").getItem(0),
        element_at(split(col("p_name"), " "), -1))
      val existing = part.filter(col("p_partkey") % 10 =!= 3)
      val batch = part.filter(col("p_partkey") % 10 === 3)
      val inc = graft.operators.TextAnalysis.goldenRecordsIncremental(
        existing, batch, "p_partkey", "p_name", maxDist = 3,
        blockExprs = blocks)
      val full = graft.operators.TextAnalysis.goldenRecords(
        part, "p_partkey", "p_name", maxDist = 3, blockExprs = blocks)
      require(inc.except(full).isEmpty && full.except(inc).isEmpty,
        "incremental fold must equal the full recompute bit-for-bit")
      inc.orderBy("entity_id")
    })
  )

  val oracles: Map[String, String] = Map(

    "q284_zorder3d" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total
         |FROM events
         |WHERE event_id % 1000 BETWEEN 100 AND 349
         |  AND (user_id * 48271 + event_id) % 1000 BETWEEN 100 AND 349
         |  AND (event_id * 40503 + user_id) % 1000 BETWEEN 100 AND 349
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q285_cep_alternation" ->
      """WITH e AS (
        |  SELECT user_id u, event_type t, event_id id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) ts
        |  FROM events
        |  WHERE event_type IN ('view','click','purchase','error')
        |), x AS (
        |  SELECT u, t, ts, id,
        |    first_value(CASE WHEN t='purchase' THEN ts END IGNORE NULLS)
        |      OVER w AS np_ts,
        |    first_value(CASE WHEN t='purchase' THEN id END IGNORE NULLS)
        |      OVER w AS np_id,
        |    first_value(CASE WHEN t='error' THEN ts END IGNORE NULLS)
        |      OVER w AS ne_ts,
        |    CASE WHEN (lag(t) OVER wo IN ('view','click'))
        |              = (t IN ('view','click'))
        |         THEN 0 ELSE 1 END AS nw
        |  FROM e
        |  WINDOW w AS (PARTITION BY u ORDER BY ts, id
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
        |         wo AS (PARTITION BY u ORDER BY ts, id)
        |), r AS (
        |  SELECT *, SUM(nw) OVER (PARTITION BY u ORDER BY ts, id
        |                          ROWS UNBOUNDED PRECEDING) AS run
        |  FROM x
        |), rr AS (
        |  SELECT *,
        |    last_value(ts) OVER wr AS rl_ts,
        |    last_value(id) OVER wr AS rl_id
        |  FROM r
        |  WINDOW wr AS (PARTITION BY u, run ORDER BY ts, id
        |                ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND UNBOUNDED FOLLOWING)
        |)
        |SELECT a.u AS user_id, a.id AS a_id, rl.np_id AS b_id,
        |       (rl.np_ts - a.ts) // 1000000 AS gap_sec
        |FROM rr a
        |JOIN rr rl ON rl.u = a.u AND rl.id = a.rl_id
        |WHERE a.t IN ('view','click')
        |  AND rl.np_ts IS NOT NULL
        |  AND (rl.ne_ts IS NULL OR rl.ne_ts >= rl.np_ts)
        |  AND rl.np_ts - a.ts <= 604800000000
        |ORDER BY user_id, a_id""".stripMargin,

    // q283's oracle verbatim: the fragment merge must be invisible
    "q286_stream_quantile_exact" ->
      """WITH v AS (
        |  SELECT event_type g,
        |         CAST(floor(value * 100.0) AS BIGINT) AS cents
        |  FROM events
        |), rk AS (
        |  SELECT g, cents,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY cents)
        |         AS BIGINT) AS r,
        |    CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM v
        |)
        |SELECT g AS event_type, MAX(n) AS n,
        |  MIN(cents) AS min_v,
        |  MAX(CASE WHEN r = greatest(1, (1 * (n + 1)) // 4)
        |      THEN cents END) AS p25,
        |  MAX(CASE WHEN r = greatest(1, (1 * (n + 1)) // 2)
        |      THEN cents END) AS p50,
        |  MAX(CASE WHEN r = greatest(1, (3 * (n + 1)) // 4)
        |      THEN cents END) AS p75,
        |  MAX(CASE WHEN r = greatest(1, (9 * (n + 1)) // 10)
        |      THEN cents END) AS p90,
        |  MAX(cents) AS max_v
        |FROM rk GROUP BY g ORDER BY event_type""".stripMargin,

    "q287_golden_record" ->
      """WITH RECURSIVE p AS (
        |  SELECT DISTINCT p_name,
        |         split_part(p_name, ' ', 1) AS blk1,
        |         split_part(p_name, ' ', -1) AS blk2
        |  FROM part
        |), cand AS (
        |  SELECT a.p_name AS a_name, b.p_name AS b_name
        |  FROM p a JOIN p b ON b.blk1 = a.blk1 AND a.p_name < b.p_name
        |  UNION
        |  SELECT a.p_name, b.p_name
        |  FROM p a JOIN p b ON b.blk2 = a.blk2 AND a.p_name < b.p_name
        |), pairs AS (
        |  SELECT a_name AS u, b_name AS v FROM cand
        |  WHERE levenshtein(a_name, b_name) <= 3
        |), edges AS (
        |  SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
        |), reach AS (
        |  SELECT u AS id, u AS lbl FROM edges
        |  UNION
        |  SELECT e.u AS id, r.lbl AS lbl FROM edges e JOIN reach r ON e.v = r.id
        |), labels AS (
        |  SELECT id, MIN(lbl) AS cl FROM reach GROUP BY id
        |), member AS (
        |  SELECT pt.p_partkey AS id, pt.p_name AS nm,
        |         COALESCE(l.cl, pt.p_name) AS cl
        |  FROM part pt LEFT JOIN labels l ON l.id = pt.p_name
        |), votes AS (
        |  SELECT cl, nm, COUNT(*) AS c FROM member GROUP BY cl, nm
        |), canon AS (
        |  SELECT cl, nm AS canonical_name FROM (
        |    SELECT cl, nm,
        |           row_number() OVER (PARTITION BY cl
        |             ORDER BY c DESC, nm) AS rn
        |    FROM votes) q
        |  WHERE rn = 1
        |)
        |SELECT MIN(m.id) AS entity_id, c.canonical_name,
        |       CAST(COUNT(*) AS BIGINT) AS n_records,
        |       CAST(COUNT(DISTINCT m.nm) AS BIGINT) AS n_variants
        |FROM member m JOIN canon c ON c.cl = m.cl
        |GROUP BY m.cl, c.canonical_name
        |ORDER BY entity_id""".stripMargin,

    // q287's full-table oracle verbatim: the delta fold must be invisible
    "q290_incremental_entities" ->
      """WITH RECURSIVE p AS (
        |  SELECT DISTINCT p_name,
        |         split_part(p_name, ' ', 1) AS blk1,
        |         split_part(p_name, ' ', -1) AS blk2
        |  FROM part
        |), cand AS (
        |  SELECT a.p_name AS a_name, b.p_name AS b_name
        |  FROM p a JOIN p b ON b.blk1 = a.blk1 AND a.p_name < b.p_name
        |  UNION
        |  SELECT a.p_name, b.p_name
        |  FROM p a JOIN p b ON b.blk2 = a.blk2 AND a.p_name < b.p_name
        |), pairs AS (
        |  SELECT a_name AS u, b_name AS v FROM cand
        |  WHERE levenshtein(a_name, b_name) <= 3
        |), edges AS (
        |  SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
        |), reach AS (
        |  SELECT u AS id, u AS lbl FROM edges
        |  UNION
        |  SELECT e.u AS id, r.lbl AS lbl FROM edges e JOIN reach r ON e.v = r.id
        |), labels AS (
        |  SELECT id, MIN(lbl) AS cl FROM reach GROUP BY id
        |), member AS (
        |  SELECT pt.p_partkey AS id, pt.p_name AS nm,
        |         COALESCE(l.cl, pt.p_name) AS cl
        |  FROM part pt LEFT JOIN labels l ON l.id = pt.p_name
        |), votes AS (
        |  SELECT cl, nm, COUNT(*) AS c FROM member GROUP BY cl, nm
        |), canon AS (
        |  SELECT cl, nm AS canonical_name FROM (
        |    SELECT cl, nm,
        |           row_number() OVER (PARTITION BY cl
        |             ORDER BY c DESC, nm) AS rn
        |    FROM votes) q
        |  WHERE rn = 1
        |)
        |SELECT MIN(m.id) AS entity_id, c.canonical_name,
        |       CAST(COUNT(*) AS BIGINT) AS n_records,
        |       CAST(COUNT(DISTINCT m.nm) AS BIGINT) AS n_variants
        |FROM member m JOIN canon c ON c.cl = m.cl
        |GROUP BY m.cl, c.canonical_name
        |ORDER BY entity_id""".stripMargin,

    // q285's oracle verbatim: stream must equal batch
    "q288_stream_cep_alternation" ->
      """WITH e AS (
        |  SELECT user_id u, event_type t, event_id id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) ts
        |  FROM events
        |  WHERE event_type IN ('view','click','purchase','error')
        |), x AS (
        |  SELECT u, t, ts, id,
        |    first_value(CASE WHEN t='purchase' THEN ts END IGNORE NULLS)
        |      OVER w AS np_ts,
        |    first_value(CASE WHEN t='purchase' THEN id END IGNORE NULLS)
        |      OVER w AS np_id,
        |    first_value(CASE WHEN t='error' THEN ts END IGNORE NULLS)
        |      OVER w AS ne_ts,
        |    CASE WHEN (lag(t) OVER wo IN ('view','click'))
        |              = (t IN ('view','click'))
        |         THEN 0 ELSE 1 END AS nw
        |  FROM e
        |  WINDOW w AS (PARTITION BY u ORDER BY ts, id
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
        |         wo AS (PARTITION BY u ORDER BY ts, id)
        |), r AS (
        |  SELECT *, SUM(nw) OVER (PARTITION BY u ORDER BY ts, id
        |                          ROWS UNBOUNDED PRECEDING) AS run
        |  FROM x
        |), rr AS (
        |  SELECT *,
        |    last_value(ts) OVER wr AS rl_ts,
        |    last_value(id) OVER wr AS rl_id
        |  FROM r
        |  WINDOW wr AS (PARTITION BY u, run ORDER BY ts, id
        |                ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND UNBOUNDED FOLLOWING)
        |)
        |SELECT a.u AS user_id, a.id AS a_id, rl.np_id AS b_id,
        |       (rl.np_ts - a.ts) // 1000000 AS gap_sec
        |FROM rr a
        |JOIN rr rl ON rl.u = a.u AND rl.id = a.rl_id
        |WHERE a.t IN ('view','click')
        |  AND rl.np_ts IS NOT NULL
        |  AND (rl.ne_ts IS NULL OR rl.ne_ts >= rl.np_ts)
        |  AND rl.np_ts - a.ts <= 604800000000
        |ORDER BY user_id, a_id""".stripMargin,

    "q289_cep_measures" ->
      """WITH e AS (
        |  SELECT user_id u, event_type t, event_id id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) ts
        |  FROM events
        |  WHERE event_type IN ('view','click','purchase','error')
        |), x AS (
        |  SELECT u, t, ts, id,
        |    first_value(CASE WHEN t='purchase' THEN ts END IGNORE NULLS)
        |      OVER w AS np_ts,
        |    first_value(CASE WHEN t='purchase' THEN id END IGNORE NULLS)
        |      OVER w AS np_id,
        |    first_value(CASE WHEN t='error' THEN ts END IGNORE NULLS)
        |      OVER w AS ne_ts,
        |    row_number() OVER wo AS rn,
        |    CASE WHEN (lag(t) OVER wo IN ('view','click'))
        |              = (t IN ('view','click'))
        |         THEN 0 ELSE 1 END AS nw
        |  FROM e
        |  WINDOW w AS (PARTITION BY u ORDER BY ts, id
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
        |         wo AS (PARTITION BY u ORDER BY ts, id)
        |), r AS (
        |  SELECT *, SUM(nw) OVER (PARTITION BY u ORDER BY ts, id
        |                          ROWS UNBOUNDED PRECEDING) AS run
        |  FROM x
        |), rr AS (
        |  SELECT *,
        |    last_value(ts) OVER wr AS rl_ts,
        |    last_value(id) OVER wr AS rl_id
        |  FROM r
        |  WINDOW wr AS (PARTITION BY u, run ORDER BY ts, id
        |                ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND UNBOUNDED FOLLOWING)
        |)
        |SELECT a.u AS user_id, a.id AS a_id, rl.np_id AS b_id,
        |       (rl.np_ts - a.ts) // 1000000 AS gap_sec,
        |       CAST(rl.rn - a.rn + 2 AS BIGINT) AS match_len
        |FROM rr a
        |JOIN rr rl ON rl.u = a.u AND rl.id = a.rl_id
        |WHERE a.t IN ('view','click')
        |  AND rl.np_ts IS NOT NULL
        |  AND (rl.ne_ts IS NULL OR rl.ne_ts >= rl.np_ts)
        |  AND rl.np_ts - a.ts <= 604800000000
        |ORDER BY user_id, a_id""".stripMargin
  )
}
