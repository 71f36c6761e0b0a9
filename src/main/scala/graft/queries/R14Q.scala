package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Qx._

/** Round-14 additions: write-side CHECK constraints (the lake's
  * commit-time data-quality gate), generalized CEP quantifiers, and
  * the streaming as-of against a CDC-updating dimension. */
object R14Q {

  val queries: Map[String, Q] = Map(

    // lake — CHECK CONSTRAINTS (r14, VERDICT r13 next #4): the
    // write-side gate q240/q247 only audit after the fact. A
    // constraint attaches via a metadata-only commit (validated
    // against existing data first), every later commit enforces it in
    // ONE scan of the newly written directory, and a violating commit
    // is REFUSED with table state unchanged — proven here by
    // committing a passing batch (visible below), attempting a
    // violating batch (refused, version unchanged), and hash-gating
    // the final table: exactly the create + passing rows. The
    // constraint set also exports as real Delta
    // `delta.constraints.<name>` configuration (spec-pinned).
    "q267_check_constraints" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      val t = graft.lake.LakeTable.createTemp(s,
        ev.filter(col("event_id") % 3 === 0), "graft-checkq")
      t.addCheck("value_nonneg", "value >= 0 OR value IS NULL")
      t.addCheck("typed", "event_type IS NOT NULL")
      // a constraint the existing data violates must refuse to attach
      val attach = scala.util.Try(t.addCheck("impossible", "value > 1e18"))
      require(attach.isFailure, "violated-by-existing CHECK must not attach")
      require(t.checks.keySet == Set("value_nonneg", "typed"),
        s"constraint set drifted: ${t.checks}")
      // passing commit: visible
      t.append(ev.filter(col("event_id") % 3 === 1))
      val vOk = t.latestVersion
      // violating commit: refused loud, nothing changes
      val refused = scala.util.Try(
        t.append(ev.filter(col("event_id") % 3 === 2)
          .withColumn("value", -abs(col("value")) - lit(1.0))))
      require(refused.isFailure &&
        refused.failed.get.isInstanceOf[graft.lake.CheckViolationException],
        s"violating append must refuse via CheckViolationException: $refused")
      require(t.latestVersion == vOk, "refused commit must not advance the log")
      t.snapshot()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("event_type")
    }),

    // GENERALIZED CEP (r14, VERDICT r13 next #8): q257/q260's fixed
    // "A then B, no C between" as a true step pattern — view, then a
    // maximal contiguous CLICK RUN (the `+` quantifier, greedy), then
    // the first purchase after the run, with no error between run end
    // and purchase, all within 7 days. `EventAnalytics.matchSteps`:
    // chained forward-carries over one staged alphabet relation, one
    // user+id equi-join per transition. R14CepSpec pins the exact
    // differential against matchPattern on the two-step special case.
    "q268_cep_steps" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.EventAnalytics.matchSteps(ev,
        Seq("view" -> "one", "click" -> "plus", "purchase" -> "one"),
        guards = Map(2 -> Seq("error")), withinSec = 604800L)
        .orderBy("user_id", "a_id")
    }),

    // STREAMING AS-OF vs a CDC-UPDATING DIMENSION (r14, VERDICT r13
    // next #3): q265's temporal enrich with the dimension ITSELF a
    // stream. Signups are dimension-version rows (eff_ts = signup ts,
    // attribute = value), purchases are observations; both ride one
    // CHRONOLOGICAL multi-batch drain and a `transformWithState`
    // keyed as-of (state = interleaved per-key history, the q238
    // backward rule) re-derives every enrichment per update, so the
    // drained result hash-matches the batch point-in-time join. The
    // q156 CDC-merge composition runs alongside: the same dimension
    // stream maintains a lake table via idempotent mergeBatch, and
    // the final snapshot must equal last-version-per-key (proven
    // in-query) — current state from CDC, history from the processor.
    "q269_stream_cdc_asof" -> ((s, d) => {
      import s.implicits._
      val sink = graft.streaming.MicroBatch.updateRun(s, d,
        splitParts = Some(3), conf = graft.streaming.Stateful.rocksDBConf,
        chronological = true) { stream =>
        graft.streaming.Stateful.keyedAsOf(
          graft.Tables.toEventTime(stream)
            .filter(col("event_type").isin("signup", "purchase"))
            .select(col("user_id"),
              when(col("event_type") === "signup", 0)
                .otherwise(1).cast("int").as("role"),
              unix_micros(col("ts")).as("us"), col("event_id"),
              col("value"))
            .as[(Long, Int, Long, Long, Double)].groupByKey(_._1))
          .toDF("user_id", "seq", "obs_id", "dim_id", "dim_value")
      }
      // q156 composition: the dim stream CDC-merges into a lake table;
      // its final snapshot must be exactly the last version per key
      val ev = Tables.events(s, d)
      val dimT = graft.lake.LakeTable.createTemp(s,
        ev.filter(col("event_type") === "signup").limit(0)
          .select(col("user_id"), col("event_id"), col("value")),
        "graft-cdcdim")
      val in = graft.streaming.MicroBatch.stageEventsByTime(s, d, 3)
      val ckpt = Qx.tempDir("graft-cdcdim-ckpt")
      val q = graft.streaming.MicroBatch.fileSource(s, in, Some(1))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         bid: Long) =>
          val ups = graft.Tables.toEventTime(batch.toDF())
            .filter(col("event_type") === "signup")
            .withColumn("__rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("user_id"))
                .orderBy(desc("ts"), desc("event_id"))))
            .filter(col("__rn") === 1)
            .select(col("user_id"), col("event_id"), col("value"))
          dimT.mergeBatch(ups, Seq("user_id"), ckpt.toString, bid)
          ()
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val expect = Tables.events(s, d)
        .filter(col("event_type") === "signup")
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"))
            .orderBy(desc("ts"), desc("event_id"))))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_id"), col("value"))
      require(dimT.snapshot().select("user_id", "event_id", "value")
          .except(expect).isEmpty &&
          expect.except(dimT.snapshot()
            .select("user_id", "event_id", "value")).isEmpty,
        "CDC-merged dim table must equal last-version-per-key")
      // converged enrichment: the last emission per observation
      sink.groupBy(col("user_id"), col("obs_id"))
        .agg(max_by(struct(col("dim_id"), col("dim_value")),
          col("seq")).as("m"))
        .select(col("user_id"), col("obs_id"),
          col("m.dim_id").as("dim_id"), col("m.dim_value").as("dim_value"))
        .orderBy("user_id", "obs_id")
    })
  )

  val oracles: Map[String, String] = Map(

    // mirrors q267: the surviving table is the creating third plus the
    // passing third of events — the violating third never lands
    "q267_check_constraints" ->
      """SELECT event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |WHERE event_id % 3 IN (0, 1)
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // mirrors q268: per-row next-(ts,id) carries for every alphabet
    // type + contiguous-run ends, then the transition chain as joins:
    // anchor(view) → its next click → that click's run end → the run
    // end's next purchase, error-guarded with the exclusive-ts rule
    "q268_cep_steps" ->
      """WITH e AS (
        |  SELECT user_id u, event_type t, event_id id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) ts
        |  FROM events
        |  WHERE event_type IN ('view','click','purchase','error')
        |), x AS (
        |  SELECT u, t, ts, id,
        |    first_value(CASE WHEN t='click' THEN ts END IGNORE NULLS)
        |      OVER w AS nc_ts,
        |    first_value(CASE WHEN t='click' THEN id END IGNORE NULLS)
        |      OVER w AS nc_id,
        |    first_value(CASE WHEN t='purchase' THEN ts END IGNORE NULLS)
        |      OVER w AS np_ts,
        |    first_value(CASE WHEN t='purchase' THEN id END IGNORE NULLS)
        |      OVER w AS np_id,
        |    first_value(CASE WHEN t='error' THEN ts END IGNORE NULLS)
        |      OVER w AS ne_ts,
        |    CASE WHEN lag(t) OVER wo = t THEN 0 ELSE 1 END AS nw
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
        |JOIN rr c  ON c.u = a.u AND c.id = a.nc_id
        |JOIN rr rl ON rl.u = a.u AND rl.id = c.rl_id
        |WHERE a.t = 'view' AND a.nc_ts IS NOT NULL
        |  AND rl.np_ts IS NOT NULL
        |  AND (rl.ne_ts IS NULL OR rl.ne_ts >= rl.np_ts)
        |  AND rl.np_ts - a.ts <= 604800000000
        |ORDER BY user_id, a_id""".stripMargin,

    // mirrors q269: the batch point-in-time join — per user, carry the
    // latest signup (dimension version) forward over the (ts, dim
    // before obs at equal ts, id) order; purchases read the carry
    "q269_stream_cdc_asof" ->
      """WITH e AS (
        |  SELECT user_id u, event_type t, event_id id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) ts, value v
        |  FROM events WHERE event_type IN ('signup','purchase')
        |), c AS (
        |  SELECT u, t, ts, id, v,
        |    last_value(CASE WHEN t='signup' THEN id END IGNORE NULLS)
        |      OVER w AS dim_id,
        |    last_value(CASE WHEN t='signup' THEN v END IGNORE NULLS)
        |      OVER w AS dim_value
        |  FROM e
        |  WINDOW w AS (PARTITION BY u ORDER BY
        |                 ts, (CASE WHEN t='signup' THEN 0 ELSE 1 END), id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT u AS user_id, id AS obs_id,
        |       COALESCE(dim_id, CAST(-1 AS BIGINT)) AS dim_id, dim_value
        |FROM c WHERE t = 'purchase'
        |ORDER BY user_id, obs_id""".stripMargin
  )
}
