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
        |ORDER BY event_type""".stripMargin
  )
}
