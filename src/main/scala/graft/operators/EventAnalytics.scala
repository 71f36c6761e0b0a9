package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream (user_id,
  * event_type, ts). Everything here is a chain of per-user
  * conditional aggregations — each stage scans only its own
  * type-filtered slice (the filter pushes to the source), the prior
  * stage's per-user entry times join as a user-keyed dimension the
  * planner broadcasts while small and shuffle-joins on the user key
  * when it grows — and no per-user event arrays are ever
  * materialized (the collect_list+fold alternative carries whole
  * users in executor memory).
  */
object EventAnalytics {

  /** Ordered funnel: step 1's entry time is the user's earliest
    * `steps(0)` event; step k's is the earliest `steps(k-1)` event
    * STRICTLY AFTER the user's step k-1 entry. Returns per-step
    * converted-user counts as (step, n_users) with "k_name" labels
    * (lexicographically ordered so the output sorts by funnel depth).
    */
  def funnelSteps(ev: DataFrame, steps: Seq[String],
                  userCol: String = "user_id",
                  typeCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.size <= 9, "single-digit step labels keep the sort lexical")
    val entries: Seq[DataFrame] = steps.zipWithIndex
      .foldLeft(Seq.empty[DataFrame]) { case (acc, (evType, i)) =>
        val stage =
          if (i == 0)
            ev.filter(col(typeCol) === evType)
              .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
          else
            ev.filter(col(typeCol) === evType)
              .join(acc.last, userCol)
              .filter(col(tsCol) > col(s"t${i - 1}"))
              .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
        // materialize each stage's (tiny) per-user entry relation: it
        // feeds BOTH its own step count and every later stage, and
        // without truncating lineage stage k re-derives the whole
        // chain below it — the unmaterialized plan recomputed stage
        // 1's aggregate once per later step (same rule as the CC
        // rounds in Dedup.dedupClusters)
        acc :+ stage.localCheckpoint(true)
      }
    entries.zip(steps).zipWithIndex
      .map { case ((df, name), i) =>
        df.select(lit(s"${i + 1}_$name").as("step"), col(userCol))
      }
      .reduce(_ union _)
      .groupBy(col("step")).agg(count(lit(1)).as("n_users"))
  }
}
