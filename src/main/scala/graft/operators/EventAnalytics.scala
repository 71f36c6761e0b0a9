package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream (user_id,
  * event_type, ts). Everything here is a chain of conditional
  * aggregations partitioned on the user column — one exchange reused
  * across stages, no per-user event arrays materialized — so the
  * shapes stream at any events volume (the collect_list+fold
  * alternative carries whole users in executor memory).
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
        acc :+ stage
      }
    entries.zip(steps).zipWithIndex
      .map { case ((df, name), i) =>
        df.select(lit(s"${i + 1}_$name").as("step"), col(userCol))
      }
      .reduce(_ union _)
      .groupBy(col("step")).agg(count(lit(1)).as("n_users"))
  }
}
