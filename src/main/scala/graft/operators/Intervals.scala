package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed interval-overlap (range) join — the operator family
  * Spark lacks natively (a naive `a.s < b.e AND b.s < a.e` condition
  * plans as a nested-loop/cartesian, which PlanAuditSpec bans).
  *
  * Bucket decomposition: an interval [s, e] is exploded to every
  * width-W bucket it touches; two overlapping intervals necessarily
  * touch a common bucket, so the equi-join on the bucket id is a
  * COMPLETE candidate set with sum-of-bucket² cost (the same
  * pigeonhole-style argument as `Dedup.simhashNearDupsExact`). A pair
  * overlapping several buckets would surface once per shared bucket;
  * instead of a distinct shuffle, the join keeps only the FIRST
  * shared bucket — the one containing max(s_a, s_b), which both
  * sides' explosions are guaranteed to emit — so each pair appears
  * exactly once by construction (the standard grid-join dedup trick;
  * same idea as emitting a spatial pair only from the cell of its
  * intersection corner, `functions/Geometry.intersectionCell`).
  *
  * W trades explosion factor (intervals spanning many buckets)
  * against bucket occupancy (many intervals per bucket); pick W near
  * the typical interval length. Everything is one explode + one
  * bucketed equi-join with codegen'd arithmetic residuals.
  */
object Intervals {

  /** Overlap join over (id, s, e) relations with integer bounds,
    * inclusive-exclusive [s, e). Emits one row per overlapping pair
    * with the overlap length. Self-join callers pass the same relation
    * twice and get each unordered pair once via the id inequality.
    *
    * Degenerate intervals (e <= s, empty under [s, e)) are FILTERED
    * before the explosion: `sequence(s div W, (e-1) div W)` on such a
    * row would generate a DESCENDING bucket list (Spark's default step
    * is -1), exploding garbage candidates that can surface with
    * overlap = 0 — the filter enforces the contract instead.
    *
    * LIMIT: Spark's `sequence()` caps at 10000 elements, so a single
    * interval may span at most 10000 buckets — pick `bucket` >=
    * max(e - s) / 10000 (near the TYPICAL interval length is the
    * right cost tradeoff anyway; see class doc). Spans past the cap
    * fail loudly at runtime rather than dropping pairs. */
  /** INTERVAL UNION / COVERAGE — the gaps-and-islands kernel: per
    * key, overlapping-or-touching [s, e) intervals merge into maximal
    * islands, emitted with the island's span and the number of source
    * intervals it absorbed. The classic two-window derivation — a
    * running max of prior ends detects island starts (an interval
    * whose start exceeds every earlier end opens a new island), a
    * running sum of those starts numbers the islands — so the whole
    * merge is ONE sort within each key's hash partition, no
    * self-joins, no per-key arrays; total covered time is then an
    * exact integer sum per island. Empty intervals (s >= e) are
    * dropped up front. */
  def coverage(df: DataFrame, keyCol: String): DataFrame = {
    val wPrior = Window.partitionBy(col(keyCol))
      .orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNum = Window.partitionBy(col(keyCol))
      .orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col("s") < col("e"))
      .withColumn("max_prior_e", max(col("e")).over(wPrior))
      .withColumn("new_island",
        when(col("max_prior_e").isNull ||
          col("s") > col("max_prior_e"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(wNum))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col("s")).as("island_s"), max(col("e")).as("island_e"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered", col("island_e") - col("island_s"))
  }

  def overlapJoin(a: DataFrame, b: DataFrame, bucket: Long,
                  selfPairs: Boolean = false): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    def exploded(df: DataFrame, p: String) = df.filter(col("s") < col("e")).select(
      col("id").as(s"${p}_id"), col("s").as(s"${p}_s"), col("e").as(s"${p}_e"),
      explode(sequence(expr(s"s div $bucket"), expr(s"(e - 1) div $bucket")))
        .as(s"${p}_bkt"))
    val idCond =
      if (selfPairs) col("a_id") < col("b_id") else col("a_id") =!= col("b_id")
    exploded(a, "a")
      .join(exploded(b, "b"),
        col("a_bkt") === col("b_bkt") && idCond &&
          col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
          // first-shared-bucket dedup: only the bucket holding the
          // overlap's left edge emits the pair
          col("a_bkt") === expr(s"greatest(a_s, b_s) div $bucket"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .as("overlap"))
  }
}
