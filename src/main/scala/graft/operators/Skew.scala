package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB contract: one
  * pathological customer/key must not serialize a stage).
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin`, on in GraftSession); explicit
  * salting remains the tool when the skew is known a priori or the
  * join is not AQE-splittable (e.g. bucketed inputs). Salting is a
  * plan rewrite, not new semantics: the big side gets a uniform salt
  * in [0, n), the small side is replicated n times, and the join key
  * becomes (key, salt) — one hot key fans out over n tasks at the cost
  * of n-fold replication of the small side. */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, salted `nSalts` ways. The salt
    * is derived (hash of a per-row id), not random — any uniform value
    * works, and determinism keeps reruns/retries stable. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    val salted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until nSalts).map(s => lit(s)): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation for hot GROUP BY keys: phase 1
    * aggregates on (key, salt) — the hot key's rows spread over
    * `nSalts` reducers — phase 2 re-aggregates the per-salt partials
    * on the key alone (at most `nSalts` rows per key, trivially
    * cheap). Only decomposable aggregates compose this way; count and
    * sum are provided (sum-of-counts, sum-of-sums). Note Spark's own
    * map-side partial aggregation already bounds each TASK's
    * contribution to one row per (task, key); explicit salting is the
    * lever when a single reducer's MERGE of those partials is the
    * bottleneck (billions of partials for one key) or when the
    * aggregate sits behind an exchange AQE cannot split. Same result
    * as the plain groupBy at any salt count — q139 gates it against
    * the unsalted oracle. */
  def saltedAgg(df: DataFrame, key: String, nSalts: Int,
                countAs: String, sumCol: String, sumAs: String): DataFrame = {
    require(nSalts > 0)
    df
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(nSalts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as(countAs), sum(col("__s")).as(sumAs))
  }
}
