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
}
