package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** PQ is an approximation — the oracle (q191) pins its determinism;
  * this pins its USEFULNESS on data with actual neighbor structure.
  * The fixture embeddings are isotropic noise (min pairwise distance
  * ≈ half the median — no vector has a genuinely near neighbor), so
  * recall there is information-free by construction. Here: 40
  * deterministic base vectors × 5 jittered copies — the jitter is two
  * orders below the base separation, so each copy's true top-4 IS its
  * sibling set, and an ADC index that can't retrieve siblings is
  * broken. */
class PQRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PQ retrieves jittered-copy siblings: recall >= 0.75 on structured data") {
    // base pattern: (b·53 + i·29 + b·i·17) mod 97 per (base b, dim i) —
    // the b·i CROSS TERM is the load-bearing part: the per-dim
    // difference between two bases is Δb·(53 + 17i) mod 97, which
    // varies with i and vanishes on at most one dim, so any two of the
    // 40 bases differ in ≥ 63 of 64 dims (an affine-in-i pattern would
    // make bases constant shifts of each other, some identical).
    // Copies add per-(vec, dim) jitter of at most ±0.004 — invisible
    // next to the ~0.02-grid base separation. All integer arithmetic,
    // no RNG: every run builds the identical corpus.
    val emb = spark.range(200).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(1, 64), i ->
                CAST(((((id % 40) * 53 + i * 29 + (id % 40) * i * 17) % 97) - 48) AS DOUBLE) * 0.02D
                + CAST((((id * 31 + i * 7) % 5) - 2) AS DOUBLE) * 0.002D)""")
        .as("embedding"))
    val pq = Similarity.pqTopK(emb, _.filter(col("vec_id") < 40), k = 4,
      m = 4, kCode = 8, rounds = 2,
      trainPred = _.filter(col("vec_id") % 5 === 0))
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.length === 40 * 4)
    // truth: cand is a sibling iff same base id (mod 40)
    val hits = pq.count { case (q, c) => c % 40 == q % 40 }
    val recall = hits.toDouble / pq.length
    info(f"sibling recall: $recall%.3f")
    assert(recall >= 0.75, f"PQ failed to retrieve jittered copies: $recall%.3f")
  }
}
