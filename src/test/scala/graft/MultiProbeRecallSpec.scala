package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Retrieval-quality differential for the LSH family (VERDICT r5 #2:
  * q82's hash-green gate proves the *implementation* mirrors its
  * oracle, not that the bucketing *retrieves* — this spec pins the
  * retrieval claim itself).
  *
  * The planted corpus makes the claim deterministic, not statistical:
  * each twin negates exactly dims 1-2 of a real vector, so its sign
  * bucket differs from the original's in AT MOST 2 bits. Radius-2
  * multi-probe therefore finds every twin BY CONSTRUCTION (the same
  * pigeonhole completeness argument as the simhash block join, q109),
  * while the single-bucket lookup misses every twin whose two flipped
  * dims are both nonzero.
  */
class MultiProbeRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Bits = 6
  private val NPlanted = 20

  /** sf0.001 embeddings + a twin of each of the first 20 vectors with
    * dims 1-2 negated (cosine stays ~0.9; sign bucket Hamming <= 2). */
  private lazy val planted = {
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val twins = base.filter(col("vec_id") < NPlanted)
      .select((col("vec_id") + 10000).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN i < 2 THEN -x ELSE x END)")
          .as("embedding"),
        col("label"))
    base.unionByName(twins)
  }

  private def found(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.filter(col("query_id") >= 10000 && col("cand_id") === col("query_id") - 10000)
      .select("query_id").collect().map(_.getLong(0)).toSet

  test("radius-2 multi-probe finds every planted twin; single bucket does not") {
    val queries: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.filter(col("vec_id") >= 10000)
    val multi = found(
      Similarity.lshTopKMultiProbe(planted, queries, k = 1, bits = Bits, radius = 2))
    assert(multi.size === NPlanted, // recall@1 = 1.0, by the Hamming argument
      s"multi-probe missed twins: ${(10000L until 10000L + NPlanted).toSet -- multi}")
    val single = found(
      Similarity.lshTopK(planted, queries, k = 1, bits = Bits))
    assert(single.size < NPlanted, // the single bucket provably misses some
      "planted corpus degenerate: every twin kept its bucket — tighten the fixture")
    info(s"recall@1: multi-probe 20/20, single-bucket ${single.size}/20")
  }

  test("radius 1 sits between radius 0 and radius 2 (monotone recall)") {
    val queries: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.filter(col("vec_id") >= 10000)
    val byRadius = (0 to 2).map { r =>
      found(Similarity.lshTopKMultiProbe(planted, queries, k = 1, bits = Bits, radius = r))
    }
    assert(byRadius(0).subsetOf(byRadius(1)) && byRadius(1).subsetOf(byRadius(2)))
    assert(byRadius(2).size === NPlanted)
  }

  test("derived-bucket IVF recall vs exhaustive truth is measured and non-degenerate") {
    // q120's hash gate proves the implementation mirrors its oracle;
    // this pins what the k-means probe actually RETRIEVES. The corpus
    // is near-orthogonal (k-means buckets are weak by construction
    // here), so the honest claim is a measured floor, not perfection —
    // on clusterable corpora the bucket captures the neighborhood.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qp: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.filter(col("vec_id") < 32)
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val truth = topSet(Similarity.cosineTopK(emb, qp, k = 5, slack = 100000))
    val buckets = Similarity.kmeansBuckets(emb, k = 4, rounds = 2)
    val got = topSet(Similarity.ivfTopKWith(emb, buckets, qp, k = 5))
    val hits = truth.keys.toSeq.map(q =>
      (got.getOrElse(q, Set.empty) intersect truth(q)).size).sum
    val total = truth.values.map(_.size).sum
    val recall = hits.toDouble / total
    info(f"ivf-kmeans recall@5 on near-orthogonal corpus: $hits/$total = $recall%.2f")
    // with k=4 buckets a random probe would still land ~1/4 of the
    // truth in-bucket; require the quantizer to beat that baseline
    assert(recall > 0.25, f"derived buckets no better than random ($recall%.2f)")
  }

  test("multi-probe candidates are non-degenerate on the raw corpus at 16 bits") {
    // The r5 crossover probe measured 0 of 64 candidates for the
    // single 16-bit bucket on this corpus; radius-2 probing must
    // produce a non-empty candidate set for most queries.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val withAnswer = Similarity
      .lshTopKMultiProbe(emb, _.filter(col("vec_id") < 64), k = 1, bits = 16, radius = 2)
      .select("query_id").distinct().count()
    assert(withAnswer > 0, "16-bit radius-2 probing still found nothing")
    info(s"queries with >=1 candidate at 16 bits, radius 2: $withAnswer/64")
  }
}
