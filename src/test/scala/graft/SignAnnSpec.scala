package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Pins the binary-quantization leg: signatures pack signs exactly,
  * Hamming is symmetric/zero-on-self, and the measured recall of the
  * 1-bit sketch against exact cosine is recorded honestly — both the
  * direct top-10 and the rerank-shortlist form actually used in
  * production (hamming shortlist → exact rescore). */
class SignAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("signSignatures packs each dimension's sign into the right bit") {
    // +1 at dims 0, 31, 32, 63 -> lo bits 0+31, hi bits 0+31
    val v = Array.fill(64)(-1.0f)
    v(0) = 1f; v(31) = 1f; v(32) = 1f; v(63) = 1f
    val df = Seq((1L, v.toSeq, 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity.signSignatures(df).collect().head
    assert(r.getLong(2) === ((1L << 0) | (1L << 31)))
    assert(r.getLong(3) === ((1L << 0) | (1L << 31)))
  }

  test("hammingTopK: self excluded, distance symmetric, identical vector at distance 0") {
    val base = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val flip5 = base.clone(); (0 until 5).foreach(i => flip5(i) = -base(i))
    val df = Seq((1L, base.toSeq, 0), (2L, base.toSeq, 0),
      (3L, flip5.toSeq, 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hammingTopK(df, _.filter(col("vec_id") === 1), 10)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(!out.contains(1L)) // self excluded
    assert(out(2L) === 0L)    // identical twin at distance 0
    assert(out(3L) === 5L)    // exactly the 5 flipped sign bits
  }

  test("measured recall vs exact cosine: direct top-10 and 3x-shortlist rerank") {
    val emb = Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("cand_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb,
      _.filter(col("vec_id") < 5), 10))
    val direct = pairs(Similarity.hammingTopK(emb,
      _.filter(col("vec_id") < 5), 10))
    val shortlist = pairs(Similarity.hammingTopK(emb,
      _.filter(col("vec_id") < 5), 30))
    val recallDirect = (exact & direct).size
    val recallShortlist = (exact & shortlist).size
    info(s"sign-bit recall@10 direct: $recallDirect/50, " +
      s"via 3x shortlist: $recallShortlist/50")
    // measured on this corpus: 13/50 direct, 26/50 via shortlist.
    // UNIFORM random embeddings are the sketch's worst case (cosines
    // cluster near 0, so 1 bit/dim discards almost all of the tiny
    // margin); real embedding spaces with cluster structure sit far
    // higher. The honest floors pin the measured behavior and the
    // structural claim: the rerank shortlist dominates the direct
    // top-10, which is why production binary ANN is always
    // shortlist + exact rescore.
    assert(recallDirect >= 10, s"direct recall collapsed: $recallDirect/50")
    assert(recallShortlist >= recallDirect + 5,
      "3x shortlist must dominate the direct top-10")
  }
}
