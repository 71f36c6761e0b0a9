package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** r14 BPE trainer shape: the merge loop is driver-resident over the
  * collected word-frequency vocabulary (the production single-node
  * formulation), so merge count must no longer drive distributed
  * work — only the one corpus→vocab reduce runs in Spark. These pin
  * the deep-vocabulary behaviors the 6-merge oracle queries cannot
  * reach. */
class BpeScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("a 100-merge vocabulary trains, stays deterministic, and encode replays it") {
    val (m1, seqs) = Corpus.bpeTrainWithSeqs(docs, nMerges = 100)
    val (m2, _) = Corpus.bpeTrainWithSeqs(docs, nMerges = 100)
    val t1 = m1.collect().map(_.toSeq)
    assert(t1.length === 100)
    assert(t1 === m2.collect().map(_.toSeq), "training must be deterministic")
    // the 100-merge table replayed by encode reproduces training's
    // final sequences — the cascade stays exact at depth, not just at
    // the oracle-gated 6 merges
    val trained = seqs.select("word", "seq").as[(String, String)].collect()
      .map { case (w, s) => w -> s.trim.split(" ").length }.toMap
    val enc = Corpus.bpeEncode(docs.limit(50), m1)
      .select("word", "n_tokens").as[(String, Long)].collect()
    assert(enc.nonEmpty)
    enc.foreach { case (w, n) => assert(trained(w) === n.toInt, w) }
  }

  test("deep rounds skip fully-merged words (the sequence(1,0) latent bug)") {
    // single-letter words collapse to ONE symbol after their first
    // merge; before r14 the pair scan then built sequence(1, 0) =
    // [1, 0] (descending!) and died on element_at index 0
    val tiny = Seq((1L, "a a a b"), (2L, "a b a")).toDF("doc_id", "text")
    val (m, seqs) = Corpus.bpeTrainWithSeqs(tiny, nMerges = 2)
    assert(m.count() === 2)
    assert(seqs.filter($"word" === "a").select("seq").as[String].head
      === " a</w> ")
  }

  test("the vocabulary cap refuses loud, not by melting the driver") {
    val e = intercept[IllegalArgumentException] {
      Corpus.bpeTrainWithSeqs(docs, nMerges = 1, maxVocab = 10)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("vocabulary exhaustion fails loud with the merge index") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // 'ab' exhausts after (a,b) then (ab,</w>): merge 3 has no pairs
    val e = intercept[IllegalArgumentException] {
      Corpus.bpeTrainWithSeqs(tiny, nMerges = 3)
    }
    assert(e.getMessage.contains("merge round 3"))
  }
}
