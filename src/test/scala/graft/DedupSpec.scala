package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
    (3L, "alpha beta gamma delta epsilon zeta eta"), // near dup of 1
    (4L, "totally different words here entirely now"))
    .toDF("doc_id", "text")

  test("exactDedup keeps the min doc_id and counts copies") {
    val out = Dedup.exactDedup(corpus).orderBy("doc_id")
      .select("doc_id", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("identical docs share identical minhash signatures") {
    val sigs = Dedup.minhashSignature(Dedup.shingles(corpus))
      .filter(col("doc_id") <= 2).collect()
    assert(sigs.length === 2)
    val s1 = sigs.find(_.getLong(0) == 1L).get
    val s2 = sigs.find(_.getLong(0) == 2L).get
    (1 until s1.length).foreach(i => assert(s1.getString(i) === s2.getString(i)))
  }

  test("LSH candidates include the exact pair and Jaccard verifies it at 1.0") {
    val sh = Dedup.shingles(corpus)
    val pairs = Dedup.jaccardVerify(
      Dedup.candidatePairs(Dedup.lshBands(Dedup.minhashSignature(sh))), sh)
      .orderBy("doc_a", "doc_b")
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
    // near dup 1-3: 4 of 5+... shingles shared -> high but < 1
    assert(pairs.collect { case (1L, 3L, j) => j }.forall(j => j > 0.5 && j < 1.0))
  }

  test("simhash is a 16-char bit string, equal for identical docs") {
    val out = Dedup.simhash(corpus).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.values.forall(s => s.length == 16 && s.forall(c => c == '0' || c == '1')))
    assert(out(1L) === out(2L))
  }

  test("bottomKSketch is deterministic and equal for identical docs") {
    val sk = Dedup.bottomKSketch(Dedup.shingles(corpus)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sk(1L) === sk(2L))
    assert(sk(1L) !== sk(4L))
  }

  test("dedupClusters labels every component with its min id") {
    // components: {1,2,3,4} (a chain), {10,11}, isolated pairs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("exact simhash block join equals brute force (pigeonhole completeness)") {
    // differential: the bucketed pigeonhole candidate set must find
    // exactly the pairs an all-pairs hamming scan finds — including
    // pairs whose fingerprints differ in the PREFIX bits, which the
    // single-prefix table (simhashNearDups) can miss by design
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 120).select(col("doc_id"), col("text"))
    val k = 3
    val exact = Dedup.simhashNearDupsExact(docs, maxHamming = k)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sh = Dedup.simhash(docs)
    val brute = sh.alias("a").join(sh.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(expr(s"hamming_distance(a.simhash, b.simhash) <= $k"))
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("hamming_distance(a.simhash, b.simhash)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty) // the fixture actually exercises matches
    assert(exact === brute)
  }

  test("dedupClusters signals non-convergence instead of partial labels") {
    // a 7-node chain needs 6 min-propagation rounds; a 2-round budget
    // must throw (VERDICT r4 #3), never return a silently-split
    // component — then the same chain under a big-enough budget labels
    // as one cluster
    val chain = (1L to 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException](Dedup.dedupClusters(chain, iterations = 2))
    assert(e.getMessage.contains("converge"))
    val ok = Dedup.dedupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet === Set(1L) && ok.size === 7)
  }

  test("pointer jumping labels a 40-hop chain within a log-scale budget") {
    // min-label alone covers one hop per round (40 rounds needed);
    // path-halving doubles coverage — 8 rounds must suffice
    val chain = (1L to 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException](Dedup.dedupClusters(chain, iterations = 8))
    val ok = Dedup.dedupClusters(chain, iterations = 8, pointerJumping = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet === Set(1L) && ok.size === 41)
  }

  private val longDoc = Seq(
    (10L, (1 to 40).map(i => s"w${i % 17}").mkString(" ")),
    (11L, (1 to 40).map(i => s"w${i % 17}").mkString(" "))) // identical
    .toDF("doc_id", "text")

  test("winnowing guarantee: every full w-window contains a fingerprint") {
    val k = 4; val w = 4
    val nGrams = 40 - k + 1
    val fps = Dedup.winnowFingerprint(longDoc, k, w)
      .filter(col("doc_id") === 10L)
      .select("fp_pos").collect().map(_.getInt(0)).toSet
    assert(fps.forall(p => p >= 1 && p <= nGrams))
    // the Schleimer et al. coverage invariant: each window of w
    // consecutive gram positions holds at least one selected gram
    (1 to nGrams - w + 1).foreach { s =>
      assert((s until s + w).exists(fps.contains),
        s"window starting at $s has no fingerprint")
    }
  }

  test("winnowing fingerprints are equal for identical docs") {
    val by = Dedup.winnowFingerprint(longDoc).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getString(2))).toSet).toMap
    assert(by(10L) === by(11L))
    assert(by(10L).nonEmpty)
  }

  test("passageDedup strips the shared header and keeps unique passages in order") {
    // 4-token chunks; docs 1..3 share the same 4-token header followed
    // by distinct bodies; doc 4 is untouched; doc 5 is PURE boilerplate
    val header = "accept our cookie policy"
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$header iota kappa lambda mu"),
      (3L, s"$header nu xi omicron pi"),
      (4L, "rho sigma tau upsilon phi chi psi omega"),
      (5L, header))
      .toDF("doc_id", "text")
    val out = Dedup.passageDedup(docs, chunk = 4, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out === Array(
      (1L, 2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, 1L, "iota kappa lambda mu"),
      (3L, 1L, "nu xi omicron pi"),
      (4L, 2L, "rho sigma tau upsilon phi chi psi omega")))
    // doc 5 (all boilerplate) is gone entirely
  }
}
