package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Retrieval-completeness differentials for the APPROXIMATE dedup
  * family (VERDICT r5 #5): q34/q91 are oracle-gated on implementation
  * parity, but — unlike the pigeonhole-exact q109 — their RECALL was
  * unmeasured. This spec plants near-dup pairs at controlled Jaccard,
  * computes the brute-force truth locally, and pins measured recall.
  *
  * Both pipelines are md5-deterministic, so for a fixed seeded corpus
  * the measured recall is a CONSTANT — the assertions pin real
  * numbers, not statistical hopes. Soundness (no false positives
  * above threshold) is exact by construction: both paths end in an
  * exact verify (Jaccard / hamming), so only recall can degrade.
  */
class DedupRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shingleSet(text: String, n: Int = 3): Set[String] =
    text.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0d
    else a.intersect(b).size.toDouble / a.union(b).size

  /** 30 base docs of 60 tokens over a 40-word vocab, plus twins of the
    * first 15: docs 0-7 get a 1-token edit (shingle Jaccard ~0.9),
    * docs 8-14 a 3-token edit (~0.75) — both above the 0.6 threshold,
    * straddling the LSH band-collision probability curve. */
  private def plantedCorpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    val base = (0L until 30L).map { i =>
      i -> Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val twins = (0 until 15).map { i =>
      val toks = base(i)._2.split(" ")
      val edits = if (i < 8) Seq(7) else Seq(7, 25, 43)
      val edited = edits.foldLeft(toks) { (t, p) => t.updated(p, "zz" + p) }
      (100L + i) -> edited.mkString(" ")
    }
    base ++ twins
  }

  test("MinHash LSH recall vs brute-force Jaccard truth (planted twins)") {
    for (seed <- Seq(1, 7)) {
      val docs = plantedCorpus(seed)
      val sets = docs.toMap.map { case (id, t) => id -> shingleSet(t) }
      val ids = docs.map(_._1)
      val truth = (for {
        a <- ids; b <- ids if a < b
        if jaccard(sets(a), sets(b)) >= 0.6
      } yield (a, b)).toSet
      assert(truth.size >= 15, s"seed $seed: planting failed (${truth.size} true pairs)")
      val got = Dedup.nearDupPairs(docs.toDF("doc_id", "text"))
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.subsetOf(truth), s"seed $seed: unsound pair ${got -- truth}")
      val recall = got.size.toDouble / truth.size
      info(f"seed $seed: minhash recall ${got.size}/${truth.size} = $recall%.2f")
      // 4 bands x 3 rows: P(candidate) = 1-(1-s^3)^4 = 0.99 at s=0.9,
      // 0.86 at s=0.75 — the planted mix should land well above 0.75
      assert(recall >= 0.75, s"seed $seed: recall $recall collapsed")
    }
  }

  test("prefix-table SimHash recall vs the exact pigeonhole block join") {
    for (seed <- Seq(1, 7)) {
      val docs = plantedCorpus(seed).toDF("doc_id", "text")
      // q109's variant is COMPLETE (proven against brute force in
      // DedupSpec), so it IS the truth for the same maxHamming
      val exact = Dedup.simhashNearDupsExact(docs, maxHamming = 3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val prefix = Dedup.simhashNearDups(docs, maxHamming = 3, prefixBits = 8)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(prefix.subsetOf(exact.keySet), s"seed $seed: prefix table emitted non-pair")
      // hamming-0 pairs (equal fingerprints) ALWAYS share the prefix:
      // recall 1.0 there is deterministic, not statistical
      val h0 = exact.collect { case (p, 0L) => p }.toSet
      assert(h0.subsetOf(prefix), s"seed $seed: prefix missed an identical fingerprint")
      val recall = if (exact.isEmpty) 1.0 else prefix.size.toDouble / exact.size
      val byH = exact.groupBy(_._2).toSeq.sortBy(_._1).map { case (h, ps) =>
        f"h=$h ${ps.keys.count(prefix)}/${ps.size}"
      }.mkString(", ")
      info(f"seed $seed: prefix-simhash recall ${prefix.size}/${exact.size} = $recall%.2f ($byH)")
      // The honest number: a pair differing only inside the 8-bit
      // prefix is invisible to the single table. Per-distance recall
      // tracks the combinatorial prediction C(8,h)/C(16,h) — measured
      // h=1 0.40-0.50 (theory 0.50), h=2 0.06-0.17 (0.23), h=3
      // 0.01-0.05 (0.10) — and on this hamming-3-dense corpus most
      // true pairs ARE hamming 2-3, so overall recall lands at
      // 0.12-0.22. That is the documented q91 limitation — q109's
      // pigeonhole block join is the exact-recall path, and this spec
      // + PERF.md record the gap rather than hide it.
      val h1 = exact.collect { case (p, h) if h <= 1 => p }
      assert(h1.count(prefix) >= (0.35 * h1.size).toInt,
        s"seed $seed: hamming<=1 recall collapsed")
      assert(recall >= 0.10, s"seed $seed: prefix recall $recall degenerate")
    }
  }
}
