package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Differential tests: the distributed dedup stack against a local
  * brute-force reference on seeded random corpora (SURVEY.md §5's
  * "engine vs oracle on randomized inputs" strategy, LSH flavor). */
class DedupDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shingleSet(text: String, n: Int = 3): Set[String] =
    text.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0d
    else a.intersect(b).size.toDouble / a.union(b).size

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("ape", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    val base = (0L until 12L).map { i =>
      i -> Seq.fill(10 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // exact dup of doc 0 and a near dup of doc 1 (one word appended)
    base ++ Seq(100L -> base(0)._2, 101L -> (base(1)._2 + " ibis"))
  }

  test("near-dup pairs are sound (exact Jaccard, correct counts) and find exact dups") {
    for (seed <- Seq(1, 7, 42)) {
      val docs = corpus(seed)
      val sets = docs.toMap.map { case (id, t) => id -> shingleSet(t) }
      val out = Dedup.nearDupPairs(docs.toDF("doc_id", "text")).collect().map { r =>
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_inter"), r.getAs[Double]("jaccard"))
      }
      // soundness: every reported pair's stats match the local reference
      out.foreach { case (a, b, na, nb, ni, j) =>
        assert(na === sets(a).size.toLong, s"seed $seed pair ($a,$b) n_a")
        assert(nb === sets(b).size.toLong, s"seed $seed pair ($a,$b) n_b")
        assert(ni === sets(a).intersect(sets(b)).size.toLong, s"seed $seed pair ($a,$b) n_inter")
        assert(j === jaccard(sets(a), sets(b)), s"seed $seed pair ($a,$b) jaccard")
        assert(j >= 0.6, s"seed $seed pair ($a,$b) below threshold")
      }
      // completeness for identical docs: identical signatures always
      // collide in every band, so (0, 100) must be reported
      assert(out.exists(p => p._1 == 0L && p._2 == 100L),
        s"seed $seed: exact-dup pair (0,100) missing")
    }
  }

  test("winnowing coverage invariant holds on random docs") {
    val k = 4; val w = 4
    for (seed <- Seq(3, 9)) {
      val docs = corpus(seed)
      val fps = Dedup.winnowFingerprint(docs.toDF("doc_id", "text"), k, w)
        .collect().map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      docs.foreach { case (id, text) =>
        val nGrams = text.split(" ").length - k + 1
        if (nGrams >= w) {
          val sel = fps.getOrElse(id, Set.empty)
          (1 to nGrams - w + 1).foreach { s =>
            assert((s until s + w).exists(sel.contains),
              s"seed $seed doc $id: window at $s uncovered")
          }
        }
      }
    }
  }
}
