package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, EventAnalytics}

/** Differential pins for the r15 batch-3 operators.
  *
  *  - setSimilarityJoin vs a BRUTE-FORCE all-pairs Jaccard sweep: the
  *    prefix filter's recall-1.0 theorem is checked empirically on
  *    random corpora with planted near-duplicates — output pair sets
  *    (and inter/union counts) must be IDENTICAL, both directions
  *    (no missed pair, no extra pair).
  *  - journeyConformance: directed fixture with hand-computed
  *    journeys and edit distances, plus the prefix-cap contract. */
class R15dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until 60).map { i =>
      (i.toLong,
        (0 until (15 + rnd.nextInt(25)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // planted near-dups: append/drop a word — Jaccard stays high
    val dups = (0 until 12).map { j =>
      val (_, t) = base(j * 3)
      val toks = t.split(" ")
      val mut =
        if (j % 2 == 0) (toks :+ vocab(j % vocab.size)).mkString(" ")
        else toks.drop(1).mkString(" ")
      ((100 + j).toLong, mut)
    }
    base ++ dups
  }

  private def bruteJaccard(docs: Seq[(Long, String)], n: Int,
                           num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
    def sh(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < n) Set.empty
      else w.sliding(n).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> sh(t) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      un = (sa | sb).size.toLong
      if inter * den >= un * num
    } yield (a, b, inter, un)).toSet
  }

  test("setSimilarityJoin ≡ brute-force all-pairs Jaccard (two seeds)") {
    Seq(421, 977).foreach { seed =>
      val docs = corpus(seed).toDF("doc_id", "text")
      val got = Dedup.setSimilarityJoin(docs, n = 3, minJacNum = 4,
          minJacDen = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = bruteJaccard(corpus(seed), 3, 4, 5)
      assert(got == want,
        s"seed $seed: missed=${want -- got} extra=${got -- want}")
      assert(want.nonEmpty, s"seed $seed: fixture planted no near-dups")
    }
  }

  test("setSimilarityJoin at a lower threshold still exact") {
    val docs = corpus(31).toDF("doc_id", "text")
    val got = Dedup.setSimilarityJoin(docs, n = 2, minJacNum = 3,
        minJacDen = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == bruteJaccard(corpus(31), 2, 3, 5))
  }

  test("setSimilarityJoinAgainst ≡ full join filtered to incoming pairs") {
    val all = corpus(77)
    val inc = all.filter(_._1 % 3 == 0)
    val cor = all.filter(_._1 % 3 != 0)
    val got = Dedup.setSimilarityJoinAgainst(
        inc.toDF("doc_id", "text"), cor.toDF("doc_id", "text"),
        n = 3, minJacNum = 4, minJacDen = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = bruteJaccard(all, 3, 4, 5)
      .filter(p => p._1 % 3 == 0 || p._2 % 3 == 0)
    assert(got == want,
      s"missed=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty, "fixture planted no incoming-touching pairs")
    assert(want.exists(p => p._1 % 3 == 0 && p._2 % 3 == 0) ||
      want.exists(p => p._1 % 3 != 0 || p._2 % 3 != 0),
      "fixture covers batch-internal or batch-corpus pairs")
  }

  test("setSimilarityJoinAgainst rejects overlapping doc-id spaces") {
    val d = corpus(5).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.setSimilarityJoinAgainst(d, d, n = 3)
    }
  }

  test("journeyConformance: directed journeys, distances, prefix cap") {
    val ev = Seq(
      // user 1 follows the canonical "svc" exactly, then noise beyond
      // the prefix cap that must NOT affect the journey
      (1L, "signup", 1L, 1L), (1L, "view", 2L, 2L), (1L, "click", 3L, 3L),
      (1L, "error", 4L, 4L),
      // user 2: one substitution (view -> error)
      (2L, "signup", 1L, 5L), (2L, "error", 2L, 6L), (2L, "click", 3L, 7L),
      // user 3: ts tie broken by event_id
      (3L, "view", 1L, 9L), (3L, "signup", 1L, 8L), (3L, "click", 2L, 10L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.journeyConformance(ev, canonical = "svc",
        prefixLen = 3, maxDist = 1, tsCol = "ts")
      .orderBy("user_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("svc", "sec", "svc"))
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 1L, 0L))
    assert(out.map(_.getBoolean(3)).toSeq == Seq(true, true, true))
    val strict = EventAnalytics.journeyConformance(ev, canonical = "svc",
        prefixLen = 3, maxDist = 0, tsCol = "ts")
      .orderBy("user_id").collect()
    assert(strict.map(_.getBoolean(3)).toSeq == Seq(true, false, true))
  }
}
