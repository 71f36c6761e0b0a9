package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitAssign is total, deterministic, and id-stable") {
    val docs = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Corpus.splitAssign(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Corpus.splitAssign(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // ~80/10/10: train dominates, every split non-empty at n=500
    val byN = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byN("train") > byN("val") && byN("train") > byN("test"))
    assert(byN.values.forall(_ > 0))
  }

  test("BPE merge rewrite is greedy left-to-right, including adjacent repeats") {
    // 'aaaa' holds three (a, a) pairs vs one (a, </w>) — round 1 must
    // merge (a, a), and the two-pass replace must produce BPE's
    // greedy-left 'aa aa </w>', NOT the single-pass 'aa a a </w>'
    // (pass 1 misses the second occurrence because the two matches
    // share a delimiter space).
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val (merges, seqs) = Corpus.bpeTrainWithSeqs(docs, nMerges = 1)
    val m = merges.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(m === Array((1L, "a", "a", 3L)))
    assert(seqs.select("seq").as[String].collect() === Array(" aa aa </w> "))
  }

  test("BPE merges cascade onto earlier merged symbols and ties break lexically") {
    // 'abab' x2: round 1 counts (a,b)=4, (b,a)=2, (b,</w>)=2 → merge
    // (a,b); round 2 counts (ab,ab)=2, (ab,</w>)=2 → tie, lexical
    // tie-break on rhs: '</w>' < 'ab' → merge (ab,</w>)
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val (merges, seqs) = Corpus.bpeTrainWithSeqs(docs, nMerges = 2)
    val m = merges.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m === Array((1L, "a", "b", "ab", 4L), (2L, "ab", "</w>", "ab</w>", 2L)))
    assert(seqs.select("seq").as[String].collect() === Array(" ab ab</w> "))
  }

  test("BPE encode reproduces training's final sequences on the training corpus") {
    val docs = Seq((1L, "abab abab ribera banana"), (2L, "riba bani abab"))
      .toDF("doc_id", "text")
    val (merges, seqs) = Corpus.bpeTrainWithSeqs(docs, nMerges = 4)
    val trained = seqs.select("word", "seq").as[(String, String)].collect()
      .map { case (w, s) => w -> s.trim.split(" ").length }.toMap
    val enc = Corpus.bpeEncode(docs, merges)
      .select("word", "n_tokens").as[(String, Long)].collect()
      .map { case (w, n) => w -> n.toInt }.toMap
    assert(enc === trained)
  }

  test("BPE encode handles words the trainer never saw") {
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = Corpus.bpeTrain(docs, nMerges = 1) // merges (a, a)
    val unseen = Seq((9L, "aaa zq")).toDF("doc_id", "text")
    val enc = Corpus.bpeEncode(unseen, merges)
      .select("word", "n_tokens").as[(String, Long)].collect().toMap
    // 'aaa' → 'aa a </w>' (3 tokens), 'zq' untouched → 'z q </w>' (3)
    assert(enc === Map("aaa" -> 3L, "zq" -> 3L))
  }

  test("shardPack cuts the concatenated stream at exact token offsets") {
    // 6 docs x 10 tokens, budget 25: starts 0,10,20,30,40,50 ->
    // shards 0,0,0,1,1,2
    val docs = (0L until 6L)
      .map(i => (i, (1 to 10).map(t => s"t$t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Corpus.shardPack(docs, budget = 25L)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("distributed scan equals the global prefix sum at any bucket size") {
    val docs = (0L until 100L)
      .map(i => (i, (0 to (i % 7).toInt).map(t => s"w$t").mkString(" ")))
      .toDF("doc_id", "text")
    def packed(bucketSize: Long) =
      Corpus.shardPack(docs, budget = 13L, bucketSize = bucketSize)
        .select("doc_id", "start_off", "shard_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(packed(3L) === packed(1000000L)) // many buckets == one bucket
  }

  test("hashSample returns exactly n per group, stable across calls") {
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "grp")
    def sample() = Corpus.hashSample(df, "grp", 7, "doc_id")
      .select("grp", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s1 = sample()
    assert(s1.groupBy(_._1).view.mapValues(_.size).toMap === Map("a" -> 7, "b" -> 7))
    assert(s1 === sample())
  }

  test("temperatureMix flattens a skewed source distribution toward sqrt weights") {
    // sources sized 900 / 100: natural ratio 9:1, sqrt ratio 3:1 —
    // the α=0.5 targets must realize the flattened ratio
    val docs = ((0L until 900L).map(i => (i, "big", s"doc $i")) ++
      (900L until 1000L).map(i => (i, "small", s"doc $i")))
      .toDF("doc_id", "source", "text")
    val kept = Corpus.temperatureMix(docs, "source", budget = 400L)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_big = floor(30*1e6), w_small = floor(10*1e6); targets = 300/100
    assert(kept === Map("big" -> 300L, "small" -> 100L))
    // determinism: the kept doc set is identical across invocations
    val ids1 = Corpus.temperatureMix(docs, "source", 400L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Corpus.temperatureMix(docs.repartition(7), "source", 400L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 === ids2)
  }

  test("kmvDistinct is exact below k and estimates above k") {
    val df = (0L until 2000L).map(i => (i, if (i < 5) "small" else "big"))
      .map { case (i, g) => (g, if (g == "small") i else i % 700) }
      .toDF("grp", "key")
    val out = graft.operators.Dedup.kmvDistinct(df, "grp", "key", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out("small") === ((5L, 5.0))) // below k: exact
    val (kept, est) = out("big")
    assert(kept === 64L)
    assert(est > 700 * 0.5 && est < 700 * 2.0, s"estimate $est far from 700")
  }

  test("tokenWindows: non-overlapping windows tile the document exactly") {
    val docs = Seq((1L, (1 to 70).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")
    val out = Corpus.tokenWindows(docs, window = 32, stride = 32)
      .orderBy("doc_id", "win_idx").collect()
    // stride = window => concatenating windows restores the text
    val rebuilt = out.groupBy(_.getLong(0)).view.mapValues(
      _.sortBy(_.getLong(1)).map(_.getString(4)).mkString(" ")).toMap
    assert(rebuilt === Map(1L -> (1 to 70).map(i => s"t$i").mkString(" "),
      2L -> "a b c", 3L -> "solo"))
    // sizes: full windows then the tail; never over the budget
    assert(out.forall(_.getLong(3) <= 32))
    assert(out.filter(_.getLong(0) == 1L).map(_.getLong(3)).toSeq === Seq(32L, 32L, 6L))
  }

  test("tokenWindows: overlapping stride repeats continuation context") {
    val docs = Seq((1L, (1 to 40).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Corpus.tokenWindows(docs, window = 16, stride = 8)
      .orderBy("win_idx").collect()
    // starts advance by the stride and the windows overlap by half
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 9L, 17L, 25L, 33L))
    val w1 = out(0).getString(4).split(" ")
    val w2 = out(1).getString(4).split(" ")
    assert(w1.takeRight(8).toSeq === w2.take(8).toSeq)
  }

  test("contamination flags exactly the docs sharing an n-gram") {
    val bench = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "xx the quick brown fox yy"), // shares 4-gram "the quick brown fox"
      (11L, "totally unrelated words entirely here"))
      .toDF("doc_id", "text")
    val out = Corpus.contamination(train, bench, n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((10L, 1L)))
  }

  test("tokenWindows clears the 10000-element sequence cap (two-level expansion)") {
    // 25000 tokens at stride 2 -> 12500 starts: a single sequence()
    // would exceed Spark's 10000-element cap and fail at runtime
    val doc = Seq((1L, (1 to 25000).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Corpus.tokenWindows(doc, window = 4, stride = 2)
      .agg(count(lit(1)), min(col("start")), max(col("start")),
        countDistinct(col("win_idx"))).collect()(0)
    assert(out.getLong(0) === 12500L)
    assert(out.getLong(1) === 1L && out.getLong(2) === 24999L)
    assert(out.getLong(3) === 12500L) // win_idx stays a contiguous rank
  }

  test("bloom prefilter: no false negatives, and it actually filters") {
    val docs = Tables.documents(TestSpark.spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") >= 100 && col("doc_id") < 400)
    val bench = docs.filter(col("doc_id") < 20)
    val truth = Corpus.contamination(train, bench, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cands = Corpus.bloomCandidates(train, bench, n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(truth.subsetOf(cands), "bloom dropped a truly contaminated doc")
    // the prefilter must be a filter: survivors well below the corpus
    val nTrain = train.count()
    assert(cands.size < nTrain, s"bloom passed everything (${cands.size}/$nTrain)")
    // and the verified output equals the exact join bit-for-bit
    val exact = Corpus.contamination(train, bench, n = 4)
      .select("doc_id", "n_shared_grams").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = Corpus.bloomDecontaminate(train, bench, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloomed === exact)
  }

  test("tokenQuotaCap: hard token budget, deterministic under repartitioning") {
    val docs = Tables.documents(TestSpark.spark, "/root/testdata/sf0.001")
    val capped = Corpus.tokenQuotaCap(docs, "source", 1500L)
    val maxCum = capped.groupBy(col("source"))
      .agg(max(col("cum_toks")).as("m")).collect()
    assert(maxCum.nonEmpty && maxCum.forall(_.getLong(1) <= 1500L))
    val kept = capped.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val keptShuffled = Corpus.tokenQuotaCap(docs.repartition(7), "source", 1500L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept === keptShuffled && kept.nonEmpty)
  }

  test("bloom membership test runs as broadcast semi-joins, no corpus shuffle") {
    val docs = Tables.documents(TestSpark.spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val plan = Corpus.bloomCandidates(
      docs.filter(col("doc_id") >= 100), docs.filter(col("doc_id") < 20), n = 4)
      .queryExecution.executedPlan.toString
    // the k slot-key probes are broadcast LEFT SEMI hash joins
    assert("BroadcastHashJoin .* LeftSemi".r.findAllIn(plan).size >= 3, plan)
  }

  test("weightedSample is deterministic, k-bounded, and weight-proportional") {
    // 400 unit-weight rows vs 100 rows at weight 50: the heavy block
    // should win far more than its 20% population share of a k=100 draw
    val docs = ((0L until 400L).map(i => (i, 1L)) ++
      (400L until 500L).map(i => (i, 50L))).toDF("doc_id", "w")
    val a = Corpus.weightedSample(docs, "doc_id", "w", k = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = Corpus.weightedSample(docs, "doc_id", "w", k = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a.size === 100 && a.distinct.size === 100)
    val heavy = a.count(_ >= 400L)
    assert(heavy > 60, s"weight-50 block won only $heavy/100 slots")
    // zero/negative weights never sampled
    val withZero = docs.union(Seq((999L, 0L)).toDF("doc_id", "w"))
    assert(!Corpus.weightedSample(withZero, "doc_id", "w", k = 500)
      .select("doc_id").collect().map(_.getLong(0)).contains(999L))
  }
}
