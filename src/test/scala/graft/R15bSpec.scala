package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, LinkAnalysis, Similarity}

/** Pins for the round-15 batch-2 operators: the Jaro-Winkler native
  * expression (DuckDB-verified constants + codegen/interpreted
  * agreement), MMR greedy invariants, a k-core brute-force
  * differential, and systematic-PPS sampling exactness properties. */
class R15bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    functions.expressions.JaroWinkler.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler matches DuckDB bit-for-bit on fixture pairs") {
    // expected values read off `SELECT jaro_winkler_similarity(a, b)`
    // in DuckDB (the oracle engine) — exact doubles, not tolerances
    val fixtures = Seq(
      ("martha", "marhta") -> 0.9611111111111111, // transposition + boost
      ("dwayne", "duane") -> 0.8400000000000001,
      ("dixon", "dicksonx") -> 0.8133333333333332,
      ("abcdef", "abefcd") -> 0.9111111111111111, // two transpositions
      ("prefix", "preface") -> 0.8476190476190476,
      ("aaaaaa", "bbbbbb") -> 0.0, // no matches at all
      ("ab", "ba") -> 0.0, // window 0: transposed pair scores zero
      ("a", "a") -> 1.0,
      ("a", "b") -> 0.0,
      ("abcdefgh", "abzzzzzz") -> 0.5, // jaro <= 0.7: NO prefix boost
      ("crate", "trace") -> 0.7333333333333334, // boost-eligible, prefix 0
      ("", "") -> 1.0,
      ("abc", "") -> 0.0,
      ("lavender blue powder puff", "lavender blue powder puf") -> 0.992)
    fixtures.foreach { case ((a, b), want) =>
      assert(jw(a, b) == want, s"similarity('$a','$b')")
      assert(jw(b, a) == want, s"symmetry('$b','$a')")
    }
  }

  test("jaro_winkler codegen path agrees with the interpreted companion") {
    val pairs = Seq(("martha", "marhta"), ("dwayne", "duane"),
      ("prefix", "preface"), ("ab", "ba"), ("same", "same"),
      ("crate", "trace"), ("abcdefgh", "abzzzzzz"))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        expr("jaro_winkler_similarity(a, b)").as("jw"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == jw(a, b), s"codegen vs interpreted ($a,$b)")
    }
  }

  // ---- MMR --------------------------------------------------------

  private def embFixture = Seq(
    // query vector 0 plus: three near-duplicates of one direction
    // (1,0,...) and two of an orthogonal one — MMR must not take all
    // three duplicates even though they out-rank the orthogonals
    (0L, Array(1.0f, 1.0f, 0.0f, 0.0f), 0),
    (1L, Array(1.0f, 0.02f, 0.0f, 0.0f), 0),
    (2L, Array(0.99f, 0.0f, 0.01f, 0.0f), 0),
    (3L, Array(0.98f, 0.01f, 0.0f, 0.0f), 0),
    (4L, Array(0.0f, 0.9f, 0.0f, 0.1f), 0),
    (5L, Array(0.01f, 0.88f, 0.05f, 0.0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("mmrSelect: round 1 is the relevance argmax; no repeats; gains verify") {
    val out = Similarity.mmrSelect(embFixture, queryId = 0L, n = 5, k = 4)
      .orderBy("round").collect()
    assert(out.length == 4)
    val ids = out.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "no vector selected twice")
    // independent int8 quantization + dot replay
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.max(-127L, math.min(127L,
        math.floor(x.toDouble * 64.0 + 0.5).toLong)))
    val vecs = embFixture.collect()
      .map(r => r.getLong(0) -> q(r.getSeq[Float](1).toArray)).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val rels = vecs.collect { case (id, v) if id != 0L => id -> dot(v, vecs(0L)) }
    assert(out.head.getLong(1) == rels.maxBy(r => (r._2, -r._1))._1,
      "round 1 = max relevance")
    // each round's recorded gain equals rel - max sim to prior picks
    out.zipWithIndex.foreach { case (row, i) =>
      val id = row.getLong(1)
      val prior = ids.take(i)
      val expect =
        if (prior.isEmpty) rels(id)
        else rels(id) - prior.map(p => dot(vecs(id), vecs(p))).max
      assert(row.getLong(2) == rels(id), s"rel of $id")
      assert(row.getLong(3) == expect, s"gain of $id at round ${i + 1}")
    }
    // diversity: the three near-duplicates of vec 1 are not all taken
    val dupTaken = ids.count(Set(1L, 2L, 3L))
    assert(dupTaken < 3, s"MMR took all near-duplicates: ${ids.toSeq}")
  }

  // ---- k-core -----------------------------------------------------

  test("kCore matches a brute-force simultaneous peel") {
    val rnd = new scala.util.Random(15015)
    val raw = (1 to 400).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
    }
    val edges = raw.toDF("src", "dst")
    val got = LinkAnalysis.kCore(edges, k = 3, maxRounds = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent reference peel
    val und = raw.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).toSet
    var alive = und.map(_._1)
    var done = false
    while (!done) {
      val deg = und.toSeq
        .filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.size }
      val next = alive.filter(n => deg.getOrElse(n, 0) >= 3)
      done = next == alive
      alive = next
    }
    val refDeg = und.toSeq.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    assert(got == refDeg, "core membership + in-core degrees")
    assert(got.nonEmpty, "fixture produces a non-trivial core")
    assert(got.values.forall(_ >= 3), "every core node keeps degree >= k")
  }

  // ---- systematic PPS ---------------------------------------------

  private def docFixture(n: Int) = {
    val rnd = new scala.util.Random(2815)
    (1 to n).map(i => (i.toLong, s"doc $i text", 50L + rnd.nextInt(900)))
      .toDF("doc_id", "text", "n_chars")
  }

  test("ppsSample: total picks == k, oversized docs always in, repartition-proof") {
    val docs = docFixture(300)
    val k = 20
    val out = Corpus.ppsSample(docs, "n_chars", k)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == k, "grid points partition exactly into picks")
    assert(rows.forall(_._3 >= 1))
    val total = docs.agg(sum(col("n_chars"))).head().getLong(0)
    // any doc heavier than the stride W/k must contain a grid point
    val heavy = docs.filter(col("n_chars") * k > total)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(heavy.subsetOf(rows.map(_._1).toSet),
      "every oversized doc is selected")
    val re = Corpus.ppsSample(docs.repartition(7), "n_chars", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq,
      "selection is partitioning-independent")
  }

  test("ppsSample rejects negative weights and overflow-risk k") {
    val bad = Seq((1L, "a", -5L), (2L, "b", 10L)).toDF("doc_id", "text", "n_chars")
    intercept[IllegalArgumentException] {
      Corpus.ppsSample(bad, "n_chars", 3)
    }
  }
}
