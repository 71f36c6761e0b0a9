package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EntityResolution, EventAnalytics, Stats, TextAnalysis}

/** Unit pins for the r13 analytics additions: OLS trend, rank
  * correlation, SCD2 history, fuzzy blocking linkage and χ²
  * distinctive terms. The oracle gate proves engine parity; these
  * prove the STATISTICS are right on constructed inputs. */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2020-01-${day + 1}%02d 00:00:00")

  test("olsTrend recovers an exact planted slope and mean") {
    // y = 3.00 + 2.50 * x on days 0..4 — cents-exact, so the
    // quantized regression must recover it exactly
    val rows = (0 to 4).map(x => ("up", ts(x), 3.00 + 2.50 * x)) ++
      (0 to 4).map(x => ("flat", ts(x), 7.25))
    val df = rows.toDF("event_type", "ts", "value")
    val out = Stats.olsTrend(df, "event_type", "ts", "value")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("up")._1 === 5L)
    assert(out("up")._2 === 2.50)
    assert(out("up")._3 === 8.00) // mean of 3, 5.5, 8, 10.5, 13
    assert(out("flat")._2 === 0.0)
    assert(out("flat")._3 === 7.25)
  }

  test("rankCorrelation is ±1 on monotone orderings, 0-centered on a designed anti-pattern") {
    // value strictly increasing with time -> ranks identical -> +1;
    // strictly decreasing -> ranks reversed -> -1
    val inc = (1 to 20).map(i => ("inc", i.toDouble, i.toLong, i.toLong))
    val dec = (1 to 20).map(i => ("dec", (21 - i).toDouble, i.toLong, i.toLong))
    val df = (inc ++ dec).toDF("event_type", "value", "ts_us", "event_id")
    val out = Stats.rankCorrelation(df, "event_type",
      col("value"), col("ts_us"), col("event_id"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out("inc") - 1.0) < 1e-12)
    assert(math.abs(out("dec") + 1.0) < 1e-12)
  }

  test("scd2History collapses runs, versions them, and marks the current row") {
    val obs = Seq(
      (1L, "trial", 10L, 1L),
      (1L, "trial", 20L, 2L),
      (1L, "paid", 30L, 3L),
      (1L, "trial", 40L, 4L), // back to a previous state = NEW version
      (2L, "paid", 5L, 5L)
    ).toDF("user_id", "state", "ts_us", "obs_id")
    val out = EventAnalytics.scd2History(obs, "user_id", "state", "ts_us", "obs_id")
      .orderBy("user_id", "version").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq === Seq("trial", "paid", "trial"))
    assert(u1.map(_.getLong(2)).toSeq === Seq(10L, 30L, 40L)) // effective_from
    assert(u1.map(r => Option(r.get(3))).toSeq ===
      Seq(Some(30L), Some(40L), None)) // effective_to chains, open tail
    assert(u1.map(_.getLong(4)).toSeq === Seq(1L, 2L, 3L))
    assert(u1.map(_.getBoolean(5)).toSeq === Seq(false, false, true))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2(0).getBoolean(5))
  }

  test("fuzzyPairs links within-block near-matches and never crosses blocks") {
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "en", "the quick brown fox jumps over the lazy cat tonight"), // dist 3 from 1
      (3L, "en", "a completely different text that shares no prefix at all"),
      (4L, "fr", "the quick brown fox jumps over the lazy dog tonight") // same text, other block
    ).toDF("doc_id", "lang", "text")
    val out = EntityResolution.fuzzyPairs(docs, "doc_id", "text",
      blockCols = Seq("lang")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set((1L, 2L, 3L))) // 4 blocked away despite dist 0
  }

  test("fuzzyPairs drops candidates past the threshold via the short-circuit form") {
    val docs = Seq(
      (1L, "x", "aaaaaaaaaaaa" + "b" * 30),
      (2L, "x", "aaaaaaaaaaaa" + "c" * 30) // same block, 30 edits apart
    ).toDF("doc_id", "lang", "text")
    val out = EntityResolution.fuzzyPairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), maxDist = 8)
    assert(out.count() === 0L)
  }

  test("rateAnomaly flags a planted spike and NULL-guards constant baselines") {
    // type "a": constant 2/day for 8 days, then a 10-event spike —
    // constant baseline => variance 0 => z NULL on days 2-8, and the
    // spike day must also be NULL-guarded (its window is constant too);
    // type "b": alternating 1/3 baseline gives real variance
    val a = (0 until 8).flatMap(dy => Seq.fill(2)(("a", ts(dy)))) ++
      Seq.fill(10)(("a", ts(8)))
    val b = (0 until 8).flatMap(dy => Seq.fill(if (dy % 2 == 0) 1 else 3)(("b", ts(dy)))) ++
      Seq.fill(30)(("b", ts(8)))
    val df = (a ++ b).toDF("event_type", "ts")
    val out = Stats.rateAnomaly(df, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val day0 = out.keys.map(_._2).min
    // first day of each type: no baseline at all
    assert(out(("a", day0)).isNullAt(4) && out(("a", day0)).isNullAt(5))
    // constant baseline: mean present, z NULL (variance 0)
    val aSpike = out(("a", day0 + 8))
    assert(aSpike.getDouble(4) === 2.0 && aSpike.isNullAt(5))
    // varied baseline: trailing-7 mean is 15/7 (3,1,3,1,3,1,3), and
    // the spike z-score is large and positive
    val bSpike = out(("b", day0 + 8))
    assert(bSpike.getDouble(4) === 15.0 / 7.0)
    assert(bSpike.getDouble(5) > 3.0)
  }

  test("gramMatrix equals the brute-force quantized outer-product sum") {
    val vecs = Seq(
      Array(0.5f, -0.25f, 0.125f),
      Array(-0.5f, 0.25f, 0.0f),
      Array(0.1f, 0.2f, -0.3f))
    val df = vecs.map(Tuple1(_)).toDF("embedding")
    val out = Stats.gramMatrix(df, "embedding", d = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def q(x: Float): Long = math.floor(x.toDouble * 65536.0).toLong
    for (i <- 0 until 3; j <- i until 3) {
      val expect = vecs.map(v => q(v(i)) * q(v(j))).sum
      assert(out((i.toLong, j.toLong)) === expect, s"cell ($i,$j)")
    }
    assert(out.size === 6) // upper triangle only
  }

  test("gramMatrix refuses mixed dimensionality loudly") {
    val df = Seq(Tuple1(Array(0.1f, 0.2f)), Tuple1(Array(0.1f)))
      .toDF("embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Stats.gramMatrix(df, "embedding", d = 2).collect()
    }
    assert(e.getMessage.contains("expected 2-dim") ||
      Option(e.getCause).exists(_.getMessage.contains("expected 2-dim")))
  }

  test("triangles enumerates each triangle exactly once, any input orientation") {
    import graft.operators.LinkAnalysis
    // K4 on {1,2,3,4} given as scrambled directed edges with dups and
    // a self-loop: C(4,3) = 4 triangles, each once
    val edges = Seq(
      (2L, 1L), (1L, 2L), (3L, 1L), (1L, 4L), (3L, 2L), (4L, 2L),
      (4L, 3L), (3L, 4L), (2L, 2L)).toDF("src", "dst")
    val out = LinkAnalysis.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    assert(out.length === 4)
  }

  test("resampleDaily fills calendar gaps with zeros and rolls over the full grid") {
    import graft.operators.EventAnalytics
    // days 0, 1, 4 observed -> days 2-3 must appear with n=0; the
    // rolling week at day 4 sees all five grid days
    val ev = Seq(("a", ts(0)), ("a", ts(0)), ("a", ts(1)), ("a", ts(4)))
      .toDF("event_type", "ts")
    val out = EventAnalytics.resampleDaily(ev)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = out.head._1
    assert(out.map(_._1).toSeq === (base to base + 4))
    assert(out.map(_._2).toSeq === Seq(2L, 1L, 0L, 0L, 1L))
    assert(out.map(_._3).toSeq === Seq(2L, 3L, 3L, 3L, 4L))
  }

  test("cooccurrenceLift: a perfectly coupled pair lifts above an anti-correlated one") {
    import graft.operators.EventAnalytics
    // 4 users: u1,u2 do {a,b}; u3 does {a,c}; u4 does {b,c}
    val ev = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b"), (4L, "c"))
      .toDF("user_id", "event_type")
    val out = EventAnalytics.cooccurrenceLift(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    // lift(a,b) = n_both * n_users / (n_a * n_b) = 2*4/(3*3);
    // lift(a,c) = 1*4/(3*2)
    assert(out(("a", "b")) === ((2L, 8.0 / 9.0)))
    assert(out(("a", "c")) === ((1L, 4.0 / 6.0)))
    assert(out(("a", "b"))._2 > out(("a", "c"))._2)
  }

  test("invertedIndex caps postings, keeps full df, ranks by df then token") {
    // letter-only singletons — digit-bearing tokens are filtered out
    val docs = (1L to 15L).map(i => (i, s"common extra${('a' + i).toChar}"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .invertedIndex(docs, topK = 3, postingsCap = 10)
      .orderBy("rank").collect()
    // "common" appears in all 15 docs but its posting head caps at 10
    assert(out(0).getString(1) === "common")
    assert(out(0).getLong(2) === 15L)
    assert(out(0).getString(4) === (1L to 10L).mkString(","))
    // the singleton tokens tie at df=1 -> lexicographic token order
    assert(out(1).getString(1) < out(2).getString(1))
  }

  test("keySkew: uniform keys score gini 0, a dominant key scores high") {
    // group "u": 4 keys x 1 row each; group "s": keys 1,2,3 once, key
    // 4 x 97 rows -> gini = 288/400 = 0.72 by the closed form
    val uniform = (1 to 4).map(k => ("u", k.toLong))
    val skewed = (1 to 3).map(k => ("s", k.toLong)) ++
      Seq.fill(97)(("s", 4L))
    val df = (uniform ++ skewed).toDF("event_type", "user_id")
    val out = Stats.keySkew(df, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("u").getLong(1) === 4L && out("u").getLong(2) === 4L)
    assert(out("u").getDouble(5) === 0.0)
    assert(out("s").getLong(3) === 97L) // max_cnt
    assert(out("s").getDouble(4) === 0.97) // top_share
    assert(out("s").getDouble(5) === 0.72)
  }

  test("distinctiveTerms surfaces a planted slice-exclusive token at rank 1") {
    val common = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"$common xylophone xylophone xylophone", "A"),
      (2L, s"$common xylophone xylophone xylophone", "A"),
      (3L, common, "B"),
      (4L, common, "B")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.distinctiveTerms(docs, "source", topK = 2)
      .filter(col("slice") === "A").orderBy("rk").collect()
    assert(out(0).getAs[String]("tok") === "xylophone")
    assert(out(0).getAs[Long]("tf_in_slice") === 6L)
    // exclusive token's chi2 strictly dominates any shared token
    assert(out(0).getAs[Double]("chi2") > out(1).getAs[Double]("chi2"))
  }

  test("featureScale: exact pct-rank/minmax, ±1 z on a symmetric pair, NULLs on singletons") {
    // group "q": 4 evenly spaced values -> pct_rank and minmax agree at
    // thirds; group "p": symmetric pair -> population z is exactly ±1;
    // group "one": singleton -> all three scalings are NULL
    val df = (Seq(("q", 1.00, "a"), ("q", 2.00, "b"), ("q", 3.00, "c"),
      ("q", 4.00, "d"), ("p", 1.00, "x"), ("p", 3.00, "y"),
      ("one", 5.00, "z"))).toDF("g", "value", "tie")
    val out = Stats.featureScale(df, "g", "value", "tie")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val thirds = Seq("a" -> 0.0, "b" -> 1.0 / 3, "c" -> 2.0 / 3, "d" -> 1.0)
    for ((t, expect) <- thirds) {
      assert(out(("q", t)).getDouble(3) === expect)
      assert(out(("q", t)).getDouble(4) === expect)
    }
    // p: y2 = 100, 300; mean 200; population sd 100 -> z = -1, +1
    assert(out(("p", "x")).getDouble(5) === -1.0)
    assert(out(("p", "y")).getDouble(5) === 1.0)
    for (i <- 3 to 5) assert(out(("one", "z")).isNullAt(i))
  }

  test("lastTouchAttribution credits the latest preceding touch, skipping conversions") {
    // u1: view, click, purchase(10), purchase(5) — BOTH purchases
    //   credit "click" (the second must skip the purchase between);
    // u2: purchase(7) with no preceding touch -> "(direct)"
    val ev = Seq(
      (1L, "view", 1L, "e1", 0.0), (1L, "click", 2L, "e2", 0.0),
      (1L, "purchase", 3L, "e3", 10.0), (1L, "purchase", 4L, "e4", 5.0),
      (2L, "purchase", 1L, "e5", 7.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val out = EventAnalytics.lastTouchAttribution(ev, "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out === Map("click" -> ((2L, 15.0)), "(direct)" -> ((1L, 7.0))))
  }

  test("kaplanMeier: hand-computed survival curve with censoring, exact values") {
    // u1 converts at dur 0; u2 converts at dur 2; u3 censored at dur 2
    // (leaves the risk set after t=2); u4 converts at dur 4.
    // KM: t0 n4 d1 S=0.75; t2 n3 d1 S=0.5; t4 n1 d1 S=0.0 — all exact
    // in fixed-point (3/4, then *2/3, then *0/1).
    val day = 86400000000L
    val ev = Seq(
      (1L, "purchase", 0L, 1L),
      (2L, "view", 0L, 2L), (2L, "purchase", 2 * day + 3600L, 3L),
      (3L, "view", 0L, 4L), (3L, "click", 2 * day + 99L, 5L),
      (4L, "view", 0L, 6L), (4L, "purchase", 4 * day + 1L, 7L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val out = EventAnalytics.kaplanMeier(ev, "purchase")
      .orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (0L, 4L, 1L, 0.75), (2L, 3L, 1L, 0.5), (4L, 1L, 1L, 0.0)))
  }

  test("positionAttribution: 40/20/40 journey credits, touches after last conversion dropped") {
    // u1: a b c d purchase -> a/d get 400000 ppm, b/c 100000 each;
    // u2: e purchase -> 1000000; the trailing touch f never converts
    val ev = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "c", 3L, 3L),
      (1L, "d", 4L, 4L), (1L, "purchase", 5L, 5L), (1L, "f", 6L, 6L),
      (2L, "e", 1L, 7L), (2L, "purchase", 2L, 8L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.positionAttribution(ev, "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("a" -> 400000L, "b" -> 100000L, "c" -> 100000L,
      "d" -> 400000L, "e" -> 1000000L))
  }

  test("sequenceNgrams: adjacent trigrams with exact corpus shares") {
    val ev = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "a", 3L, 3L),
      (1L, "b", 4L, 4L), (1L, "a", 5L, 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.sequenceNgrams(ev, 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out === Map(
      ("a", "b", "a") -> ((2L, 2.0 / 3)), ("b", "a", "b") -> ((1L, 1.0 / 3))))
  }

  test("winsorize clips at order-statistic bounds; small groups pass through") {
    // group "g": 1..40, k = 40 div 20 = 2 -> bounds [v_3, v_38] = [3, 38];
    // group "s": 10 values, k = 0 -> untouched
    val rows = (1 to 40).map(i => ("g", i.toDouble, i.toLong)) ++
      (1 to 10).map(i => ("s", i * 10.0, i.toLong))
    val out = Stats.winsorize(rows.toDF("g", "v", "id"), "g", "v", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    assert(out(("g", 1L)) === 3.0 && out(("g", 2L)) === 3.0)
    assert(out(("g", 3L)) === 3.0 && out(("g", 20L)) === 20.0)
    assert(out(("g", 38L)) === 38.0)
    assert(out(("g", 39L)) === 38.0 && out(("g", 40L)) === 38.0)
    (1 to 10).foreach(i => assert(out(("s", i.toLong)) === i * 10.0))
  }

  test("benfordDigits: integer digit extraction, zero-filled spine, exact shares") {
    // cents 100, 250, 19 -> digits 1, 2, 1; zero and negative filtered
    val df = Seq(1.00, 2.50, 0.19, 0.0, -5.0).toDF("value")
    val out = Stats.benfordDigits(df, "value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.size === 9)
    assert(out(1L) === ((2L, 2.0 / 3)))
    assert(out(2L) === ((1L, 1.0 / 3)))
    (3L to 9L).foreach(d => assert(out(d)._1 === 0L))
  }

  test("interpolateDaily: exact straight line on interior gaps only") {
    // day 0 -> 1.00, day 3 -> 4.00; days 1-2 interpolate to 2.00, 3.00
    val ev = Seq(("a", ts(0), 1.00), ("a", ts(3), 4.00))
      .toDF("event_type", "ts", "value")
    val out = EventAnalytics.interpolateDaily(ev)
      .orderBy("day").collect()
      .map(r => (r.getBoolean(2), r.getDouble(3)))
    assert(out.toSeq === Seq((true, 1.0), (false, 2.0), (false, 3.0),
      (true, 4.0)))
  }

  test("matchPattern: B within window, C-guard exclusive, late B rejected") {
    // u1: A@0 -> B@50 with no C between: match, gap 0s (50µs)
    // u2: A@0, C@30, B@50: C between -> no match
    // u3: A@0, B@9e6+1µs: outside the 9-second window -> no match
    // u4: A@0, B@50, C@50 (same µs as B): exclusive guard -> match
    val ev = Seq(
      (1L, "A", 0L, 1L), (1L, "B", 50L, 2L),
      (2L, "A", 0L, 3L), (2L, "C", 30L, 4L), (2L, "B", 50L, 5L),
      (3L, "A", 0L, 6L), (3L, "B", 9000001L, 7L),
      (4L, "A", 0L, 8L), (4L, "B", 50L, 9L), (4L, "C", 50L, 10L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val out = EventAnalytics.matchPattern(ev, "A", "B", "C", withinSec = 9L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set((1L, 1L, 2L), (4L, 8L, 9L)))
  }

  test("conversionLatency: exact rank statistics on a constructed gap set") {
    // 10 users with gaps 1..10 µs: min 1, lower-median rank (11)div2=5,
    // p90 rank (99)div10... ceil(0.9*10)=9, max 10. One non-converter.
    val rows = (1 to 10).flatMap(u => Seq(
      (u.toLong, "view", 0L, u * 100L),
      (u.toLong, "purchase", u.toLong, u * 100L + 1))) ++
      Seq((99L, "view", 0L, 9900L))
    val ev = rows.toDF("user_id", "event_type", "ts_us", "event_id")
    val r = EventAnalytics.conversionLatency(ev, "view", "purchase")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((10L, 1L, 5L, 9L, 10L)))
  }

  test("ewmaDaily: hand-computed fixed-point recursion over a gap-filled grid") {
    // type "a": 4 events day 0, silence day 1 (gap-filled), 2 events
    // day 2. alphaDen=2: s0=4.0; s1=4+(0-4)/2=2.0; s2=2+(2-2)/2=2.0
    val ev = Seq.fill(4)(("a", ts(0))) ++ Seq(("a", ts(2)), ("a", ts(2)))
    val out = EventAnalytics.ewmaDaily(
      ev.toDF("event_type", "ts"), alphaDen = 2)
      .orderBy("day").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((4L, 4.0), (0L, 2.0), (2L, 2.0)))
  }
}
