package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Generalized CEP step patterns (r14): differential against the
  * fixed-pattern operator on its special case, and hand-computed
  * quantifier/contiguity semantics. */
class R14CepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seqDf(rows: (Long, String, Long, Long)*) =
    rows.toDF("user_id", "event_type", "ts_us", "event_id")

  test("differential: [A one, B one] with guard C IS matchPattern") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_us", unix_micros(col("ts")))
    val fixed = EventAnalytics
      .matchPattern(ev, "view", "purchase", "error", withinSec = 7200L)
      .orderBy("user_id", "a_id").collect().map(_.toSeq)
    val general = EventAnalytics.matchSteps(ev,
      Seq("view" -> "one", "purchase" -> "one"),
      guards = Map(1 -> Seq("error")), withinSec = 7200L)
      .orderBy("user_id", "a_id").collect().map(_.toSeq)
    assert(fixed.nonEmpty, "fixture must produce matches")
    assert(general === fixed)
  }

  test("plus consumes the maximal contiguous run, greedily") {
    val ev = seqDf((1L, "a", 1000000L, 1L), (1L, "b", 2000000L, 2L),
      (1L, "b", 3000000L, 3L), (1L, "b", 4000000L, 4L),
      (1L, "c", 5000000L, 5L))
    val m = EventAnalytics.matchSteps(ev,
      Seq("a" -> "one", "b" -> "plus", "c" -> "one")).collect()
    assert(m.length === 1)
    val r = m.head
    assert(r.getLong(1) === 1L && r.getLong(2) === 5L && r.getLong(3) === 4L)
  }

  test("opt under contiguity backtracks like MATCH_RECOGNIZE") {
    val pat = Seq("a" -> "one", "b" -> "opt", "c" -> "one")
    // A B C: greedy with-B variant wins
    val withB = EventAnalytics.matchSteps(
      seqDf((2L, "a", 1000000L, 1L), (2L, "b", 2000000L, 2L),
        (2L, "c", 3000000L, 3L)), pat, contiguous = true).collect()
    assert(withB.length === 1 && withB.head.getLong(2) === 3L)
    // A C: the skip variant matches
    val skipB = EventAnalytics.matchSteps(
      seqDf((3L, "a", 1000000L, 1L), (3L, "c", 2000000L, 2L)),
      pat, contiguous = true).collect()
    assert(skipB.length === 1 && skipB.head.getLong(2) === 2L)
    // A B B C: opt means ONE b; two contiguous b's defeat both variants
    val double = EventAnalytics.matchSteps(
      seqDf((4L, "a", 1000000L, 1L), (4L, "b", 2000000L, 2L),
        (4L, "b", 3000000L, 3L), (4L, "c", 4000000L, 4L)),
      pat, contiguous = true).collect()
    assert(double.isEmpty)
  }

  test("star under contiguity takes a whole run or skips") {
    val pat = Seq("a" -> "one", "b" -> "star", "c" -> "one")
    val run = EventAnalytics.matchSteps(
      seqDf((5L, "a", 1000000L, 1L), (5L, "b", 2000000L, 2L),
        (5L, "b", 3000000L, 3L), (5L, "c", 4000000L, 4L)),
      pat, contiguous = true).collect()
    assert(run.length === 1 && run.head.getLong(2) === 4L)
    val skip = EventAnalytics.matchSteps(
      seqDf((6L, "a", 1000000L, 1L), (6L, "c", 2000000L, 2L)),
      pat, contiguous = true).collect()
    assert(skip.length === 1 && skip.head.getLong(2) === 2L)
  }

  test("within bounds anchor-to-end; guards use the exclusive rule") {
    // gap 10s > within 5s
    val late = EventAnalytics.matchSteps(
      seqDf((7L, "a", 1000000L, 1L), (7L, "b", 11000000L, 2L)),
      Seq("a" -> "one", "b" -> "one"), withinSec = 5L).collect()
    assert(late.isEmpty)
    // a guard event AT the match's exact microsecond does not refute
    val tie = EventAnalytics.matchSteps(
      seqDf((8L, "a", 1000000L, 1L), (8L, "b", 2000000L, 2L),
        (8L, "x", 2000000L, 3L)),
      Seq("a" -> "one", "b" -> "one"), guards = Map(1 -> Seq("x"))).collect()
    assert(tie.length === 1)
  }

  test("anchor granularity is per event, like the fixed operator") {
    // two A's in a row, non-contiguous pattern: both anchor
    val m = EventAnalytics.matchSteps(
      seqDf((9L, "a", 1000000L, 1L), (9L, "a", 2000000L, 2L),
        (9L, "b", 3000000L, 3L)),
      Seq("a" -> "one", "b" -> "one")).collect()
    assert(m.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L))
  }
}
