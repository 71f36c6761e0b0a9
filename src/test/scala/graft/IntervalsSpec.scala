package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Intervals

/** The bucketed interval join must equal the brute-force theta join —
  * completeness (no shared-bucket miss) and exactly-once pair emission
  * (first-shared-bucket dedup) in one differential check. */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ints(rows: (Long, Long, Long)*) = rows.toDF("id", "s", "e")

  test("bucketed overlap join equals brute force across bucket widths") {
    // spans from sub-bucket to many-bucket, touching edges, exact dups
    val fx = ints((1L to 60L).map(i =>
      (i, (i * 13) % 97, (i * 13) % 97 + (i % 29) + 1)): _*)
    val brute = fx.alias("a").join(fx.alias("b"),
      col("a.id") < col("b.id") &&
        col("a.s") < col("b.e") && col("b.s") < col("a.e"))
      .select(col("a.id"), col("b.id"),
        (least(col("a.e"), col("b.e")) - greatest(col("a.s"), col("b.s"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    for (w <- Seq(1L, 4L, 32L, 1000L)) {
      val got = Intervals.overlapJoin(fx, fx, bucket = w, selfPairs = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute, s"bucket=$w")
    }
  }

  test("touching intervals ([0,5) and [5,9)) do not overlap") {
    val out = Intervals.overlapJoin(
      ints((1L, 0L, 5L), (2L, 5L, 9L)), ints((1L, 0L, 5L), (2L, 5L, 9L)),
      bucket = 4, selfPairs = true).collect()
    assert(out.isEmpty)
  }

  test("degenerate intervals (e <= s) are filtered, never emit pairs") {
    // [7,7) is empty and [9,3) is inverted: without the s < e guard the
    // descending sequence() would still explode them into buckets and
    // they could surface with overlap = 0 against [0,100)
    val fx = ints((1L, 0L, 100L), (2L, 7L, 7L), (3L, 9L, 3L), (4L, 50L, 60L))
    val got = Intervals.overlapJoin(fx, fx, bucket = 8, selfPairs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 4L, 10L)))
  }

  test("coverage merges overlapping and touching intervals into islands per key") {
    // key 1: [0,10) + [5,15) + [15,20) chain into one island (touching
    // merges); [30,40) opens a second. key 2: containment absorbs.
    // Empty [50,50) dropped.
    val df = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 15L, 20L), (1L, 30L, 40L),
      (2L, 0L, 100L), (2L, 10L, 20L), (2L, 50L, 50L))
      .toDF("k", "s", "e")
    val out = Intervals.coverage(df, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out((1L, 1L)) === ((0L, 20L, 3L, 20L)))
    assert(out((1L, 2L)) === ((30L, 40L, 1L, 10L)))
    assert(out((2L, 1L)) === ((0L, 100L, 2L, 100L)))
    assert(out.size === 3)
  }
}
