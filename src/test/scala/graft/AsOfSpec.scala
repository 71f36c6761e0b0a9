package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

/** Pins for the point-in-time join's boundary semantics: inclusive
  * at-or-before, deterministic equal-time tie-break, left (null)
  * behavior, and the whole-row payload carry. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pointInTimeJoin: latest at-or-before, inclusive boundary, left nulls") {
    val obs = Seq((1L, 5L, 100L), (1L, 10L, 101L), (2L, 1L, 102L))
      .toDF("k", "ts", "oid")
    val feat = Seq((1L, 3L, 10L, "A"), (1L, 5L, 11L, "B"), (1L, 7L, 12L, "C"))
      .toDF("k", "ts", "fid", "v")
    val out = AsOf.pointInTimeJoin(obs, feat, "k", "ts", "oid", "fid",
        Seq("v"))
      .collect().map(r => r.getLong(1) ->
        (Option(r.getAs[String]("asof_v")),
          Option(r.getAs[Any]("asof_fid")))).toMap
    assert(out(100L) === ((Some("B"), Some(11L)))) // equal ts matches
    assert(out(101L) === ((Some("C"), Some(12L))))
    assert(out(102L) === ((None, None))) // no feature for key 2
  }

  test("pointInTimeJoin: equal-time features resolve to greatest tie, payload stays one row") {
    // two features at ts=4: fid 20 (value 1.0) and fid 21 (value NULL).
    // The greatest tie (21) must win AND carry ITS null value — a
    // per-column carry would mix fid 21 with fid 20's value.
    val obs = Seq((1L, 6L, 100L)).toDF("k", "ts", "oid")
    val feat = Seq((1L, 4L, 20L, Some(1.0)), (1L, 4L, 21L, None))
      .toDF("k", "ts", "fid", "v")
    val r = AsOf.pointInTimeJoin(obs, feat, "k", "ts", "oid", "fid",
      Seq("v")).collect().head
    assert(r.getAs[Long]("asof_fid") === 21L)
    assert(r.isNullAt(r.fieldIndex("asof_v")))
  }
}
