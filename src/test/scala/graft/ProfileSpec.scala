package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profile

/** Pins the profiler's per-column statistics on a constructed table
  * with planted nulls and duplicates. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profileTable: nulls, exact distincts, typed min/max slots") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("a")),
      (Some(2L), None), (None, Some("c")))
      .toDF("x", "s")
    val out = Profile.profileTable(df, numCols = Seq("x"), strCols = Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = out("x")
    assert(x.getLong(1) === 4L)      // n_rows
    assert(x.getLong(2) === 1L)      // n_null
    assert(x.getLong(3) === 2L)      // n_distinct (nulls excluded)
    assert(x.getDouble(4) === 1.0 && x.getDouble(5) === 2.0)
    assert(x.isNullAt(6) && x.isNullAt(7)) // string slots empty
    val s = out("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) === "a" && s.getString(7) === "c")
  }

  test("fkCheck counts orphans and null FKs separately, dedups orphan keys") {
    // parents 1,2 (2 duplicated — must not multiply child rows);
    // children: two valid, two orphans on key 9, one orphan on key 8,
    // one NULL FK (not an orphan)
    val parent = Seq(1L, 2L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L), Some(8L), None)
      .toDF("fk")
    val r = Profile.fkCheck(Seq(
      Profile.FkRelation("c->p", child, "fk", parent, "pk"))).collect().head
    assert(r.getString(0) === "c->p")
    assert(r.getLong(1) === 6L) // n_child unchanged by dup parent keys
    assert(r.getLong(2) === 1L) // n_null_fk
    assert(r.getLong(3) === 3L) // n_orphans
    assert(r.getLong(4) === 2L) // n_orphan_keys {8, 9}
  }

  test("tableDiff: multiset semantics — duplicate cardinality differences surface") {
    val a = Seq(1L, 2L, 2L, 3L).toDF("x")
    val b = Seq(1L, 2L, 4L, 4L).toDF("x")
    // common multiset {1, 2}; a-only {2, 3}; b-only {4, 4}
    val r = Profile.tableDiff(a, b).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 2L)))
    intercept[IllegalArgumentException] {
      Profile.tableDiff(a, b.withColumnRenamed("x", "y"))
    }
  }
}
