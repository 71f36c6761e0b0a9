package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-SHAPE pins for the round-13 window/join families —
  * [[PlanAuditSpec]] forbids the globally scale-hostile operators;
  * these assert the POSITIVE claims the operators were designed
  * around, so a refactor that silently adds a second shuffle or
  * degrades a broadcast fails here, not in a cluster.
  *
  * The window family (as-of, CEP, coverage, feature table) must be
  * exactly ONE data shuffle: every window/groupBy stage reuses the
  * user-key hash partitioning, and the only other exchange is the
  * output-determinism range sort. */
class R13PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }
  private def count(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("one-shuffle window family: a single hashpartitioning exchange each") {
    for ((name, windows) <- Seq(
      "q238_asof_join" -> 1, "q257_event_pattern" -> 2,
      "q261_interval_coverage" -> 2, "q266_feature_table" -> 4)) {
      val p = formatted(name)
      assert(count(p, "Arguments: hashpartitioning") === 1,
        s"$name must shuffle the data exactly once:\n$p")
      assert(count(p, "\\(\\d+\\) Window") === windows, name)
      assert(!p.contains("Join"), s"$name must not join")
    }
  }

  test("weighted sample plans as TakeOrderedAndProject, never a global sort") {
    val p = formatted("q245_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(count(p, "Arguments: rangepartitioning") === 0,
      s"bottom-k must not range-shuffle the corpus:\n$p")
  }

  test("coherent sample keeps the user filter a broadcast semi-join") {
    val p = formatted("q264_coherent_sample")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("FK checks broadcast all six parent sides") {
    val p = formatted("q247_fk_check")
    assert(count(p, "\\(\\d+\\) BroadcastHashJoin") === 6, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "no parent should sort-merge")
  }
}
