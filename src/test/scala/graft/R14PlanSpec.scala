package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Round-14 plan-shape pins.
  *
  * 1. The r13 verdict's one weak plan — q262's global
  *    `Window.orderBy` rank over the users-sized gap relation — is
  *    replaced by distributed exact selection (staged value-count
  *    artifact → ≤1025-bucket prefix fold → in-bucket partitioned
  *    rank). The pin asserts the scale-killer cannot come back: no
  *    unpartitioned WindowExec anywhere in the plan, and the one
  *    remaining window is the bucket-partitioned rank pass.
  *
  * 2. Positive shape pins for the legacy heavy batch families that
  *    [[PlanAuditSpec]] only guarded negatively (no BNLJ/Cartesian) —
  *    a refactor that silently downgraded a broadcast chain to
  *    sort-merge, or added a data shuffle to the minhash band join,
  *    passes the negative audit but fails here. */
class R14PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def df(name: String) = SparkEntry.queries(name)(spark, sf)
  private def formatted(name: String): String =
    df(name).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  private def count(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("q262: no unpartitioned WindowExec — distributed selection only") {
    val p = df("q262_conversion_latency").queryExecution.sparkPlan
    val wins = p.collect { case w: WindowExec => w }
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"q262 regressed to a global single-partition window:\n$p")
    // exactly the one in-bucket rank pass survives
    assert(wins.size === 1, s"expected one bucket-partitioned window:\n$p")
    val f = formatted("q262_conversion_latency")
    // both data shuffles hash on the bucket key; everything else is a
    // one-row / ≤1025-row aggregate collapse
    assert(count(f, "Arguments: hashpartitioning\\(b#") === 2, f.take(3000))
    assert(count(f, "Arguments: rangepartitioning") === 0,
      "q262 must not globally sort")
  }

  test("q34: minhash band join stays an all-broadcast equi-join chain") {
    val f = formatted("q34_minhash_pairs")
    assert(count(f, "\\(\\d+\\) BroadcastHashJoin") === 7,
      s"band/verify joins must all broadcast at this SF:\n${f.take(3000)}")
    assert(!f.contains("SortMergeJoin"), "band join lost a broadcast")
    // signature build + band rollup + verify: the measured shuffle set
    assert(count(f, "Arguments: hashpartitioning") === 12,
      "a data shuffle crept into the minhash pipeline")
  }

  test("q141 (TPC-H Q3): two broadcast dims and a TakeOrdered top-k") {
    val f = formatted("q141_shipping_priority")
    assert(count(f, "\\(\\d+\\) BroadcastHashJoin") === 2, f.take(2000))
    assert(!f.contains("SortMergeJoin"), "dimension join lost its broadcast")
    assert(f.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    assert(count(f, "Arguments: hashpartitioning") === 1,
      "Q3 shuffles exactly once (the groupBy)")
  }

  test("q148 (TPC-H Q5): the full six-table chain rides broadcasts") {
    val f = formatted("q148_local_supplier_revenue")
    assert(count(f, "\\(\\d+\\) BroadcastHashJoin") === 7, f.take(2000))
    assert(!f.contains("SortMergeJoin"), "the Q5 chain lost a broadcast")
    assert(count(f, "Arguments: hashpartitioning") === 1,
      "Q5 shuffles exactly once (the revenue groupBy)")
  }

  test("q283: grouped selection — no unpartitioned window, no nested loop") {
    val p = df("q283_grouped_quantiles").queryExecution.sparkPlan
    val wins = p.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"grouped selection regressed to a global window:\n$p")
    val loops = p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(loops.isEmpty,
      s"the stats relation must join by hash on the group key:\n$p")
  }

  test("q268: every CEP transition is a hash-family equi join") {
    val p = df("q268_cep_steps").queryExecution.sparkPlan
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty, "the transition chain must exist")
    val loops = p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(loops.isEmpty, s"a transition lost its user+id equi-key:\n$p")
    // and the only global sort is the query's own deterministic output
    // ordering — pattern matching itself must not range-shuffle
    val f = formatted("q268_cep_steps")
    assert(count(f, "Arguments: rangepartitioning") <= 1, f.take(2000))
  }

  test("q199 candidate generator: coarse-bucket prescreen is an equi join") {
    // the staged q199 pipeline checkpoints eagerly, so pin the
    // generator itself: the label (coarse bucket) must be extracted
    // as a hash-join key — losing it turns the prescreen quadratic
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = graft.operators.Similarity.embeddingNearDups(emb, 0.9)
      .queryExecution.sparkPlan
    val equi = p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    val loops = p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(loops.isEmpty, s"prescreen lost its bucket equi-key:\n$p")
    assert(equi.exists(_.leftKeys.exists(_.toString.contains("label"))),
      s"no join keyed on the coarse bucket:\n$p")
  }
}
