package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Round-15 plan-shape pins.
  *
  * 1. q232 (inverted index) — the r14 verdict's one un-pinned
  *    optimizer dependency: the old global `row_number().over(
  *    Window.orderBy)` + rank filter was only scale-safe through
  *    Spark's InferWindowGroupLimit. The rewrite takes the top-k
  *    FIRST (TakeOrderedAndProject — per-partition heap, k-row merge)
  *    and ranks only the ≤topK survivors, so a vocabulary-sized
  *    relation can never sort on one partition. The pin fails if the
  *    top-k ever degrades back to a global sort.
  *
  * 2. stageEventsByTime (streaming test harness) — r14 verdict #4:
  *    the old global-ntile staging pushed the whole events table
  *    through one WindowExec partition. The range-partitioned rewrite
  *    must keep the drain contract the streaming family depends on:
  *    file k = the k-th event-time range (non-overlapping, ascending)
  *    AND ascending modification times, because FileStreamSource
  *    drains in mtime order, not name order. */
class R15PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def df(name: String) = SparkEntry.queries(name)(spark, sf)
  private def formatted(name: String): String =
    df(name).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  private def count(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("q232: top-k before rank — TakeOrdered, no vocab-sized sort") {
    val f = formatted("q232_inverted_index")
    assert(f.contains("TakeOrderedAndProject"),
      s"the df top-k must be a distributed TakeOrdered:\n${f.take(3000)}")
    // the only single-partition work is the rank over the ≤topK
    // survivors; the vocabulary must never range-shuffle
    assert(count(f, "Arguments: rangepartitioning") === 0,
      s"q232 globally sorted a vocabulary-sized relation:\n${f.take(3000)}")
    // the bounded top-k side broadcasts into the postings join
    assert(count(f, "\\(\\d+\\) BroadcastHashJoin") >= 1,
      s"top-k join lost its broadcast:\n${f.take(3000)}")
    // every WindowExec in the plan sits ABOVE the global limit (its
    // input is ≤topK rows), except the per-token postings window
    // which is partitioned by tok
    val p = df("q232_inverted_index").queryExecution.sparkPlan
    val unpart = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w }
    unpart.foreach { w =>
      val limited = w.collectFirst {
        case g: org.apache.spark.sql.execution.GlobalLimitExec => g
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(limited.nonEmpty,
        s"unpartitioned window not fed by a global limit:\n$w")
    }
  }

  test("q285: alternation transitions stay hash-family equi joins") {
    // the q268 pin, carried to the set-step operator: alternation must
    // not cost a join shape — set-nexts are least() over the same
    // staged carries, set runs one more window column, transitions the
    // same user+id equi-joins
    val p = df("q285_cep_alternation").queryExecution.sparkPlan
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty, "the transition chain must exist")
    val loops = p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(loops.isEmpty, s"a transition lost its user+id equi-key:\n$p")
    val f = formatted("q285_cep_alternation")
    assert(count(f, "Arguments: rangepartitioning") <= 1, f.take(2000))
  }

  test("q286: weighted selection read-side — no unpartitioned window, " +
    "no nested loop (q283's pin on the incremental path)") {
    // the returned df is the read-side plan (fragment merge + weighted
    // selection); the drain itself ran eagerly during construction
    val p = df("q286_stream_quantile_exact").queryExecution.sparkPlan
    val wins = p.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"weighted selection regressed to a global window:\n$p")
    val loops = p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(loops.isEmpty,
      s"the fragment relation must join by hash on the group key:\n$p")
  }

  test("stageEventsByTime: chronological ranges, ascending mtimes, " +
    "no window in the staging plan") {
    import scala.jdk.CollectionConverters._
    val in = graft.streaming.MicroBatch.stageEventsByTime(
      spark, sf, parts = 4)
    val files = java.nio.file.Files.list(in).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .sortBy(_.getFileName.toString)
    assert(files.nonEmpty)
    // file k's range ends before file k+1's begins (ties co-located:
    // range partitioning never splits equal keys)
    val ranges = files.map { p =>
      val r = spark.read.parquet(p.toString)
        .agg(min(col("ts")), max(col("ts")), org.apache.spark.sql.functions.count(lit(1)))
        .collect()(0)
      (r.get(0).toString, r.get(1).toString, r.getLong(2))
    }
    ranges.foreach { case (_, _, n) => assert(n > 0) }
    ranges.sliding(2).foreach {
      case Seq((_, hiA, _), (loB, _, _)) =>
        assert(hiA <= loB, s"overlapping event-time ranges: $ranges")
      case _ =>
    }
    // FileStreamSource drains by mtime: names and mtimes must agree
    val mtimes = files.map(p =>
      java.nio.file.Files.getLastModifiedTime(p).toMillis)
    assert(mtimes === mtimes.sorted && mtimes.distinct.size === mtimes.size,
      s"staged mtimes must be strictly ascending in name order: $mtimes")
    // and the staging computation itself carries no window operator
    val plan = spark.read.parquet(s"$sf/events.parquet")
      .repartitionByRange(4, col("ts"))
      .sortWithinPartitions(col("ts"))
      .queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "staging must not re-grow a global window")
  }
}
