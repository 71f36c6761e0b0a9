package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Pins for the r15 distributed in-group rank rewiring: featureScale /
  * winsorize / rankCorrelation / quantileBin used to rank through a
  * window partitioned ONLY by the group key — with few groups (event
  * types, languages) that funnels a corpus-sized group through one
  * partition, the q262 scale-killer class. They now ride
  * `Stats.rankInGroup` (bucket counts → bounded offset window over the
  * AGGREGATE relation → (group, bucket)-partitioned exact order).
  *
  *  1. Differential: rankInGroup ≡ the plain global window at several
  *     bucket widths, on tie-heavy data with negative values.
  *  2. ntile re-derivation: the arithmetic bin formula ≡ window
  *     `ntile(k)` across n/k edge shapes.
  *  3. Plan pins: in the four gated queries, every WindowExec
  *     partitioned by fewer than two columns must consume an
  *     AGGREGATE relation (bucket counts / group moments), never raw
  *     corpus rows. */
class R15cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(15115)
    (1 to 3000).map { i =>
      (s"g${rnd.nextInt(3)}",
        math.floor((rnd.nextDouble() - 0.5) * 2000) / 4.0, // heavy ties
        i.toLong)
    }.toDF("g", "v", "tie")
  }

  test("rankInGroup ≡ plain group window at any bucket width") {
    val df = fixture
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("tie"))
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .select("g", "tie", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    Seq(0.25, 1.0, 97.0, 1e6).foreach { bw =>
      val got = Stats.rankInGroup(df, "g", col("v"), col("tie"), "rk", bw)
        .select("g", "tie", "rk")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(got == want, s"bucketWidth=$bw diverged from the window rank")
    }
  }

  test("quantileBin's arithmetic split ≡ window ntile(k)") {
    // n per group deliberately spans n < k, n % k == 0, n % k != 0
    val rnd = new scala.util.Random(7)
    val rows = Seq("a" -> 7, "b" -> 40, "c" -> 43, "d" -> 3).flatMap {
      case (g, n) => (1 to n).map(i => (g, rnd.nextInt(20).toDouble, i.toLong))
    }
    val df = rows.toDF("g", "v", "tie")
    val k = 10
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("tie"))
    val want = df.withColumn("bin", ntile(k).over(w).cast("long"))
      .groupBy("g", "bin").agg(count(lit(1)).as("n"),
        min("v").as("lo"), max("v").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val got = Stats.quantileBin(df, k, "g", "v", "tie")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == want)
  }

  private def aggregateBelow(w: WindowExec): Boolean =
    w.child.collectFirst {
      case a: HashAggregateExec => a
      case a: ObjectHashAggregateExec => a
      case a: SortAggregateExec => a
    }.isDefined

  test("q236/q251/q279/q222/q309: narrow-partition windows only over aggregates") {
    Seq("q236_feature_scale", "q251_winsorize", "q279_quantile_bins",
      "q222_rank_corr", "q309_quantile_normalize").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan
      val wins = plan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"$name: expected the bucket-rank windows")
      wins.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"$name regressed to a GLOBAL window:\n$plan")
        if (w.partitionSpec.size < 2)
          assert(aggregateBelow(w),
            s"$name: a window partitioned only by the group key reads " +
              s"raw rows — the corpus-sized-partition hazard is back:\n$plan")
      }
    }
  }
}
