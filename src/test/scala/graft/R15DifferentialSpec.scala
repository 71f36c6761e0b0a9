package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

/** Differential pins for the r15 incremental-quantile path:
  * [[Stats.exactRankStatsWeighted]] over arbitrary count-fragment
  * partitions must reproduce [[Stats.exactRankStats]] over the raw
  * rows bit-for-bit — additivity is the whole correctness argument
  * for the q286 streaming maintenance, so it is pinned directly. */
class R15DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(1515)
  // heavy ties, negatives, and a skewed tail — the rank-edge diet
  private val rows: Seq[(String, Long)] =
    (1 to 4000).map { _ =>
      val g = s"g${rnd.nextInt(5)}"
      val v = rnd.nextInt(12) match {
        case 0 => -(rnd.nextInt(1000).toLong)
        case 1 => 1000000L + rnd.nextInt(50)
        case _ => rnd.nextInt(40).toLong
      }
      (g, v)
    }

  test("weighted fragments (any split) ≡ batch exactRankStats") {
    val raw = rows.toDF("g", "v")
    val batch = Stats.exactRankStats(raw, "g", "v")
      .orderBy("g").collect().map(_.toSeq).toSeq
    // three different fragmentations: 1 fragment, 4 random fragments,
    // 16 fragments with one empty — all must merge to the same answer
    Seq(1, 4, 16).foreach { parts =>
      val tagged = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, rnd.nextInt(parts)) }
      val frags = tagged.toDF("g", "v", "part")
        .groupBy(col("part"), col("g"), col("v"))
        .agg(count(lit(1)).as("c"))
        .drop("part") // fragments stay separate rows: the merge is
                      // exactRankStatsWeighted's job, not the caller's
      val merged = Stats.exactRankStatsWeighted(frags, "g", "v", "c")
        .orderBy("g").collect().map(_.toSeq).toSeq
      assert(merged === batch, s"fragmentation into $parts parts drifted")
    }
  }

  test("weighted handles multi-count fragments and duplicate keys") {
    // two fragments both carrying (g, 5) with different counts: the
    // read-side sum must see 5 occurrences total (rank arithmetic is
    // exercised because 5 is the p50 of the 9-value multiset)
    val frags = Seq(
      ("a", 1L, 2L), ("a", 5L, 2L), ("a", 9L, 1L),
      ("a", 5L, 3L), ("a", 2L, 1L)
    ).toDF("g", "v", "c")
    val got = Stats.exactRankStatsWeighted(frags, "g", "v", "c").collect()(0)
    // multiset: 1,1,2,5,5,5,5,5,9 (n=9) -> p25=rk2=1, p50=rk5=5,
    // p75=rk7=5, p90=rk9=9
    assert(got.getAs[Long]("n") === 9L)
    assert(got.getAs[Long]("min_v") === 1L)
    assert(got.getAs[Long]("p25") === 1L)
    assert(got.getAs[Long]("p50") === 5L)
    assert(got.getAs[Long]("p75") === 5L)
    assert(got.getAs[Long]("p90") === 9L)
    assert(got.getAs[Long]("max_v") === 9L)
  }
}
