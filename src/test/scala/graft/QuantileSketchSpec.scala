package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantiles

/** The mergeable quantile sketch's two contracts (VERDICT r7 next #6):
  * merging is exactly associative/commutative/lossless, and the
  * extracted quantile obeys the deterministic rank/value error bound. */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val Width = 50000L // $500 buckets in cents

  private def li = Tables.lineitem(spark, sf)
    .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"))

  private def asMap(sk: DataFrame): Map[(String, Long), Long] =
    sk.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def shard(i: Int): DataFrame =
    Quantiles.sketch(li.filter(pmod(col("l_orderkey"), lit(3)) === i),
      Seq("l_returnflag"), "l_extendedprice", Width)

  test("merge is associative, commutative, and equals the n-ary merge") {
    val Seq(a, b, c) = (0 until 3).map(shard)
    val left = asMap(Quantiles.merge(Quantiles.merge(a, b), c))
    val right = asMap(Quantiles.merge(a, Quantiles.merge(b, c)))
    val swapped = asMap(Quantiles.merge(Quantiles.merge(c, a), b))
    val nary = asMap(Quantiles.mergeAll(
      Quantiles.sketch(li.withColumn("s", pmod(col("l_orderkey"), lit(3))),
        Seq("s", "l_returnflag"), "l_extendedprice", Width).withColumnRenamed("s", "sh")
        .select(col("l_returnflag"), col("bucket"), col("cnt"), col("sh")),
      Seq("sh")))
    assert(left === right)
    assert(left === swapped)
    assert(left === nary)
  }

  test("merged shards are lossless: identical to the sketch of all data") {
    val Seq(a, b, c) = (0 until 3).map(shard)
    val merged = asMap((a +: Seq(b, c)).reduce(Quantiles.merge))
    val global = asMap(Quantiles.sketch(li, Seq("l_returnflag"), "l_extendedprice", Width))
    assert(merged === global)
  }

  test("negative values bucket by floor division: edges stay exact on signed data") {
    import spark.implicits._
    // balances straddling zero, including the (-width, 0) strip that a
    // truncating DIV would fold into bucket 0 (r8 wrong #2)
    val vals = Seq(-1234.56, -499.99, -0.01, -500.0, -0.5, 0.0, 0.01,
      123.45, 499.99, 500.0, 777.77, -750.25)
    val df = vals.zipWithIndex.map { case (v, i) => (s"g${i % 2}", v) }
      .toDF("g", "balance")
    val sk = Quantiles.sketch(df, Seq("g"), "balance", Width)
    // every bucket b must cover [b*w, (b+1)*w): recompute from raw data
    val expected = vals.zipWithIndex
      .map { case (v, i) => (s"g${i % 2}", Math.floorDiv(Math.round(v * 100), Width)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(asMap(sk) === expected)
    // and the extracted edges keep the deterministic bound on signed data
    val est = Quantiles.quantileEdges(sk, Seq("g"), Seq(50), Width)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    vals.zipWithIndex.groupBy(t => s"g${t._2 % 2}").foreach { case (g, vs) =>
      val sorted = vs.map(_._1).sorted
      val target = (sorted.length.toLong * 50 + 99) / 100
      val trueQ = sorted(target.toInt - 1)
      val e = est(g)
      assert(e > trueQ && e - trueQ <= Width / 100.0, s"$g: edge $e vs true $trueQ")
    }
  }

  test("quantile edges obey the deterministic rank and value bounds") {
    val est = Quantiles.quantileEdges(
      Quantiles.sketch(li, Seq("l_returnflag"), "l_extendedprice", Width),
      Seq("l_returnflag"), Seq(25, 50, 75), Width)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val byFlag = li.select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byFlag.foreach { case (flag, vals) =>
      val (n, q25, q50, q75) = est(flag)
      assert(n === vals.length)
      Seq((25, q25), (50, q50), (75, q75)).foreach { case (p, e) =>
        val target = (vals.length.toLong * p + 99) / 100
        val trueQ = vals(target.toInt - 1) // value at the target rank
        // the reported upper edge sits at most one bucket above the
        // true quantile value, and strictly above it
        assert(e > trueQ, s"$flag p$p: edge $e not above true $trueQ")
        assert(e - trueQ <= Width / 100.0, s"$flag p$p: $e vs $trueQ exceeds width")
        // rank bound: every value below the crossing bucket's lower
        // edge ranks below the estimate, so rank(edge) >= target
        assert(vals.count(_ < e) >= target, s"$flag p$p rank bound")
      }
    }
  }
}
