package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties behind `operators.Quantiles`, stated on the
  * pure sketch arithmetic the relational implementation mirrors
  * (bucket = cents DIV width; merge = per-bucket addition; estimate =
  * upper edge of the bucket where the cumulative count first reaches
  * ceil(pct/100 · n)):
  *  - losslessness: ANY sharding of the data merges to exactly the
  *    global sketch (associativity + commutativity follow — integer
  *    addition — so the spec's fixed 3-shard test generalizes);
  *  - the deterministic error bound: the reported edge is strictly
  *    above the true target-rank value, at most one bucket width
  *    above it, and its rank meets the target.
  * `QuantileSketchSpec` pins the same facts on the Spark
  * implementation over lineitem; the q147/q149 oracles pin it against
  * DuckDB. These properties justify the arithmetic for ALL inputs. */
object QuantileProps extends Properties("QuantileSketch") {

  // floor division, not truncating / — matches the Spark impl's
  // (cents - pmod(cents, w)) DIV w, so bucket b covers [b·w, (b+1)·w)
  // over the whole SIGNED domain (r8 wrong #2)
  private def sketch(cents: Seq[Long], w: Long): Map[Long, Long] =
    cents.groupBy(Math.floorDiv(_, w)).view.mapValues(_.size.toLong).toMap

  private def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap

  /** Upper edge of the crossing bucket, in cents. */
  private def edge(sk: Map[Long, Long], w: Long, n: Long, pct: Int): Long = {
    val target = (n * pct + 99) / 100
    var cum = 0L
    val crossing = sk.keys.toSeq.sorted.find { b =>
      cum += sk(b); cum >= target
    }.get
    (crossing + 1) * w
  }

  // the domain includes NEGATIVE cents: floor-division bucketing must
  // hold on signed data (truncating DIV would fold (-w, 0) into the
  // [0, w) bucket and break both properties)
  private val gen = for {
    cents <- Gen.nonEmptyListOf(Gen.chooseNum(-10000000L, 10000000L))
    w <- Gen.chooseNum(1L, 100000L)
    pct <- Gen.chooseNum(1, 100)
    seed <- Gen.chooseNum(2, 7)
  } yield (cents, w, pct, seed)

  property("any sharding merges losslessly to the global sketch") = forAll(gen) {
    case (cents, w, _, shards) =>
      val parts = cents.zipWithIndex.groupBy(_._2 % shards).values
        .map(p => sketch(p.map(_._1), w))
      parts.foldLeft(Map.empty[Long, Long])(merge) == sketch(cents, w)
  }

  property("edge is above the true quantile, within one width, and meets the rank") =
    forAll(gen) { case (cents, w, pct, _) =>
      val n = cents.size.toLong
      val target = (n * pct + 99) / 100
      val trueQ = cents.sorted.apply(target.toInt - 1)
      val e = edge(sketch(cents, w), w, n, pct)
      e > trueQ && e - trueQ <= w && cents.count(_ < e) >= target
    }
}
