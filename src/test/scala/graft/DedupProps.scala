package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property behind `Dedup.simhashNearDupsExact`: the
  * pigeonhole block decomposition. For ANY two B-bit fingerprints
  * within hamming distance k, splitting both into k+1 contiguous
  * blocks (the same boundary arithmetic as the operator) yields at
  * least one block-wise exact match — so the union of per-block
  * equi-joins is a complete candidate set. */
object DedupProps extends Properties("DedupBlocks") {

  private val bits = 16

  private def blocks(s: String, nBlocks: Int): Seq[String] =
    (0 until nBlocks).map { i =>
      val start = i * bits / nBlocks
      val end = (i + 1) * bits / nBlocks
      s.substring(start, end)
    }

  private val genBits: Gen[String] =
    Gen.listOfN(bits, Gen.oneOf('0', '1')).map(_.mkString)

  private val genPairWithinK: Gen[(String, String, Int)] = for {
    a <- genBits
    k <- Gen.chooseNum(0, 4)
    flips <- Gen.pick(k, 0 until bits)
  } yield {
    val b = a.toCharArray
    flips.foreach(i => b(i) = if (b(i) == '0') '1' else '0')
    (a, new String(b), k)
  }

  property("pairs within hamming k share a block under k+1 blocks") =
    forAll(genPairWithinK) { case (a, b, k) =>
      val ba = blocks(a, k + 1)
      val bb = blocks(b, k + 1)
      ba.zip(bb).exists { case (x, y) => x == y }
    }

  property("block boundaries partition the fingerprint exactly") =
    forAll(genBits, Gen.chooseNum(1, 8)) { (a, nBlocks) =>
      blocks(a, nBlocks).mkString == a
    }
}
