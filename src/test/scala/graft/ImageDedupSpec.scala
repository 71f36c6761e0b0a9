package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageOps
import graft.operators.ImageDedup
import graft.queries.ParityQ

/** Perceptual image dedup (VERDICT r7 next #2): the dHash fingerprint
  * is deterministic through a real PNG encode/decode round trip, the
  * planted fixture twins land at their constructed distances, and the
  * pigeonhole block join has EXACT recall vs brute force. */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureHash(img: Int): String =
    ImageOps.dHash64(ParityQ.phashFixturePng(img)).get

  /** The hash the formula predicts, bypassing the codec entirely. */
  private def formulaHash(img: Int): String = {
    val sb = new StringBuilder
    for (gy <- 0 until 8; gx <- 0 until 8) {
      val a = ParityQ.phashFixtureV(img, 2 * gx, 2 * gy)
      val b = ParityQ.phashFixtureV(img, 2 * (gx + 1), 2 * gy)
      sb.append(if (b > a) '1' else '0')
    }
    sb.toString
  }

  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  test("dHash of a solid image is all zeros; undecodable bytes hash to None") {
    assert(ImageOps.dHash64(ImageOps.solidPng(20, 20, 80, 90, 100)).contains("0" * 64))
    assert(ImageOps.dHash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("dHash through the PNG codec equals the closed-form pixel formula") {
    (0 until 100).foreach { img =>
      assert(fixtureHash(img) === formulaHash(img), s"img $img codec/formula mismatch")
    }
  }

  test("planted twins: between-sample noise is hash-identical; sampled-cell edits stay <= 4 bits") {
    (0 until 40).foreach { b =>
      assert(hamming(fixtureHash(b), fixtureHash(b + 40)) === 0, s"variant1 of base $b")
    }
    (0 until 20).foreach { b =>
      val d = hamming(fixtureHash(b), fixtureHash(b + 80))
      assert(d <= 4, s"variant2 of base $b drifted to $d bits")
    }
  }

  test("block join finds exactly the brute-force pair set (exact recall)") {
    import spark.implicits._
    val hashes = (0 until 100).map(i => (i.toLong, fixtureHash(i)))
    val truth = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && hamming(ha, hb) <= 4
    } yield (ia, ib, hamming(ha, hb).toLong)).sorted
    val got = ImageDedup.nearDupPairs(hashes.toDF("img_id", "dhash"), maxHamming = 4)
      .orderBy("img_a", "img_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === truth)
    assert(truth.nonEmpty, "fixture planted no pairs — the test proves nothing")
    // every base must pair with its hash-identical variant-1 twin
    (0 until 40).foreach { b =>
      assert(truth.contains((b.toLong, (b + 40).toLong, 0L)), s"missing twin pair $b")
    }
  }

  test("imageClusters: exact-dup images collapse onto hash vertices; planted components form") {
    import spark.implicits._
    val rows = (0 until 100).map(i => (i.toLong, ParityQ.phashFixturePng(i)))
    val clusters = ImageDedup.imageClusters(rows.toDF("img_id", "content"), maxHamming = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clusters.size === 100)
    // variant-1 twins share the base's hash, so always the base's cluster
    (0 until 40).foreach(b => assert(clusters(b) === clusters(b + 40), s"base $b twin"))
    // variant-2 edits sit within 4 bits of the base, so CC joins them
    (0 until 20).foreach(b => assert(clusters(b) === clusters(b + 80), s"base $b edit"))
    // the label is the component-min fingerprint: a member's own hash
    val hashes = ImageDedup.dHashes(rows.toDF("img_id", "content"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    clusters.foreach { case (_, lbl) =>
      assert(hashes.values.exists(_ === lbl), "cluster label must be a member hash")
    }
  }

  test("hashNearDupPairs equals nearDupPairs collapsed to hash granularity") {
    import spark.implicits._
    val hs = (0 until 100).map(i => (i.toLong, fixtureHash(i))).toDF("img_id", "dhash")
    val byHash = ImageDedup.hashNearDupPairs(hs, maxHamming = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val fromPairs = ImageDedup.nearDupPairs(hs, maxHamming = 4)
      .collect().map { r => (fixtureHash(r.getLong(0).toInt), fixtureHash(r.getLong(1).toInt)) }
      .collect { case (a, b) if a != b => if (a < b) (a, b) else (b, a) }.toSet
    assert(byHash === fromPairs)
  }

  test("end-to-end imageNearDups over binary rows matches the staged pipeline") {
    import spark.implicits._
    val rows = (0 until 60).map(i => (i.toLong, ParityQ.phashFixturePng(i)))
    val pairs = ImageDedup.imageNearDups(rows.toDF("img_id", "content"), maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 20).foreach { b =>
      assert(pairs.contains((b.toLong, (b + 40).toLong)), s"missing $b twin")
    }
  }
}
