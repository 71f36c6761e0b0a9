package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AssetFingerprint

/** The temporal energy fingerprint: bits match hand-computed energies,
  * a tail edit leaves prefix bits intact, and the prefix-bucketed
  * near-dup join pairs exactly the planted twins. */
class AssetFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Asset of n frames where frame i is 4 copies of byte b(i) — frame
    * energy is 4·b(i), so the expected bit string is b's slope. */
  private def asset(levels: Seq[Int]): Array[Byte] =
    levels.flatMap(b => Seq.fill(4)(b.toByte)).toArray

  private def fingerprints(rows: Seq[(Long, Array[Byte])]) =
    AssetFingerprint.temporalFingerprint(
      rows.toDF("asset_id", "content"), frameBytes = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap

  test("bits follow the frame-energy slope exactly") {
    val fps = fingerprints(Seq(
      1L -> asset(Seq(10, 20, 15, 15, 40)), // up, down, flat(=0), up
      2L -> asset(Seq(90, 80, 70))))        // strictly descending
    assert(fps(1L) === (5, "1001"))
    assert(fps(2L) === (3, "00"))
  }

  test("assets shorter than two frames drop out") {
    val fps = fingerprints(Seq(1L -> asset(Seq(10)), 2L -> Array[Byte](1, 2)))
    assert(fps.isEmpty)
  }

  test("a tail edit flips only trailing bits; the twin join finds exactly the planted pair") {
    // levels stay < 128: the ASCII energy path decodes single bytes
    val base = (0 until 40).map(i => 30 + (i * 37 % 97)) // pseudo-random walk
    val edited = base.dropRight(4) ++ Seq(0, 0, 0, 0)    // rewrite last 4 frames
    val unrelated = (0 until 40).map(i => 30 + (i * 53 % 89))
    val fps = AssetFingerprint.temporalFingerprint(
      Seq(1L -> asset(base), 2L -> asset(edited), 3L -> asset(unrelated))
        .toDF("asset_id", "content"), frameBytes = 4)
    val byId = fps.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(1L).take(30) === byId(2L).take(30)) // prefix untouched
    val pairs = AssetFingerprint.nearDupPairs(fps, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
