package graft.lake

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Delta RESTORE: one history-preserving commit that re-points the
  * table at an earlier version's content — removes for files added
  * since, re-adds for files removed since, metaData re-declared when
  * it evolved, and a fail-loud guard when vacuum already reclaimed a
  * file the target needs. */
class DeltaRestoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def orders = Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def commitLines(root: Path, v: Long): Seq[String] =
    Files.readAllLines(root.resolve("_delta_log")
      .resolve(f"$v%020d.json")).asScala.toSeq

  test("restore rewinds content in one commit and preserves history") {
    val a = orders.filter(col("o_orderkey") % 2 === 0)
    val b = orders.filter(col("o_orderkey") % 2 === 1)
    val t = LakeTable.createTemp(spark, a.repartition(2))
    t.append(b.repartition(2))
    val dest = TempDirs.create("graft-rest1").resolve("t")
    assert(DeltaInterop.exportHistory(t, dest) === 2)
    val full = DeltaInterop.readDelta(spark, dest).count()
    val v0 = DeltaInterop.readDelta(spark, dest, version = 0L).count()

    val r = DeltaInterop.restore(spark, dest, toVersion = 0L)
    assert(r === DeltaInterop.RestoreResult(0, 2, 2L))
    assert(DeltaInterop.readDelta(spark, dest).count() === v0)
    // history preserved: the pre-restore version still time-travels
    assert(DeltaInterop.readDelta(spark, dest, version = 1L).count() === full)
    // the restore commit's actions are dataChange=true removes
    val lines = commitLines(dest, 2L)
    assert(lines.count(_.contains("\"remove\"")) === 2)
    assert(lines.forall(l =>
      !l.contains("\"remove\"") || l.contains("\"dataChange\":true")))

    // forward restore re-adds the removed files
    val f = DeltaInterop.restore(spark, dest, toVersion = 1L)
    assert(f === DeltaInterop.RestoreResult(2, 0, 3L))
    assert(DeltaInterop.readDelta(spark, dest).count() === full)
  }

  test("restore to the current version is a no-op commit-free") {
    val t = LakeTable.createTemp(spark, orders.limit(10).repartition(1))
    val dest = TempDirs.create("graft-rest2").resolve("t")
    DeltaInterop.exportHistory(t, dest)
    val r = DeltaInterop.restore(spark, dest, toVersion = 0L)
    assert(r === DeltaInterop.RestoreResult(0, 0, 0L))
    assert(!Files.exists(dest.resolve("_delta_log")
      .resolve(f"${1L}%020d.json")))
  }

  test("restore re-declares evolved-away metaData") {
    val t = LakeTable.createTemp(spark,
      orders.select(col("o_orderkey"), col("o_totalprice")).limit(20)
        .repartition(1))
    // schema evolves at commit 1
    t.append(orders.limit(5).repartition(1))
    val dest = TempDirs.create("graft-rest3").resolve("t")
    assert(DeltaInterop.exportHistory(t, dest) === 2)
    assert(DeltaInterop.readDelta(spark, dest)
      .columns.contains("o_orderstatus"))
    DeltaInterop.restore(spark, dest, toVersion = 0L)
    val lines = commitLines(dest, 2L)
    assert(lines.exists(_.contains("\"metaData\"")),
      "restore across a schema evolution must re-declare the old schema")
    assert(!DeltaInterop.readDelta(spark, dest)
      .columns.contains("o_orderstatus"))
  }

  test("restore refuses when the target's files were vacuumed") {
    val t = LakeTable.createTemp(spark,
      orders.filter(col("o_orderkey") % 2 === 0).repartition(1))
    t.append(orders.filter(col("o_orderkey") % 2 === 1).repartition(1))
    val dest = TempDirs.create("graft-rest4").resolve("t")
    DeltaInterop.exportHistory(t, dest)
    DeltaInterop.restore(spark, dest, toVersion = 0L)
    // vacuum reclaims the tombstoned commit-1 file...
    assert(DeltaInterop.vacuumDelta(spark, dest) === 1)
    // ...so restoring forward to it must abort BEFORE any log write
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.restore(spark, dest, toVersion = 1L)
    }
    assert(e.getMessage.contains("vacuumed"))
    assert(!Files.exists(dest.resolve("_delta_log")
      .resolve(f"${3L}%020d.json")))
  }
}
