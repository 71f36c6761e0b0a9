package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Write-audit-publish on Iceberg branches (r14): staging isolation,
  * chained stages, publish fast-forward, and the audit-failure leg
  * where dropping the ref lets expiry reclaim the staged files. */
class IcebergWapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def ev = Tables.events(spark, sf)
    .select(col("event_id"), col("event_type"), col("value"))

  private def export(): java.nio.file.Path = {
    val t = LakeTable.createTemp(spark,
      ev.filter(col("event_id") % 2 === 0), "graft-wap")
    val dest = TempDirs.create("graft-wap-spec").resolve("t")
    IcebergInterop.exportHistory(t, dest)
    dest
  }

  test("staging is invisible on main; chained stages parent on the branch tip") {
    val dest = export()
    val baseN = IcebergInterop.readIceberg(spark, dest).count()
    val b1 = ev.filter(col("event_id") % 4 === 1)
    val b2 = ev.filter(col("event_id") % 4 === 3)
    val s1 = IcebergInterop.stageAppend(spark, dest, b1, "audit")
    val s2 = IcebergInterop.stageAppend(spark, dest, b2, "audit")
    assert(s2 === s1 + 1)
    assert(IcebergInterop.readIceberg(spark, dest).count() === baseN)
    // the branch tip sees BOTH staged batches (chained parentage)
    assert(IcebergInterop.readIcebergRef(spark, dest, "audit").count()
      === baseN + b1.count() + b2.count())
    // snapshot-addressed read of the first stage sees only b1
    assert(IcebergInterop.readIceberg(spark, dest, s1).count()
      === baseN + b1.count())
    IcebergInterop.publishBranch(dest, "audit")
    assert(IcebergInterop.readIceberg(spark, dest).count()
      === baseN + b1.count() + b2.count())
  }

  test("audit failure: drop the ref and expiry reclaims exactly the staged files") {
    val dest = export()
    val before = IcebergInterop.readIceberg(spark, dest)
      .agg(count(lit(1)), sum(col("event_id"))).collect()(0)
    val bad = ev.filter(col("event_id") % 2 === 1)
      .withColumn("event_type", lit(null).cast("string"))
    IcebergInterop.stageAppend(spark, dest, bad, "audit")
    val violations = IcebergInterop.readIcebergRef(spark, dest, "audit")
      .filter(col("event_type").isNull).count()
    assert(violations > 0, "fixture must actually fail its audit")
    // reject: drop the ref; the staged snapshot loses its protection
    IcebergInterop.dropRef(dest, "audit")
    val exp = IcebergInterop.expireSnapshots(dest, retainLast = 1)
    assert(exp.deletedDataFiles > 0,
      "expiry must reclaim the staged-and-rejected data files")
    val after = IcebergInterop.readIceberg(spark, dest)
      .agg(count(lit(1)), sum(col("event_id"))).collect()(0)
    assert(after === before, "main must be bit-identical after the rejection")
    // and the reclaimed files are really gone from disk: no parquet
    // file may survive under any wap-* staging directory (the dir
    // itself may remain empty)
    val walk = Files.walk(dest.resolve("data"))
    val leftover =
      try {
        val it = walk.iterator()
        val buf = scala.collection.mutable.ListBuffer.empty[String]
        while (it.hasNext) {
          val p = it.next()
          val s = dest.resolve("data").relativize(p).toString
          if (s.contains("wap-") && s.endsWith(".parquet")) buf += s
        }
        buf.toList
      } finally walk.close()
    assert(leftover.isEmpty,
      s"staged-and-rejected parquet files must be physically deleted, " +
        s"found: $leftover")
  }

  test("staging refuses main and unknown parents refuse loudly") {
    val dest = export()
    intercept[IllegalArgumentException] {
      IcebergInterop.stageAppend(spark, dest, ev.limit(1), "main")
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.publishBranch(dest, "nope")
    }
  }

  test("staging refuses a schema-drifted batch before any file lands") {
    val dest = export()
    val drifted = ev.limit(3).withColumn("extra", lit(1L))
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.stageAppend(spark, dest, drifted, "audit")
    }
    assert(e.getMessage.contains("does not match"))
    // and the refusal left no staged snapshot or ref behind
    intercept[IllegalArgumentException] {
      IcebergInterop.refSnapshotId(dest, "audit")
    }
  }
}
