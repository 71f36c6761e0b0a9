package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Iceberg named refs: tags/branches resolve reads by name, protect
  * their snapshots from expiry, and fail loudly on unknown names or
  * snapshots. */
class IcebergRefsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def orders = Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def freshTable() = {
    val t = LakeTable.createTemp(spark,
      orders.filter(col("o_orderkey") % 2 === 0))
    t.append(orders.filter(col("o_orderkey") % 2 === 1))
    val dest = TempDirs.create("graft-refs").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 2)
    (t, dest)
  }

  test("setRef + readIcebergRef resolve by name; main is the current snapshot") {
    val (t, dest) = freshTable()
    val Seq(v1, v2) = t.versions
    IcebergInterop.setRef(dest, "rel", v1, "tag")
    assert(IcebergInterop.refSnapshotId(dest, "rel") === v1)
    assert(IcebergInterop.refSnapshotId(dest, "main") === v2)
    assert(IcebergInterop.readIcebergRef(spark, dest, "rel").count() ===
      IcebergInterop.readIceberg(spark, dest, v1).count())
    assert(IcebergInterop.readIcebergRef(spark, dest, "main").count() ===
      IcebergInterop.readIceberg(spark, dest).count())
  }

  test("refs protect their snapshots from expiry; dropRef re-exposes them") {
    val (t, dest) = freshTable()
    val Seq(v1, _) = t.versions
    IcebergInterop.setRef(dest, "keepme", v1, "branch")
    assert(IcebergInterop.expireSnapshots(dest, retainLast = 1) ===
      IcebergInterop.ExpireResult(Nil, 0, 0, 0))
    assert(IcebergInterop.readIcebergRef(spark, dest, "keepme").count() > 0)
    IcebergInterop.dropRef(dest, "keepme")
    val res = IcebergInterop.expireSnapshots(dest, retainLast = 1)
    assert(res.expired === Seq(v1))
  }

  test("unknown snapshot, unknown ref, and reserved names refuse") {
    val (_, dest) = freshTable()
    intercept[IllegalArgumentException] {
      IcebergInterop.setRef(dest, "bad", 999999L)
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.setRef(dest, "main", 1L)
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.refSnapshotId(dest, "nope")
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.dropRef(dest, "nope")
    }
  }
}
