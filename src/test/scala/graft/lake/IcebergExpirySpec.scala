package graft.lake

import java.nio.file.{Files, Path}

import scala.util.Using

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Snapshot expiry (VERDICT r12 next #5): expiring all but the last N
  * snapshots must honor the MANIFEST-REUSE invariant — a manifest (and
  * its data files) referenced by any retained snapshot survives no
  * matter how many expired snapshots also referenced it — while
  * everything reachable only from expired snapshots is physically
  * removed, time travel to an expired id refuses at snapshot
  * resolution, and every retained snapshot keeps reading
  * bit-identically. */
class IcebergExpirySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def orders = Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))

  private def dataFiles(root: Path): Set[String] =
    Using.resource(Files.walk(root.resolve("data"))) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(_.toString).toSet
    }

  test("append-only history: shared manifests survive, expired travel refuses") {
    val t = LakeTable.createTemp(spark, orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    val dest = TempDirs.create("graft-exp1").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 3)
    val before = dataFiles(dest)
    val total = IcebergInterop.readIceberg(spark, dest).count()
    val res = IcebergInterop.expireSnapshots(dest, retainLast = 1)
    assert(res.expired === t.versions.init)
    // every expired snapshot's manifests are ALSO in the current
    // snapshot's list (append-only history) → nothing may be deleted
    // except the expired snapshots' own manifest lists
    assert(res.deletedManifests === 0 && res.deletedDataFiles === 0)
    assert(res.deletedManifestLists === 2)
    assert(dataFiles(dest) === before, "append-only expiry must not touch data")
    assert(IcebergInterop.readIceberg(spark, dest).count() === total)
    val err = intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, dest, t.versions.head))
    assert(err.getMessage.contains("no snapshot"))
  }

  test("overwrite history: orphaned eras are physically removed, kept reads intact") {
    val t = LakeTable.createTemp(spark, orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.overwrite(orders.filter(col("o_orderkey") % 3 === 2))
    val dest = TempDirs.create("graft-exp2").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 3)
    val expectRows = IcebergInterop.readIceberg(spark, dest).count()
    val before = dataFiles(dest)
    val res = IcebergInterop.expireSnapshots(dest, retainLast = 1)
    // the overwrite orphaned both earlier eras: their manifests and
    // data files are gone, the current era's files all survive
    assert(res.deletedManifests === 2)
    assert(res.deletedDataFiles > 0)
    val after = dataFiles(dest)
    assert(after.subsetOf(before) && after.nonEmpty)
    val kept = IcebergInterop.readIceberg(spark, dest)
    assert(kept.count() === expectRows)
    assert(kept.inputFiles.forall(f => Files.exists(
      java.nio.file.Paths.get(f.stripPrefix("file:")))))
  }

  test("retaining 2 keeps the middle snapshot readable and its reachable files") {
    val t = LakeTable.createTemp(spark, orders.filter(col("o_orderkey") % 3 === 0))
    t.overwrite(orders.filter(col("o_orderkey") % 3 === 1))
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    val dest = TempDirs.create("graft-exp3").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 3)
    val midBefore = IcebergInterop.readIceberg(spark, dest, t.versions(1)).count()
    val res = IcebergInterop.expireSnapshots(dest, retainLast = 2)
    assert(res.expired === Seq(t.versions.head))
    // snapshot 1's era was orphaned by the overwrite → deletable;
    // snapshots 2 and 3 share the overwrite era → it must survive
    assert(res.deletedDataFiles > 0)
    assert(IcebergInterop.readIceberg(spark, dest, t.versions(1)).count() === midBefore)
    assert(IcebergInterop.readIceberg(spark, dest).count() ===
      midBefore + orders.filter(col("o_orderkey") % 3 === 2).count())
  }

  test("no-op and guard rails") {
    val t = LakeTable.createTemp(spark, orders.limit(10))
    t.append(orders.limit(5))
    val dest = TempDirs.create("graft-exp4").resolve("t")
    IcebergInterop.exportHistory(t, dest)
    assert(IcebergInterop.expireSnapshots(dest, retainLast = 5) ===
      IcebergInterop.ExpireResult(Nil, 0, 0, 0))
    intercept[IllegalArgumentException](
      IcebergInterop.expireSnapshots(dest, retainLast = 0))
    // metadata version did not roll forward on the no-op
    assert(Files.readString(dest.resolve("metadata/version-hint.text")).trim === "1")
  }

  test("manifest compaction: one merged manifest, lineage kept, reads and travel intact") {
    val t = LakeTable.createTemp(spark, orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    val dest = TempDirs.create("graft-mc1").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 3)
    val before = IcebergInterop.readIceberg(spark, dest).count()
    val files = dataFiles(dest)
    assert(IcebergInterop.rewriteManifests(dest) === 3)
    // metadata-only: identical file set, identical reads, old travel OK
    assert(dataFiles(dest) === files)
    assert(IcebergInterop.readIceberg(spark, dest).count() === before)
    assert(IcebergInterop.readIceberg(spark, dest, t.versions.head).count() ===
      orders.filter(col("o_orderkey") % 3 === 0).count())
    // the new current snapshot resolves to exactly one manifest whose
    // entries are all EXISTING with their original snapshot ids
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(dest.resolve("metadata/v2.metadata.json")))
    val curId = meta.get("current-snapshot-id").asLong()
    import scala.jdk.CollectionConverters._
    val cur = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId).get
    assert(cur.get("summary").get("operation").asText() === "replace")
    val list = IcebergInterop.readAvro(java.nio.file.Paths.get(
      cur.get("manifest-list").asText().stripPrefix("file://")))
    assert(list.size === 1)
    val entries = IcebergInterop.readAvro(java.nio.file.Paths.get(
      list.head.get("manifest_path").toString.stripPrefix("file://")))
    assert(entries.forall(_.get("status").asInstanceOf[Integer] == 0))
    assert(entries.map(_.get("snapshot_id").asInstanceOf[Long]).toSet === t.versions.toSet)
    // second rewrite is a no-op on a single-manifest snapshot
    assert(IcebergInterop.rewriteManifests(dest) === 1)
    // expiry after compaction: the 3 pre-compaction manifests go, but
    // every data file is shared with the merged manifest — file-level
    // reachability must keep all of them
    val res = IcebergInterop.expireSnapshots(dest, retainLast = 1)
    assert(res.deletedManifests === 3 && res.deletedDataFiles === 0)
    assert(dataFiles(dest) === files)
    assert(IcebergInterop.readIceberg(spark, dest).count() === before)
  }

  test("timestamp as-of resolves in commit order and narrows with expiry") {
    val slice0 = orders.filter(col("o_orderkey") % 3 === 0)
    val t = LakeTable.createTemp(spark, slice0)
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    val dest = TempDirs.create("graft-asof1").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 3)
    val log = IcebergInterop.snapshotLog(dest)
    assert(log.size === 3 && log.map(_._2).distinct.size === 3)
    // exactly at the first commit → snapshot 1; between 1 and 2 → 1
    assert(IcebergInterop.readIcebergAsOf(spark, dest, log(0)._2).count() ===
      slice0.count())
    assert(IcebergInterop.readIcebergAsOf(spark, dest, log(1)._2 - 1L).count() ===
      slice0.count())
    val full = IcebergInterop.readIceberg(spark, dest).count()
    assert(IcebergInterop.readIcebergAsOf(spark, dest, log(2)._2).count() === full)
    intercept[IllegalArgumentException](
      IcebergInterop.readIcebergAsOf(spark, dest, log(0)._2 - 1L))
    // expiry narrows the reachable history: timestamps that resolved
    // to snapshots 1/2 now refuse, the current one still resolves
    IcebergInterop.expireSnapshots(dest, retainLast = 1)
    intercept[IllegalArgumentException](
      IcebergInterop.readIcebergAsOf(spark, dest, log(0)._2))
    intercept[IllegalArgumentException](
      IcebergInterop.readIcebergAsOf(spark, dest, log(1)._2))
    assert(IcebergInterop.readIcebergAsOf(spark, dest, log(2)._2).count() === full)
  }

  test("evolved export keeps NULL-predicate rows in exactly one era") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), 1.0), (2L, None: Option[String], 2.0),
      (3L, Some("b"), 3.0))
      .toDF("id", "k", "v")
    val t = LakeTable.createTemp(spark, df)
    val dest = TempDirs.create("graft-expnull").resolve("t")
    // k = 'a' is NULL for row 2 — it must land in the new-spec era,
    // not vanish from both (ADVICE r12)
    val (n0, n1) = IcebergInterop.exportSnapshotEvolved(t, dest,
      oldSpec = Seq("id" -> "identity"), newSpec = Seq("k" -> "identity"),
      oldWhere = col("k") === "a")
    assert(n0 > 0 && n1 > 0)
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.count() === 3)
    assert(back.select("id").as[Long].collect().sorted === Array(1L, 2L, 3L))
  }
}
