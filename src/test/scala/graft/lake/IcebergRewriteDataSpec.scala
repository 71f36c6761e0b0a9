package graft.lake

import java.nio.file.{Files, Path}

import scala.util.Using

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Data-file compaction (rewrite_data_files, r13 — the physical twin
  * of manifest compaction): bin-packing the current snapshot's small
  * files into target-size outputs must preserve every row (asserted
  * per bin from footer counts), keep pre-compaction snapshots
  * time-traveling bit-identically, leave oversize files carried as
  * EXISTING with their original commit lineage, and let a later
  * expiry physically drop exactly the rewritten-away small files. */
class IcebergRewriteDataSpec extends AnyFunSuite {
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

  private def sums(root: Path, version: Long = -1L): Map[String, (Long, Double)] =
    IcebergInterop.readIceberg(spark, root, version)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("bin-pack merges a multi-file history into one file, rows and history intact") {
    val t = LakeTable.createTemp(spark,
      orders.filter(col("o_orderkey") % 2 === 0).repartition(3))
    t.append(orders.filter(col("o_orderkey") % 2 === 1).repartition(3))
    val dest = TempDirs.create("graft-rdf1").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 2)
    val before = sums(dest)
    val firstSnapBefore = sums(dest, t.versions.head)
    val nSmall = dataFiles(dest).size
    assert(nSmall === 6)

    val res = IcebergInterop.rewriteDataFiles(spark, dest)
    assert(res === IcebergInterop.RewriteDataResult(6, 1, 0))
    // current read identical, both small + compacted files on disk
    assert(sums(dest) === before)
    assert(dataFiles(dest).size === nSmall + 1)
    // pre-compaction snapshot reads bit-identically from the old files
    assert(sums(dest, t.versions.head) === firstSnapBefore)

    // expiry drops exactly the 6 rewritten-away files; compacted stays
    val exp = IcebergInterop.expireSnapshots(dest, retainLast = 1)
    assert(exp.deletedDataFiles === 6)
    assert(dataFiles(dest).size === 1)
    assert(sums(dest) === before)
  }

  test("mixed-schema bins keep evolved-column values (declared-schema read)") {
    // the Delta-optimize twin: commit 1 evolves the schema, the bin
    // mixes pre-/post-evolution files, and only a declared-schema read
    // keeps the evolved column's values through compaction
    val t = LakeTable.createTemp(spark,
      orders.select(col("o_orderkey"), col("o_totalprice"))
        .filter(col("o_orderkey") % 2 === 0).repartition(2))
    t.append(orders.filter(col("o_orderkey") % 2 === 1).repartition(2))
    val dest = TempDirs.create("graft-rdf-evo").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 2)
    def state() = IcebergInterop.readIceberg(spark, dest)
      .agg(count(lit(1)).as("rows"),
        count(col("o_orderpriority")).as("evolved_nonnull"),
        sum(col("o_orderkey")).as("keys")).collect()(0)
    val before = state()
    assert(before.getLong(1) > 0, "fixture must carry evolved values")
    val res = IcebergInterop.rewriteDataFiles(spark, dest)
    assert(res.compactedFiles === 4 && res.newFiles === 1)
    assert(state() === before,
      "compaction must not drop evolved-column values")
  }

  test("files above the target are carried as EXISTING, not rewritten") {
    val t = LakeTable.createTemp(spark, orders.repartition(4))
    val dest = TempDirs.create("graft-rdf2").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 1)
    // target below every file's size → nothing merges, no new commit
    val res = IcebergInterop.rewriteDataFiles(spark, dest, targetFileBytes = 1L)
    assert(res === IcebergInterop.RewriteDataResult(0, 0, 4))
    assert(dataFiles(dest).size === 4)
    // no-op must not have committed a snapshot (metadata v1 still current)
    assert(Files.readString(dest.resolve("metadata")
      .resolve("version-hint.text")).trim === "1")
  }

  test("mixed bins: small files merge, the lone tail bin is carried") {
    val t = LakeTable.createTemp(spark,
      orders.filter(col("o_orderkey") % 2 === 0).repartition(2))
    t.append(orders.filter(col("o_orderkey") % 2 === 1).repartition(1))
    val dest = TempDirs.create("graft-rdf3").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 2)
    val files = dataFiles(dest)
    assert(files.size === 3)
    // target sized to fit exactly the two files of the first dir in
    // path order, leaving the third alone in its bin
    val sorted = files.toSeq.sorted.map(f => Files.size(Path.of(f)))
    val target = sorted(0) + sorted(1)
    val before = sums(dest)
    val res = IcebergInterop.rewriteDataFiles(spark, dest, targetFileBytes = target)
    assert(res.compactedFiles === 2 && res.newFiles === 1 && res.carriedFiles === 1)
    assert(sums(dest) === before)
    val exp = IcebergInterop.expireSnapshots(dest, retainLast = 1)
    // only the 2 merged-away files go; the carried file is referenced
    // by the live manifest and must survive file-level reachability
    assert(exp.deletedDataFiles === 2)
    assert(sums(dest) === before)
  }
}
