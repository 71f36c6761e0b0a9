package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Partition-spec evolution: old data stays under the spec it was
  * written with (never rewritten), the current snapshot unions
  * manifests of BOTH specs, and pruning applies each manifest's own
  * spec — keeping any manifest whose spec cannot prove exclusion.
  */
class IcebergEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 6 rows over 3 days × 2 categories; the first 3 rows (day 1) were
  // written under identity(cat), then the spec evolved to day(ts)
  private def fixture() = {
    val rows = Seq(
      (1L, "a", "2024-01-01 10:00:00", 1.0),
      (2L, "b", "2024-01-01 11:00:00", 2.0),
      (3L, "a", "2024-01-01 12:00:00", 3.0),
      (4L, "a", "2024-01-02 10:00:00", 4.0),
      (5L, "b", "2024-01-02 11:00:00", 5.0),
      (6L, "b", "2024-01-03 10:00:00", 6.0))
      .toDF("id", "cat", "ts_s", "v")
      .select(col("id"), col("cat"), col("ts_s").cast("timestamp").as("ts"), col("v"))
    val t = LakeTable.createTemp(spark, rows, "graft-evo-spec")
    val dest = Files.createTempDirectory("graft-evo").resolve("t")
    val (n0, n1) = IcebergInterop.exportSnapshotEvolved(t, dest,
      oldSpec = Seq("cat" -> "identity"),
      newSpec = Seq("ts" -> "day"),
      oldWhere = col("ts") < "2024-01-02 00:00:00")
    assert(n0 > 0 && n1 > 0, s"both spec eras must write files, got ($n0, $n1)")
    (dest, n0, n1)
  }

  test("current snapshot reads the union of both spec eras; snapshot 1 only the old") {
    val (dest, _, _) = fixture()
    val all = IcebergInterop.readIceberg(spark, dest)
    assert(all.count() === 6)
    assert(all.agg(sum(col("v"))).head().getDouble(0) === 21.0)
    val meta = Files.readString(
      dest.resolve("metadata").resolve("v1.metadata.json"))
    val firstSnap = """"snapshot-id" : (\d+)""".r
      .findFirstMatchIn(meta).get.group(1).toLong
    val s1 = IcebergInterop.readIceberg(spark, dest, snapshotId = firstSnap)
    assert(s1.count() === 3, "snapshot 1 must hold only the pre-evolution rows")
  }

  test("pruning on the evolved-IN column day-prunes new files, keeps all old") {
    val (dest, n0, n1) = fixture()
    val total = IcebergInterop.readIceberg(spark, dest).inputFiles.length
    assert(total === n0 + n1)
    val pruned = IcebergInterop.readIcebergPruned(spark, dest, "ts",
      java.time.LocalDate.of(2024, 1, 3), java.time.LocalDate.of(2024, 1, 3))
    // old-spec manifests cannot prove exclusion on ts → all n0 kept;
    // new-spec files prune to day 3 only
    assert(pruned.inputFiles.length < total)
    assert(pruned.inputFiles.length >= n0 + 1)
    // no in-range row is lost (the point of "keep when unprovable")
    assert(pruned.filter(col("ts") >= "2024-01-03 00:00:00").count() === 1)
  }

  test("pruning on the evolved-AWAY column prunes old files, keeps all new") {
    val (dest, n0, n1) = fixture()
    val total = IcebergInterop.readIceberg(spark, dest).inputFiles.length
    val pruned = IcebergInterop.readIcebergPruned(spark, dest, "cat", "a", "a")
    assert(pruned.inputFiles.length < total)
    assert(pruned.inputFiles.length >= n1 + 1)
    // all cat=a rows survive, from both eras
    assert(pruned.filter(col("cat") === "a").count() === 3)
  }

  test("evolution across non-identity transforms: bucket-era equality prune") {
    val rows = (1L to 12L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", s"2024-01-${"%02d".format(i)} 08:00:00", i.toDouble))
      .toDF("id", "cat", "ts_s", "v")
      .select(col("id"), col("cat"), col("ts_s").cast("timestamp").as("ts"), col("v"))
    val t = LakeTable.createTemp(spark, rows, "graft-evo-bkt")
    val dest = Files.createTempDirectory("graft-evo-b").resolve("t")
    val (n0, n1) = IcebergInterop.exportSnapshotEvolved(t, dest,
      oldSpec = Seq("id" -> "bucket[4]"),
      newSpec = Seq("cat" -> "truncate[2]"),
      oldWhere = col("id") <= 6)
    assert(n0 > 0 && n1 > 0)
    assert(IcebergInterop.readIceberg(spark, dest).count() === 12)
    val total = IcebergInterop.readIceberg(spark, dest).inputFiles.length
    // bucket admits only equality pruning: old-era files prune to the
    // probe id's bucket, new-era files (no id field in their spec) all
    // keep — and the probed row must survive
    val pruned = IcebergInterop.readIcebergPruned(spark, dest, "id", 3L, 3L)
    assert(pruned.inputFiles.length < total)
    assert(pruned.inputFiles.length >= n1 + 1)
    assert(pruned.filter(col("id") === 3L).count() === 1)
    // range pruning on a bucket-partitioned column must refuse loudly
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.readIcebergPruned(spark, dest, "id", 1L, 5L).count()
    }
    assert(e.getMessage.contains("order-preserving"))
  }
}
