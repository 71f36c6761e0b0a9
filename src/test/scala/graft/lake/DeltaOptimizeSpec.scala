package graft.lake

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Delta OPTIMIZE (bin-pack compaction): one dataChange=false
  * remove+add commit per run, bins never cross partitions, prior
  * versions still time-travel, DV/column-mapped tables refuse. */
class DeltaOptimizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def orders = Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def sums(root: Path, version: Long = Long.MaxValue): Map[String, (Long, Double)] =
    DeltaInterop.readDelta(spark, root, version)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def commitLines(root: Path, v: Long): Seq[String] =
    Files.readAllLines(root.resolve("_delta_log")
      .resolve(f"$v%020d.json")).asScala.toSeq

  test("multi-commit history packs into one file under a dataChange=false commit") {
    val t = LakeTable.createTemp(spark,
      orders.filter(col("o_orderkey") % 2 === 0).repartition(3))
    t.append(orders.filter(col("o_orderkey") % 2 === 1).repartition(3))
    val dest = TempDirs.create("graft-opt1").resolve("t")
    assert(DeltaInterop.exportHistory(t, dest) === 2)
    val before = sums(dest)
    val v0 = sums(dest, 0L)

    val res = DeltaInterop.optimize(spark, dest)
    assert(res.compactedFiles === 6 && res.newFiles === 1 &&
      res.carriedFiles === 0 && res.version === 2)
    assert(sums(dest) === before)
    // prior versions replay from the tombstoned-but-on-disk originals
    assert(sums(dest, 0L) === v0)
    assert(sums(dest, 1L) === before)
    // the optimize commit carries ONLY dataChange=false actions
    val acts = commitLines(dest, 2L)
    assert(acts.nonEmpty)
    assert(acts.forall(_.contains("\"dataChange\":false")))
    // idempotent second run: everything already packed → no new commit
    val again = DeltaInterop.optimize(spark, dest)
    assert(again === DeltaInterop.OptimizeResult(0, 0, 1, 2))
  }

  test("mixed-schema bins keep evolved-column values (declared-schema read)") {
    // commit 0 is narrow; commit 1 evolves the schema by adding
    // o_orderstatus — the optimize bin then mixes pre-/post-evolution
    // files, and a footer-inferred read could adopt the narrow schema,
    // silently nulling the evolved column while row counts still match
    val t = LakeTable.createTemp(spark,
      orders.select(col("o_orderkey"), col("o_totalprice"))
        .filter(col("o_orderkey") % 2 === 0).repartition(2))
    t.append(orders.filter(col("o_orderkey") % 2 === 1).repartition(2))
    val dest = TempDirs.create("graft-opt-evo").resolve("t")
    assert(DeltaInterop.exportHistory(t, dest) === 2)
    def state() = DeltaInterop.readDelta(spark, dest)
      .agg(count(lit(1)).as("rows"),
        count(col("o_orderstatus")).as("evolved_nonnull"),
        sum(col("o_orderkey")).as("keys")).collect()(0)
    val before = state()
    assert(before.getLong(1) > 0, "fixture must carry evolved values")
    val res = DeltaInterop.optimize(spark, dest)
    assert(res.compactedFiles === 4 && res.newFiles === 1)
    assert(state() === before,
      "compaction must not drop evolved-column values")
  }

  test("bins never cross a partition boundary") {
    val t = LakeTable.createTemp(spark, orders)
    val dest = TempDirs.create("graft-opt2").resolve("t")
    // partitioned single-commit export: several files per status dir
    DeltaInterop.exportSnapshot(t, dest, partitionBy = Seq("o_orderstatus"))
    val statuses = DeltaInterop.readDelta(spark, dest)
      .select("o_orderstatus").distinct().collect().map(_.getString(0)).toSet
    val before = sums(dest)
    val res = DeltaInterop.optimize(spark, dest)
    assert(sums(dest) === before)
    // one compacted file per partition at most — and every new file
    // lives inside its partition's hive directory
    assert(res.newFiles <= statuses.size)
    val compacted = Using.resource(Files.walk(dest)) { s =>
      s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("compacted-")).toSeq
    }
    assert(compacted.size === res.newFiles)
    compacted.foreach { f =>
      assert(f.getParent.getFileName.toString.startsWith("o_orderstatus="),
        s"$f not inside a partition dir")
    }
  }

  test("vacuum reclaims tombstoned files; current reads live, expired travel dies at scan") {
    val t = LakeTable.createTemp(spark,
      orders.filter(col("o_orderkey") % 2 === 0).repartition(2))
    t.append(orders.filter(col("o_orderkey") % 2 === 1).repartition(2))
    val dest = TempDirs.create("graft-vac1").resolve("t")
    assert(DeltaInterop.exportHistory(t, dest) === 2)
    val before = sums(dest)
    val res = DeltaInterop.optimize(spark, dest)
    assert(res.compactedFiles === 4 && res.newFiles === 1)
    val deleted = DeltaInterop.vacuumDelta(spark, dest)
    assert(deleted === 4)
    // current version reads identically from the compacted file alone
    assert(sums(dest) === before)
    // a second vacuum finds nothing
    assert(DeltaInterop.vacuumDelta(spark, dest) === 0)
    // pre-optimize versions: the log replays, the scan fails loudly
    val e = intercept[Throwable] {
      DeltaInterop.readDelta(spark, dest, version = 0L).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(c.getMessage).contains("does not exist") ||
        String.valueOf(c.getMessage).contains("FileNotFound")))
  }

  test("deletion-vector tables refuse loudly") {
    val t = LakeTable.createTemp(spark, orders.repartition(2))
    val dest = TempDirs.create("graft-opt3").resolve("t")
    DeltaInterop.exportSnapshotDV(t, dest,
      deleteWhere = col("o_orderkey") % 10 === 0)
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.optimize(spark, dest)
    }
    assert(e.getMessage.contains("deletion-vector"))
  }
}
