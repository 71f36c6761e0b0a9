package graft.lake

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Iceberg TRANSFORM partitions (VERDICT r9 next #6): day / bucket[N] /
  * truncate[W] on export (per-transformed-tuple data dirs, typed
  * partition records, the transform spec in the metadata) and on read
  * (hidden partitioning keeps source columns physically in the files,
  * so correctness is a flat scan; the new capability is
  * MANIFEST-LEVEL FILE PRUNING via readIcebergPruned — bounds
  * evaluated through the transform, files skipped from the manifests
  * before Spark ever lists them). */
class IcebergTransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = Tables.events(spark, sf)
    .select(col("event_id"), col("event_type"), col("value"), col("ts"))

  test("bucket hash matches the spec's published vectors (Appendix B)") {
    // int/long hash their 8-byte little-endian form; strings UTF-8
    assert(IcebergInterop.murmur3(
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(34L).array()) === 2017239379)
    assert(IcebergInterop.murmur3(
      "iceberg".getBytes("UTF-8")) === 1210000089)
    assert(IcebergInterop.icebergBucket(34, 16) === 2017239379 % 16)
    assert(IcebergInterop.icebergBucket(34L, 16) ===
      IcebergInterop.icebergBucket(34, 16)) // ints promote to long
  }

  test("day-partitioned export: per-day dirs, day spec, flat read-back") {
    val base = events
    val t = LakeTable.createTemp(spark, base, "graft-icday")
    val dest = Files.createTempDirectory("graft-icday").resolve("t")
    val n = IcebergInterop.exportSnapshot(t, dest,
      transformPartitionBy = Seq("ts" -> "days")) // legacy alias parses
    assert(n > 0)
    val meta = new ObjectMapper().readTree(
      Files.readString(dest.resolve("metadata").resolve("v1.metadata.json")))
    val pf = meta.get("partition-specs").elements().asScala.next()
      .get("fields").elements().asScala.next()
    assert(pf.get("transform").asText === "day") // canonical spelling
    assert(pf.get("name").asText === "ts_day")
    // full read-back is exact: transforms never change storage
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.exceptAll(base).count() === 0)
    assert(base.exceptAll(back).count() === 0)
  }

  test("pruned day read scans only the in-range files") {
    val base = events
    val t = LakeTable.createTemp(spark, base, "graft-icdayp")
    val dest = Files.createTempDirectory("graft-icdayp").resolve("t")
    IcebergInterop.exportSnapshot(t, dest,
      transformPartitionBy = Seq("ts" -> "day"))
    val total = IcebergInterop.readIceberg(spark, dest).inputFiles.length
    val lo = java.time.LocalDate.of(2024, 1, 10)
    val hi = java.time.LocalDate.of(2024, 1, 14)
    val pruned = IcebergInterop.readIcebergPruned(spark, dest, "ts", lo, hi)
    assert(pruned.inputFiles.length < total,
      s"pruning read ${pruned.inputFiles.length} of $total files — no files skipped")
    // the pruned file set holds exactly the 5 days' rows
    val expected = base.filter(
      col("ts") >= "2024-01-10 00:00:00" && col("ts") < "2024-01-15 00:00:00")
    assert(pruned.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(pruned).count() === 0)
  }

  test("truncate[100000] range-prunes numerics; truncated files hold the range") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val t = LakeTable.createTemp(spark, base, "graft-ictr")
    val dest = Files.createTempDirectory("graft-ictr").resolve("t")
    IcebergInterop.exportSnapshot(t, dest,
      transformPartitionBy = Seq("o_orderkey" -> "truncate[100000]"))
    val total = IcebergInterop.readIceberg(spark, dest).inputFiles.length
    val pruned = IcebergInterop.readIcebergPruned(
      spark, dest, "o_orderkey", 100000L, 250000L)
    assert(pruned.inputFiles.length < total)
    val expected = base.filter(
      col("o_orderkey") >= 100000L && col("o_orderkey") <= 250000L)
    val narrowed = pruned.filter(
      col("o_orderkey") >= 100000L && col("o_orderkey") <= 250000L)
    assert(narrowed.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(narrowed).count() === 0)
  }

  test("bucket[8] equality-prunes to one bucket; range pruning refuses") {
    val base = events.drop("ts")
    val t = LakeTable.createTemp(spark, base, "graft-icbk")
    val dest = Files.createTempDirectory("graft-icbk").resolve("t")
    IcebergInterop.exportSnapshot(t, dest,
      transformPartitionBy = Seq("event_id" -> "bucket[8]"))
    val total = IcebergInterop.readIceberg(spark, dest).inputFiles.length
    assert(total >= 8) // one dir per non-empty bucket
    val key = 4242L
    val pruned = IcebergInterop.readIcebergPruned(spark, dest, "event_id", key, key)
    assert(pruned.inputFiles.length < total)
    val narrowed = pruned.filter(col("event_id") === key)
    val expected = base.filter(col("event_id") === key)
    assert(narrowed.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(narrowed).count() === 0)
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.readIcebergPruned(spark, dest, "event_id", 1L, 2L)
    }
    assert(e.getMessage.contains("order-preserving"))
  }

  test("pruning on a non-partition column refuses, not full-scans") {
    val base = events.drop("ts")
    val t = LakeTable.createTemp(spark, base, "graft-icnp")
    val dest = Files.createTempDirectory("graft-icnp").resolve("t")
    IcebergInterop.exportSnapshot(t, dest,
      transformPartitionBy = Seq("event_id" -> "bucket[4]"))
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.readIcebergPruned(spark, dest, "event_type", "a", "a")
    }
    assert(e.getMessage.contains("no partition spec field"))
  }

  test("identity pruning works through the same path as q157's Delta shape") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val t = LakeTable.createTemp(spark, base, "graft-icidp")
    val dest = Files.createTempDirectory("graft-icidp").resolve("t")
    IcebergInterop.exportSnapshot(t, dest,
      identityPartitionBy = Seq("o_orderpriority"))
    val total = IcebergInterop.readIceberg(spark, dest).inputFiles.length
    val pruned = IcebergInterop.readIcebergPruned(
      spark, dest, "o_orderpriority", "1-URGENT", "2-HIGH")
    assert(pruned.inputFiles.length < total)
    val expected = base.filter(
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    assert(pruned.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(pruned).count() === 0)
  }
}
