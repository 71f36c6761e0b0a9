package graft.lake

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Delta COLUMN MAPPING (the last common reader feature the protocol
  * gate refused): files store generated physical names (col-<uuid>),
  * schemaString keeps the logical names in per-field metadata, and
  * partitionValues/hive dirs key by the PHYSICAL name while
  * metaData.partitionColumns stays logical. readDelta must run its
  * whole scan in physical space and surface only logical names — and
  * refuse a mapped table whose schema lacks physicalName metadata,
  * because reading by logical name would silently yield nulls. */
class DeltaColumnMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = Tables.events(spark, sf)
    .select(col("event_id"), col("event_type"), col("value"))

  private def dest(prefix: String): Path =
    Files.createTempDirectory(prefix).resolve("t")

  test("name-mode round trip: physical files, logical frame") {
    val base = events.filter(col("event_id") < 1500)
    val t = LakeTable.createTemp(spark, base, "graft-cm")
    val d = dest("graft-cm-rt")
    val n = DeltaInterop.exportSnapshotMapped(t, d)
    assert(n > 0)
    // the parquet files must NOT contain logical names
    val part = Files.list(d).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val physFields = spark.read.parquet(part.toString).schema.fieldNames
    assert(physFields.forall(_.startsWith("col-")),
      s"expected physical col-<uuid> names, got ${physFields.mkString(",")}")
    val back = DeltaInterop.readDelta(spark, d)
    assert(back.schema.fieldNames.toSeq === base.schema.fieldNames.toSeq)
    assert(back.exceptAll(base).count() === 0)
    assert(base.exceptAll(back).count() === 0)
  }

  test("PARTITIONED mapped table: physical partitionValues, logical columns") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .filter(col("o_orderkey") < 4000)
    val t = LakeTable.createTemp(spark, base, "graft-cmp")
    val d = dest("graft-cmp-rt")
    DeltaInterop.exportSnapshotMapped(t, d, partitionBy = Seq("o_orderpriority"))
    // the log's partitionColumns are LOGICAL; partitionValues keys physical
    val m = new ObjectMapper()
    val actions = Files.readAllLines(
      d.resolve("_delta_log").resolve("0" * 20 + ".json")).asScala.map(m.readTree)
    val md = actions.find(_.has("metaData")).get.get("metaData")
    assert(md.get("partitionColumns").elements().asScala.map(_.asText()).toSeq
      === Seq("o_orderpriority"))
    val addPvKeys = actions.filter(_.has("add"))
      .flatMap(_.get("add").get("partitionValues").fieldNames().asScala).toSet
    assert(addPvKeys.forall(_.startsWith("col-")),
      s"partitionValues must key by physical names, got $addPvKeys")
    val back = DeltaInterop.readDelta(spark, d)
    assert(back.exceptAll(base).count() === 0)
    assert(base.exceptAll(back).count() === 0)
  }

  test("id mode reads identically and files carry parquet field ids") {
    val base = events.filter(col("event_id") < 800)
    val t = LakeTable.createTemp(spark, base, "graft-cmid")
    val d = dest("graft-cmid-rt")
    DeltaInterop.exportSnapshotMapped(t, d, mode = "id")
    val back = DeltaInterop.readDelta(spark, d)
    assert(back.exceptAll(base).count() === 0)
    assert(base.exceptAll(back).count() === 0)
  }

  test("a mapped table missing physicalName metadata refuses, not nulls") {
    val base = events.filter(col("event_id") < 300)
    val t = LakeTable.createTemp(spark, base, "graft-cmbad")
    val d = dest("graft-cmbad")
    DeltaInterop.exportSnapshotMapped(t, d)
    // doctor the log: keep mode=name but strip the per-field metadata
    val log = d.resolve("_delta_log").resolve("0" * 20 + ".json")
    val m = new ObjectMapper()
    val doctored = Files.readAllLines(log).asScala.map { line =>
      val node = m.readTree(line)
      if (!node.has("metaData")) line
      else {
        val md = node.get("metaData").asInstanceOf[
          com.fasterxml.jackson.databind.node.ObjectNode]
        md.put("schemaString", base.schema.json) // metadata-free schema
        m.writeValueAsString(node)
      }
    }
    Files.write(log, doctored.asJava)
    val e = intercept[IllegalArgumentException](DeltaInterop.readDelta(spark, d))
    assert(e.getMessage.contains("physicalName"))
  }

  test("checkpointing preserves configuration: mapped replay via checkpoint") {
    val base = events.filter(col("event_id") < 1000)
    val t = LakeTable.createTemp(spark, base, "graft-cmck")
    val d = dest("graft-cmck")
    DeltaInterop.exportSnapshotMapped(t, d)
    DeltaInterop.writeCheckpoint(spark, d)
    // delete the JSON commit: replay must come from the checkpoint alone
    Files.delete(d.resolve("_delta_log").resolve("0" * 20 + ".json"))
    val back = DeltaInterop.readDelta(spark, d)
    assert(back.schema.fieldNames.toSeq === base.schema.fieldNames.toSeq)
    assert(back.exceptAll(base).count() === 0)
    assert(base.exceptAll(back).count() === 0)
  }

  test("checkpoint carries the replayed protocol, not a reconstructed one") {
    // a column-mapped table declares (2,5); a checkpoint claiming
    // minWriterVersion 2 would invite spec-compliant writers to commit
    // mapping-unaware adds (ADVICE r10 medium)
    val base = events.filter(col("event_id") < 300)
    val t = LakeTable.createTemp(spark, base, "graft-cmproto")
    val d = dest("graft-cmproto")
    DeltaInterop.exportSnapshotMapped(t, d)
    val v = DeltaInterop.writeCheckpoint(spark, d)
    val ck = spark.read.parquet(
      d.resolve("_delta_log").resolve(f"$v%020d.checkpoint.parquet").toString)
    val p = ck.filter(col("protocol").isNotNull)
      .select("protocol.minReaderVersion", "protocol.minWriterVersion")
      .collect()
    assert(p.length === 1)
    assert(p(0).getInt(0) === 2)
    assert(p(0).getInt(1) === 5)
  }

  test("an unknown mapping mode refuses") {
    val base = events.filter(col("event_id") < 300)
    val t = LakeTable.createTemp(spark, base, "graft-cmunk")
    val d = dest("graft-cmunk")
    DeltaInterop.exportSnapshotMapped(t, d)
    val log = d.resolve("_delta_log").resolve("0" * 20 + ".json")
    val doctored = Files.readAllLines(log).asScala.map(
      _.replace("\"delta.columnMapping.mode\":\"name\"",
        "\"delta.columnMapping.mode\":\"hieroglyphic\""))
    Files.write(log, doctored.asJava)
    val e = intercept[IllegalArgumentException](DeltaInterop.readDelta(spark, d))
    assert(e.getMessage.contains("hieroglyphic"))
  }
}
