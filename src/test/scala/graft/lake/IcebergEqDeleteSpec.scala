package graft.lake

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Iceberg EQUALITY deletes (VERDICT r9 next #5, content = 2 — the
  * Flink CDC output shape): the CDC export writes data at sequence 1
  * and ONE commit at sequence 2 carrying both an equality-delete file
  * and the replacement rows; the reader must apply each delete only to
  * data files with a STRICTLY LOWER data sequence number. The upsert
  * rows share the delete's sequence, so `<=` ordering (or no ordering)
  * would annihilate every upsert — the round trips here pin the strict
  * rule, sequence inheritance, and the mixed position+equality shape. */
class IcebergEqDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = Tables.events(spark, sf)
    .select(col("event_id"), col("event_type"), col("value"))

  /** base, upserts (value shifted by +1000 on event_id % 7 == 0 rows),
    * and the reader's expected multiset. */
  private def cdcFixture = {
    val base = events.filter(col("event_id") < 2000)
    val upserts = base.filter(col("event_id") % 7 === 0)
      .withColumn("value", col("value") + 1000.0)
    val expected = base
      .filter(col("event_type") =!= "error" && col("event_id") % 7 =!= 0)
      .unionByName(upserts)
    (base, upserts, expected)
  }

  test("CDC round trip: old rows die, same-sequence upserts survive") {
    val (base, upserts, expected) = cdcFixture
    val t = LakeTable.createTemp(spark, base, "graft-eqcdc")
    val dest = Files.createTempDirectory("graft-eqcdc").resolve("t")
    val (nFiles, nKeys) = IcebergInterop.exportSnapshotV2CDC(
      t, dest, Seq("event_id"), col("event_type") === "error", upserts)
    assert(nFiles > 0 && nKeys > 0)
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
    // the strictness witness: every upsert row is present with its NEW
    // value — a <= reader would have deleted them all
    val got = back.filter(col("event_id") % 7 === 0)
    assert(got.count() === upserts.count())
    assert(got.exceptAll(upserts).count() === 0)
  }

  test("mixed flavors: position deletes and equality deletes in one commit") {
    val (base, upserts, eqExpected) = cdcFixture
    val t = LakeTable.createTemp(spark, base, "graft-eqmix")
    val dest = Files.createTempDirectory("graft-eqmix").resolve("t")
    // positions kill high-value seq-1 rows; equality kills errors+upsert keys
    val (nFiles, nKeys) = IcebergInterop.exportSnapshotV2CDC(
      t, dest, Seq("event_id"), col("event_type") === "error", upserts,
      posDeleteWhere = Some(col("value") > 800.0))
    assert(nFiles > 0 && nKeys > 0)
    val back = IcebergInterop.readIceberg(spark, dest)
    // position deletes hit only the sequence-1 files, so upserts keep
    // even value > 800 rows
    val expected = eqExpected.filter(
      col("value") <= 800.0 || col("event_id") % 7 === 0)
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
  }

  test("entries with NULL sequence numbers inherit the manifest's") {
    val (base, upserts, expected) = cdcFixture
    val t = LakeTable.createTemp(spark, base, "graft-eqinh")
    val dest = Files.createTempDirectory("graft-eqinh").resolve("t")
    IcebergInterop.exportSnapshotV2CDC(
      t, dest, Seq("event_id"), col("event_type") === "error", upserts)
    // real writers leave added-entry sequence numbers null and let them
    // inherit from the manifest list — null out every entry seq
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(dest.resolve("metadata").resolve("v1.metadata.json")))
    val curId = meta.get("current-snapshot-id").asLong()
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId).get
    val listPath = java.nio.file.Paths.get(
      snap.get("manifest-list").asText.stripPrefix("file://"))
    IcebergInterop.readAvro(listPath).foreach { mf =>
      val mfPath = java.nio.file.Paths.get(
        mf.get("manifest_path").toString.stripPrefix("file://"))
      val entries = IcebergInterop.readAvro(mfPath)
      scala.util.Using.resource(new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](
          IcebergInterop.manifestEntrySchemaV2))) { w =>
        w.create(IcebergInterop.manifestEntrySchemaV2, mfPath.toFile)
        entries.foreach { e =>
          val copy = new GenericData.Record(IcebergInterop.manifestEntrySchemaV2)
          copy.put("status", e.get("status"))
          copy.put("snapshot_id", e.get("snapshot_id"))
          copy.put("sequence_number", null)
          copy.put("file_sequence_number", null)
          copy.put("data_file", e.get("data_file"))
          w.append(copy)
        }
      }
    }
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
  }

  test("snapshot 1 time-travels to the pre-CDC state") {
    val (base, upserts, _) = cdcFixture
    val t = LakeTable.createTemp(spark, base, "graft-eqtt")
    val dest = Files.createTempDirectory("graft-eqtt").resolve("t")
    IcebergInterop.exportSnapshotV2CDC(
      t, dest, Seq("event_id"), col("event_type") === "error", upserts)
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(dest.resolve("metadata").resolve("v1.metadata.json")))
    val snap1 = meta.get("snapshots").elements().asScala.toSeq
      .map(_.get("snapshot-id").asLong()).min
    val at1 = IcebergInterop.readIceberg(spark, dest, snapshotId = snap1)
    assert(at1.exceptAll(base).count() === 0)
    assert(base.exceptAll(at1).count() === 0)
  }

  test("composite equality keys match null-safely on all declared columns") {
    import spark.implicits._
    val base = Seq(
      (1L, Option("a"), 10.0), (2L, Option("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Option("a"), 40.0))
      .toDF("id", "grp", "v")
    // delete (1,a) and (3,null); upsert replaces (2,b)
    val upserts = Seq((2L, Option("b"), 99.0)).toDF("id", "grp", "v")
    val t = LakeTable.createTemp(spark, base, "graft-eqcomp")
    val dest = Files.createTempDirectory("graft-eqcomp").resolve("t")
    IcebergInterop.exportSnapshotV2CDC(
      t, dest, Seq("id", "grp"),
      (col("id") === 1L && col("grp") === "a") || col("grp").isNull, upserts)
    val back = IcebergInterop.readIceberg(spark, dest)
    val expected = Seq((2L, Option("b"), 99.0), (4L, Option("a"), 40.0))
      .toDF("id", "grp", "v")
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
  }

  test("unknown delete content and unknown equality field ids refuse") {
    val (base, upserts, _) = cdcFixture
    val t = LakeTable.createTemp(spark, base.limit(50), "graft-eqbad")
    val dest = Files.createTempDirectory("graft-eqbad").resolve("t")
    IcebergInterop.exportSnapshotV2CDC(
      t, dest, Seq("event_id"), col("event_type") === "error", upserts.limit(5))
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(dest.resolve("metadata").resolve("v1.metadata.json")))
    val curId = meta.get("current-snapshot-id").asLong()
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId).get
    val listPath = java.nio.file.Paths.get(
      snap.get("manifest-list").asText.stripPrefix("file://"))
    // doctor the equality manifest: declare a field id not in the schema
    IcebergInterop.readAvro(listPath)
      .filter(_.get("content").toString.toInt == 1).foreach { mf =>
        val mfPath = java.nio.file.Paths.get(
          mf.get("manifest_path").toString.stripPrefix("file://"))
        val entries = IcebergInterop.readAvro(mfPath)
        scala.util.Using.resource(new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](
            IcebergInterop.manifestEntrySchemaV2))) { w =>
          w.create(IcebergInterop.manifestEntrySchemaV2, mfPath.toFile)
          entries.foreach { e =>
            val old = e.get("data_file").asInstanceOf[GenericRecord]
            val df2 = new GenericData.Record(
              IcebergInterop.manifestEntrySchemaV2.getField("data_file").schema())
            Seq("content", "file_path", "file_format", "partition",
              "record_count", "file_size_in_bytes").foreach(f => df2.put(f, old.get(f)))
            df2.put("equality_ids", Seq(Int.box(9999)).asJava)
            val copy = new GenericData.Record(IcebergInterop.manifestEntrySchemaV2)
            copy.put("status", e.get("status"))
            copy.put("snapshot_id", e.get("snapshot_id"))
            copy.put("sequence_number", e.get("sequence_number"))
            copy.put("file_sequence_number", e.get("file_sequence_number"))
            copy.put("data_file", df2)
            w.append(copy)
          }
        }
      }
    val err = intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, dest).count()
    }
    assert(err.getMessage.contains("9999"))
  }
}
