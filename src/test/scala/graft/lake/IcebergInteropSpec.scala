package graft.lake

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The Iceberg wire-format bridge (VERDICT r8 next #4 — the second half
  * of BASELINE.json:7's "Delta/Iceberg"): an exported table must be a
  * spec-shaped v1 Iceberg table (metadata JSON + Avro manifest list +
  * Avro manifest with field-id props), and the read path must replay
  * foreign metadata the way an Iceberg reader does, refusing the
  * constructs it cannot honor (partition specs, delete manifests,
  * nested types) instead of misreading them. */
class IcebergInteropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = Tables.events(spark, sf)
    .select(col("event_id"), col("event_type"), col("value"))

  test("export writes spec-shaped v1 metadata: schema ids, snapshot, manifest chain") {
    val t = LakeTable.createTemp(spark, events.filter(col("event_id") < 300))
    val dest = Files.createTempDirectory("graft-iceberg").resolve("t")
    val n = IcebergInterop.exportSnapshot(t, dest)
    assert(n > 0)
    val metaDir = dest.resolve("metadata")
    assert(Files.readString(metaDir.resolve("version-hint.text")).trim === "1")
    val meta = new ObjectMapper().readTree(
      Files.readString(metaDir.resolve("v1.metadata.json")))
    assert(meta.get("format-version").asInt === 1)
    val fields = meta.get("schema").get("fields").elements().asScala.toSeq
    assert(fields.map(_.get("name").asText) === Seq("event_id", "event_type", "value"))
    assert(fields.map(_.get("id").asInt) === Seq(1, 2, 3))
    val snapId = meta.get("current-snapshot-id").asLong
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == snapId).get
    // manifest list → manifest → one live entry per data file, all
    // with field-id-annotated Avro schemas
    val list = IcebergInterop.readAvro(
      java.nio.file.Paths.get(snap.get("manifest-list").asText.stripPrefix("file://")))
    assert(list.size === 1)
    assert(list.head.getSchema.getField("manifest_path").getObjectProp("field-id").toString === "500")
    assert(list.head.get("added_data_files_count").toString.toInt === n)
    val entries = IcebergInterop.readAvro(java.nio.file.Paths.get(
      list.head.get("manifest_path").toString.stripPrefix("file://")))
    assert(entries.size === n)
    entries.foreach { e =>
      assert(e.get("status").toString.toInt === 1)
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      assert(df.get("file_format").toString === "PARQUET")
      assert(df.getSchema.getField("file_path").getObjectProp("field-id").toString === "100")
      val p = java.nio.file.Paths.get(df.get("file_path").toString.stripPrefix("file://"))
      assert(Files.exists(p))
      assert(Files.size(p) === df.get("file_size_in_bytes").toString.toLong)
    }
  }

  test("export/readIceberg round-trip preserves rows and schema exactly") {
    val base = events.filter(col("event_id") < 500)
    val t = LakeTable.createTemp(spark, base)
    t.append(events.filter(col("event_id").between(500, 799)))
    val dest = Files.createTempDirectory("graft-iceberg").resolve("t")
    IcebergInterop.exportSnapshot(t, dest)
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.schema.fieldNames.toSeq === t.snapshot().schema.fieldNames.toSeq)
    assert(back.exceptAll(t.snapshot()).count() === 0)
    assert(t.snapshot().exceptAll(back).count() === 0)
    // and the import path lands it as a lake table
    val lt = IcebergInterop.importIceberg(spark, dest,
      Files.createTempDirectory("graft-iceimp").resolve("t"))
    assert(lt.snapshot().count() === t.snapshot().count())
  }

  test("evolved schema exports: old rows surface the new column as null") {
    import spark.implicits._
    val t = LakeTable.createTemp(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    t.append(Seq((3L, "c", 1.5)).toDF("id", "s", "score"))
    val dest = Files.createTempDirectory("graft-iceberg").resolve("t")
    IcebergInterop.exportSnapshot(t, dest)
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.columns.toSeq === Seq("id", "s", "score"))
    assert(back.filter(col("score").isNull).count() === 2)
  }

  test("manifest-entry status DELETED drops the file from the scan") {
    import spark.implicits._
    val t = LakeTable.createTemp(spark, Seq((1L, "keep")).toDF("id", "s"))
    val dest = Files.createTempDirectory("graft-iceberg").resolve("t")
    IcebergInterop.exportSnapshot(t, dest)
    // hand-append a DELETED entry pointing at the same file: a reader
    // honoring status must still return only the live rows... build a
    // second manifest holding the same file with status 2 and splice it
    // into a fresh manifest list — the scan must then be empty
    val metaDir = dest.resolve("metadata")
    val meta = new ObjectMapper().readTree(Files.readString(metaDir.resolve("v1.metadata.json")))
    val snap = meta.get("snapshots").elements().asScala.next()
    val listPath = java.nio.file.Paths.get(
      snap.get("manifest-list").asText.stripPrefix("file://"))
    val oldList = IcebergInterop.readAvro(listPath)
    val manifestPath = java.nio.file.Paths.get(
      oldList.head.get("manifest_path").toString.stripPrefix("file://"))
    val entries = IcebergInterop.readAvro(manifestPath)
    val tombstoned = metaDir.resolve("manifest-tombstone.avro")
    scala.util.Using.resource(new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](IcebergInterop.manifestEntrySchema))) { w =>
      w.create(IcebergInterop.manifestEntrySchema, tombstoned.toFile)
      entries.foreach { e =>
        val copy = new GenericData.Record(IcebergInterop.manifestEntrySchema)
        copy.put("status", 2) // DELETED
        copy.put("snapshot_id", e.get("snapshot_id"))
        copy.put("data_file", e.get("data_file"))
        w.append(copy)
      }
    }
    // rewrite the manifest list in place to point at the tombstone manifest
    scala.util.Using.resource(new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](IcebergInterop.manifestListSchema))) { w =>
      w.create(IcebergInterop.manifestListSchema, listPath.toFile)
      val m = new GenericData.Record(IcebergInterop.manifestListSchema)
      m.put("manifest_path", s"file://$tombstoned")
      m.put("manifest_length", Files.size(tombstoned))
      m.put("partition_spec_id", 0)
      m.put("added_snapshot_id", snap.get("snapshot-id").asLong)
      m.put("added_data_files_count", 0)
      m.put("existing_data_files_count", 0)
      m.put("deleted_data_files_count", entries.size)
      w.append(m)
    }
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.count() === 0)
    assert(back.columns.toSeq === Seq("id", "s")) // schema survives an empty scan
  }

  test("fail-loud boundaries: partitioned specs, nested types, bad format versions") {
    import spark.implicits._
    // nested column type refuses at export
    val bad = LakeTable.createTemp(spark,
      Seq((1L, Seq("a", "b"))).toDF("id", "tags"))
    val e1 = intercept[IllegalArgumentException] {
      IcebergInterop.exportSnapshot(bad, Files.createTempDirectory("graft-icebad").resolve("t"))
    }
    assert(e1.getMessage.contains("primitive columns only"))
    // a declared spec whose files DO carry the source column reads fine
    // (hidden partitioning) — pinned properly in the partitioned test;
    // here: a spec whose source-id resolves to nothing refuses
    val t = LakeTable.createTemp(spark, Seq((1L, "x")).toDF("id", "s"))
    val dest = Files.createTempDirectory("graft-icepart").resolve("t")
    IcebergInterop.exportSnapshot(t, dest)
    val metaPath = dest.resolve("metadata").resolve("v1.metadata.json")
    val m = new ObjectMapper()
    val meta = m.readTree(Files.readString(metaPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val spec = meta.get("partition-specs").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val pf = spec.putArray("fields").addObject()
    pf.put("name", "ghost"); pf.put("transform", "identity")
    pf.put("source-id", 99); pf.put("field-id", 1000)
    Files.writeString(metaPath, m.writeValueAsString(meta))
    val e2 = intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, dest)
    }
    assert(e2.getMessage.contains("unknown source-id 99"))
    // unknown format version refuses
    meta.put("format-version", 3)
    Files.writeString(metaPath, m.writeValueAsString(meta))
    val e3 = intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, dest)
    }
    assert(e3.getMessage.contains("format-version"))
  }

  test("identity-partitioned export/read: per-tuple dirs, typed partition records, flat scan") {
    val t = LakeTable.createTemp(spark, events.filter(col("event_id") < 600))
    val dest = Files.createTempDirectory("graft-icepart2").resolve("t")
    val n = IcebergInterop.exportSnapshot(t, dest,
      identityPartitionBy = Seq("event_type"))
    assert(n > 0)
    // the metadata declares the identity spec
    val meta = new ObjectMapper().readTree(
      Files.readString(dest.resolve("metadata").resolve("v1.metadata.json")))
    val sf0 = meta.get("partition-specs").get(0).get("fields").get(0)
    assert(sf0.get("name").asText === "event_type")
    assert(sf0.get("transform").asText === "identity")
    // every manifest entry carries a typed partition record whose value
    // matches a real event_type
    val snap = meta.get("snapshots").elements().asScala.next()
    val list = IcebergInterop.readAvro(java.nio.file.Paths.get(
      snap.get("manifest-list").asText.stripPrefix("file://")))
    val entries = IcebergInterop.readAvro(java.nio.file.Paths.get(
      list.head.get("manifest_path").toString.stripPrefix("file://")))
    val types = events.filter(col("event_id") < 600)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    entries.foreach { e =>
      val part = e.get("data_file").asInstanceOf[GenericRecord]
        .get("partition").asInstanceOf[GenericRecord]
      assert(types.contains(part.get("event_type").toString))
    }
    assert(entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("partition").asInstanceOf[GenericRecord].get("event_type").toString)
      .toSet === types)
    // the flat scan returns every row WITH the partition column —
    // hidden partitioning keeps source columns in the files
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.exceptAll(t.snapshot()).count() === 0)
    assert(t.snapshot().exceptAll(back).count() === 0)
  }

  test("hive-migrated layout (files missing partition columns) refuses, not nulls") {
    import spark.implicits._
    val t = LakeTable.createTemp(spark, Seq((1L, "x"), (2L, "y")).toDF("id", "s"))
    val dest = Files.createTempDirectory("graft-icemig").resolve("t")
    IcebergInterop.exportSnapshot(t, dest, identityPartitionBy = Seq("s"))
    // simulate add_files migration: strip the partition column from the
    // physical files (rewrite each data file without it, same name)
    scala.util.Using.resource(Files.walk(dest.resolve("data"))) { st =>
      st.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    }.foreach { f =>
      val tmp = Files.createTempDirectory("graft-icemig-rw")
      spark.read.parquet(f.toString).drop("s")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = scala.util.Using.resource(Files.list(tmp)) { s =>
        s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      }
      Files.copy(part, f, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // drop the Hadoop LocalFileSystem checksum sidecar the original
      // write left behind — it no longer matches the replaced bytes
      Files.deleteIfExists(f.getParent.resolve(s".${f.getFileName}.crc"))
    }
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, dest).count()
    }
    assert(e.getMessage.contains("hive-migrated"))
  }

  test("exportHistory: every lake version time-travels identically via snapshot-id") {
    import spark.implicits._
    val t = LakeTable.createTemp(spark, events.filter(col("event_id") < 100)) // v1
    t.append(events.filter(col("event_id").between(100, 199))) // v2
    t.overwrite(events.filter(col("event_id") < 50)) // v3: drops manifests
    t.append(Seq((999999L, "evolved", 1.0, 42L))
      .toDF("event_id", "event_type", "value", "extra")) // v4: schema +extra
    val dest = Files.createTempDirectory("graft-icehist").resolve("t")
    assert(IcebergInterop.exportHistory(t, dest) === 4)
    (1L to 4L).foreach { v =>
      val lake = t.snapshot(v)
      val ice = IcebergInterop.readIceberg(spark, dest, snapshotId = v)
      assert(ice.columns.toSeq === lake.columns.toSeq, s"snapshot $v schema")
      assert(ice.exceptAll(lake).count() === 0, s"snapshot $v extra rows")
      assert(lake.exceptAll(ice).count() === 0, s"snapshot $v missing rows")
    }
    // pre-evolution snapshot reads with the NARROW schema via its schema-id
    assert(IcebergInterop.readIceberg(spark, dest, 2L).columns.toSeq ===
      Seq("event_id", "event_type", "value"))
    // default read = current snapshot = latest lake version
    val cur = IcebergInterop.readIceberg(spark, dest)
    assert(cur.filter(col("extra").isNull).count() === 50)
    // unknown snapshot throws
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, dest, 99L)
    }
    assert(e.getMessage.contains("no snapshot 99"))
    // manifest REUSE: v1's data-dir manifest appears in multiple
    // manifest lists rather than being rewritten per snapshot
    val meta = new ObjectMapper().readTree(
      Files.readString(dest.resolve("metadata").resolve("v1.metadata.json")))
    val listsOfManifests = meta.get("snapshots").elements().asScala.toSeq.map { sn =>
      IcebergInterop.readAvro(java.nio.file.Paths.get(
        sn.get("manifest-list").asText.stripPrefix("file://")))
        .map(_.get("manifest_path").toString).toSet
    }
    // v2's list contains v1's manifest (append keeps prior dirs live)
    assert(listsOfManifests(1).intersect(listsOfManifests(0)).nonEmpty)
    // v3's overwrite drops both earlier manifests from its list
    assert(listsOfManifests(2).intersect(listsOfManifests(0)).isEmpty)
  }

  test("v2 position deletes: export subtracts exactly the matching rows on read") {
    val base = events.filter(col("event_id") < 400)
    val t = LakeTable.createTemp(spark, base)
    val dest = Files.createTempDirectory("graft-icev2").resolve("t")
    val (nData, nDeleted) =
      IcebergInterop.exportSnapshotV2(t, dest, col("event_type") === "error")
    assert(nData > 0)
    val expectedDeleted = base.filter(col("event_type") === "error").count()
    assert(nDeleted === expectedDeleted && nDeleted > 0)
    // metadata is v2 with sequence numbers
    val meta = new ObjectMapper().readTree(
      Files.readString(dest.resolve("metadata").resolve("v1.metadata.json")))
    assert(meta.get("format-version").asInt === 2)
    assert(meta.get("last-sequence-number").asLong === 1L)
    // manifest list carries one data (content 0) + one delete (content 1) manifest
    val snap = meta.get("snapshots").elements().asScala.next()
    val list = IcebergInterop.readAvro(java.nio.file.Paths.get(
      snap.get("manifest-list").asText.stripPrefix("file://")))
    assert(list.map(_.get("content").toString.toInt).sorted === Seq(0, 1))
    // the delete parquet is spec-shaped: file_path + pos, sorted, with
    // the reserved column ids in the footer metadata
    val delDir = dest.resolve("deletes")
    val delDf = spark.read.parquet(delDir.toString)
    assert(delDf.columns.toSeq === Seq("file_path", "pos"))
    val delRows = delDf.orderBy("file_path", "pos").collect()
    assert(delRows.length === nDeleted)
    assert(delRows.forall(_.getString(0).startsWith("file:///")))
    // read applies the deletes: survivors only, exactly
    val back = IcebergInterop.readIceberg(spark, dest)
    val expected = base.filter(!(col("event_type") === "error"))
    assert(back.count() === expected.count())
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
  }

  test("manifest entries carry exact per-file record_count, v1 and v2 (ADVICE r9)") {
    // real readers (Spark-Iceberg, Trino) answer metadata-only
    // COUNT(*) from record_count — a -1 placeholder gives them wrong
    // counts even though graft's own reader ignores the field
    def entryCounts(dest: java.nio.file.Path): Seq[(String, Int, Long)] = {
      val meta = new ObjectMapper().readTree(
        Files.readString(dest.resolve("metadata").resolve("v1.metadata.json")))
      val snap = meta.get("snapshots").elements().asScala.next()
      val list = IcebergInterop.readAvro(java.nio.file.Paths.get(
        snap.get("manifest-list").asText.stripPrefix("file://")))
      list.flatMap { m =>
        IcebergInterop.readAvro(java.nio.file.Paths.get(
          m.get("manifest_path").toString.stripPrefix("file://"))).map { e =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val content = Option(df.getSchema.getField("content"))
            .map(_ => df.get("content").toString.toInt).getOrElse(0)
          (df.get("file_path").toString, content,
            df.get("record_count").toString.toLong)
        }
      }
    }
    def verify(counts: Seq[(String, Int, Long)]): Unit = counts.foreach {
      case (p, _, rc) =>
        val actual = spark.read.parquet(p.stripPrefix("file://")).count()
        assert(rc === actual, s"record_count $rc != $actual for $p")
    }
    val base = events.filter(col("event_id") < 400)
    val t1 = LakeTable.createTemp(spark, base)
    val d1 = Files.createTempDirectory("graft-icerc1").resolve("t")
    IcebergInterop.exportSnapshot(t1, d1)
    val c1 = entryCounts(d1)
    verify(c1)
    assert(c1.map(_._3).sum === base.count())
    // v2: data entries (content 0) sum to the table, delete entries
    // (content 1) sum to the deleted-row count
    val t2 = LakeTable.createTemp(spark, base)
    val d2 = Files.createTempDirectory("graft-icerc2").resolve("t")
    val (_, nDeleted) =
      IcebergInterop.exportSnapshotV2(t2, d2, col("event_type") === "error")
    val c2 = entryCounts(d2)
    verify(c2)
    assert(c2.filter(_._2 == 0).map(_._3).sum === base.count())
    assert(c2.filter(_._2 == 1).map(_._3).sum === nDeleted && nDeleted > 0)
  }

  test("position deletes survive user columns named __gf_path/__gf_pos") {
    // the anti-join's helper columns must not collide with (and
    // silently destroy) legitimately-named user columns (ADVICE r9)
    import spark.implicits._
    val df = Seq((1L, "keep", "pa", 100L), (2L, "drop", "pb", 200L),
      (3L, "keep", "pc", 300L))
      .toDF("id", "flag", "__gf_path", "__gf_pos")
    val t = LakeTable.createTemp(spark, df)
    val dest = Files.createTempDirectory("graft-icecol").resolve("t")
    val (_, nDeleted) =
      IcebergInterop.exportSnapshotV2(t, dest, col("flag") === "drop")
    assert(nDeleted === 1L)
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.columns.toSeq === Seq("id", "flag", "__gf_path", "__gf_pos"))
    val rows = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSeq
    assert(rows === Seq((1L, "pa", 100L), (3L, "pc", 300L)))
  }

  test("v2 position deletes: empty delete set reads the full snapshot") {
    import spark.implicits._
    val t = LakeTable.createTemp(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val dest = Files.createTempDirectory("graft-icev2e").resolve("t")
    val (_, nDeleted) = IcebergInterop.exportSnapshotV2(t, dest, lit(false))
    assert(nDeleted === 0L)
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("an equality delete with NO declared equality_ids refuses, not guesses") {
    import spark.implicits._
    val t = LakeTable.createTemp(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val dest = Files.createTempDirectory("graft-icev2q").resolve("t")
    IcebergInterop.exportSnapshotV2(t, dest, col("id") === 1L)
    // rewrite the DELETE manifest's entries to claim equality deletes
    // (data_file.content = 2) with no equality_ids — there is nothing
    // to match on, so the reader must refuse: applying positionally
    // would be wrong and ignoring them resurrects rows
    val meta = new ObjectMapper().readTree(
      Files.readString(dest.resolve("metadata").resolve("v1.metadata.json")))
    val snap = meta.get("snapshots").elements().asScala.next()
    val listPath = java.nio.file.Paths.get(
      snap.get("manifest-list").asText.stripPrefix("file://"))
    val list = IcebergInterop.readAvro(listPath)
    val delMf = list.find(_.get("content").toString.toInt == 1).get
    val delMfPath = java.nio.file.Paths.get(
      delMf.get("manifest_path").toString.stripPrefix("file://"))
    val entries = IcebergInterop.readAvro(delMfPath)
    scala.util.Using.resource(new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](IcebergInterop.manifestEntrySchemaV2))) { w =>
      w.create(IcebergInterop.manifestEntrySchemaV2, delMfPath.toFile)
      entries.foreach { e =>
        val old = e.get("data_file").asInstanceOf[GenericRecord]
        val df2 = new GenericData.Record(
          IcebergInterop.manifestEntrySchemaV2.getField("data_file").schema())
        df2.put("content", 2) // EQUALITY
        Seq("file_path", "file_format", "partition", "record_count",
          "file_size_in_bytes").foreach(f => df2.put(f, old.get(f)))
        val copy = new GenericData.Record(IcebergInterop.manifestEntrySchemaV2)
        copy.put("status", 1)
        copy.put("snapshot_id", e.get("snapshot_id"))
        copy.put("sequence_number", 1L)
        copy.put("file_sequence_number", 1L)
        copy.put("data_file", df2)
        w.append(copy)
      }
    }
    val err = intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, dest)
    }
    assert(err.getMessage.contains("equality_ids"))
  }

  test("empty table (no current snapshot) reads as a typed empty frame") {
    val root = Files.createTempDirectory("graft-iceempty").resolve("t")
    Files.createDirectories(root.resolve("metadata"))
    Files.writeString(root.resolve("metadata").resolve("v1.metadata.json"),
      """{"format-version":1,"table-uuid":"u","location":"file:///x",
        |"last-updated-ms":0,"last-column-id":2,
        |"schema":{"type":"struct","schema-id":0,"fields":[
        |  {"id":1,"name":"id","required":false,"type":"long"},
        |  {"id":2,"name":"s","required":false,"type":"string"}]},
        |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
        |"properties":{},"current-snapshot-id":-1,"snapshots":[]}""".stripMargin)
    Files.writeString(root.resolve("metadata").resolve("version-hint.text"), "1")
    val df = IcebergInterop.readIceberg(spark, root)
    assert(df.columns.toSeq === Seq("id", "s"))
    assert(df.count() === 0)
  }
}
