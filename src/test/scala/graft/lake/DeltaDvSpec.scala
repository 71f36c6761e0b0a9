package graft.lake

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Delta DELETION VECTORS (VERDICT r9 next #4): a DV-bearing table —
  * the default output of current Delta writers — must round-trip
  * exactly (no resurrected rows, no over-deletion), the protocol gate
  * must accept minReaderVersion 3 iff `deletionVectors` is the only
  * reader feature, and every corruption class (bad CRC, wrong
  * cardinality, truncated file) must fail loud. */
class DeltaDvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = Tables.events(spark, sf)
    .select(col("event_id"), col("event_type"), col("value"))

  private def dest(prefix: String): Path =
    Files.createTempDirectory(prefix).resolve("t")

  // ---- codecs ------------------------------------------------------------

  test("Z85 round-trips arbitrary 4-byte-aligned payloads") {
    val rnd = new scala.util.Random(7)
    (0 to 40 by 4).foreach { n =>
      val bytes = Array.fill(n)(rnd.nextInt().toByte)
      val enc = DeltaInterop.z85Encode(bytes)
      assert(enc.length === n / 4 * 5)
      assert(DeltaInterop.z85Decode(enc).toSeq === bytes.toSeq)
    }
    // the ZeroMQ spec's own test vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59
    // 0xF7 0x5B encodes to "HelloWorld"
    val helloWorld = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeltaInterop.z85Encode(helloWorld) === "HelloWorld")
    assert(DeltaInterop.z85Decode("HelloWorld").toSeq === helloWorld.toSeq)
  }

  test("DV bitmap data round-trips, including positions above 2^32") {
    val positions = Array(0L, 1L, 7L, 63L, 1000000L, (1L << 32) + 5, (1L << 33))
    val (bytes, card) = DeltaInterop.serializeDvData(positions.iterator)
    assert(card === positions.length.toLong)
    // wire prefix: the spec's magic number, little-endian
    val magic = (bytes(0) & 0xff) | ((bytes(1) & 0xff) << 8) |
      ((bytes(2) & 0xff) << 16) | ((bytes(3) & 0xff) << 24)
    assert(magic === DeltaInterop.DvMagic)
    assert(DeltaInterop.deserializeDvData(bytes).toSeq === positions.toSeq.sorted)
  }

  // ---- round trips -------------------------------------------------------

  test("DV export round-trips: deleted rows vanish, everything else survives") {
    val base = events.filter(col("event_id") < 2000)
    val t = LakeTable.createTemp(spark, base, "graft-dv")
    val d = dest("graft-dv-rt")
    val (nFiles, nDel) = DeltaInterop.exportSnapshotDV(
      t, d, col("event_type") === "error")
    assert(nFiles > 0)
    val expectDel = base.filter(col("event_type") === "error").count()
    assert(nDel === expectDel && nDel > 0)
    val back = DeltaInterop.readDelta(spark, d)
    assert(back.count() === base.count() - nDel)
    assert(back.filter(col("event_type") === "error").count() === 0)
    // exact multiset equality with the surviving rows
    val expected = base.filter(col("event_type") =!= "error")
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
  }

  test("PARTITIONED DV export round-trips with per-branch subtraction") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .filter(col("o_orderkey") < 3000)
    val t = LakeTable.createTemp(spark, base, "graft-dvp")
    val d = dest("graft-dvp-rt")
    val (nFiles, nDel) = DeltaInterop.exportSnapshotDV(
      t, d, col("o_totalprice") > 150000.0,
      partitionBy = Seq("o_orderpriority"))
    assert(nFiles > 0 && nDel > 0)
    val back = DeltaInterop.readDelta(spark, d)
    val expected = base.filter(col("o_totalprice") <= 150000.0)
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
  }

  test("a DV log declares protocol (3,7) with the feature in both lists") {
    val t = LakeTable.createTemp(spark,
      events.filter(col("event_id") < 500), "graft-dvproto")
    val d = dest("graft-dvproto")
    DeltaInterop.exportSnapshotDV(t, d, col("event_type") === "error")
    val m = new ObjectMapper()
    val actions = Files.readAllLines(
      d.resolve("_delta_log").resolve("0" * 20 + ".json")).asScala.map(m.readTree)
    val p = actions.find(_.has("protocol")).get.get("protocol")
    assert(p.get("minReaderVersion").asInt === 3)
    assert(p.get("minWriterVersion").asInt === 7)
    assert(p.get("readerFeatures").elements().asScala.map(_.asText()).toSeq
      === Seq("deletionVectors"))
    assert(p.get("writerFeatures").elements().asScala.map(_.asText()).toSeq
      === Seq("deletionVectors"))
    // every add whose rows matched carries a 'u' descriptor with offset
    val dvs = actions.filter(_.has("add")).map(_.get("add"))
      .filter(_.has("deletionVector")).map(_.get("deletionVector"))
    assert(dvs.nonEmpty)
    dvs.foreach { n =>
      assert(n.get("storageType").asText === "u")
      assert(n.has("offset") && n.get("sizeInBytes").asInt > 0)
      assert(n.get("cardinality").asLong > 0)
    }
  }

  test("an INLINE ('i') deletion vector reads back identically") {
    // hand-roll a one-file DV table with the descriptor inline: pad the
    // DV data to a 4-byte boundary for Z85 (sizeInBytes keeps the true
    // length, as the spec's inline encoding does)
    val d = dest("graft-dvi")
    val df = events.filter(col("event_id") < 300)
    df.coalesce(1).write.parquet(d.toString)
    val part = Files.list(d).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val kill = spark.read.parquet(d.toString)
      .select(col("_metadata.row_index").as("pos"), col("event_type"))
      .filter(col("event_type") === "error")
      .collect().map(_.getLong(0))
    assert(kill.nonEmpty)
    val (data, card) = DeltaInterop.serializeDvData(kill.iterator)
    val padded = data ++ Array.fill((4 - data.length % 4) % 4)(0.toByte)
    val m = new ObjectMapper()
    val proto = """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""
    val meta = m.createObjectNode()
    val md = meta.putObject("metaData")
    md.put("id", "t-inline")
    md.putObject("format").put("provider", "parquet")
    md.put("schemaString", df.schema.json)
    md.putArray("partitionColumns")
    md.putObject("configuration")
    val add = m.createObjectNode()
    val a = add.putObject("add")
    a.put("path", part.getFileName.toString)
    a.putObject("partitionValues")
    a.put("size", Files.size(part))
    a.put("modificationTime", 0L)
    a.put("dataChange", true)
    val dv = a.putObject("deletionVector")
    dv.put("storageType", "i")
    dv.put("pathOrInlineDv", DeltaInterop.z85Encode(padded))
    dv.put("sizeInBytes", data.length)
    dv.put("cardinality", card)
    Files.createDirectories(d.resolve("_delta_log"))
    Files.write(d.resolve("_delta_log").resolve("0" * 20 + ".json"),
      Seq(proto, m.writeValueAsString(meta), m.writeValueAsString(add)).asJava)
    val back = DeltaInterop.readDelta(spark, d)
    val expected = df.filter(col("event_type") =!= "error")
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
  }

  // ---- protocol gate -----------------------------------------------------

  private def writeMinimalLog(d: Path, protocolJson: String): Unit = {
    val df = events.filter(col("event_id") < 100)
    df.coalesce(1).write.parquet(d.toString)
    val part = Files.list(d).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val meta = s"""{"metaData":{"id":"t","format":{"provider":"parquet"},""" +
      s""""schemaString":${new ObjectMapper().writeValueAsString(df.schema.json)},""" +
      s""""partitionColumns":[],"configuration":{}}}"""
    val add = s"""{"add":{"path":"${part.getFileName}","partitionValues":{},""" +
      s""""size":${Files.size(part)},"modificationTime":0,"dataChange":true}}"""
    Files.createDirectories(d.resolve("_delta_log"))
    Files.write(d.resolve("_delta_log").resolve("0" * 20 + ".json"),
      Seq(protocolJson, meta, add).asJava)
  }

  test("minReader 3 with SUPPORTED features opens; unknown features refuse") {
    val ok = dest("graft-dvgate-ok")
    writeMinimalLog(ok,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""")
    assert(DeltaInterop.readDelta(spark, ok).count() > 0)

    // columnMapping became a supported reader feature in round 10 —
    // with mode unset (none) the table reads plainly
    val cm = dest("graft-dvgate-cm")
    writeMinimalLog(cm,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","columnMapping"],""" +
        """"writerFeatures":["deletionVectors","columnMapping"]}}""")
    assert(DeltaInterop.readDelta(spark, cm).count() > 0)

    val bad = dest("graft-dvgate-bad")
    writeMinimalLog(bad,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","timestampNtz"],""" +
        """"writerFeatures":["deletionVectors","timestampNtz"]}}""")
    val e = intercept[IllegalArgumentException](DeltaInterop.readDelta(spark, bad))
    assert(e.getMessage.contains("timestampNtz"))

    // minReader 2 (legacy column mapping) opens; with no mapping mode
    // configured it is a plain read
    val v2 = dest("graft-dvgate-v2")
    writeMinimalLog(v2,
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""")
    assert(DeltaInterop.readDelta(spark, v2).count() > 0)

    val v4 = dest("graft-dvgate-v4")
    writeMinimalLog(v4,
      """{"protocol":{"minReaderVersion":4,"minWriterVersion":7}}""")
    val e4 = intercept[IllegalArgumentException](DeltaInterop.readDelta(spark, v4))
    assert(e4.getMessage.contains("minReaderVersion"))
  }

  // ---- fail-loud corruption classes --------------------------------------

  test("a corrupted DV file fails the CRC check instead of misreading") {
    val t = LakeTable.createTemp(spark,
      events.filter(col("event_id") < 500), "graft-dvcrc")
    val d = dest("graft-dvcrc")
    DeltaInterop.exportSnapshotDV(t, d, col("event_type") === "error")
    val dvFile = Files.list(d).iterator().asScala
      .find(_.getFileName.toString.startsWith("deletion_vector_")).get
    val bytes = Files.readAllBytes(dvFile)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x41).toByte
    Files.write(dvFile, bytes)
    val e = intercept[Exception](DeltaInterop.readDelta(spark, d).count())
    assert(e.getMessage.contains("mismatch"),
      s"expected a size/checksum mismatch, got: ${e.getMessage}")
  }

  test("a cardinality lie in the descriptor fails loud at expansion") {
    val t = LakeTable.createTemp(spark,
      events.filter(col("event_id") < 500), "graft-dvcard")
    val d = dest("graft-dvcard")
    DeltaInterop.exportSnapshotDV(t, d, col("event_type") === "error")
    val log = d.resolve("_delta_log").resolve("0" * 20 + ".json")
    val doctored = Files.readAllLines(log).asScala.map(
      _.replaceAll("\"cardinality\":(\\d+)", "\"cardinality\":999999"))
    Files.write(log, doctored.asJava)
    val e = intercept[Exception](DeltaInterop.readDelta(spark, d).count())
    assert(e.getMessage.contains("cardinality"),
      s"expected a cardinality mismatch, got: ${e.getMessage}")
  }

  test("checkpointing a DV table refuses (this writer cannot carry DVs)") {
    val t = LakeTable.createTemp(spark,
      events.filter(col("event_id") < 500), "graft-dvck")
    val d = dest("graft-dvck")
    DeltaInterop.exportSnapshotDV(t, d, col("event_type") === "error")
    val e = intercept[IllegalArgumentException](
      DeltaInterop.writeCheckpoint(spark, d))
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("importDelta of a DV table lands the post-delete row set in the lake") {
    val base = events.filter(col("event_id") < 1000)
    val t = LakeTable.createTemp(spark, base, "graft-dvimp")
    val d = dest("graft-dvimp")
    DeltaInterop.exportSnapshotDV(t, d, col("event_type") === "error")
    val lakeRoot = Files.createTempDirectory("graft-dvimp-lake").resolve("t")
    val imported = DeltaInterop.importDelta(spark, d, lakeRoot)
    val expected = base.filter(col("event_type") =!= "error")
    assert(imported.snapshot().exceptAll(expected).count() === 0)
    assert(expected.exceptAll(imported.snapshot()).count() === 0)
  }
}
