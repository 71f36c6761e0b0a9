package graft.lake

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** CHECK constraints (r14): commit-time enforcement on every data
  * path, SQL CHECK null semantics, carry-forward across maintenance
  * commits, and the Delta `delta.constraints.*` export surface. */
class LakeCheckSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev = Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("event_type"), col("value"))

  test("append/overwrite/merge all refuse violating rows, state unchanged") {
    val t = LakeTable.createTemp(spark, ev.limit(100), "graft-chk1")
    t.addCheck("nonneg", "value >= 0")
    val v = t.latestVersion
    val before = t.snapshot().count()
    val bad = Seq((-1L, "x", -5.0)).toDF("event_id", "event_type", "value")
    for (attempt <- Seq(
        () => t.append(bad),
        () => t.overwrite(bad),
        () => t.merge(bad, Seq("event_id")))) {
      val e = intercept[CheckViolationException](attempt())
      assert(e.getMessage.contains("nonneg"))
      assert(t.latestVersion === v, "refused commit advanced the log")
      assert(t.snapshot().count() === before)
    }
    // the same rows pass once they satisfy the constraint
    t.append(Seq((-1L, "x", 5.0)).toDF("event_id", "event_type", "value"))
    assert(t.snapshot().count() === before + 1)
  }

  test("SQL CHECK null semantics: NULL passes, FALSE refuses") {
    val t = LakeTable.createTemp(spark, ev.limit(10), "graft-chk2")
    t.addCheck("pos", "value > 0")
    val withNull = Seq((9000000L, "x", Option.empty[Double]))
      .toDF("event_id", "event_type", "value")
    t.append(withNull) // NULL > 0 is UNKNOWN — passes, as in SQL CHECK
    assert(t.snapshot().filter($"event_id" === 9000000L).count() === 1)
  }

  test("manifest-corrupting names/expressions refuse before any commit " +
    "(r15 ADVICE: newline in either field breaks the line-oriented log)") {
    val t = LakeTable.createTemp(spark, ev.limit(10), "graft-chk-nl")
    val v0 = t.latestVersion
    intercept[IllegalArgumentException](t.addCheck("bad|pipe", "value >= 0"))
    intercept[IllegalArgumentException](t.addCheck("bad\nname", "value >= 0"))
    intercept[IllegalArgumentException](t.addCheck("bad\rname", "value >= 0"))
    intercept[IllegalArgumentException](t.addCheck("ok", "value >= 0\n OR true"))
    intercept[IllegalArgumentException](t.addCheck("ok", "value >= 0\r\n"))
    assert(t.latestVersion === v0 && t.checks.isEmpty,
      "refused declarations must leave the log untouched")
    // and the table still reads fine afterwards
    assert(t.snapshot().count() === 10)
  }

  test("streaming commitBatch and mergeBatch enforce too") {
    val t = LakeTable.createTemp(spark, ev.limit(50), "graft-chk3")
    t.addCheck("nonneg", "value >= 0")
    val bad = Seq((9000001L, "x", -1.0)).toDF("event_id", "event_type", "value")
    intercept[CheckViolationException](t.commitBatch(bad, "appA", 1L))
    intercept[CheckViolationException](t.mergeBatch(bad, Seq("event_id"), "appA", 2L))
    val good = Seq((9000001L, "x", 1.0)).toDF("event_id", "event_type", "value")
    t.commitBatch(good, "appA", 3L)
    assert(t.snapshot().filter($"event_id" === 9000001L).count() === 1)
  }

  test("constraints survive z-order, vacuum, and merge commits; drop removes") {
    val t = LakeTable.createTemp(spark, ev.limit(200), "graft-chk4")
    t.addCheck("nonneg", "value >= 0")
    t.append(ev.filter(col("event_id") % 7 === 0))
    t.optimizeZOrder(Seq("event_id", "value"), buckets = 4)
    t.vacuum()
    t.merge(Seq((9000002L, "x", 2.0)).toDF("event_id", "event_type", "value"),
      Seq("event_id"))
    assert(t.checks === Map("nonneg" -> "value >= 0"),
      "maintenance commits must carry the constraint set")
    intercept[CheckViolationException](
      t.append(Seq((9000003L, "x", -2.0)).toDF("event_id", "event_type", "value")))
    t.dropCheck("nonneg")
    assert(t.checks.isEmpty)
    t.append(Seq((9000003L, "x", -2.0)).toDF("event_id", "event_type", "value"))
    assert(t.snapshot().filter($"event_id" === 9000003L).count() === 1)
  }

  test("adding a constraint the existing data violates refuses to attach") {
    val t = LakeTable.createTemp(spark,
      Seq((1L, "x", -3.0)).toDF("event_id", "event_type", "value"), "graft-chk5")
    val e = intercept[CheckViolationException](t.addCheck("nonneg", "value >= 0"))
    assert(e.getMessage.contains("existing rows"))
    assert(t.checks.isEmpty)
  }

  test("Delta export writes delta.constraints.* config and writer protocol 3") {
    val t = LakeTable.createTemp(spark, ev.limit(30), "graft-chk6")
    t.addCheck("nonneg", "value >= 0")
    val dest = TempDirs.create("graft-chk-delta").resolve("t")
    DeltaInterop.exportSnapshot(t, dest)
    val log = Files.readAllLines(
      dest.resolve("_delta_log").resolve(f"${0L}%020d.json")).asScala.mkString("\n")
    assert(log.contains("\"delta.constraints.nonneg\":\"value >= 0\""), log)
    assert(log.contains("\"minWriterVersion\":3"), log)
    // and a constraint-free table keeps the plain (1, 2) protocol
    val t2 = LakeTable.createTemp(spark, ev.limit(5), "graft-chk7")
    val dest2 = TempDirs.create("graft-chk-delta2").resolve("t")
    DeltaInterop.exportSnapshot(t2, dest2)
    val log2 = Files.readAllLines(
      dest2.resolve("_delta_log").resolve(f"${0L}%020d.json")).asScala.mkString("\n")
    assert(log2.contains("\"minWriterVersion\":2") && !log2.contains("delta.constraints"))
  }

  test("constraints round-trip: export, read back, re-attach, re-enforce") {
    val t = LakeTable.createTemp(spark, ev.limit(40), "graft-chk8")
    t.addCheck("nonneg", "value >= 0")
    val dest = TempDirs.create("graft-chk-rt").resolve("t")
    DeltaInterop.exportSnapshot(t, dest)
    val back = DeltaInterop.readConstraints(spark, dest)
    assert(back === Map("nonneg" -> "value >= 0"))
    // an importing engine re-attaches the contract and it ENFORCES
    val t2 = LakeTable.createTemp(spark,
      DeltaInterop.readDelta(spark, dest), "graft-chk9")
    back.foreach { case (n, e) => t2.addCheck(n, e) }
    intercept[CheckViolationException](t2.append(
      Seq((9000004L, "x", -1.0)).toDF("event_id", "event_type", "value")))
  }
}
