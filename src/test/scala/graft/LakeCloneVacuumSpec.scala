package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ADVICE r15 (high): a shallowClone manifest borrows the SOURCE
  * table's data dirs as absolute paths, and vacuum's `root.resolve`
  * passed absolutes through — so after the clone rewrote itself
  * (overwrite/optimize/deleteWhere drops the borrowed dirs from its
  * live manifest), a clone-side vacuum recursively deleted the SOURCE
  * table's data: cross-table data loss. Delta's contract is the
  * opposite — clone-side VACUUM never touches source files. Pins the
  * guard: vacuum never deletes outside the table root. */
class LakeCloneVacuumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clone → overwrite → vacuum leaves the source table intact") {
    val srcRows = (1 to 40).map(i => (i.toLong, s"v$i"))
    val src = graft.lake.LakeTable.createTemp(spark,
      srcRows.toDF("id", "v"), "clvac-src")
    val cl = src.shallowClone(
      graft.lake.TempDirs.create("clvac-dst").resolve("t"))
    assert(cl.snapshot().count() == 40)

    // the clone rewrites itself: the borrowed absolute dirs drop out
    // of its live manifest and become vacuum candidates
    cl.overwrite((100 to 102).map(i => (i.toLong, s"c$i")).toDF("id", "v"))
    val (droppedManifests, deletedDirs) = cl.vacuum(retainVersions = 1)
    assert(droppedManifests >= 1, "vacuum must have dropped the create manifest")
    // the borrowed source dirs were drop candidates but are NOT the
    // clone's to delete — only clone-owned dirs may be reclaimed
    assert(deletedDirs == 0,
      s"clone-side vacuum deleted $deletedDirs dirs — it owns none of the dropped ones")

    // the source table still reads every row, bit-for-bit
    val back = src.snapshot().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == srcRows, "clone-side vacuum damaged the source table")

    // and a source-side vacuum still reclaims the source's OWN dirs
    src.overwrite(Seq((1L, "z")).toDF("id", "v"))
    val (_, srcDeleted) = src.vacuum(retainVersions = 1)
    assert(srcDeleted >= 1, "source vacuum must still reclaim its own dirs")
    assert(src.snapshot().count() == 1)
    // the clone (which still borrows the now-vacuumed source dirs) is
    // the documented Delta caveat: source retention must outlive
    // clones — not asserted here beyond the clone's own liveness
    assert(cl.snapshot().count() == 3)
  }
}
