package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Grid

/** End-to-end grid reconstruction on a hand-built page: a 2x2 table
  * with one duplicate detection and one empty cell (golden fixture per
  * SURVEY §5.4). */
class GridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // page 1: cells (r1,c1), (r1,c2)="b", (r2,c1)="c"; (r2,c2) empty.
  // line 4 duplicates (r1,c1) with lower confidence: NMS suppresses its
  // grid-line candidates on both axes, but the cell fill still sees it
  // and the reference's overwrite-in-detection-order means the LAST
  // matching detection wins (tableExtract.py:194-197) -> (r1,c1)="dup".
  private val ocr = Seq(
    (1L, 1L, 10d, 10d, 90d, 30d, "a", 0.9),
    (1L, 2L, 110d, 10d, 190d, 30d, "b", 0.8),
    (1L, 3L, 10d, 50d, 90d, 70d, "c", 0.7),
    (1L, 4L, 12d, 11d, 88d, 29d, "dup", 0.2))
    .toDF("page_id", "line_id", "x1", "y1", "x2", "y2", "text", "score")

  test("reconstruct yields the expected 2x2 grid, last detection wins, empty cell kept") {
    val grid = Grid.reconstruct(ocr, 200d, 100d)
      .orderBy("row_idx", "col_idx")
      .select("row_idx", "col_idx", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(grid.toSeq === Seq(
      (1L, 1L, "dup"), (1L, 2L, "b"),
      (2L, 1L, "c"), (2L, 2L, "")))
  }

  test("toMatrix pivots the exploded grid into row-major string columns") {
    val m = Grid.toMatrix(Grid.reconstruct(ocr, 200d, 100d), 2)
      .orderBy("row_idx")
      .select("c1", "c2").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(m.toSeq === Seq(("dup", "b"), ("c", "")))
  }
}
