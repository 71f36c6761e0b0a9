package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Grid, Models}
import graft.operators.Models.{OcrLine, PageImage}

/** The model-contract seam: doubles run end-to-end through the real
  * downstream operators (M1 double -> M6 grid reconstruction), the
  * composition the reference performs per page
  * (tableExtract.py:204-226). */
class ModelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pages = Seq(
    PageImage(1L, 1L, Array.fill[Byte](123)(40)),
    PageImage(1L, 2L, Array.fill[Byte](64)(120)),
    PageImage(2L, 1L, Array.fill[Byte](257)(7)))

  test("ocr double is deterministic and batch-shaped") {
    val a = Models.infer(pages.toDS(), Models.OcrDouble).collect().sortBy(l => (l.doc_id, l.page_no, l.line_id))
    val b = Models.infer(pages.toDS(), Models.OcrDouble).collect().sortBy(l => (l.doc_id, l.page_no, l.line_id))
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty && a.forall(l => l.conf >= 0.5 && l.conf < 1.0))
  }

  test("ocr double output feeds grid reconstruction end-to-end") {
    val lines = Models.infer(pages.toDS(), Models.OcrDouble)
      .withColumnRenamed("conf", "score")
      .withColumn("page_id",
        org.apache.spark.sql.functions.expr("doc_id * 100 + page_no"))
    val grid = Grid.reconstruct(lines, 400d, 330d)
    assert(grid.count() > 0)
    // every page yields rows x 1 column (all lines share x extent)
    val perPage = grid.groupBy("page_id").count().collect()
    assert(perPage.forall(_.getLong(1) >= 1))
  }

  test("deplot double output parses with the total M12 parser") {
    val df = Models.infer(pages.toDS(), Models.DeplotDouble)
      .toDF("doc_id", "page_no", "lin")
    val parsed = graft.operators.Deplot.parseYearValue(
      df, org.apache.spark.sql.functions.col("lin"),
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("page_no"))
    val rows = parsed.collect()
    assert(rows.length === pages.size * 2)
    assert(rows.forall(r => !r.isNullAt(3) && !r.isNullAt(4)))
  }

  test("preprocess inverts dark pages only") {
    val dark = Array.fill[Byte](10)(20)
    val bright = Array.fill[Byte](10)(-56) // 0xc8 = 200
    assert(Models.preprocess(dark).toSeq === graft.functions.ImageOps.invert(dark).toSeq)
    assert(Models.preprocess(bright).toSeq === bright.toSeq)
  }

  test("pageText joins lines in line order") {
    val lines = Seq(
      OcrLine(1, 1, 2, 0, 0, 1, 1, "b", 0.9),
      OcrLine(1, 1, 1, 0, 0, 1, 1, "a", 0.8))
    assert(Models.pageText(lines) === "a b")
  }
}
