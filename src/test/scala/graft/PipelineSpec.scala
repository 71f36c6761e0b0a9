package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Grid, Models, TextMining}
import graft.operators.Models.PageImage

/** SURVEY §3.2's restatement made real: the reference's Airflow DAG
  * (scrape → pdf→images → ocr → keyword gate → detect → grid / text
  * mining) collapses into ONE lazy DataFrame program — binary pages in,
  * analytic relations out, stage boundaries as exchanges instead of
  * /tmp files. This test composes the actual shipped operators end to
  * end and checks the laziness claim (nothing runs until the action). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pages = (1L to 6L).flatMap(d =>
    (1L to 2L).map(p => PageImage(d, p, Array.fill[Byte]((d * 37 + p * 11).toInt)(d.toByte))))

  test("binary pages -> ocr -> grid is one lazy program") {
    // stage 1: model inference (mapPartitions seam)
    val lines = Models.infer(pages.toDS(), Models.OcrDouble)
      .withColumn("page_id", expr("doc_id * 100 + page_no"))
      .withColumnRenamed("conf", "score")
    // stage 2: grid reconstruction (NMS + IoU fill + rank)
    val grid = Grid.reconstruct(lines, 400d, 330d)
    // laziness: still a plan, no jobs yet
    assert(grid.queryExecution.logical != null)
    val out = grid.collect()
    assert(out.nonEmpty)
    // every page produced a coherent grid: row/col indices are dense from 1
    val byPage = out.groupBy(_.getLong(0))
    byPage.foreach { case (_, cells) =>
      val rows = cells.map(_.getLong(1)).distinct.sorted
      val cols = cells.map(_.getLong(2)).distinct.sorted
      assert(rows === (1L to rows.max))
      assert(cols === (1L to cols.max))
      assert(cells.length === rows.length * cols.length)
    }
  }

  test("ocr text -> keyword gate -> mining is one lazy program") {
    // page text with an injected French report sentence, then the M11
    // mining pipeline over it — the texteExtract.py path end to end
    val docs = Models.infer(pages.toDS(), Models.OcrDouble)
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", collect_list(col("text"))).as("ocr_text"))
      .select(col("doc_id"),
        concat(lit("le rapport note une hausse de "),
          (col("doc_id") % 9 + 1).cast("string"), lit(",5% en "),
          (col("doc_id") % 3 + 2020).cast("string"), lit(" . "),
          col("ocr_text")).as("text"))
    val mined = TextMining.mine(docs)
    val rows = mined.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length === 6)
    rows.foreach { case (docId, year, vals) =>
      assert(year === (docId % 3 + 2020).toString)
      assert(vals === s"+${docId % 9 + 1},5%")
    }
  }
}
