package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Geometry
import graft.functions.Geometry.Box

/** M6 table-grid reconstruction (the reference's flagship custom
  * operator, tableExtract.py:112-200) as a distributed pipeline over an
  * OCR-lines relation `(page_id, line_id, x1, y1, x2, y2, text,
  * score)`:
  *
  *  1. project every line into a full-width horizontal strip and a
  *     full-height vertical strip (:133-143);
  *  2. greedy NMS per page and axis (IoU 0.1, cap 1000, :145-161) —
  *     sequential per page, so it runs as `flatMapGroups` keyed by
  *     page: each page's few hundred candidates are suppressed
  *     in-memory on one task while pages parallelize across the
  *     cluster (the per-group state is bounded by the NMS cap, never by
  *     table size);
  *  3. rank surviving rows by detection order and columns by x (O1/O2,
  *     :163-169);
  *  4. build each cell as the strip intersection and fill it via the
  *     IoU > 0.09 spatial theta join (J1, :171-197) — the IoU is a
  *     pure-arithmetic Column expression, so the join stays inside
  *     whole-stage codegen; page equality makes it a hash join with an
  *     arithmetic residual, never a cross product;
  *  5. emit the grid exploded as (page_id, row_idx, col_idx, text) —
  *     the relational form of the R×C string matrix (:167, :200); a
  *     `groupBy(row).pivot(col)` re-assembles the matrix when needed.
  */
/** Encoder row for the per-page NMS stage (must be a public top-level
  * case class so the generated deserializer can reach it). */
case class ScoredBox(page_id: Long, line_id: Long,
                     x1: Double, y1: Double, x2: Double, y2: Double,
                     score: Double)

object Grid {

  /** Greedy NMS per page over (page_id, line_id, x1..y2, score) rows;
    * returns the surviving (page_id, line_id) pairs. */
  def nmsSurvivors(boxes: DataFrame, iouThreshold: Double = 0.1,
                   maxOutputSize: Int = 1000): DataFrame = {
    val spark = boxes.sparkSession
    import spark.implicits._
    boxes
      .select(col("page_id").cast("long"), col("line_id").cast("long"),
        col("x1").cast("double"), col("y1").cast("double"),
        col("x2").cast("double"), col("y2").cast("double"),
        col("score").cast("double"))
      .as[ScoredBox]
      .groupByKey(_.page_id)
      .flatMapGroups { (pid, it) =>
        val items = it.map(b => (b.line_id, Box(b.x1, b.y1, b.x2, b.y2), b.score)).toSeq
        Geometry.nms(items, iouThreshold, maxOutputSize).map(id => (pid, id))
      }
      .toDF("page_id", "line_id")
  }

  /** Full reconstruction. `ocr` columns: page_id, line_id, x1, y1, x2,
    * y2, text, score; `imgW`/`imgH` bound the strips. */
  def reconstruct(ocr: DataFrame, imgW: Double, imgH: Double): DataFrame = {
    val horiz = ocr.select(col("page_id"), col("line_id"),
      lit(0d).as("x1"), col("y1").cast("double").as("y1"),
      lit(imgW).as("x2"), col("y2").cast("double").as("y2"), col("score"))
    val vert = ocr.select(col("page_id"), col("line_id"),
      col("x1").cast("double").as("x1"), lit(0d).as("y1"),
      col("x2").cast("double").as("x2"), lit(imgH).as("y2"), col("score"))

    // NMS survivors joined back to their strip geometry
    val hsurv = nmsSurvivors(horiz).join(horiz, Seq("page_id", "line_id"))
      .withColumn("row_idx",
        row_number().over(Window.partitionBy("page_id").orderBy("line_id")).cast("long"))
      .select(col("page_id"), col("row_idx"), col("y1").as("hy1"), col("y2").as("hy2"))
    val vsurv = nmsSurvivors(vert).join(vert, Seq("page_id", "line_id"))
      .withColumn("col_idx",
        row_number().over(Window.partitionBy("page_id").orderBy("x1", "line_id")).cast("long"))
      .select(col("page_id"), col("col_idx"), col("x1").as("vx1"), col("x2").as("vx2"))

    // cells = per-page row-strip x col-strip intersections (R x C per page)
    val cells = hsurv.join(vsurv, "page_id")

    // J1: IoU > 0.09 spatial fill; the reference overwrites in line
    // order so the max line_id wins (tableExtract.py:194-197)
    val iou = Geometry.iouCol(
      col("vx1"), col("hy1"), col("vx2"), col("hy2"),
      col("b.x1"), col("b.y1"), col("b.x2"), col("b.y2"))
    cells.alias("c")
      .join(ocr.alias("b"),
        col("c.page_id") === col("b.page_id") && iou > 0.09, "left")
      .groupBy(col("c.page_id").as("page_id"), col("c.row_idx").as("row_idx"),
        col("c.col_idx").as("col_idx"))
      .agg(coalesce(max_by(col("b.text"), col("b.line_id")), lit("")).as("text"))
  }

  /** Matrix form: one output row per grid row, columns c1..cN
    * (groupBy + pivot — the M6 grid-assembly shape). */
  def toMatrix(grid: DataFrame, nCols: Int): DataFrame = {
    val piv = grid.groupBy(col("page_id"), col("row_idx"))
      .pivot("col_idx", (1 to nCols).map(Integer.valueOf))
      .agg(first(col("text")))
    val renamed = (1 to nCols).foldLeft(piv)((df, c) => df.withColumnRenamed(s"$c", s"c$c"))
    renamed.na.fill("", (1 to nCols).map(c => s"c$c"))
  }
}
