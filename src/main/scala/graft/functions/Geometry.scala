package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Box geometry for the table-grid reconstruction flagship
  * (SURVEY.md §2.8 M6/J1; reference
  * /root/reference/dags/get_data/tableExtract.py:171-197).
  *
  * The IoU exists twice on purpose:
  *  - [[iou]] — plain Scala on [[Box]], used inside the sequential NMS
  *    loop and unit/property tests;
  *  - [[iouCol]] — the same formula as a Column expression tree
  *    (greatest/least/abs arithmetic), so an IoU theta join stays
  *    inside whole-stage codegen instead of calling a UDF per pair.
  */
object Geometry {

  /** Axis-aligned box, [x1, y1, x2, y2] like the reference's reduced
    * quad (tableExtract.py:136-143). */
  final case class Box(x1: Double, y1: Double, x2: Double, y2: Double) {
    def area: Double = math.abs((x2 - x1) * (y2 - y1))
  }

  /** IoU exactly as tableExtract.py:174-188: zero when the
    * intersection is empty, else inter / (a1 + a2 - inter). */
  def iou(a: Box, b: Box): Double = {
    val x1 = math.max(a.x1, b.x1)
    val y1 = math.max(a.y1, b.y1)
    val x2 = math.min(a.x2, b.x2)
    val y2 = math.min(a.y2, b.y2)
    val inter = math.abs(math.max(x2 - x1, 0d) * math.max(y2 - y1, 0d))
    if (inter == 0d) 0d
    else inter / (a.area + b.area - inter)
  }

  /** Column form of [[iou]] over (x1,y1,x2,y2) column quadruples. Pure
    * arithmetic — usable directly as a join condition with no UDF. */
  def iouCol(ax1: Column, ay1: Column, ax2: Column, ay2: Column,
             bx1: Column, by1: Column, bx2: Column, by2: Column): Column = {
    val iw = greatest(least(ax2, bx2) - greatest(ax1, bx1), lit(0d))
    val ih = greatest(least(ay2, by2) - greatest(ay1, by1), lit(0d))
    val inter = abs(iw * ih)
    val areaA = abs((ax2 - ax1) * (ay2 - ay1))
    val areaB = abs((bx2 - bx1) * (by2 - by1))
    when(inter === 0d, lit(0d)).otherwise(inter / (areaA + areaB - inter))
  }

  /** Intersection cell of a horizontal and a vertical grid-line strip
    * (tableExtract.py:171-172): x-extent from the vertical strip,
    * y-extent from the horizontal one. */
  def intersectionCell(h: Box, v: Box): Box = Box(v.x1, h.y1, v.x2, h.y2)

  /** Greedy non-maximum suppression, the tf.image.non_max_suppression
    * contract used at tableExtract.py:145-161: consider boxes by score
    * descending (ties broken by id ascending — TF's stable order), keep
    * a box iff its IoU with every already-kept box is <= iouThreshold,
    * stop at maxOutputSize. Returns kept ids in selection order. */
  def nms(boxes: Seq[(Long, Box, Double)], iouThreshold: Double = 0.1,
          maxOutputSize: Int = 1000): Seq[Long] = {
    val ordered = boxes.sortBy { case (id, _, score) => (-score, id) }
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Box)]
    val it = ordered.iterator
    while (it.hasNext && kept.size < maxOutputSize) {
      val (id, box, _) = it.next()
      if (kept.forall { case (_, k) => iou(box, k) <= iouThreshold })
        kept += ((id, box))
    }
    kept.map(_._1).toSeq
  }

  /** F13/A4 — crop-bound arithmetic with greatest/least clamps
    * (tableExtract.py:58-72): denormalize a [cx, cy, w, h] detection,
    * pad by `pad` (fraction), clamp to the image. Returns (x1, y1, x2,
    * y2) integer columns. */
  def cropBounds(cx: Column, cy: Column, w: Column, h: Column,
                 imgW: Column, imgH: Column, pad: Double = 0.02): Seq[Column] = {
    val x1 = (cx - w / 2 - lit(pad)) * imgW
    val y1 = (cy - h / 2 - lit(pad)) * imgH
    val x2 = (cx + w / 2 + lit(pad)) * imgW
    val y2 = (cy + h / 2 + lit(pad)) * imgH
    Seq(
      floor(greatest(x1, lit(0d))).cast("long").as("x1"),
      floor(greatest(y1, lit(0d))).cast("long").as("y1"),
      floor(least(x2, imgW)).cast("long").as("x2"),
      floor(least(y2, imgH)).cast("long").as("y2"))
  }
}
