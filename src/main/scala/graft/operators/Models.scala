package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import graft.functions.ImageOps

/** Contracts for the reference's model-backed operators (SURVEY §2.8
  * M1 OCR, M4 table detection, M7 layout detection, M8 chart→table)
  * and their deterministic test doubles.
  *
  * The neural models themselves don't exist on the JVM; what the
  * engine ships is the *operator contract*: a batched per-partition
  * column transform with lazily-initialized per-executor state — the
  * Spark analog of the reference loading its model once at module
  * import (tableExtract.py:30, graphData.py:32-35) and batching
  * inference (ocr.py:23 max_batch_size=32). A real deployment swaps
  * the double for a JNI/ONNX-backed implementation with the same
  * signature; every downstream operator (crop, grid, deplot parse,
  * mining) is already programmed against the contract types.
  */
object Models {

  /** A page image row: opaque bytes + identity. */
  case class PageImage(doc_id: Long, page_no: Long, content: Array[Byte])

  /** M1 output row: one OCR line (reduced box, text, confidence). */
  case class OcrLine(doc_id: Long, page_no: Long, line_id: Long,
                     x1: Double, y1: Double, x2: Double, y2: Double,
                     text: String, conf: Double)

  /** M4/M7 output row: one detection (normalized cxcywh + class). */
  case class Detection(doc_id: Long, page_no: Long, det_id: Long,
                       cx: Double, cy: Double, w: Double, h: Double,
                       score: Double, cls: String)

  /** A model is a per-partition batched transform. Implementations
    * hold their expensive state in a lazy val so it is created once
    * per executor JVM, not per task. */
  trait ColumnModel[I, O] extends Serializable {
    def name: String
    def transform(batch: Iterator[I]): Iterator[O]
  }

  /** Run a model over a Dataset partition-wise (the mapPartitions
    * seam every M-operator uses — no shuffle, model state amortized
    * across the partition). */
  def infer[I, O: Encoder](ds: Dataset[I], model: ColumnModel[I, O]): Dataset[O] =
    ds.mapPartitions(it => model.transform(it))

  /** Deterministic M1 double: derives a plausible line relation from
    * the page bytes alone (length-seeded), so pipelines are end-to-end
    * runnable and repeatable without weights. */
  object OcrDouble extends ColumnModel[PageImage, OcrLine] {
    val name = "ocr-double"
    def transform(batch: Iterator[PageImage]): Iterator[OcrLine] =
      batch.flatMap { p =>
        val nLines = (p.content.length % 5) + 1
        (1 to nLines).map { i =>
          val y = i * 40d
          OcrLine(p.doc_id, p.page_no, i.toLong,
            10d, y + 3, 90d + (p.content.length % 7) * 10, y + 33,
            s"line-${p.doc_id}-${p.page_no}-$i",
            0.5 + (((p.content.length * 31 + i * 17) % 50) / 100.0))
        }
      }
  }

  /** Deterministic M4 double: one centered "table" detection per page
    * whose size is seeded by the byte length. */
  object DetectionDouble extends ColumnModel[PageImage, Detection] {
    val name = "table-detection-double"
    def transform(batch: Iterator[PageImage]): Iterator[Detection] =
      batch.map { p =>
        Detection(p.doc_id, p.page_no, 1L,
          0.5, 0.5,
          0.3 + (p.content.length % 40) / 100.0,
          0.2 + (p.content.length % 30) / 100.0,
          0.9, "Table")
      }
  }

  /** Deterministic M8 double: emits the deplot linearized-table text
    * downstream M12 parsing consumes (graphData.py:147-151 shape). */
  object DeplotDouble extends ColumnModel[PageImage, (Long, Long, String)] {
    val name = "deplot-double"
    def transform(batch: Iterator[PageImage]): Iterator[(Long, Long, String)] =
      batch.map { p =>
        val y1 = 2015 + (p.content.length % 5)
        val v1 = s"${p.content.length % 90},${p.content.length % 10}"
        (p.doc_id, p.page_no,
          s"TITLE chart <0x0A> annee | valeur <0x0A> $y1 | $v1 <0x0A> ${y1 + 1} | ${p.content.length % 7},5")
      }
  }

  /** M2: page text = OCR line texts joined with spaces (ocr.py:58-67),
    * with the dark-page invert gate (ocr.py:42-43) applied to the
    * bytes first. */
  def pageText(lines: Seq[OcrLine]): String =
    lines.sortBy(_.line_id).map(_.text).mkString(" ")

  /** The A1 preprocessing gate: invert when the brightness probe says
    * the page is dark (ocr.py:42-43, threshold 100). */
  def preprocess(content: Array[Byte]): Array[Byte] =
    if (ImageOps.meanByte(content) < 100d) ImageOps.invert(content) else content
}
