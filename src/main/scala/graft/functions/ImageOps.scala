package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Multimodal binary-column operators (SURVEY.md §2.7 F16, §2.8 M1–M8
  * contracts; builder north-star "multimodal columns").
  *
  * Images/audio/video live in the lake as opaque `binary` columns with
  * typed metadata alongside (the `binaryFile` source provides path,
  * length, content). The byte-level transforms here are real and
  * deterministic; the codec-backed DECODE step is a clearly-marked
  * stub (no image libraries exist in this container — see
  * [[decodeStub]]) with the Spark-side plumbing (UDF signatures, batch
  * shape, schema) kept production-shaped. The reference's originals:
  * invert via bitwise_not (ocr.py:42-44), enhance/sharpen
  * (ocr.py:91-99), resize by fractional factors (graphData.py:132-142).
  *
  * All of these are per-row byte transforms — embarrassingly parallel,
  * no shuffle, and at cluster scale they run where the bytes live.
  */
object ImageOps {

  /** Grayscale invert: bitwise NOT per byte (cv2.bitwise_not). */
  def invert(bytes: Array[Byte]): Array[Byte] =
    bytes.map(b => (~b).toByte)

  /** Nearest-neighbor 1-D downsample by 2: every other byte — the
    * fx=0.5 resize stand-in for raw byte planes. */
  def resizeHalf(bytes: Array[Byte]): Array[Byte] =
    bytes.zipWithIndex.collect { case (b, i) if i % 2 == 0 => b }

  /** Mean unsigned byte value — the corner-patch brightness probe that
    * gates inversion in the reference (ocr.py:80-89, threshold 100). */
  def meanByte(bytes: Array[Byte]): Double =
    if (bytes.isEmpty) 0d else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length

  /** STUB — codec decode. A real deployment decodes JPEG/PNG/audio
    * frames here (per-partition codec init, like the reference's
    * module-level model loads); this container has no codec libs, so
    * the stub returns deterministic fake dimensions derived from the
    * byte length. The contract (binary -> (width, height, channels))
    * is what the downstream operators program against. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (math.max(n % 640, 1), math.max(n % 480, 1), 3)
  }

  // Column-function registrations (Scala UDFs over binary; a custom
  // Expression would only pay off if these became hot-path filters)
  val invertUdf = udf(invert _)
  val resizeHalfUdf = udf(resizeHalf _)
  val meanByteUdf = udf(meanByte _)
  val isDark: Column => Column = c => meanByteUdf(c) < 100d
}
