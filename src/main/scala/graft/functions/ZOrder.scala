package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve arithmetic — the multi-dimensional data
  * layout used by Delta OPTIMIZE ZORDER BY / Iceberg sort orders:
  * interleaving the bits of two columns makes points close in EITHER
  * dimension close on the curve, so sorting by the z-value and cutting
  * the table into contiguous files gives every file a narrow min/max
  * range on BOTH columns at once — which is exactly what the lake
  * stats-skipping index ([[graft.lake.LakeTable.scanPruned]]) needs to
  * prune range predicates on either dimension. A single-column sort
  * only ever achieves that for its leading column.
  *
  * Everything here is plain shift/mask integer arithmetic (the
  * classic 16→32-bit spread chain), codegen-friendly on the Spark
  * side and bit-reproducible in any engine with `<<` and `&` — the
  * DuckDB oracle runs [[sqlInterleave]].
  */
object ZOrder {

  /** (shift, mask) chain spreading the low 16 bits of a value to the
    * even bit positions of a 32-bit lane. */
  private val steps = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `c` so bit i lands at position 2i. */
  def spread16(c: Column): Column =
    steps.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code of (x, y): x's bits at even positions, y's at
    * odd. Total order on the z-value is the space-filling curve. */
  def interleave(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Reference JVM implementation (spec oracle). */
  def interleaveRef(x: Long, y: Long): Long = {
    def sp(v0: Long): Long =
      steps.foldLeft(v0 & 0xFFFFL) { case (v, (s, m)) => (v | (v << s)) & m }
    sp(x) | (sp(y) << 1)
  }

  /** The identical computation as an ANSI-ish SQL fragment (DuckDB
    * dialect: `<<` and `&` on BIGINT) over column expressions. */
  def sqlInterleave(xe: String, ye: String): String = {
    def sp(e: String): String =
      steps.foldLeft(s"($e & 65535)") { case (v, (s, m)) => s"(($v | ($v << $s)) & $m)" }
    s"(${sp(xe)} | (${sp(ye)} << 1))"
  }
}
