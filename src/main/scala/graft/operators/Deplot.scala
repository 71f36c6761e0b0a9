package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M12 — parse of a "deplot" linearized chart table
  * (activity_test.py:90-118, notePresentation.py:60-77): line 1 is a
  * title, line 2 the `|`-separated header, lines 3+ are `|`-separated
  * body rows; lines are delimited by a literal `<0x0A>` token. The
  * reference crashes on rows without exactly two fields
  * (notePresentation.py:71 unpacking); this version is TOTAL —
  * malformed rows yield null fields (SURVEY §2.8 M12 calls out the
  * divergence). */
object Deplot {

  /** df + a linearized-text column -> (..keys.., row_idx, annee,
    * valeur): the 2-column year/value variant with European
    * decimal-comma normalization (P9). */
  def parseYearValue(df: DataFrame, lin: Column, keys: Column*): DataFrame =
    df
      .withColumn("lines", split(lin, " <0x0A> "))
      .select((keys :+ posexplode(slice(col("lines"), lit(3), size(col("lines")) - 2))): _*)
      .withColumn("fields", split(col("col"), " \\| "))
      .select((keys ++ Seq(
        (col("pos") + 1).cast("long").as("row_idx"),
        when(size(col("fields")) === 2, trim(element_at(col("fields"), 1)))
          .as("annee"),
        when(size(col("fields")) === 2,
          expr("try_cast(replace(trim(element_at(fields, 2)), ',', '.') AS DOUBLE)"))
          .as("valeur"))): _*)
}
