package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** POINT-IN-TIME (backward as-of) JOIN — the feature-store canon: for
  * every observation row, attach the feature row with the greatest
  * feature time at-or-before the observation time, per key. This is
  * the join that makes offline training features leakage-free (no
  * future information) and it is NOT a Spark built-in.
  *
  * Implementation is the merge-join formulation, not a range join:
  * union the two sides tagged by origin, sort within each key's hash
  * partition by (ts, side, feature-tie) — features BEFORE observations
  * at equal ts, so "at-or-before" is inclusive; larger tie last, so
  * equal-time features resolve deterministically to the greatest tie —
  * and carry the latest feature payload forward with one
  * `last(_, ignoreNulls)` over a strictly-running ROWS frame. The
  * payload travels as ONE struct, so all carried columns come from the
  * SAME matched feature row even when some of its fields are null
  * (separate per-column carries would mix rows).
  *
  * Scale: one shuffle of obs+feat on the key, a sort within each
  * partition, zero self-joins and zero per-key arrays — the same plan
  * shape at 100 TB, with cost linear in rows per key. Contrast with
  * the range-join formulation (key equi-join + ts inequality), which
  * multiplies candidates before filtering.
  */
object AsOf {

  /** @param obs      observation side (keeps one output row per obs row)
    * @param feat     feature side (latest at-or-before row is attached)
    * @param keyCol   equi-join key present on both sides
    * @param tsCol    event-time column present on both sides (any
    *                 orderable type; pass µs longs for exactness)
    * @param obsTie   unique id on the observation side (carried through)
    * @param featTie  unique id on the feature side (deterministic
    *                 tie-break among equal-time features; emitted as
    *                 `asof_<featTie>`)
    * @param featCols feature payload columns, emitted as `asof_<name>`
    *                 (null when no feature precedes the observation —
    *                 left as-of semantics)
    */
  def pointInTimeJoin(obs: DataFrame, feat: DataFrame, keyCol: String,
                      tsCol: String, obsTie: String, featTie: String,
                      featCols: Seq[String]): DataFrame = {
    val payload = struct(
      (featCols.map(col) :+ col(featTie).cast("long").as("__ftie")): _*)
    val featSel = feat.select(col(keyCol), col(tsCol).as("__ts"),
      lit(0).as("__side"), lit(null).cast("long").as("__obs_tie"),
      payload.as("__p"))
    val payloadType = featSel.schema("__p").dataType
    val obsSel = obs.select(col(keyCol), col(tsCol).as("__ts"),
      lit(1).as("__side"), col(obsTie).cast("long").as("__obs_tie"),
      lit(null).cast(payloadType).as("__p"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"), col("__p").getField("__ftie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = featSel.unionByName(obsSel)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carried.select(
      col(keyCol) +: col("__obs_tie").as(obsTie) +: col("__ts").as(tsCol) +:
        (featCols.map(c => col("__m").getField(c).as(s"asof_$c")) :+
          col("__m").getField("__ftie").as(s"asof_$featTie")): _*)
  }
}
