package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed statistics via sufficient-statistic aggregation.
  *
  * Both operators here are one-pass groupBy aggregations: every
  * per-group statistic (slope, correlation) is assembled from sums
  * that Spark computes with map-side partial aggregation, so the
  * shuffle carries one row per (group, statistic-tuple), never the
  * data. That is the 100 TB shape — the alternative (collecting the
  * group to fit a model) carries whole groups in executor memory.
  *
  * Determinism discipline (the oracle gate hash-compares against
  * DuckDB): floating-point SUM is order-dependent, so every sum runs
  * over exact integers (quantized inputs, DECIMAL(38,0) accumulators
  * — overflow-proof at any corpus size), and the statistic is formed
  * by a short, explicitly-ordered chain of IEEE ops on the exact
  * totals. IEEE arithmetic is correctly rounded, so identical inputs
  * + identical op order = bit-identical output on any engine.
  */
object Stats {

  /** Ordinary-least-squares trend per group: slope and mean of
    * `valueCol` (a 2-decimal money-ish double, quantized to exact
    * cents) against the day index of `tsCol` (days since 2020-01-01
    * — a small integer, keeping every cross-product far inside
    * DECIMAL(38,0)).
    *
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), the classic
    * sufficient-statistics form: five exact sums per group, one
    * aggregation pass, no second scan for the residuals. Output
    * slope is in value-units per day (the /100 un-quantizes cents).
    */
  def olsTrend(df: DataFrame, groupCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val d19 = DecimalType(19, 0)
    val x = datediff(to_date(col(tsCol)), lit("2020-01-01")).cast("long")
    val y = floor(col(valueCol) * lit(100.0)).cast("long")
    val g = df
      .select(col(groupCol), x.as("x"), y.as("y2"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y2").cast(d38)).as("sy"),
        sum((col("x").cast(d19) * col("x").cast(d19)).cast(d38)).as("sxx"),
        sum((col("x").cast(d19) * col("y2").cast(d19)).cast(d38)).as("sxy"))
    // One cast per exact total, then an explicitly-ordered IEEE chain
    // (mirrored token-for-token in the oracle SQL).
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val sxy = col("sxy").cast("double")
    g.select(
      col(groupCol),
      col("n"),
      ((n * sxy - sx * sy) / (n * sxx - sx * sx) / lit(100.0)).as("slope_per_day"),
      (sy / n / lit(100.0)).as("mean_value"))
  }

  /** Rank correlation per group between two orderings — Spearman's ρ
    * with DETERMINISTIC tie-breaking: ranks are `row_number` over
    * (key, tieCol), a total order, so the statistic is exactly
    * reproducible on any engine (classic Spearman's fractional
    * average ranks need no tie-break but cost a second window pass
    * and a non-integer accumulator; with a unique tie column the two
    * agree whenever the data is tie-free).
    *
    * Pearson on integer ranks, all sums exact in DECIMAL(38,0):
    * ρ = (n·Σab − Σa·Σb) / (√(n·Σa² − (Σa)²) · √(n·Σb² − (Σb)²)).
    * The two windows partition by the group key — at scale each
    * group sorts within its own hash partition, no global sort.
    */
  def rankCorrelation(df: DataFrame, groupCol: String, aCol: Column,
                      bCol: Column, tieCol: Column): DataFrame = {
    val d38 = DecimalType(38, 0)
    val d19 = DecimalType(19, 0)
    val wa = Window.partitionBy(col(groupCol)).orderBy(aCol, tieCol)
    val wb = Window.partitionBy(col(groupCol)).orderBy(bCol, tieCol)
    val ranked = df.select(col(groupCol),
      row_number().over(wa).cast("long").as("ra"),
      row_number().over(wb).cast("long").as("rb"))
    val g = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("ra").cast(d38)).as("sa"),
      sum(col("rb").cast(d38)).as("sb"),
      sum((col("ra").cast(d19) * col("ra").cast(d19)).cast(d38)).as("saa"),
      sum((col("rb").cast(d19) * col("rb").cast(d19)).cast(d38)).as("sbb"),
      sum((col("ra").cast(d19) * col("rb").cast(d19)).cast(d38)).as("sab"))
    val n = col("n").cast("double")
    val sa = col("sa").cast("double")
    val sb = col("sb").cast("double")
    val saa = col("saa").cast("double")
    val sbb = col("sbb").cast("double")
    val sab = col("sab").cast("double")
    g.select(
      col(groupCol),
      col("n"),
      ((n * sab - sa * sb) /
        (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb))).as("rank_corr"))
  }
}
