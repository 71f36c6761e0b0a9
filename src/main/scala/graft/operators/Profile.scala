package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TABLE PROFILING — the data-quality pass a pipeline runs on every
  * new drop before trusting it: per column, the row count, NULL
  * count, exact distinct count, and min/max (numeric columns report
  * doubles, string columns report strings; the other family's slots
  * are NULL so one relation profiles a mixed table).
  *
  * One distributed aggregation computes every statistic in a single
  * pass over the data (the multiple exact COUNT(DISTINCT)s plan as
  * one expand + partial aggregation — no per-column scans), then the
  * single stats row is pivoted to one row per column driver-free with
  * an `inline` over a literal-indexed struct array. Exact distincts
  * are deliberate: at profile time an approximation hides exactly the
  * anomalies (near-duplicate keys, silent truncation) the profile
  * exists to catch; swap `count_distinct` for
  * `approx_count_distinct` per column when 2% error is acceptable.
  */
object Profile {

  def profileTable(df: DataFrame, numCols: Seq[String],
                   strCols: Seq[String]): DataFrame = {
    def nNull(c: String): Column =
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c")
    val aggs: Seq[Column] =
      (numCols ++ strCols).flatMap { c =>
        Seq(nNull(c), count_distinct(col(c)).as(s"nd_$c"))
      } ++
        numCols.flatMap { c =>
          Seq(min(col(c)).cast("double").as(s"mn_$c"),
            max(col(c)).cast("double").as(s"mx_$c"))
        } ++
        strCols.flatMap { c =>
          Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))
        }
    val stats = df.agg(count(lit(1)).as("n"), aggs: _*)
    val rows: Seq[Column] =
      numCols.map { c =>
        struct(lit(c).as("column_name"), col("n").as("n_rows"),
          col(s"nn_$c").as("n_null"), col(s"nd_$c").as("n_distinct"),
          col(s"mn_$c").as("min_num"), col(s"mx_$c").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
      } ++ strCols.map { c =>
        struct(lit(c).as("column_name"), col("n").as("n_rows"),
          col(s"nn_$c").as("n_null"), col(s"nd_$c").as("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col(s"mn_$c").as("min_str"), col(s"mx_$c").as("max_str"))
      }
    stats.select(inline(array(rows: _*)))
  }
}
