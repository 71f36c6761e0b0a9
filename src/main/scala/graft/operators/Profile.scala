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

  /** TABLE DIFF — the replication/migration drill-down behind a
    * [[fkCheck]]/checksum mismatch: exact multiset comparison of two
    * relations with the same schema, reported as one row of counts
    * (rows only in A, only in B, common — multiset semantics via
    * exceptAll, so duplicate cardinality differences surface too).
    * Two shuffles on the full row; at 100 TB run it AFTER the cheap
    * order-independent checksum says the tables differ. */
  def tableDiff(a: DataFrame, b: DataFrame): DataFrame = {
    require(a.columns.sameElements(b.columns),
      s"tableDiff: schemas differ: ${a.columns.mkString(",")} vs " +
        b.columns.mkString(","))
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    val nA = a.count()
    a.sparkSession.range(1).select(
      lit(nA - onlyA).as("n_common"),
      lit(onlyA).as("n_only_a"), lit(onlyB).as("n_only_b"))
  }

  /** One declared foreign-key relation: `child.fkCol` should reference
    * `parent.pkCol`. */
  case class FkRelation(name: String, child: DataFrame, fkCol: String,
                        parent: DataFrame, pkCol: String)

  /** REFERENTIAL-INTEGRITY CHECK — [[profileTable]]'s cross-table
    * sibling: for every declared FK relation, the child row count,
    * NULL-FK count (not orphans, per SQL semantics), orphan row count
    * (non-null FK with no parent) and distinct orphan key count. Each
    * relation is ONE left join against the parent's distinct keys
    * (broadcast while the dimension is small, hash otherwise —
    * planner's call) folded to a single row; a violating key is a
    * data bug this check exists to surface BEFORE a downstream inner
    * join silently drops the rows. */
  def fkCheck(relations: Seq[FkRelation]): DataFrame = {
    require(relations.nonEmpty, "fkCheck: no relations declared")
    relations.map { r =>
      val orphan = col(r.fkCol).isNotNull && col("__pk").isNull
      r.child.select(col(r.fkCol))
        .join(r.parent.select(col(r.pkCol).as("__pk")).distinct(),
          col(r.fkCol) === col("__pk"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col(r.fkCol).isNull, 1L).otherwise(0L)).as("n_null_fk"),
          sum(when(orphan, 1L).otherwise(0L)).as("n_orphans"),
          count_distinct(when(orphan, col(r.fkCol))).as("n_orphan_keys"))
        .select(lit(r.name).as("relation"), col("n_child"),
          col("n_null_fk"), col("n_orphans"), col("n_orphan_keys"))
    }.reduce(_ unionByName _)
  }

  /** K-ANONYMITY AUDIT (r15) — the re-identification screen a
    * privacy review runs before a table ships: every quasi-identifier
    * combination shared by FEWER than k rows is a linkage risk (a
    * singleton combination re-identifies its row outright). One
    * map-side-combinable aggregation on the quasi-identifier tuple;
    * the shuffle carries one row per distinct combination, and the
    * violating relation (the output) is the rare tail only. Pair
    * with the PII scrubber (q127): scrub handles direct identifiers,
    * this catches the indirect ones. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2,
      s"kAnonymity: need quasi columns and k >= 2, got $quasiCols/$k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }
}
