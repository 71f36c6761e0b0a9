package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the modules under `graft.queries`; each
  * module pairs Spark DataFrame programs with DuckDB oracle SQL.
  */
object SparkEntry {

  import _root_.graft.{queries => q}

  private val modules: Seq[(Map[String, q.Qx.Q], Map[String, String])] = Seq(
    (q.Relational.queries, q.Relational.oracles),
    (q.TextMiningQ.queries, q.TextMiningQ.oracles),
    (q.DedupQ.queries, q.DedupQ.oracles),
    (q.SimilarityQ.queries, q.SimilarityQ.oracles),
    (q.TextAnalysisQ.queries, q.TextAnalysisQ.oracles),
    (q.StreamingQ.queries, q.StreamingQ.oracles),
    (q.GridQ.queries, q.GridQ.oracles),
    (q.ParityQ.queries, q.ParityQ.oracles),
    (q.ExtendedQ.queries, q.ExtendedQ.oracles),
    (q.SurfaceQ.queries, q.SurfaceQ.oracles),
    (q.CorpusQ.queries, q.CorpusQ.oracles),
    (q.R14Q.queries, q.R14Q.oracles),
    (q.R15Q.queries, q.R15Q.oracles),
    (q.R15bQ.queries, q.R15bQ.oracles),
    (q.R16Q.queries, q.R16Q.oracles),
    (q.R17Q.queries, q.R17Q.oracles),
    (q.R18Q.queries, q.R18Q.oracles),
    (q.R19Q.queries, q.R19Q.oracles),
    (q.R20Q.queries, q.R20Q.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's most-used shape: keyword search + first match
    * (dags/get_data/kpis_search.py:21-54) as scan → filter → top-1.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(lower(col("text")).contains("spark"))
      .orderBy(desc("doc_id"))
      .limit(1)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver's rows-only check. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
