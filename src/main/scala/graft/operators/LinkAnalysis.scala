package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis operators over an edge relation — the ranking
  * counterpart of the dedup stack's connected components
  * ([[Dedup.dedupClusters]]): where CC answers "which docs are the
  * same", PageRank answers "which nodes matter" (canonical-URL
  * selection, crawl prioritization, citation weighting in a
  * training-data pipeline).
  *
  * INTEGER-EXACT PageRank: every quantity is a BIGINT at a fixed
  * 10^12 scale and every division is integer division, so the result
  * is bit-identical across engines and partitionings — no IEEE
  * accumulation order anywhere (a float PageRank sum is
  * partition-ordered and irreproducible; the standard damping 0.15 +
  * 0.85·x becomes 150e9 + (85·x) DIV 100 at this scale, exact).
  * Dangling mass is dropped (the common simplification); nodes with
  * no in-edges hold the base term.
  *
  * Scale shape: one iteration = one equi-join of edges against
  * (outdeg, scores) + one groupBy(dst) sum — two shuffles on the edge
  * relation, partitioned by src then dst, the textbook distributed PR
  * step. Iteration count is a small constant here; an open-ended
  * fixpoint run should checkpoint each round exactly like
  * `Dedup.dedupClusters` does (localCheckpoint per round, fail-loud
  * budget).
  */
object LinkAnalysis {

  val Scale = 1000000000000L // 10^12
  private val Base = 150000000000L // floor(0.15 * Scale), exact

  /** `iters` damped PageRank rounds over `edges(src, dst)`. Returns
    * (node, score) for every node appearing as a src or dst; scores
    * are BIGINTs at the 10^12 scale (the uniform start state is
    * exactly `Scale`). */
  def pageRankInt(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    var scores = nodes.withColumn("score", lit(Scale))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(outdeg, "src")
        .join(scores.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("score DIV od").as("c"))
      val in = contrib.groupBy(col("dst")).agg(sum(col("c")).as("insum"))
      scores = nodes
        .join(in.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(Base) + expr("(85 * coalesce(insum, 0L)) DIV 100")).as("score"))
    }
    scores
  }
}
