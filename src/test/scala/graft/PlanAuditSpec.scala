package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automated scale-guard: no query may plan a CartesianProduct or a
  * BroadcastNestedLoopJoin — the two shapes that stop scaling with
  * input size. Every join in the engine must be hash- or
  * sort-merge-joinable (equi keys, possibly with arithmetic
  * residuals). Runs on the physical plan at sf0.001.
  *
  * Side-effecting queries (streaming drains, DDL, staged writes) are
  * excluded: building their DataFrame executes the pipeline, and their
  * join structure is already covered by the equivalent batch queries.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val sideEffecting = Set(
    "q42_stream_append", "q43_stream_json_flatten", "q44_stream_window",
    "q48_csv_roundtrip", "q54_binary_scan", "q58_table_ddl",
    "q59_stage_checkpoint", "q64_session_window", "q65_sliding_window",
    "q73_json_scan", "q75_partition_overwrite", "q76_partition_pruning",
    "q80_stream_dedup", "q81_stream_stream_join", "q87_frame_sample",
    "q112_stream_time_travel", "q127_stream_scrub", "q138_stream_decontaminate",
    "q93_stateful_count", "q94_schema_merge", "q95_compaction",
    "q96_cdc_apply", "q97_snapshot_read", "q99_bucketed_join",
    "q105_time_travel_merge", "q107_image_decode", "q113_vacuum_read",
    "q115_orc_roundtrip", "q131_stats_skip", "q133_version_diff",
    "q135_incremental_agg", "q137_schema_evolution",
    "q103_dedup_clusters", "q110_chain_clusters",
    "q120_ivf_kmeans", "q123_neardup_kmeans",
    "q126_canonical_docs", "q128_training_pipeline") // localCheckpoint runs jobs at plan build

  /** Justified BroadcastNestedLoopJoins — both are bounded-build-side
    * scans, linear in the big side:
    *  - q37: the deliberate brute-force baseline; its prescreen scores
    *    a BOUNDED broadcast query set against every corpus vector.
    *    Every scale-path variant (q38 IVF, q82 LSH, q66 bucketed
    *    near-dup) must stay nested-loop-free.
    *  - q102: SINGLE-ROW broadcast scalar relations (corpus stats /
    *    document frequencies) cross-joined into the scoring
    *    projection — the declarative form of "embed these scalars",
    *    O(corpus) by construction.
    *  - q119/q120: the k-means quantizer broadcasts its K centroids
    *    (k = 8 rows, a CONSTANT) against the training sample — the
    *    assignment scan is O(corpus x k) by construction, which is
    *    what nearest-centroid assignment costs anywhere.
    *  - q134: hard-negative mining shares q37's prescreen (bounded
    *    broadcast query set, non-equi different-label condition) —
    *    one linear corpus scan per query batch by design. */
  private val allowedBnlj = Set("q37_cosine_topk", "q102_bm25_rank",
    "q119_kmeans_buckets", "q120_ivf_kmeans", "q134_hard_negatives")

  test("no CartesianProduct or BroadcastNestedLoopJoin in any query plan") {
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(sideEffecting)
    val plans = names.map { name =>
      name -> SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
    }.toMap
    val offenders = plans.toSeq.sortBy(_._1).flatMap { case (name, plan) =>
      val bad = Seq("CartesianProduct") ++
        (if (allowedBnlj(name)) Nil else Seq("BroadcastNestedLoopJoin"))
      bad.filter(plan.contains).map(op => s"$name: $op")
    }
    assert(offenders.isEmpty, s"scale-hostile operators found:\n${offenders.mkString("\n")}")
    // the ANN scale paths specifically must be bucketed equi-joins
    Seq("q38_ivf_topk", "q82_lsh_ann", "q66_embed_neardup").foreach { n =>
      assert(!plans(n).contains("BroadcastNestedLoopJoin"), s"$n lost its bucketing")
    }
    assert(names.size > 70) // the audit actually covered the surface
  }

  test("q88 unigram join carries no forced broadcast on the corpus-derived vocab") {
    // The unigram table is corpus-derived (unbounded at web scale): a
    // forced broadcast hint would bypass AQE's size check and OOM the
    // driver on a real corpus. Only AQE may decide to broadcast it.
    val docs = graft.Tables.documents(spark, sf)
    val analyzed = graft.operators.TextAnalysis.unigramQuality(docs)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      "unigramQuality must not force-broadcast the vocabulary relation")
  }
}
