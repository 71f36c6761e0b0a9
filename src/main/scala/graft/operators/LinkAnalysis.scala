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
  * step. Every round localCheckpoints (VERDICT r7 wrong #3, the
  * `Dedup.dedupClusters` discipline): without lineage truncation an
  * open-ended run re-derives the whole upstream DAG per round —
  * exponential plan growth long before any scale problem.
  */
object LinkAnalysis {

  val Scale = 1000000000000L // 10^12
  private val Base = 150000000000L // floor(0.15 * Scale), exact

  /** Damped PageRank rounds over `edges(src, dst)`. Returns
    * (node, score) for every node appearing as a src or dst; scores
    * are BIGINTs at the 10^12 scale (the uniform start state is
    * exactly `Scale`).
    *
    * With `tol = None` runs EXACTLY `iters` rounds (the fixed-round
    * contract q136's oracle unrolls). With `tol = Some(t)`, `iters`
    * becomes a fail-loud BUDGET: the run stops at the first round
    * whose max |Δscore| is <= t — exact BIGINT arithmetic, so
    * `Some(0L)` is a true integer fixpoint, no epsilon — and THROWS
    * if the budget is exhausted unconverged, never returning
    * silently-unconverged scores (the `dedupClusters` rule; the
    * fixpoint probe is a `head(1)` on a checkpointed relation, O(1)
    * driver-side). */
  def pageRankInt(edges: DataFrame, iters: Int = 3,
                  tol: Option[Long] = None): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od")).localCheckpoint(true)
    var scores = nodes.withColumn("score", lit(Scale)).localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val next = prRound(e, outdeg, scores).localCheckpoint(true)
      tol.foreach { t =>
        converged = next.filter(abs(col("score") - col("oscore")) > t).head(1).isEmpty
      }
      scores = next.select(col("node"), col("score"))
      i += 1
    }
    if (tol.isDefined && !converged) throw new IllegalStateException(
      s"pageRankInt did not converge within $iters iterations " +
        s"(tol=${tol.get}); raise the budget")
    scores
  }

  /** One un-checkpointed PageRank round: edges ⋈ outdeg ⋈ scores on
    * src, groupBy(dst) sum, damped update — carrying the previous
    * score as `oscore` so the loop's fixpoint test is a filter.
    * Extracted so `PlanAuditSpec` can walk the round's physical plan
    * (the loop checkpoints it, which executes at plan build). */
  private[graft] def prRound(e: DataFrame, outdeg: DataFrame,
                             scores: DataFrame): DataFrame = {
    val contrib = e
      .join(outdeg, "src")
      .join(scores.withColumnRenamed("node", "src"), "src")
      .select(col("dst"), expr("score DIV od").as("c"))
    val in = contrib.groupBy(col("dst")).agg(sum(col("c")).as("insum"))
    scores.withColumnRenamed("score", "oscore")
      .join(in.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .select(col("node"), col("oscore"),
        (lit(Base) + expr("(85 * coalesce(insum, 0L)) DIV 100")).as("score"))
  }

  /** TRIANGLE ENUMERATION — the graph-quality metric next to PageRank
    * (clustering coefficient, community density, link-farm
    * detection). Edges are first canonicalized to an ORIENTED
    * undirected form (a < b, distinct, self-loops dropped), which is
    * the classic exactly-once trick: every triangle {x,y,z} with
    * x<y<z is produced solely as the wedge (x,y)+(y,z) closed by
    * (x,z), so no post-hoc dedup pass is needed.
    *
    * Scale shape: two hash equi-joins on single vertex keys — wedge
    * generation joins b=b' (partitioned on the shared vertex),
    * closure joins (a,c) against the edge set. Cost is
    * Σ deg(v)² for wedges, the standard bound; at 100 TB the known
    * refinement (orient by degree instead of id, cutting the bound
    * to O(E^1.5)) drops in by replacing the a<b comparator — id
    * order keeps the oracle expressible and is exact at any size. */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val wedges = und.alias("e1")
      .join(und.alias("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    wedges.join(und,
        wedges("x") === und("a") && wedges("z") === und("b"))
      .select(col("x"), col("y"), col("z"))
  }

  /** LOCAL CLUSTERING COEFFICIENT per node — [[triangles]] composed
    * with degrees: c(v) = 2·t(v) / (deg(v)·(deg(v)−1)), the "how
    * cliquish is this node's neighborhood" metric (spam-farm and
    * community-density detection). Every count is exact; the
    * coefficient is ONE IEEE division of exact integers, NULL below
    * degree 2 (undefined, not zero). Triangle membership is the
    * exactly-once enumeration exploded back to its three corners —
    * three bounded projections and one groupBy, no new join shape. */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tri = triangles(edges)
    val triPerNode = tri.select(col("x").as("node"))
      .unionAll(tri.select(col("y").as("node")))
      .unionAll(tri.select(col("z").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("coeff",
        when(col("degree") >= 2,
          (lit(2L) * col("n_triangles")).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double")))
  }

  /** SYNCHRONOUS LABEL PROPAGATION community detection (r14) —
    * Raghavan et al.'s LPA made deterministic: every node starts
    * labeled with its own id; each round, every node simultaneously
    * adopts its neighbors' MODE label with ties broken (count desc,
    * label asc) — no RNG, no asynchronous order dependence, so a
    * fixed round count replays bit-identically in the unrolled-CTE
    * oracle (the [[pageRankInt]] stance; LPA oscillates on bipartite
    * structures under plain synchronous updates, which a fixed round
    * budget sidesteps deterministically).
    *
    * One round = one hash equi-join (undirected edges ⋈ labels on the
    * neighbor key) + one (node, label) count + one per-node top-1 —
    * all shuffles on the node key, `WindowGroupLimit`-prunable, with
    * a per-round `localCheckpoint` truncating the lineage exactly as
    * the PageRank fixpoint does. Nodes are edge endpoints (an
    * isolated node has no neighbors to vote). */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"labelPropagation: rounds must be >= 1, got $rounds")
    import org.apache.spark.sql.expressions.Window
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.filter(col("src") =!= col("dst"))
        .select(col("dst").as("a"), col("src").as("b")))
      .distinct().localCheckpoint(true)
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to rounds) {
      val votes = und
        .join(labels.select(col("node").as("nb"), col("lbl")),
          col("b") === col("nb"))
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("c"))
      val top = Window.partitionBy(col("a"))
        .orderBy(desc("c"), asc("lbl"))
      labels = votes.withColumn("rn", row_number().over(top))
        .filter(col("rn") === 1)
        .select(col("a").as("node"), col("lbl"))
        .localCheckpoint(true)
    }
    labels.withColumnRenamed("lbl", "community")
  }

  /** PERSONALIZED PAGERANK (r15) — [[pageRankInt]] with the teleport
    * mass restarting at ONE source node instead of uniformly: the
    * relevance-to-s ranking behind "related items" / seed-expansion
    * curation. Same exact-integer discipline (10¹² fixed point,
    * truncating div), fixed `iters` rounds, per-round
    * `localCheckpoint`; the oracle unrolls the rounds with the
    * restart term in the update. Scores decay with distance from the
    * source; unreachable nodes stay 0. */
  def pageRankPersonalizedInt(edges: DataFrame, source: Long,
                              iters: Int = 3): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(true)
    var scores = nodes.withColumn("score",
      when(col("node") === source, lit(Scale)).otherwise(lit(0L)))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = e
        .join(outdeg, "src")
        .join(scores.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("score DIV od").as("c"))
      val in = contrib.groupBy(col("dst")).agg(sum(col("c")).as("insum"))
      scores = nodes
        .join(in.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (when(col("node") === source, lit(Base)).otherwise(lit(0L)) +
            expr("(85 * coalesce(insum, 0L)) DIV 100")).as("score"))
        .localCheckpoint(true)
    }
    scores
  }

  /** BOUNDED-HOP WEIGHTED SHORTEST PATHS (r15) — single-source
    * Bellman-Ford over `edges(src, dst, w)` with non-negative LONG
    * weights, run for exactly `hops` relaxation rounds: after round
    * k, `dist(v)` is the exact cheapest cost among paths of ≤ k
    * edges. The bounded-hop form IS the production question on
    * event/link graphs ("cheapest influence path within 4 steps") and
    * keeps the oracle finite (a recursive CTE enumerating ≤ hops-edge
    * walks).
    *
    * Scale shape: one round = frontier ⋈ edges on src (hash join) +
    * a min groupBy — the Pregel/GraphX SSSP superstep on plain
    * DataFrames. Only nodes whose distance IMPROVED join the next
    * frontier, so rounds touch the active subgraph, not the whole
    * node set; per-round `localCheckpoint` truncates the loop's
    * lineage (the pageRankInt rule). Integer-exact, so results are
    * partitioning-proof. Returns (node, dist) for reached nodes. */
  def ssspBounded(edges: DataFrame, source: Long, hops: Int): DataFrame = {
    require(hops >= 1, s"ssspBounded: hops >= 1, got $hops")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .distinct().localCheckpoint(true)
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    var i = 0
    while (i < hops && frontier.head(1).nonEmpty) {
      val relaxed = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("cand"))
        .groupBy(col("node")).agg(min(col("cand")).as("cand"))
      val joined = relaxed.join(dist.withColumnRenamed("dist", "old"),
          Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("cand"), col("old")),
            coalesce(col("old"), col("cand"))).as("dist"),
          (coalesce(col("old"), lit(Long.MaxValue)) >
            coalesce(col("cand"), lit(Long.MaxValue))).as("improved"))
        .localCheckpoint(true)
      frontier = joined.filter(col("improved"))
        .select(col("node"), col("dist")).localCheckpoint(true)
      dist = joined.select(col("node"), col("dist"))
      i += 1
    }
    dist
  }

  /** K-CORE DECOMPOSITION (r15) — the maximal subgraph in which every
    * node keeps degree >= k, by SIMULTANEOUS peeling: each round
    * recomputes degrees inside the surviving subgraph and removes
    * every node below k at once. The parallel peel is deterministic
    * (no removal order to disagree on) and idempotent after the
    * fixpoint, so an oracle that unrolls exactly `maxRounds` rounds
    * equals the converged loop — provided convergence happened within
    * the budget, which the loop REQUIRES fail-loud rather than
    * silently truncating (the BPE maxVocab stance).
    *
    * Scale shape: one round = two hash semi-joins of the symmetrized
    * edge set against the alive-node relation + one degree count —
    * all shuffles on the node key; per-round `localCheckpoint`
    * truncates lineage (the [[pageRankInt]] rule). Rounds needed is
    * the peel depth of the graph, typically O(10) on social/link
    * graphs; each round's cost shrinks with the surviving subgraph.
    * Returns (node, deg) of the k-core, deg = degree INSIDE the core.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 12): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    require(maxRounds >= 1, s"kCore: maxRounds must be >= 1, got $maxRounds")
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.filter(col("src") =!= col("dst"))
        .select(col("dst").as("a"), col("src").as("b")))
      .distinct().localCheckpoint(true)
    var alive = und.select(col("a").as("node")).distinct().localCheckpoint(true)
    var aliveN = alive.count()
    var core = alive.withColumn("deg", lit(-1L)) // replaced in round 1
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      require(rounds <= maxRounds,
        s"kCore: no fixpoint within $maxRounds rounds (still $aliveN alive) " +
          "— raise maxRounds (and the oracle's unroll depth with it)")
      val next = und
        .join(alive.select(col("node").as("a")), "a")
        .join(alive.select(col("node").as("b")), "b")
        .groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("a").as("node"), col("deg"))
        .localCheckpoint(true)
      val nextN = next.count()
      converged = nextN == aliveN
      core = next
      alive = next.select("node")
      aliveN = nextN
    }
    core
  }

  /** EXACT UNNORMALIZED HITS STEPS (r16) — hub/authority estimates on
    * the directed graph, kept ENGINE-EXACT the powerIterationExact
    * way: from h₀ ≡ 1, two full mutual-reinforcement steps
    * a₁(v) = indeg(v), h₁(u) = Σ_{u→v} a₁(v), a₂(v) = Σ_{u→v} h₁(u),
    * all integer/decimal arithmetic — bit-identical on any engine or
    * partitioning (the normalized double continuation stops needing
    * cross-engine identity, exactly like PageRank's). Each step is
    * one edges⋈scores hash join + a node-keyed groupBy, linear in
    * edges. Width budget: a₁ ≤ E as DECIMAL(20,0), h₁ ≤ E² and
    * a₂ ≤ E³ inside DECIMAL(38,0) for E up to ~2·10¹². h₁/a₂ are
    * emitted as canonical digit STRINGS (the r16 DECIMAL(38,0)
    * output rule). Multi-edges collapse first (simple-graph HITS). */
  /** DEGREE ASSORTATIVITY (r16) — "do hubs link to hubs": the Pearson
    * correlation over directed edges of (out-degree of the source,
    * in-degree of the target). Positive ⇒ assortative (social-graph
    * shape), negative ⇒ hub-and-spoke (web/dependency shape) — the
    * one-number topology readout a graph-quality report carries.
    * Five exact integer sums over the edge relation (two degree
    * aggregates joined back — hash joins on the endpoint); the
    * correlation is the q298 CUPED chain: exact totals cast to
    * double, then one mirrored IEEE tree (num/den products exceed any
    * fixed decimal width at 10¹² edges, so the CHAIN, not the
    * difference, is the cross-engine contract). Zero variance on
    * either side → NULL (the q230 rule). */
  def assortativity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val outd = e.groupBy(col("src")).agg(count(lit(1)).cast("long").as("j"))
    val ind = e.groupBy(col("dst")).agg(count(lit(1)).cast("long").as("k"))
    import org.apache.spark.sql.types.DecimalType
    val d14 = DecimalType(14, 0)
    val g = e.join(outd, "src").join(ind, "dst")
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("j")).cast("long").as("sj"),
        sum(col("k")).cast("long").as("sk"),
        sum((col("j").cast(d14) * col("k").cast(d14))
          .cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("sjk"),
        sum((col("j").cast(d14) * col("j").cast(d14))
          .cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("sj2"),
        sum((col("k").cast(d14) * col("k").cast(d14))
          .cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("sk2"))
    val mD = col("m").cast("double")
    val num = mD * col("sjk").cast("double") -
      col("sj").cast("double") * col("sk").cast("double")
    val varJ = mD * col("sj2").cast("double") -
      col("sj").cast("double") * col("sj").cast("double")
    val varK = mD * col("sk2").cast("double") -
      col("sk").cast("double") * col("sk").cast("double")
    g.select(col("m"), col("sj"), col("sk"),
      col("sjk").cast("string").as("sum_jk"),
      when(varJ > 0.0d && varK > 0.0d,
        num / sqrt(varJ * varK)).as("assortativity"))
  }

  def hitsExact(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = edges.select(col("src"), col("dst")).distinct()
    val a1 = e.groupBy(col("dst")).agg(count(lit(1)).cast("long").as("a1"))
    val h1 = e.join(a1, "dst").groupBy(col("src"))
      .agg(sum(col("a1").cast(DecimalType(20, 0)))
        .cast(DecimalType(38, 0)).as("h1"))
    val a2 = e.join(h1, "src").groupBy(col("dst"))
      .agg(sum(col("h1")).cast(DecimalType(38, 0)).as("a2"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    nodes
      .join(a1.select(col("dst").as("node"), col("a1")), Seq("node"), "left")
      .join(h1.select(col("src").as("node"), col("h1")), Seq("node"), "left")
      .join(a2.select(col("dst").as("node"), col("a2")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("a1"), lit(0L)).as("auth1"),
        coalesce(col("h1").cast("string"), lit("0")).as("hub1"),
        coalesce(col("a2").cast("string"), lit("0")).as("auth2"))
  }
}
