package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity
import Qx._

/** Oracle-checked similarity-search queries over the `embeddings`
  * table. Cosine scores are decimal-exact (see Similarity scaladoc) so
  * DuckDB reproduces them bit-for-bit. */
object SimilarityQ {

  /** The PQ index as a STAGED ARTIFACT (VERDICT r9 next #3, the q103
    * cluster-artifact pattern): q191 and q192 consume the identical
    * trained index — m per-subspace codebooks, the corpus's m-code
    * encoding, and the IVF coarse centroids. In production these are
    * trained once and stored (the index IS the artifact; that's what
    * makes a billion-vector ADC scan affordable), so the queries here
    * read lake-staged relations and pay only the probe. Training is
    * deterministic (md5-seeded Lloyd, exact integer means), so the
    * parquet round trip is bit-exact and the oracles keep replaying
    * the training chain from the raw table unchanged. Bench pays the
    * training once via [[stageArtifacts]] and reports it under
    * `staging`. */
  private val stagedPq = new graft.lake.Stamps.StampedMemo[
    (graft.lake.LakeTable, graft.lake.LakeTable, graft.lake.LakeTable)]()

  private def pqArtifacts(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val (codes, books, cents) =
      stagedPq.getOrBuild(
        s"${Qx.sessionKey(s)}|$d", Qx.tableStamp(d, "embeddings")) {
        val emb = Tables.embeddings(s, d)
        val trainPred = (df: org.apache.spark.sql.DataFrame) =>
          df.filter(col("vec_id") % 5 === 0)
        val (cod, bks) = Similarity.pqEncode(emb, m = 4, k = 8, rounds = 2,
          trainPred = trainPred)
        val cents = Similarity.coarseCentroids(emb, k = 8, rounds = 2,
          trainPred = trainPred)
        (graft.lake.LakeTable.createTemp(s, cod, "graft-pq-codes"),
          graft.lake.LakeTable.createTemp(s, bks, "graft-pq-books"),
          graft.lake.LakeTable.createTemp(s, cents, "graft-pq-cents"))
      }
    (codes.snapshot(), books.snapshot(), cents.snapshot())
  }

  /** The k-means coarse ASSIGNMENT as a staged artifact (VERDICT r11
    * next #6 — the same once-per-(session, sf) pattern as
    * [[stagedPq]]): q120 and q123 both consume the identical trained
    * (vec_id, cluster) relation, so training Lloyd in-query per rep
    * paid rounds × reps for a relation that is an index in production.
    * Deterministic training ⇒ the lake round trip is bit-exact and
    * the oracles keep replaying the training chain from the raw
    * table. */
  private val stagedKm =
    new graft.lake.Stamps.StampedMemo[graft.lake.LakeTable]()

  private def kmBuckets(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    stagedKm.getOrBuild(
      s"${Qx.sessionKey(s)}|$d", Qx.tableStamp(d, "embeddings")) {
      graft.lake.LakeTable.createTemp(s,
        Similarity.kmeansBuckets(Tables.embeddings(s, d), k = 8, rounds = 2,
          trainPred = _.filter(col("vec_id") % 5 === 0)),
        "graft-km-buckets")
    }.snapshot()

  /** Force the shared index artifacts for (session, sf dir) — bench
    * hygiene: training cost lands in the `staging` metric; q191/q192
    * report the ADC probe, q120/q123 the bucketed scan. */
  def stageArtifacts(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    pqArtifacts(s, d)
    kmBuckets(s, d)
    semanticComponents(s, d) // r22: shared by q199/q205
    ()
  }

  /** The two INDEPENDENT halves of [[stageArtifacts]], exposed so the
    * bench's staging pool can overlap them (r22, guide §2.6): PQ
    * training is the straggler (~13 s) and shares nothing with the
    * k-means buckets or the component table that builds on them
    * (~3+3 s chained). Both are memo-idempotent with stageArtifacts. */
  def stagePq(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    pqArtifacts(s, d); ()
  }
  def stageKmComponents(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    kmBuckets(s, d)
    semanticComponents(s, d)
    ()
  }

  private def exSql(pred: String): String =
    s"""ex AS (
       |  SELECT vec_id, label, i AS pos,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1073741824.0) AS DECIMAL(18,0)) AS x
       |  FROM (SELECT vec_id, label, embedding,
       |               unnest(generate_series(1, len(embedding))) AS i
       |        FROM embeddings)
       |),
       |norms AS (SELECT vec_id, sum(x*x) AS norm2 FROM ex GROUP BY vec_id),
       |q AS (SELECT * FROM ex WHERE $pred)""".stripMargin

  private def topkSql(joinLabel: String, pred: String, k: Int): String =
    s"""WITH ${exSql(pred)},
       |dots AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, sum(q.x * c.x) AS dot
       |  FROM q JOIN ex c ON q.pos = c.pos AND q.vec_id <> c.vec_id $joinLabel
       |  GROUP BY q.vec_id, c.vec_id
       |),
       |scored AS (
       |  -- decimal -> varchar -> double: DuckDB's direct decimal->double
       |  -- cast is not correctly rounded for int128 decimals; parsing the
       |  -- exact digit string is, and matches Spark's BigDecimal.doubleValue.
       |  SELECT d.query_id AS query_id, d.cand_id AS cand_id,
       |         CAST(CAST(d.dot AS VARCHAR) AS DOUBLE) /
       |         (sqrt(CAST(CAST(nq.norm2 AS VARCHAR) AS DOUBLE)) *
       |          sqrt(CAST(CAST(nc.norm2 AS VARCHAR) AS DOUBLE))) AS cosine
       |  FROM dots d
       |  JOIN norms nq ON d.query_id = nq.vec_id
       |  JOIN norms nc ON d.cand_id = nc.vec_id
       |)
       |SELECT query_id, rank, cand_id, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
       |  FROM scored
       |) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** The deterministic k-means pipeline as DuckDB CTEs — the oracle
    * twin of `Similarity.kmeansBuckets(k=8, rounds=2, train = vec_id %
    * 5 = 0)`. Every step mirrors the Spark side bit-for-bit: int8
    * quantization (floor rounding), md5-ordered seeds, BIGINT/BIGINT
    * centroid means, and LEFT-TO-RIGHT `list_reduce` distance folds
    * (== Spark's ordered `aggregate` HOF). Ends with CTE `afin`
    * (vec_id, cluster). */
  private val kmeansSql: String = {
    def dist(rel: String, cent: String, out: String): String =
      s"""$out AS (
         |  SELECT t.vec_id, c.cid,
         |         list_reduce(list_transform(generate_series(1, len(t.qv)),
         |           i -> (t.qv[i] - c.c[i]) * (t.qv[i] - c.c[i])),
         |           (acc, x) -> acc + x) AS d
         |  FROM $rel t CROSS JOIN $cent c
         |)""".stripMargin
    def argmin(din: String, out: String): String =
      s"""$out AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         |    FROM $din
         |  ) WHERE rn = 1
         |)""".stripMargin
    def update(assign: String, n: Int): String =
      s"""e$n AS (
         |  SELECT a.cid, t.qv, unnest(generate_series(1, len(t.qv))) AS i
         |  FROM $assign a JOIN train t USING (vec_id)
         |),
         |u$n AS (
         |  SELECT cid, i AS pos, CAST(SUM(qv[i]) AS BIGINT) / COUNT(*) AS cmean
         |  FROM e$n GROUP BY cid, i
         |),
         |cent$n AS (SELECT cid, list(cmean ORDER BY pos) AS c FROM u$n GROUP BY cid)""".stripMargin
    s"""quant AS (
       |  SELECT vec_id, list_transform(embedding,
       |           x -> CAST(greatest(-127.0, least(127.0,
       |                  floor(CAST(x AS DOUBLE) * 64.0 + 0.5))) AS BIGINT)) AS qv
       |  FROM embeddings
       |),
       |train AS (SELECT vec_id, qv FROM quant WHERE vec_id % 5 = 0),
       |seeds AS (
       |  SELECT vec_id, qv, md5(CAST(vec_id AS VARCHAR)) AS h
       |  FROM train ORDER BY h, vec_id LIMIT 8
       |),
       |cent0 AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid,
       |         list_transform(qv, x -> CAST(x AS DOUBLE)) AS c
       |  FROM seeds
       |),
       |${dist("train", "cent0", "d1")},
       |${argmin("d1", "a1")},
       |${update("a1", 1)},
       |${dist("train", "cent1", "d2")},
       |${argmin("d2", "a2")},
       |${update("a2", 2)},
       |${dist("quant", "cent2", "dfin")},
       |afin AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM dfin
       |  ) WHERE rn = 1
       |)""".stripMargin
  }

  /** PQ oracle: the deterministic Lloyd chain replayed PER SUBSPACE
    * over sliced int8 vectors, then the ADC lookup join — distances
    * are fixed-order dimension folds and the m-way total goes through
    * the decimal cast, mirroring `Similarity.pqTopK` exactly. */
  private val pqSql: String = {
    val m = 4; val w = 16; val k = 8
    def dist(rel: String, cent: String, out: String): String =
      s"""$out AS (
         |  SELECT t.vec_id, c.cid,
         |         list_reduce(list_transform(generate_series(1, len(t.qv)),
         |           i -> (t.qv[i] - c.c[i]) * (t.qv[i] - c.c[i])),
         |           (acc, x) -> acc + x) AS d
         |  FROM $rel t CROSS JOIN $cent c
         |)""".stripMargin
    def argmin(din: String, out: String): String =
      s"""$out AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         |    FROM $din
         |  ) WHERE rn = 1
         |)""".stripMargin
    def update(assign: String, trainRel: String, sub: Int, n: Int): String =
      s"""e${n}_$sub AS (
         |  SELECT a.cid, t.qv, unnest(generate_series(1, len(t.qv))) AS i
         |  FROM $assign a JOIN $trainRel t USING (vec_id)
         |),
         |u${n}_$sub AS (
         |  SELECT cid, i AS pos, CAST(SUM(qv[i]) AS BIGINT) / COUNT(*) AS cmean
         |  FROM e${n}_$sub GROUP BY cid, i
         |),
         |cent${n}_$sub AS (SELECT cid, list(cmean ORDER BY pos) AS c FROM u${n}_$sub GROUP BY cid)""".stripMargin
    def subChain(s: Int): String = {
      val lo = s * w + 1; val hi = s * w + w
      s"""quant_$s AS (SELECT vec_id, qv[$lo:$hi] AS qv FROM quant),
         |train_$s AS (SELECT vec_id, qv FROM quant_$s WHERE vec_id % 5 = 0),
         |seeds_$s AS (
         |  SELECT vec_id, qv, md5(CAST(vec_id AS VARCHAR)) AS h
         |  FROM train_$s ORDER BY h, vec_id LIMIT $k
         |),
         |cent0_$s AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid,
         |         list_transform(qv, x -> CAST(x AS DOUBLE)) AS c
         |  FROM seeds_$s
         |),
         |${dist(s"train_$s", s"cent0_$s", s"d1_$s")},
         |${argmin(s"d1_$s", s"a1_$s")},
         |${update(s"a1_$s", s"train_$s", s, 1)},
         |${dist(s"train_$s", s"cent1_$s", s"d2_$s")},
         |${argmin(s"d2_$s", s"a2_$s")},
         |${update(s"a2_$s", s"train_$s", s, 2)},
         |${dist(s"quant_$s", s"cent2_$s", s"dfin_$s")},
         |${argmin(s"dfin_$s", s"codes_$s")},
         |lut_$s AS (
         |  SELECT t.vec_id AS query_id, c.cid,
         |         list_reduce(list_transform(generate_series(1, len(t.qv)),
         |           i -> (t.qv[i] - c.c[i]) * (t.qv[i] - c.c[i])),
         |           (acc, x) -> acc + x) AS d
         |  FROM (SELECT * FROM quant_$s WHERE vec_id < 20) t CROSS JOIN cent2_$s c
         |),
         |score_$s AS (
         |  SELECT l.query_id, cd.vec_id AS cand_id, l.d
         |  FROM codes_$s cd JOIN lut_$s l ON cd.cid = l.cid
         |)""".stripMargin
    }
    (0 until m).map(subChain).mkString(",\n")
  }

  /** The int8 quantization CTE (identical to kmeansSql's `quant` — the
    * standalone prefix for PQ oracles that don't carry the coarse
    * chain). */
  private val pqQuantSql: String =
    """quant AS (
      |  SELECT vec_id, list_transform(embedding,
      |           x -> CAST(greatest(-127.0, least(127.0,
      |                  floor(CAST(x AS DOUBLE) * 64.0 + 0.5))) AS BIGINT)) AS qv
      |  FROM embeddings
      |)""".stripMargin

  private val pqUnionSql: String =
    """SELECT * FROM score_0 UNION ALL SELECT * FROM score_1
      |        UNION ALL SELECT * FROM score_2 UNION ALL SELECT * FROM score_3""".stripMargin

  private val pqRankSql: String =
    """SELECT query_id, cand_id, dist, rank FROM (
      |  SELECT query_id, cand_id, dist,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY dist, cand_id) AS rank
      |  FROM scores
      |) WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, Q] = Map(
    // Brute-force exact cosine top-10 for 5 query vectors
    "q37_cosine_topk" -> ((s, d) =>
      Similarity.cosineTopK(Tables.embeddings(s, d), _.filter(col("vec_id") < 5), 10)
        .orderBy("query_id", "rank")),

    // Product quantization (IVF-PQ's fine stage): 4 independent
    // 8-codeword Lloyd codebooks over 16-dim subspaces, every vector
    // encoded as 4 code ids, queries scored by the ADC lookup-table
    // linear scan — O(m) per pair instead of O(dim), the technique
    // that fits a billion-vector index in memory. Top-5 per query,
    // ties by cand_id
    "q191_pq_topk" -> ((s, d) => {
      val (codes, books, _) = pqArtifacts(s, d)
      Similarity.pqTopKWith(Tables.embeddings(s, d), codes, books,
        _.filter(col("vec_id") < 20), k = 5)
        .orderBy("query_id", "rank")
    }),

    // IVF-PQ (the production billion-vector configuration): the coarse
    // k-means cell bounds each query's candidate set to ~1/k of the
    // corpus, the PQ ADC lookup-sum ranks only those survivors —
    // compose q119's quantizer with q191's codebooks, both stages
    // replayed exactly by the oracle
    "q192_ivf_pq" -> ((s, d) => {
      val (codes, books, cents) = pqArtifacts(s, d)
      Similarity.pqTopKIvfWith(Tables.embeddings(s, d), codes, books, cents,
        _.filter(col("vec_id") < 20), k = 5)
        .orderBy("query_id", "rank")
    }),

    // IVF-style probe: top-5 within the query's coarse cluster (label)
    "q38_ivf_topk" -> ((s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d), _.filter(col("vec_id") < 20), 5)
        .orderBy("query_id", "rank")),

    // Mean pooling / centroid construction: element-wise mean vector
    // per label group from the dyadic-exact exploded relation — the
    // chunk-vectors -> document-vector (and cluster -> centroid) op;
    // one bounded shuffle of |labels| x dim partials
    "q140_mean_pool" -> ((s, d) =>
      Similarity.meanPool(Tables.embeddings(s, d))
        .select(col("label").cast("long").as("label"),
          (col("pos") + 1).cast("long").as("pos"),
          col("n_vecs"), col("mean_val"))
        .orderBy("label", "pos")),

    // Hard-negative mining for contrastive training: per query, the 5
    // most similar DIFFERENT-label vectors (the near-misses a
    // bi-encoder learns the most from). Oracle is the brute-force
    // all-pairs score with the label inequality — the hash match
    // proves the prescreen loses no true hard negative
    "q134_hard_negatives" -> ((s, d) =>
      Similarity.hardNegatives(Tables.embeddings(s, d), _.filter(col("vec_id") < 10), 5)
        .orderBy("query_id", "rank")),

    // embedding-cosine near-dup pairs, bucketed by coarse cluster
    "q66_embed_neardup" -> ((s, d) =>
      Similarity.embeddingNearDups(Tables.embeddings(s, d), 0.3)
        .orderBy("vec_a", "vec_b")),

    // Sign-bit LSH-bucketed ANN: bucket equi-join + exact rescore,
    // top-3 per query among same-bucket candidates
    "q82_lsh_ann" -> ((s, d) =>
      Similarity.lshTopK(Tables.embeddings(s, d), _.filter(col("vec_id") < 100),
        k = 3, bits = 6)
        .orderBy("query_id", "rank")),

    // Deterministic k-means coarse quantizer: centroids trained on a
    // hash-sample (vec_id % 5), full corpus assigned in one pass
    "q119_kmeans_buckets" -> ((s, d) =>
      Similarity.kmeansBuckets(Tables.embeddings(s, d), k = 8, rounds = 2,
        trainPred = _.filter(col("vec_id") % 5 === 0))
        .orderBy("vec_id")),

    // The standalone IVF path: probe within the DERIVED k-means
    // bucket — no precomputed label column involved. The assignment is
    // the staged [[kmBuckets]] lake artifact: the probe fans the
    // bucketed relation out ~5x (prescreen q+c sides, exact rescore,
    // norms), and re-deriving the whole Lloyd DAG per reference — or
    // even per query — is the difference between 7.0 s and ~2 s at
    // sf0.1 (in production the assignment IS a lake table)
    "q120_ivf_kmeans" -> ((s, d) =>
      Similarity.ivfTopKWith(Tables.embeddings(s, d), kmBuckets(s, d),
        _.filter(col("vec_id") < 20), 5)
        .orderBy("query_id", "rank")),

    // Embedding near-dup over DERIVED k-means buckets: the q66 path
    // with no precomputed label column — the last label dependence
    // removed from the similarity family; shares q120's staged
    // assignment artifact
    "q123_neardup_kmeans" -> ((s, d) =>
      Similarity.embeddingNearDupsWith(Tables.embeddings(s, d), kmBuckets(s, d), 0.3)
        .orderBy("vec_a", "vec_b")),

    // Multi-probe LSH: the query probes every bucket within Hamming
    // distance 2 of its own sign bucket — the recall fix over q82's
    // single-bucket lookup, still a bucketed equi-join
    "q121_lsh_multiprobe" -> ((s, d) =>
      Similarity.lshTopKMultiProbe(Tables.embeddings(s, d),
        _.filter(col("vec_id") < 50), k = 3, bits = 6, radius = 2)
        .orderBy("query_id", "rank")),

    // Int8 quantization + integer-exact dot products between
    // consecutive vectors (HOF zip_with/aggregate — no explode)
    "q79_embed_quantize" -> ((s, d) => {
      val q8 = Similarity.quantize(Tables.embeddings(s, d).filter(col("vec_id") < 300))
      q8.alias("a").join(q8.alias("b"), col("b.vec_id") === col("a.vec_id") + 1)
        .select(col("a.vec_id").as("vec_id"),
          expr("aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("qdot"),
          expr("aggregate(a.qv, 0L, (acc, v) -> acc + v * v)").as("qnorm2"))
        .orderBy("vec_id")
    }),

    // SemDeDup (Abbas et al. 2023) as a relational pipeline: embedding
    // near-dup pairs within the staged k-means coarse buckets (q123's
    // candidate generator — never all-pairs), connected components over
    // the pair graph (min-label propagation with pointer jumping), keep
    // exactly the minimum-id representative per component; every vector
    // outside any component is its own survivor. The full keep/drop
    // decision table is the output, so downstream corpus filters are a
    // semi-join against `kept = 1`.
    "q199_semantic_dedup" -> ((s, d) =>
      semanticComponents(s, d)
        .withColumn("kept",
          (col("vec_id") === col("cluster")).cast("long"))
        .orderBy("vec_id")),

    // SemDeDup with KEEP-BEST representatives (VERDICT r12 next #4):
    // q199 keeps the min-id member per component — fine as an
    // identity, but the curation win is keeping the best-quality
    // member. Same composition q126 applies to MinHash clusters:
    // the semantic component table joins the documents table on the
    // aligned id, and one cluster-partitioned window keeps the
    // highest-token-count member, ties to min id. Both window
    // functions share the cluster partitioning, so past the (already
    // bucketed) component pass the cost is one doc-keyed join + one
    // cluster shuffle.
    "q205_semantic_canonical" -> ((s, d) =>
      graft.operators.Dedup.canonicalDocs(
        semanticComponents(s, d)
          .select(col("vec_id").as("doc_id"), col("cluster")),
        Tables.documents(s, d))
        .orderBy("cluster")),

    // INCREMENTAL semantic dedup (r13) — the production ingest shape:
    // a NEW batch (vec_id % 4 = 0) is scored only against the
    // EXISTING corpus inside the shared staged coarse buckets, never
    // against itself and never all-pairs; an incoming vector with any
    // corpus near-dup at cosine ≥ 0.3 is dropped. Per-batch cost is
    // linear in the batch for a fixed corpus density — the steady
    // state of a continuously-fed training-data lake, where q199's
    // full-corpus pass is the bootstrap and this is every day after.
    // Output is the full (vec_id, n_matches, kept) decision table.
    "q209_incremental_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val incoming = emb.filter(col("vec_id") % 4 === 0)
      val corpus = emb.filter(col("vec_id") % 4 =!= 0)
      val pairs = Similarity.embeddingNearDupsAgainst(
        incoming, corpus, kmBuckets(s, d), 0.3)
      val matches = pairs.groupBy(col("vec_a").as("vec_id"))
        .agg(count(lit(1)).as("n_matches"))
      incoming.select(col("vec_id"))
        .join(matches, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"))
        .withColumn("kept", (col("n_matches") === 0).cast("long"))
        .orderBy("vec_id")
    }),

    // Distributed Gram matrix (r13): the one-pass PCA/whitening
    // building block — a typed Aggregator buffers the 64×64 exact
    // integer matrix per partition, the shuffle carries one 32 KB
    // buffer per partition, never the vectors. The oracle recomputes
    // the upper triangle by double-unnest (fine at oracle scale; the
    // engine path never materializes the d²× row blowup).
    "q224_gram_matrix" -> ((s, d) =>
      graft.operators.Stats.gramMatrix(
        Tables.embeddings(s, d), "embedding", d = 64)
        .orderBy("i", "j")),

    // k-center greedy diversity sampling (r13): 4 coverage-maximizing
    // exemplars via deterministic farthest-point traversal — exact
    // int8 L2² distances, min-id seed/tie-breaks, each round one
    // corpus projection folding the new center into the running
    // min-distance (no join). The oracle unrolls the same 4 rounds.
    "q229_kcenter" -> ((s, d) =>
      graft.operators.Similarity.kCenterSelect(
        Tables.embeddings(s, d), k = 4)
        .orderBy("round")),

    // Binary sign quantization (r13): the 1-bit leg of the
    // quantization family — 64 floats packed to two 32-bit words by a
    // transform+aggregate HOF chain (no explode), Hamming = two
    // xor+popcounts, top-10 per broadcast query. 32× compression;
    // compose with IVF buckets for the billion-vector path.
    // `operators/Similarity.{signSignatures, hammingTopK}`.
    "q252_sign_ann" -> ((s, d) =>
      graft.operators.Similarity.hammingTopK(
        Tables.embeddings(s, d), _.filter(col("vec_id") < 5), 10)
        .orderBy("query_id", "rank"))
  )

  /** The oracle twin of [[semanticComponents]]: the k-means chain,
    * in-bucket cosine pairs at 0.3, recursive reachability, min-label
    * components — ends with CTE `comp` (vec_id, cluster, singletons
    * included), shared by the q199 and q205 oracles. */
  private lazy val semanticComponentsSql: String =
    s"""$kmeansSql,
       |ex AS (
       |  SELECT e.vec_id, a.cluster AS label, e.i AS pos,
       |         CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1073741824.0) AS DECIMAL(18,0)) AS x
       |  FROM (SELECT vec_id, embedding,
       |               unnest(generate_series(1, len(embedding))) AS i
       |        FROM embeddings) e
       |  JOIN afin a USING (vec_id)
       |),
       |norms AS (SELECT vec_id, sum(x*x) AS norm2 FROM ex GROUP BY vec_id),
       |dots AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.x * b.x) AS dot
       |  FROM ex a JOIN ex b
       |    ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id
       |  GROUP BY a.vec_id, b.vec_id
       |),
       |prs AS (
       |  SELECT vec_a AS u, vec_b AS v FROM (
       |    SELECT d.vec_a AS vec_a, d.vec_b AS vec_b,
       |           CAST(CAST(d.dot AS VARCHAR) AS DOUBLE) /
       |           (sqrt(CAST(CAST(na.norm2 AS VARCHAR) AS DOUBLE)) *
       |            sqrt(CAST(CAST(nb.norm2 AS VARCHAR) AS DOUBLE))) AS cosine
       |    FROM dots d
       |    JOIN norms na ON d.vec_a = na.vec_id
       |    JOIN norms nb ON d.vec_b = nb.vec_id
       |  ) WHERE cosine >= 0.3
       |),
       |edges AS (SELECT u, v FROM prs UNION ALL SELECT v AS u, u AS v FROM prs),
       |reach AS (
       |  SELECT u AS id, u AS lbl FROM edges
       |  UNION
       |  SELECT e.u AS id, r.lbl AS lbl FROM edges e JOIN reach r ON e.v = r.id
       |),
       |labels AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id),
       |comp AS (
       |  SELECT emb.vec_id AS vec_id,
       |         COALESCE(l.cluster, emb.vec_id) AS cluster
       |  FROM embeddings emb LEFT JOIN labels l ON emb.vec_id = l.id
       |)""".stripMargin

  /** The SemDeDup component table (vec_id, cluster), singletons
    * included as their own cluster — the shared stage behind q199
    * (keep/drop table) and q205 (keep-best canonicals): embedding
    * near-dup pairs mined inside the staged k-means coarse buckets
    * (q123's candidate generator — never all-pairs), then connected
    * components. Cosine 0.3 is a LOOSE threshold: transitive
    * near-dup chains get long at scale, so the component pass is
    * pointer-doubling with a 16-round budget (diameter 2^16) —
    * sf0.01 already exceeds what 8 rounds of plain label
    * propagation cover. */
  private val stagedComponents =
    new graft.lake.Stamps.StampedMemo[graft.lake.LakeTable]()

  private def semanticComponents(s: org.apache.spark.sql.SparkSession,
                                 d: String): org.apache.spark.sql.DataFrame =
    // r22: STAGED per (session, sf) exactly like kmBuckets/pqArtifacts
    // — q199 and q205 each re-ran the full pair-mining + CC pipeline
    // (~3.3 s each at sf0.1); the component table is deterministic, so
    // the snapshot equals the inline recompute bit-for-bit and both
    // consumers stay hash-green against unchanged oracles. Training
    // cost lands in the bench's `staging` metric via stageArtifacts.
    stagedComponents.getOrBuild(
      s"${Qx.sessionKey(s)}|$d", Qx.tableStamp(d, "embeddings")) {
      val emb = Tables.embeddings(s, d)
      val pairs = Similarity
        .embeddingNearDupsWith(emb, kmBuckets(s, d), 0.3)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      val comp = graft.operators.Dedup
        .dedupClusters(pairs, iterations = 16, pointerJumping = true)
        .select(col("doc_id").as("vec_id"), col("cluster"))
      graft.lake.LakeTable.createTemp(s,
        emb.select(col("vec_id"))
          .join(comp, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("cluster"), col("vec_id")).as("cluster")),
        "graft-semcomp")
    }.snapshot()

  val oracles: Map[String, String] = Map(
    "q37_cosine_topk" -> topkSql("", "vec_id < 5", 10),

    "q119_kmeans_buckets" ->
      s"""WITH $kmeansSql
         |SELECT vec_id, cluster FROM afin ORDER BY vec_id""".stripMargin,

    "q191_pq_topk" ->
      s"""WITH $pqQuantSql,
         |$pqSql,
         |scores AS (
         |  SELECT query_id, cand_id,
         |         CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) AS dist
         |  FROM ($pqUnionSql)
         |  WHERE query_id <> cand_id
         |  GROUP BY query_id, cand_id
         |)
         |$pqRankSql""".stripMargin,

    "q192_ivf_pq" ->
      s"""WITH $kmeansSql,
         |$pqSql,
         |scores AS (
         |  SELECT query_id, cand_id,
         |         CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) AS dist
         |  FROM ($pqUnionSql) s
         |  JOIN afin qa ON qa.vec_id = s.query_id
         |  JOIN afin ca ON ca.vec_id = s.cand_id
         |  WHERE query_id <> cand_id AND qa.cluster = ca.cluster
         |  GROUP BY query_id, cand_id
         |)
         |$pqRankSql""".stripMargin,

    "q120_ivf_kmeans" ->
      s"""WITH $kmeansSql,
         |ex AS (
         |  SELECT e.vec_id, a.cluster AS label, e.i AS pos,
         |         CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1073741824.0) AS DECIMAL(18,0)) AS x
         |  FROM (SELECT vec_id, embedding,
         |               unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings) e
         |  JOIN afin a USING (vec_id)
         |),
         |norms AS (SELECT vec_id, sum(x*x) AS norm2 FROM ex GROUP BY vec_id),
         |q AS (SELECT * FROM ex WHERE vec_id < 20),
         |dots AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, sum(q.x * c.x) AS dot
         |  FROM q JOIN ex c ON q.pos = c.pos AND q.vec_id <> c.vec_id AND q.label = c.label
         |  GROUP BY q.vec_id, c.vec_id
         |),
         |scored AS (
         |  SELECT d.query_id AS query_id, d.cand_id AS cand_id,
         |         CAST(CAST(d.dot AS VARCHAR) AS DOUBLE) /
         |         (sqrt(CAST(CAST(nq.norm2 AS VARCHAR) AS DOUBLE)) *
         |          sqrt(CAST(CAST(nc.norm2 AS VARCHAR) AS DOUBLE))) AS cosine
         |  FROM dots d
         |  JOIN norms nq ON d.query_id = nq.vec_id
         |  JOIN norms nc ON d.cand_id = nc.vec_id
         |)
         |SELECT query_id, rank, cand_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
         |  FROM scored
         |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q38_ivf_topk" -> topkSql("AND q.label = c.label", "vec_id < 20", 5),
    "q134_hard_negatives" -> topkSql("AND q.label <> c.label", "vec_id < 10", 5),

    "q140_mean_pool" ->
      """WITH ex AS (
        |  SELECT vec_id, label, i AS pos,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1073741824.0) AS DECIMAL(18,0)) AS x
        |  FROM (SELECT vec_id, label, embedding,
        |               unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)
        |)
        |SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
        |       COUNT(*) AS n_vecs,
        |       CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) /
        |       (1073741824.0 * COUNT(*)) AS mean_val
        |FROM ex GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q66_embed_neardup" ->
      """WITH ex AS (
        |  SELECT vec_id, label, i AS pos,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1073741824.0) AS DECIMAL(18,0)) AS x
        |  FROM (SELECT vec_id, label, embedding,
        |               unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)
        |),
        |norms AS (SELECT vec_id, sum(x*x) AS norm2 FROM ex GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.x * b.x) AS dot
        |  FROM ex a JOIN ex b
        |    ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id
        |  GROUP BY a.vec_id, b.vec_id
        |)
        |SELECT vec_a, vec_b, cosine FROM (
        |  SELECT d.vec_a AS vec_a, d.vec_b AS vec_b,
        |         CAST(CAST(d.dot AS VARCHAR) AS DOUBLE) /
        |         (sqrt(CAST(CAST(na.norm2 AS VARCHAR) AS DOUBLE)) *
        |          sqrt(CAST(CAST(nb.norm2 AS VARCHAR) AS DOUBLE))) AS cosine
        |  FROM dots d
        |  JOIN norms na ON d.vec_a = na.vec_id
        |  JOIN norms nb ON d.vec_b = nb.vec_id
        |) WHERE cosine >= 0.3 ORDER BY vec_a, vec_b""".stripMargin,

    "q82_lsh_ann" ->
      """WITH ex AS (
        |  SELECT vec_id, label, i AS pos,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1073741824.0) AS DECIMAL(18,0)) AS x
        |  FROM (SELECT vec_id, label, embedding,
        |               unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)
        |),
        |norms AS (SELECT vec_id, sum(x*x) AS norm2 FROM ex GROUP BY vec_id),
        |b AS (
        |  SELECT vec_id,
        |         array_to_string(list_transform(embedding[1:6],
        |           x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
        |  FROM embeddings
        |),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id
        |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 100
        |),
        |dots AS (
        |  SELECT p.query_id AS query_id, p.cand_id AS cand_id, sum(q.x * c.x) AS dot
        |  FROM pairs p
        |  JOIN ex q ON p.query_id = q.vec_id
        |  JOIN ex c ON p.cand_id = c.vec_id AND q.pos = c.pos
        |  GROUP BY p.query_id, p.cand_id
        |),
        |scored AS (
        |  SELECT d.query_id AS query_id, d.cand_id AS cand_id,
        |         CAST(CAST(d.dot AS VARCHAR) AS DOUBLE) /
        |         (sqrt(CAST(CAST(nq.norm2 AS VARCHAR) AS DOUBLE)) *
        |          sqrt(CAST(CAST(nc.norm2 AS VARCHAR) AS DOUBLE))) AS cosine
        |  FROM dots d
        |  JOIN norms nq ON d.query_id = nq.vec_id
        |  JOIN norms nc ON d.cand_id = nc.vec_id
        |)
        |SELECT query_id, rank, cand_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
        |  FROM scored
        |) WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q123_neardup_kmeans" ->
      s"""WITH $kmeansSql,
         |ex AS (
         |  SELECT e.vec_id, a.cluster AS label, e.i AS pos,
         |         CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1073741824.0) AS DECIMAL(18,0)) AS x
         |  FROM (SELECT vec_id, embedding,
         |               unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings) e
         |  JOIN afin a USING (vec_id)
         |),
         |norms AS (SELECT vec_id, sum(x*x) AS norm2 FROM ex GROUP BY vec_id),
         |dots AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.x * b.x) AS dot
         |  FROM ex a JOIN ex b
         |    ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id
         |  GROUP BY a.vec_id, b.vec_id
         |)
         |SELECT vec_a, vec_b, cosine FROM (
         |  SELECT d.vec_a AS vec_a, d.vec_b AS vec_b,
         |         CAST(CAST(d.dot AS VARCHAR) AS DOUBLE) /
         |         (sqrt(CAST(CAST(na.norm2 AS VARCHAR) AS DOUBLE)) *
         |          sqrt(CAST(CAST(nb.norm2 AS VARCHAR) AS DOUBLE))) AS cosine
         |  FROM dots d
         |  JOIN norms na ON d.vec_a = na.vec_id
         |  JOIN norms nb ON d.vec_b = nb.vec_id
         |) WHERE cosine >= 0.3 ORDER BY vec_a, vec_b""".stripMargin,

    // q123's pair generator, then transitive closure via the recursive
    // CTE (the q103 pattern) and min-id-per-component canonicals
    "q199_semantic_dedup" ->
      s"""WITH RECURSIVE $semanticComponentsSql
         |SELECT vec_id, cluster,
         |       CAST(CASE WHEN vec_id = cluster THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM comp ORDER BY vec_id""".stripMargin,

    "q209_incremental_semdedup" ->
      s"""WITH RECURSIVE $kmeansSql,
         |ex AS (
         |  SELECT e.vec_id, a.cluster AS label, e.i AS pos,
         |         CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1073741824.0) AS DECIMAL(18,0)) AS x
         |  FROM (SELECT vec_id, embedding,
         |               unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings) e
         |  JOIN afin a USING (vec_id)
         |),
         |norms AS (SELECT vec_id, sum(x*x) AS norm2 FROM ex GROUP BY vec_id),
         |dots AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.x * b.x) AS dot
         |  FROM ex a JOIN ex b ON a.label = b.label AND a.pos = b.pos
         |  WHERE a.vec_id % 4 = 0 AND b.vec_id % 4 <> 0
         |  GROUP BY a.vec_id, b.vec_id
         |),
         |m AS (
         |  SELECT vec_a AS vec_id, COUNT(*) AS n_matches FROM (
         |    SELECT d.vec_a AS vec_a,
         |           CAST(CAST(d.dot AS VARCHAR) AS DOUBLE) /
         |           (sqrt(CAST(CAST(na.norm2 AS VARCHAR) AS DOUBLE)) *
         |            sqrt(CAST(CAST(nb.norm2 AS VARCHAR) AS DOUBLE))) AS cosine
         |    FROM dots d
         |    JOIN norms na ON d.vec_a = na.vec_id
         |    JOIN norms nb ON d.vec_b = nb.vec_id
         |  ) WHERE cosine >= 0.3 GROUP BY vec_a
         |)
         |SELECT emb.vec_id AS vec_id,
         |       COALESCE(m.n_matches, 0) AS n_matches,
         |       CAST(CASE WHEN COALESCE(m.n_matches, 0) = 0
         |            THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM embeddings emb LEFT JOIN m ON emb.vec_id = m.vec_id
         |WHERE emb.vec_id % 4 = 0
         |ORDER BY vec_id""".stripMargin,

    "q205_semantic_canonical" ->
      s"""WITH RECURSIVE $semanticComponentsSql,
         |stats AS (
         |  SELECT c.cluster AS cluster, c.vec_id AS doc_id,
         |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
         |  FROM comp c JOIN documents d ON c.vec_id = d.doc_id
         |),
         |ranked AS (
         |  SELECT cluster, doc_id, n_tokens,
         |         row_number() OVER (PARTITION BY cluster
         |                            ORDER BY n_tokens DESC, doc_id) AS rn,
         |         COUNT(*) OVER (PARTITION BY cluster) AS n_members
         |  FROM stats
         |)
         |SELECT cluster, doc_id AS canonical_id, n_tokens,
         |       CAST(n_members AS BIGINT) AS n_members
         |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin,

    "q121_lsh_multiprobe" ->
      """WITH ex AS (
        |  SELECT vec_id, label, i AS pos,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1073741824.0) AS DECIMAL(18,0)) AS x
        |  FROM (SELECT vec_id, label, embedding,
        |               unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)
        |),
        |norms AS (SELECT vec_id, sum(x*x) AS norm2 FROM ex GROUP BY vec_id),
        |b AS (
        |  SELECT vec_id,
        |         array_to_string(list_transform(embedding[1:6],
        |           x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
        |  FROM embeddings
        |),
        |probes AS (
        |  SELECT vec_id, unnest(list_concat(list_concat(
        |    [bucket],
        |    list_transform(generate_series(1, 6), i ->
        |      substr(bucket, 1, i - 1) ||
        |      (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END) ||
        |      substr(bucket, i + 1, 6))),
        |    flatten(list_transform(generate_series(1, 6), i ->
        |      list_transform(list_filter(generate_series(1, 6), j -> j > i), j ->
        |        substr(bucket, 1, i - 1) ||
        |        (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END) ||
        |        substr(bucket, i + 1, j - i - 1) ||
        |        (CASE WHEN substr(bucket, j, 1) = '1' THEN '0' ELSE '1' END) ||
        |        substr(bucket, j + 1, 6)))))) AS probe
        |  FROM b WHERE vec_id < 50
        |),
        |pairs AS (
        |  SELECT p.vec_id AS query_id, c.vec_id AS cand_id
        |  FROM probes p JOIN b c ON p.probe = c.bucket AND p.vec_id <> c.vec_id
        |),
        |dots AS (
        |  SELECT p.query_id AS query_id, p.cand_id AS cand_id, sum(q.x * c.x) AS dot
        |  FROM pairs p
        |  JOIN ex q ON p.query_id = q.vec_id
        |  JOIN ex c ON p.cand_id = c.vec_id AND q.pos = c.pos
        |  GROUP BY p.query_id, p.cand_id
        |),
        |scored AS (
        |  SELECT d.query_id AS query_id, d.cand_id AS cand_id,
        |         CAST(CAST(d.dot AS VARCHAR) AS DOUBLE) /
        |         (sqrt(CAST(CAST(nq.norm2 AS VARCHAR) AS DOUBLE)) *
        |          sqrt(CAST(CAST(nc.norm2 AS VARCHAR) AS DOUBLE))) AS cosine
        |  FROM dots d
        |  JOIN norms nq ON d.query_id = nq.vec_id
        |  JOIN norms nc ON d.cand_id = nc.vec_id
        |)
        |SELECT query_id, rank, cand_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
        |  FROM scored
        |) WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q79_embed_quantize" ->
      """WITH q8 AS (
        |  SELECT vec_id, list_transform(embedding,
        |           x -> CAST(greatest(-127.0, least(127.0,
        |                  floor(CAST(x AS DOUBLE) * 64.0 + 0.5))) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 300
        |),
        |pairs AS (
        |  SELECT a.vec_id AS vec_id, a.qv AS qa, b.qv AS qb
        |  FROM q8 a JOIN q8 b ON b.vec_id = a.vec_id + 1
        |),
        |ex AS (SELECT vec_id, qa, qb, unnest(generate_series(1, len(qa))) AS i FROM pairs)
        |SELECT vec_id,
        |       CAST(SUM(qa[i] * qb[i]) AS BIGINT) AS qdot,
        |       CAST(SUM(qa[i] * qa[i]) AS BIGINT) AS qnorm2
        |FROM ex GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q224_gram_matrix" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 65536.0) AS BIGINT)) AS qv
        |  FROM embeddings
        |), idx AS (
        |  SELECT unnest(generate_series(1, 64)) AS p
        |), cells AS (
        |  SELECT a.p AS pi, b.p AS pj FROM idx a JOIN idx b ON b.p >= a.p
        |)
        |SELECT CAST(c.pi - 1 AS BIGINT) AS i, CAST(c.pj - 1 AS BIGINT) AS j,
        |       CAST(SUM(qv[c.pi] * qv[c.pj]) AS BIGINT) AS dot_q,
        |       CAST(CAST(SUM(qv[c.pi] * qv[c.pj]) AS BIGINT) AS DOUBLE)
        |         / 4294967296.0 AS gram
        |FROM q CROSS JOIN cells c
        |GROUP BY c.pi, c.pj ORDER BY i, j""".stripMargin,

    "q229_kcenter" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |           x -> CAST(greatest(-127.0, least(127.0,
        |                  floor(CAST(x AS DOUBLE) * 64.0 + 0.5))) AS BIGINT)) AS qv
        |  FROM embeddings
        |), idx AS (
        |  SELECT unnest(generate_series(1, 64)) AS i
        |), c1 AS (
        |  SELECT qv FROM q WHERE vec_id = (SELECT min(vec_id) FROM q)
        |), d1 AS (
        |  SELECT q.vec_id, q.qv,
        |         CAST(SUM((q.qv[i.i] - c1.qv[i.i]) * (q.qv[i.i] - c1.qv[i.i])) AS BIGINT) AS d
        |  FROM q CROSS JOIN c1 CROSS JOIN idx i GROUP BY q.vec_id, q.qv
        |), s2 AS (
        |  SELECT vec_id, qv, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1
        |), d2 AS (
        |  SELECT d1.vec_id, d1.qv,
        |         LEAST(d1.d, CAST(SUM((d1.qv[i.i] - s2.qv[i.i]) * (d1.qv[i.i] - s2.qv[i.i])) AS BIGINT)) AS d
        |  FROM d1 CROSS JOIN s2 CROSS JOIN idx i GROUP BY d1.vec_id, d1.qv, d1.d
        |), s3 AS (
        |  SELECT vec_id, qv, d FROM d2 ORDER BY d DESC, vec_id LIMIT 1
        |), d3 AS (
        |  SELECT d2.vec_id, d2.qv,
        |         LEAST(d2.d, CAST(SUM((d2.qv[i.i] - s3.qv[i.i]) * (d2.qv[i.i] - s3.qv[i.i])) AS BIGINT)) AS d
        |  FROM d2 CROSS JOIN s3 CROSS JOIN idx i GROUP BY d2.vec_id, d2.qv, d2.d
        |), s4 AS (
        |  SELECT vec_id, d FROM d3 ORDER BY d DESC, vec_id LIMIT 1
        |)
        |SELECT CAST(1 AS BIGINT) AS round,
        |       (SELECT min(vec_id) FROM q) AS vec_id,
        |       CAST(NULL AS BIGINT) AS d2_at_selection
        |UNION ALL SELECT CAST(2 AS BIGINT), vec_id, d FROM s2
        |UNION ALL SELECT CAST(3 AS BIGINT), vec_id, d FROM s3
        |UNION ALL SELECT CAST(4 AS BIGINT), vec_id, d FROM s4
        |ORDER BY round""".stripMargin,

    // mirrors Similarity.signSignatures/hammingTopK: two 32-bit sign
    // words (bit 63 never used), hamming = two xor+popcounts
    "q252_sign_ann" ->
      """WITH sig AS (
        |  SELECT vec_id,
        |    bit_or(CASE WHEN i <= 32 AND x > 0
        |                THEN 1::BIGINT << (i - 1) ELSE 0 END) AS lo,
        |    bit_or(CASE WHEN i > 32 AND x > 0
        |                THEN 1::BIGINT << (i - 33) ELSE 0 END) AS hi
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |               generate_subscripts(embedding, 1) AS i
        |        FROM embeddings)
        |  GROUP BY vec_id
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         CAST(bit_count(xor(q.lo, c.lo)) +
        |              bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming
        |  FROM sig q JOIN sig c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5
        |), ranked AS (
        |  SELECT query_id, cand_id, hamming,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY hamming, cand_id) AS BIGINT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, cand_id, hamming
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin
  )
}
