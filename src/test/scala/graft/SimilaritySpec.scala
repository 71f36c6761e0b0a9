package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // vec 0 is the query; 1 = same direction (cos 1), 2 = orthogonal
  // (cos 0), 3 = opposite (cos -1)
  private val emb = Seq(
    (0L, Seq(1f, 0f, 0f, 0f), 0),
    (1L, Seq(2f, 0f, 0f, 0f), 0),
    (2L, Seq(0f, 3f, 0f, 0f), 0),
    (3L, Seq(-1f, 0f, 0f, 0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("cosine top-k ranks by exact cosine with deterministic ties") {
    val out = Similarity.cosineTopK(emb, _.filter(col("vec_id") === 0), 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((1L, 1.0)))
    assert(out(1) === ((2L, 0.0)))
    assert(out(2) === ((3L, -1.0)))
  }

  test("ivf probe only scores the query's coarse bucket") {
    val out = Similarity.ivfTopK(emb, _.filter(col("vec_id") === 0), 10)
      .select("cand_id").as[Long].collect()
    assert(out.toSet === Set(1L, 2L)) // label 0 only; vec 3 is in bucket 1
  }

  test("sign-bit LSH only scores same-bucket candidates") {
    // signs of the first 2 dims: vecs 0,1,2 -> "11" (0 counts as +);
    // vec 3 -> "01" lands in its own bucket
    val out = Similarity.lshTopK(emb, _.filter(col("vec_id") === 0), 10, bits = 2)
      .select("cand_id").as[Long].collect()
    assert(out.toSet === Set(1L, 2L))
  }

  test("prescreen slack cutoff does not change the exact top-k (real embeddings)") {
    val emb = Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    def run(slack: Int) =
      Similarity.cosineTopK(emb, _.filter(col("vec_id") < 3), k = 5, slack = slack)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // slack = corpus size keeps every candidate -> exact by construction
    val exhaustive = run(100000)
    assert(run(20) === exhaustive)
    assert(exhaustive.nonEmpty)
  }

  test("int8 quantization: floor(x*scale + 0.5) rounding with clamps") {
    val one = Seq((1L, Seq(0.5f, -3.0f, 0.01f, 5.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val qv = Similarity.quantize(one, scale = 64.0)
      .select("qv").as[Seq[Long]].head()
    // 0.5*64+0.5=32.5 -> 32; -3*64 clamps to -127; 0.01f*64+0.5~1.14 -> 1;
    // 5*64 clamps to 127
    assert(qv === Seq(32L, -127L, 1L, 127L))
  }

  test("kmeansBuckets: total assignment, bounded ids, partition-invariant") {
    val emb = Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val out = Similarity.kmeansBuckets(emb, k = 4, rounds = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === n)                       // every vector assigned once
    assert(out.map(_._1).distinct.length === n)
    val used = out.map(_._2).toSet
    assert(used.subsetOf((0L until 4L).toSet) && used.size > 1)
    // hash-seeded + ordered folds + exact sums => the SAME assignment
    // from any input partitioning (the determinism claim, tested)
    val repart = Similarity.kmeansBuckets(emb.repartition(7), k = 4, rounds = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(repart === out)
  }

  test("meanPool: identical vectors pool to themselves, mixed pool to the average") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.meanPool(emb).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out((0, 0)) === ((2L, 1.0)) && out((0, 1)) === ((2L, 0.0)))
    assert(out((1, 0)) === ((2L, 0.5)) && out((1, 1)) === ((2L, 0.5)))
  }

  test("hardNegatives: k per query, no same-label candidate, similarity-ordered") {
    val emb = Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.hardNegatives(emb, _.filter(col("vec_id") < 10), 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 50) // 10 queries x 5 negatives
    out.foreach { case (q, _, c, _) =>
      assert(labels(q) !== labels(c), s"same-label candidate $c for query $q")
    }
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      val cos = rs.sortBy(_._2).map(_._4)
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, "not similarity-ordered")
    }
  }

  test("kmeansBuckets runs on a bare (vec_id, embedding) table — no label column") {
    val emb = Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val bare = emb.select("vec_id", "embedding") // what a user's corpus ships
    val out = Similarity.kmeansBuckets(bare, k = 4, rounds = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // and the assignment is identical to the labeled table's (label is ignored)
    val labeled = Similarity.kmeansBuckets(emb, k = 4, rounds = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out === labeled && out.nonEmpty)
  }

  test("kmeansBuckets trains on the sample but assigns the full corpus") {
    val emb = Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val out = Similarity.kmeansBuckets(emb, k = 4, rounds = 1,
      trainPred = _.filter(col("vec_id") % 5 === 0))
    assert(out.count() === emb.count()) // non-sample vectors assigned too
  }

  test("ivfTopKWith probes the derived bucket only") {
    // buckets put vec 3 alone; the query (vec 0) must never see it
    val buckets = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L)).toDF("vec_id", "cluster")
    val out = Similarity.ivfTopKWith(emb, buckets, _.filter(col("vec_id") === 0), 10)
      .select("cand_id").as[Long].collect()
    assert(out.toSet === Set(1L, 2L))
  }

  test("semantic dedup keeps exactly the min-id representative per component") {
    val out = queries.SimilarityQ.queries("q199_semantic_dedup")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nVec = Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(out.length.toLong === nVec) // a full keep/drop decision table
    out.groupBy(_._2).foreach { case (cluster, members) =>
      val keptIds = members.filter(_._3 == 1L).map(_._1)
      assert(keptIds.toSeq === Seq(cluster),
        s"cluster $cluster kept ${keptIds.mkString(",")}")
      assert(members.map(_._1).min === cluster,
        s"cluster $cluster label is not its min member")
    }
  }

  test("kCenterSelect covers every planted cluster before revisiting one") {
    // four tight clusters at the corners of a 2-plane; 3 near-copies
    // each. Greedy farthest-point with k=4 must take one per cluster.
    def jitter(base: Seq[Float], eps: Float): Seq[Float] =
      base.zipWithIndex.map { case (v, i) => if (i == 3) v + eps else v }
    val corners = Seq(
      Seq(1f, 1f, 0f, 0f), Seq(-1f, 1f, 0f, 0f),
      Seq(1f, -1f, 0f, 0f), Seq(-1f, -1f, 0f, 0f))
    val rows = for {
      (c, ci) <- corners.zipWithIndex
      j <- 0 until 3
    } yield ((ci * 3 + j).toLong, jitter(c, 0.01f * j), ci)
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.kCenterSelect(df, k = 4)
      .orderBy("round").collect()
    // seed is min id (cluster 0); each pick lands in a fresh cluster
    assert(out(0).getLong(1) === 0L)
    assert(out(0).isNullAt(2))
    val clusters = out.map(_.getLong(1) / 3).toSet
    assert(clusters === Set(0L, 1L, 2L, 3L))
    // selection distances are non-increasing (greedy invariant)
    val ds = out.drop(1).map(_.getLong(2))
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => a >= b })
  }
}
