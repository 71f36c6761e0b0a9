package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native cosine_similarity expression: registered as a SQL
  * built-in via GraftExtensions, codegen'd, total on zero vectors. */
class CosineExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    Seq((a, b)).toDF("a", "b").createOrReplaceTempView("cos_in")
    spark.sql("SELECT cosine_similarity(a, b) FROM cos_in").first().getDouble(0)
  }

  test("registered via extensions and computes known fixtures") {
    assert(cos(Seq(1f, 0f), Seq(2f, 0f)) === 1.0)
    assert(cos(Seq(1f, 0f), Seq(0f, 5f)) === 0.0)
    assert(cos(Seq(1f, 0f), Seq(-3f, 0f)) === -1.0)
    assert(math.abs(cos(Seq(1f, 1f), Seq(1f, 0f)) - math.sqrt(0.5)) < 1e-12)
  }

  test("total on zero vectors (0.0, not NaN)") {
    assert(cos(Seq(0f, 0f), Seq(1f, 2f)) === 0.0)
  }

  test("null inputs propagate null") {
    val r = spark.sql("SELECT cosine_similarity(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").first()
    assert(r.isNullAt(0))
  }

  test("matches the interpreted path on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(20).select("vec_id", "embedding")
    emb.createOrReplaceTempView("emb_t")
    val sql = spark.sql(
      """SELECT a.vec_id, b.vec_id, cosine_similarity(a.embedding, b.embedding) AS c
        |FROM emb_t a JOIN emb_t b ON a.vec_id < b.vec_id""".stripMargin)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val local = {
      val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      for {
        (ia, va) <- rows; (ib, vb) <- rows if ia < ib
      } yield {
        val n = va.length
        var dot = 0d; var na = 0d; var nb = 0d
        (0 until n).foreach { i =>
          dot += va(i).toDouble * vb(i); na += va(i).toDouble * va(i); nb += vb(i).toDouble * vb(i)
        }
        (ia, ib) -> dot / (math.sqrt(na) * math.sqrt(nb))
      }
    }.toMap
    assert(sql.keySet === local.keySet)
    local.foreach { case (k, v) => assert(math.abs(sql(k) - v) < 1e-12, s"pair $k") }
  }
}
