package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

/** r14 sketch/robust-stats properties beyond the oracle gates. */
class R14SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL estimate lands near exact cardinality in the raw regime") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .withColumn("g", lit("all"))
    val exact = docs.select("doc_id").distinct().count().toDouble
    assert(exact > 2.5 * 64, "fixture must be out of the small-range regime")
    val est = Stats.hllDistinct(docs, "g", "doc_id")
      .select("estimate").head().getDouble(0)
    assert(math.abs(est - exact) / exact < 0.2,
      s"HLL(64 registers) off by >20%: est=$est exact=$exact")
  }

  test("HLL is partitioning- and order-invariant") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("g", lit("all"))
    val a = Stats.hllDistinct(docs, "g", "doc_id").collect().map(_.toSeq)
    val b = Stats.hllDistinct(docs.repartition(7).orderBy(desc("doc_id")),
      "g", "doc_id").collect().map(_.toSeq)
    assert(a === b)
  }

  test("feature hashing: same text, same sparse vector; sign cancels") {
    val d = Seq((1L, "alpha beta alpha"), (2L, "alpha beta alpha"))
      .toDF("doc_id", "text")
    val v = Stats.featureHash(d, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = v.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet)
    assert(byDoc(1L) === byDoc(2L), "identical text must hash identically")
  }

  test("MAD flags an injected spike that a mean-based rule would absorb") {
    val base = Tables.events(spark, "/root/testdata/sf0.001")
    val flags = Stats.madAnomalyDaily(base)
    // the daily series is roughly uniform; the doubled-median MAD
    // must flag only genuinely extreme days (possibly none), never
    // the bulk
    val n = flags.count()
    val flagged = flags.filter(col("is_anomaly")).count()
    assert(n > 0 && flagged < n / 4,
      s"MAD flagged $flagged of $n days — the rule is too loose")
    // and the integers are internally consistent: dev vs med/mad
    val bad = flags.filter(col("is_anomaly") &&
      abs(lit(2L) * (lit(2L) * col("n") - col("med2"))) <= lit(3L) * col("mad4"))
    assert(bad.isEmpty, "flag disagrees with its own rule")
  }
}
