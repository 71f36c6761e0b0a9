package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics, Stats}

/** Round-18 pins: the new analytics faces against seeded brute-force
  * replays (contingency residuals, active-set Jaccard), the MIN-fold
  * additivity of the sequence-support fragments (the registry's first
  * idempotent-fold streaming face — redelivery must be harmless by
  * algebra), and the funnel/as-of replay faces against the registry's
  * batch oracles at sf0.001. */
class R18Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("contingencyResiduals ≡ brute per-cell replay") {
    val rnd = new scala.util.Random(1801)
    val rows = (1 to 4000).map { _ =>
      (s"r${rnd.nextInt(5)}", s"c${rnd.nextInt(4)}")
    }
    val df = rows.toDF("rk", "ck")
    val got = Stats.contingencyResiduals(df, col("rk"), col("ck"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5),
          r.getDouble(6), r.getDouble(7)))
      .toMap
    val n = rows.size.toLong
    val rTot = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cTot = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every r×c cell must be present, including never-observed ones
    assert(got.size == rTot.size * cTot.size)
    for (rk <- rTot.keys; ck <- cTot.keys) {
      val nij = cells.getOrElse((rk, ck), 0L)
      val (gn, gr, gc, gdev, gexp, gres) = got((rk, ck))
      assert(gn == nij && gr == rTot(rk) && gc == cTot(ck))
      val dev = BigInt(nij) * BigInt(n) - BigInt(rTot(rk)) * BigInt(cTot(ck))
      assert(gdev == dev.toString)
      val nd = n.toDouble
      val exp = rTot(rk).toDouble * cTot(ck).toDouble / nd
      assert(gexp == exp)
      val res = (dev.toDouble / nd) /
        math.sqrt(exp * (1.0 - rTot(rk).toDouble / nd) *
          (1.0 - cTot(ck).toDouble / nd))
      assert(gres == res, s"cell ($rk,$ck)")
    }
  }

  test("contingency cell fragments fold ≡ one-shot (additivity)") {
    val rnd = new scala.util.Random(1802)
    val rows = (1 to 3000).map(i =>
      (i % 4, s"r${rnd.nextInt(4)}", s"c${rnd.nextInt(3)}"))
    val df = rows.toDF("part", "row_key", "col_key")
    val oneShot = Stats.contingencyResiduals(
      df, col("row_key"), col("col_key"))
    val frags = (0 to 3).map(k =>
      df.filter(col("part") === k)
        .groupBy(col("row_key"), col("col_key"))
        .agg(count(lit(1)).as("c"))).reduce(_ unionByName _)
    val folded = Stats.contingencyFromCounts(frags)
    assert(folded.except(oneShot).isEmpty && oneShot.except(folded).isEmpty)
  }

  test("activeSetJaccard ≡ brute set replay (incl. zero-overlap pair)") {
    val rows = Seq(
      // day 0: {1,2,3}; day 1: {2,3,4}; day 2: {9} (disjoint from day 1)
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 2L),
      (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 9L))
    val got = EventAnalytics.activeSetJaccard(
      rows.toDF("d", "u"), col("d"), col("u"))
      .orderBy("day_a")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (0L, 1L, 3L, 3L, 2L, 0.5),
      (1L, 2L, 3L, 1L, 0L, 0.0)))
  }

  test("sequence-support MIN fragments fold ≡ one-shot, redelivery-safe") {
    val rnd = new scala.util.Random(1803)
    val ev = (1 to 2000).map(i =>
      (rnd.nextInt(40).toLong, s"t${rnd.nextInt(4)}",
        rnd.nextLong(1000000L), i.toLong))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val oneShot = EventAnalytics.sequenceSupport(ev)
    def frag(pred: org.apache.spark.sql.Column) =
      ev.filter(pred)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(struct(col("ts_us").as("ts"), col("event_id").as("id")))
          .as("m"))
        .select(col("user_id"), col("event_type"),
          col("m.ts").as("fts"), col("m.id").as("fid"))
    // 3 disjoint fragments PLUS a full duplicate of fragment 0 — the
    // idempotent MIN fold must absorb at-least-once redelivery
    val frags = Seq(col("event_id") % 3 === 0, col("event_id") % 3 === 1,
      col("event_id") % 3 === 2, col("event_id") % 3 === 0)
      .map(frag).reduce(_ unionByName _)
    val firsts = frags.groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("fts").as("ts"), col("fid").as("id"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.ts").as("ts_us"), col("m.id").as("event_id"))
    val folded = EventAnalytics.sequenceSupport(firsts)
    assert(folded.except(oneShot).isEmpty && oneShot.except(folded).isEmpty)
  }

  test("sourceRuzicka ≡ brute multiset replay (incl. disjoint pair)") {
    val docs = Seq(
      (1L, "a b b c", "s1"), (2L, "b c d", "s1"),
      (3L, "a a b", "s2"), (4L, "e f", "s3") // s3 disjoint from s2
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.TextAnalysis.sourceRuzicka(docs, "source")
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // brute: token count vectors per source
    val vecs = Seq(
      "s1" -> Map("a" -> 1L, "b" -> 3L, "c" -> 2L, "d" -> 1L),
      "s2" -> Map("a" -> 2L, "b" -> 1L),
      "s3" -> Map("e" -> 1L, "f" -> 1L)).toMap
    def brute(x: String, y: String) = {
      val (vx, vy) = (vecs(x), vecs(y))
      val smin = (vx.keySet ++ vy.keySet).toSeq
        .map(t => math.min(vx.getOrElse(t, 0L), vy.getOrElse(t, 0L))).sum
      val (na, nb) = (vx.values.sum, vy.values.sum)
      (x, y, na, nb, smin, smin.toDouble / (na + nb - smin).toDouble)
    }
    assert(got.toSeq == Seq(brute("s1", "s2"), brute("s1", "s3"),
      brute("s2", "s3")))
    assert(got.find(r => r._1 == "s2" && r._2 == "s3").get._6 == 0.0)
  }

  test("q399/q404 replay drains ≡ their batch oracles (sf0.001)") {
    // q399 vs the batch windowed funnel (q204's query, same params)
    val funnelBatch = EventAnalytics.funnelSteps(
      Tables.events(spark, sf), Seq("view", "click", "purchase"),
      within = Seq(86400L, 86400L)).orderBy("step")
      .collect().map(_.toSeq).toSeq
    val funnelStream = graft.queries.R18Q.queries("q399_stream_funnel_ooo")(
      spark, sf).collect().map(_.toSeq).toSeq
    // label shapes differ ("01_view" vs "1_view") only at depth ≥ 10;
    // at depth 3 they are identical
    assert(funnelStream == funnelBatch,
      s"funnel: $funnelStream vs $funnelBatch")

    // q404 vs a batch point-in-time window build
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val asofBatch = ev
      .withColumn("last_click",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        coalesce(col("last_click"), lit(-1L)).as("click_id"))
      .orderBy("user_id", "purchase_id")
      .collect().map(_.toSeq).toSeq
    val asofStream = graft.queries.R18Q.queries("q404_stream_asof_ooo")(
      spark, sf).collect().map(_.toSeq).toSeq
    assert(asofStream == asofBatch,
      s"asof: ${asofStream.size} vs ${asofBatch.size}")
  }
}
