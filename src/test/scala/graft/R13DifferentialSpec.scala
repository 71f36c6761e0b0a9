package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOf, EventAnalytics, Intervals, Stats}

/** Differential pins for the round-13 analytics additions: each
  * operator is replayed against an independent brute-force Scala
  * reference on seeded random data — the fixtures in the unit specs
  * prove chosen corners, these prove the SEMANTICS over hundreds of
  * unplanned ones. The oracle gate then proves the same semantics
  * against DuckDB on the real tables. */
class R13DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(13)

  test("pointInTimeJoin equals the brute latest-at-or-before lookup") {
    val obs = (1 to 300).map(i =>
      (rnd.nextInt(8) + 1L, rnd.nextInt(50).toLong, 1000L + i))
    val feat = (1 to 200).map(i =>
      (rnd.nextInt(8) + 1L, rnd.nextInt(50).toLong, 2000L + i,
        rnd.nextInt(100).toDouble))
    val out = AsOf.pointInTimeJoin(
      obs.toDF("k", "ts", "oid"), feat.toDF("k", "ts", "fid", "v"),
      "k", "ts", "oid", "fid", Seq("v"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    obs.foreach { case (k, ts, oid) =>
      val expect = feat.filter(f => f._1 == k && f._2 <= ts)
        .sortBy(f => (f._2, f._3)).lastOption.map(_._3)
      assert(out(oid) === expect, s"obs $oid (k=$k, ts=$ts)")
    }
  }

  test("Intervals.coverage equals a brute sweep merge") {
    val iv = (1 to 300).map { _ =>
      val s = rnd.nextInt(200).toLong
      (rnd.nextInt(6) + 1L, s, s + rnd.nextInt(30).toLong)
    }
    val out = Intervals.coverage(iv.toDF("k", "s", "e"), "k")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val expect = iv.filter(x => x._2 < x._3).groupBy(_._1).toSeq
      .flatMap { case (k, xs) =>
        val sorted = xs.map(x => (x._2, x._3)).sorted
        val islands = sorted.tail.foldLeft(
          List((sorted.head._1, sorted.head._2, 1L))) {
          case ((is, ie, n) :: done, (s, e)) =>
            if (s <= ie) (is, math.max(ie, e), n + 1) :: done
            else (s, e, 1L) :: (is, ie, n) :: done
          case (Nil, _) => Nil
        }
        islands.map { case (s, e, n) => (k, s, e, n) }
      }.toSet
    assert(out === expect)
  }

  test("matchPattern equals the brute first-B/first-C scan") {
    val types = Seq("A", "B", "C", "X")
    val ev = (1 to 400).map(i =>
      (rnd.nextInt(10) + 1L, types(rnd.nextInt(4)),
        rnd.nextInt(1000000).toLong, i.toLong))
    val out = EventAnalytics.matchPattern(
      ev.toDF("user_id", "event_type", "ts_us", "event_id"),
      "A", "B", "C", withinSec = 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val withinUs = 1000000L
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ord = xs.sortBy(x => (x._3, x._4))
      ord.filter(_._2 == "A").flatMap { a =>
        val after = ord.dropWhile(x => (x._3, x._4) != ((a._3, a._4))).tail
        val nb = after.find(_._2 == "B")
        val nc = after.find(_._2 == "C")
        nb match {
          case Some(b) if b._3 - a._3 <= withinUs &&
            nc.forall(c => c._3 >= b._3) => Some((a._4, b._4))
          case _ => None
        }
      }
    }.toSet
    assert(out === expect)
  }

  test("winsorize equals brute order-statistic clipping") {
    val rows = (1 to 237).map(i =>
      ("g" + rnd.nextInt(3), rnd.nextInt(1000) / 10.0, i.toLong))
    val out = Stats.winsorize(rows.toDF("g", "v", "id"), "g", "v", "id")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val sorted = xs.sortBy(x => (x._2, x._3))
      val n = sorted.size
      val k = n / 20
      val lo = sorted(k)._2
      val hi = sorted(n - k - 1)._2
      xs.foreach { x =>
        assert(out(x._3) === math.min(math.max(x._2, lo), hi),
          s"row ${x._3} in group of $n (k=$k)")
      }
    }
  }

  test("kaplanMeier equals the brute fixed-point product") {
    val day = 86400000000L
    val ev = (1 to 40).flatMap { u =>
      val n = rnd.nextInt(5) + 1
      (1 to n).map(_ => (u.toLong,
        if (rnd.nextInt(4) == 0) "purchase" else "view",
        rnd.nextInt(20).toLong * day + rnd.nextInt(1000).toLong,
        rnd.nextInt(1 << 20).toLong))
    }
    val out = EventAnalytics.kaplanMeier(
      ev.toDF("user_id", "event_type", "ts_us", "event_id"), "purchase")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // brute: per user durations, suffix risk, BigInt fold
    val durs = ev.groupBy(_._1).toSeq.map { case (_, xs) =>
      val t0 = xs.map(_._3).min
      val tp = xs.filter(_._2 == "purchase").map(_._3).minOption
      val te = xs.map(_._3).max
      ((tp.getOrElse(te) - t0) / day, tp.isDefined)
    }
    val evts = durs.filter(_._2).groupBy(_._1).view.mapValues(_.size.toLong)
      .toMap.toSeq.sortBy(_._1)
    var s = BigInt("1000000000000000000")
    evts.foreach { case (t, d) =>
      val nRisk = durs.count(_._1 >= t).toLong
      s = s * BigInt(nRisk - d) / BigInt(nRisk)
      val (gotN, gotD, gotS) = out(t)
      assert(gotN === nRisk && gotD === d)
      assert(gotS === s.toDouble / 1e18)
    }
    assert(out.size === evts.size)
  }

  test("ewmaDaily equals the brute integer recursion") {
    // all samples inside January 2020, so the day index is dom - 1
    // regardless of timezone conventions
    val raw = (1 to 200).map(_ => ("t" + rnd.nextInt(2), rnd.nextInt(25) + 1))
    val ev = raw.map { case (g, dom) =>
      (g, java.sql.Timestamp.valueOf(f"2020-01-$dom%02d 12:00:00"))
    }
    val out = EventAnalytics.ewmaDaily(ev.toDF("event_type", "ts"), 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    raw.groupBy(_._1).foreach { case (g, xs) =>
      val byDay = xs.groupBy(x => (x._2 - 1).toLong)
        .view.mapValues(_.size.toLong).toMap
      val d0 = byDay.keys.min
      val d1 = byDay.keys.max
      var s = -1L
      (d0 to d1).foreach { d =>
        val n = byDay.getOrElse(d, 0L)
        s = if (s < 0) n * 1000000L else s + (n * 1000000L - s) / 4
        assert(out((g, d)) === ((n, s.toDouble / 1e6)), s"$g day $d")
      }
    }
  }
}
