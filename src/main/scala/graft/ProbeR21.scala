package graft

/** Round-21 OPTIMIZATION probe — the hot-key axis VERDICT r20 next #5
  * asked for: `Stateful.RateBuffered`'s per-event step cost on ONE key
  * as its in-window event count scales ×1/×4/×8. The r20 shape
  * (immutable `Seq` dropWhile + `:+` per event) copied the whole ring
  * per event — O(ring) per event, O(n²) per window for a hot key; the
  * r21 Vector ring with an indexed prefix drop is amortized O(1) per
  * event, so total fold time must scale LINEARLY in the event count.
  *
  * The probe drives the step function directly (the exact code a flush
  * runs per row — the skeleton holds the state in memory across a
  * flush, so JVM-local iteration IS the hot path; no Spark drain
  * needed to measure it). Two regimes:
  *  - "burst": window covers everything — the ring grows to n (the
  *    adversarial hot key);
  *  - "steady": eviction holds the ring at ~1000 — the common case.
  *
  * Usage: `sbt "runMain graft.ProbeR21"`. Rows land in
  * OPTIMIZATION_r21.md / PERF.md.
  */
object ProbeR21 {

  private def foldSeconds(n: Int, windowUs: Long): Double = {
    val rb = new streaming.Stateful.RateBuffered(windowUs) {
      def stepPub(st: Option[Tuple1[Seq[Long]]], row: (String, Long, Long)) =
        step(1L, st, row)
    }
    var st: Option[Tuple1[Seq[Long]]] = None
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      // 1 event per second on the hot key, in (ts, id) order — the
      // order the skeleton guarantees a flush replays
      val (ns, _) = rb.stepPub(st, ("e", i.toLong * 1000000L, i.toLong))
      st = Some(ns)
      i += 1
    }
    val s = (System.nanoTime() - t0) / 1e9
    require(st.get._1.nonEmpty)
    s
  }

  def main(args: Array[String]): Unit = {
    val base = 20000
    println("[probe] RATE-FACE HOT-KEY AXIS (one key, events ×1/×4/×8)")
    Seq(("burst (ring grows to n)", Long.MaxValue / 4),
        ("steady (ring ~1000)", 1000L * 1000000L)).foreach {
      case (label, windowUs) =>
        // JIT warm-up pass, untimed
        foldSeconds(base, windowUs)
        Seq(1, 4, 8).foreach { k =>
          val s = foldSeconds(base * k, windowUs)
          println(f"[probe] $label%-26s ×$k%d: ${base * k}%7d events " +
            f"in $s%7.3f s  (${s * 1e9 / (base * k)}%7.1f ns/event)")
        }
    }
  }
}
