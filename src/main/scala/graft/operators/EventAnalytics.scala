package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product-analytics operators over an event stream (user_id,
  * event_type, ts). Everything here is a chain of per-user
  * conditional aggregations — each stage scans only its own
  * type-filtered slice (the filter pushes to the source), the prior
  * stage's per-user entry times join as a user-keyed dimension the
  * planner broadcasts while small and shuffle-joins on the user key
  * when it grows — and no per-user event arrays are ever
  * materialized (the collect_list+fold alternative carries whole
  * users in executor memory).
  */
object EventAnalytics {

  /** Ordered funnel: step 1's entry time is the user's earliest
    * `steps(0)` event; step k's is the earliest `steps(k-1)` event
    * STRICTLY AFTER the user's step k-1 entry — and, when `within`
    * is given, AT MOST `within(k-2)` seconds after it (the form
    * every real conversion-window funnel takes: a purchase six
    * months after the click is not a conversion). Returns one
    * (step, n_users) row PER STEP, including n_users = 0 for steps
    * nobody reached — each stage's count is a scalar aggregate over
    * its materialized entry relation, so the output shape is the
    * step list itself, not whichever steps happened to convert
    * (ADVICE r12: a groupBy over an empty stage emitted no row
    * while COUNT(*) oracles emit 0). Labels are zero-padded to the
    * funnel depth ("01_view" once a 10th step exists) so
    * lexicographic order equals funnel order at any depth.
    *
    * @param within optional per-transition conversion windows in
    *               seconds, one per step after the first: step k+1
    *               counts only when its event lands in
    *               (t_k, t_k + within(k-1)]. Empty = unwindowed.
    */
  def funnelSteps(ev: DataFrame, steps: Seq[String],
                  within: Seq[Long] = Seq.empty,
                  userCol: String = "user_id",
                  typeCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(within.isEmpty || within.size == steps.size - 1,
      s"within needs one bound per transition (${steps.size - 1} here), " +
        s"got ${within.size}")
    require(within.forall(_ > 0), "conversion windows must be positive seconds")
    val width = steps.size.toString.length
    def label(i: Int) = s"%0${width}d_%s".format(i + 1, steps(i))
    val entries: Seq[DataFrame] = steps.zipWithIndex
      .foldLeft(Seq.empty[DataFrame]) { case (acc, (evType, i)) =>
        val stage =
          if (i == 0)
            ev.filter(col(typeCol) === evType)
              .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
          else {
            val inWindow =
              if (within.isEmpty) lit(true)
              else col(tsCol) <=
                col(s"t${i - 1}") + expr(s"INTERVAL ${within(i - 1)} SECOND")
            ev.filter(col(typeCol) === evType)
              .join(acc.last, userCol)
              .filter(col(tsCol) > col(s"t${i - 1}") && inWindow)
              .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
          }
        // materialize each stage's (tiny) per-user entry relation: it
        // feeds BOTH its own step count and every later stage, and
        // without truncating lineage stage k re-derives the whole
        // chain below it — the unmaterialized plan recomputed stage
        // 1's aggregate once per later step (same rule as the CC
        // rounds in Dedup.dedupClusters)
        acc :+ stage.localCheckpoint(true)
      }
    entries.zipWithIndex
      .map { case (df, i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(label(i)).as("step"), col("n_users"))
      }
      .reduce(_ unionByName _)
  }

  /** ANY-ORDER span conversion — the unordered complement of
    * [[funnelSteps]]: a user converts when they have done ALL of
    * `steps` (in any order) and the span between their earliest and
    * latest FIRST occurrences fits inside `withinSeconds` (the
    * standard first-occurrence reading of "did all of X, Y, Z within
    * N days"). One (user, type)-keyed min-aggregation then one
    * user-keyed rollup — two shuffles, no arrays, no order
    * dependence. Emits a single (n_users, n_all_steps, n_converted)
    * row over the users touching any step. */
  def spanConversion(ev: DataFrame, steps: Seq[String], withinSeconds: Long,
                     userCol: String = "user_id",
                     typeCol: String = "event_type",
                     tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty && withinSeconds > 0, "steps and a positive span required")
    val firsts = ev.filter(col(typeCol).isin(steps.map(x => x: Any): _*))
      .groupBy(col(userCol), col(typeCol))
      .agg(min(col(tsCol)).as("first_ts"))
    val per = firsts.groupBy(col(userCol)).agg(
      count(lit(1)).as("n_types"),
      (unix_micros(max(col("first_ts"))) -
        unix_micros(min(col("first_ts")))).as("span_us"))
    val all = col("n_types") === steps.size
    per.agg(count(lit(1)).as("n_users"),
      count(when(all, 1)).as("n_all_steps"),
      count(when(all && col("span_us") <= withinSeconds * 1000000L, 1))
        .as("n_converted"))
  }

  /** FIRST-TOUCH event paths (the Sankey/user-journey rollup): per
    * user, the chronological order of each event type's FIRST
    * occurrence, joined into a ">"-separated path string, counted by
    * path. The per-user list is bounded by the EVENT-TYPE dimension
    * (a handful), never by that user's events — the one shape where
    * collect_list is scale-safe — and ordering is made engine-exact
    * by sorting zero-padded "epochUs|type" strings (timestamp ties
    * fall back to the type name identically everywhere). */
  def firstTouchPaths(ev: DataFrame,
                      userCol: String = "user_id",
                      typeCol: String = "event_type",
                      tsCol: String = "ts"): DataFrame = {
    val firsts = ev.groupBy(col(userCol), col(typeCol))
      .agg(min(col(tsCol)).as("first_ts"))
    firsts.groupBy(col(userCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(
            format_string("%020d|%s", unix_micros(col("first_ts")), col(typeCol)))),
          x => substring_index(x, "|", -1)),
        ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
  }

  /** Weekly lifecycle cohorts: classify every (week, user) activity
    * cell as `new` (first active week), `retained` (also active the
    * immediately preceding week) or `resurrected` (active before,
    * but not last week), and emit a `churned` cell at week w+7 for
    * every user active in w but not in w+7 — bounded to the corpus's
    * last observed week, since churn past the data's edge is
    * unknowable. Completes the q201 retention skeleton: one distinct
    * (user, week) pass, then lag/lead over the user partition — the
    * events table is touched once, per-user state is two adjacent
    * window rows (never an activity array), and the corpus max-week
    * scalar joins in on a constant key as a one-row broadcast hash
    * join. Output (week, status, n_users), one row per non-empty
    * cell. */
  def weeklyChurn(ev: DataFrame,
                  userCol: String = "user_id",
                  tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = ev
      .select(col(userCol), to_date(date_trunc("week", col(tsCol))).as("week"))
      .distinct()
    val byUser = Window.partitionBy(userCol).orderBy("week")
    val a = wk
      .withColumn("prev", lag(col("week"), 1).over(byUser))
      .withColumn("next", lead(col("week"), 1).over(byUser))
    val active = a.select(col("week"),
      when(col("prev").isNull, lit("new"))
        .when(datediff(col("week"), col("prev")) === 7, lit("retained"))
        .otherwise(lit("resurrected")).as("status"))
    // the corpus max-week bound embeds as a ONE-ROW broadcast cross
    // join (the q102/q171 scalar idiom — allowlisted in PlanAuditSpec;
    // an equi-join on a constant key just constant-folds back to this)
    val mx = wk.agg(max(col("week")).as("max_week"))
    val churned = a
      .filter(col("next").isNull || datediff(col("next"), col("week")) > 7)
      .select(date_add(col("week"), 7).as("week"))
      .crossJoin(broadcast(mx))
      .filter(col("week") <= col("max_week"))
      .select(col("week"), lit("churned").as("status"))
    active.unionByName(churned)
      .groupBy(date_format(col("week"), "yyyy-MM-dd").as("week"), col("status"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** CO-OCCURRENCE LIFT between event types — the association/
    * recommender primitive ("users who do A also do B"):
    * lift(a,b) = P(a∧b) / (P(a)·P(b)) over per-user type sets, > 1
    * meaning the pair co-occurs more than independence predicts.
    * One distinct (user, type) pass, a self-join ON THE USER KEY
    * with a<b (output bounded by the type-dimension², not users),
    * and exact counts into one mirrored IEEE expression:
    * lift = (n_both·n_users) / (n_a·n_b). */
  def cooccurrenceLift(ev: DataFrame,
                       userCol: String = "user_id",
                       typeCol: String = "event_type"): DataFrame = {
    val ut = ev.select(col(userCol).as("u"), col(typeCol).as("t")).distinct()
    // the user-universe size embeds as a ONE-ROW broadcast (the
    // q102/weeklyChurn scalar idiom — allowlisted in PlanAuditSpec)
    val nUsers = ut.agg(countDistinct(col("u")).as("n_users"))
    val perType = ut.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val both = ut.alias("a")
      .join(ut.alias("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(perType.select(col("t").as("type_a"), col("n_t").as("n_a")), "type_a")
      .join(perType.select(col("t").as("type_b"), col("n_t").as("n_b")), "type_b")
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("n_a"), col("n_b"),
        ((col("n_both").cast("double") * col("n_users").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  /** LAST-TOUCH ATTRIBUTION — the marketing-analytics canon: every
    * `convType` event is credited to the user's most recent PRECEDING
    * non-conversion event type (the "channel"), conversions with no
    * preceding touch credit "(direct)". One `last(_, ignoreNulls)`
    * carry over the user partition with a strictly-preceding ROWS
    * frame — no per-user arrays, no self-join — then a
    * channel-bounded rollup with exact value sums. */
  def lastTouchAttribution(ev: DataFrame, convType: String,
                           userCol: String = "user_id",
                           typeCol: String = "event_type",
                           tsCol: String = "ts",
                           tieCol: String = "event_id",
                           valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.select(col(userCol), col(typeCol), col(tsCol), col(tieCol),
        col(valueCol))
      .withColumn("channel",
        last(when(col(typeCol) =!= convType, col(typeCol)), ignoreNulls = true)
          .over(w))
      .filter(col(typeCol) === convType)
      .groupBy(coalesce(col("channel"), lit("(direct)")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
  }

  /** POSITION-BASED (U-SHAPED) MULTI-TOUCH ATTRIBUTION — the
    * fractional complement of [[lastTouchAttribution]]: each touch is
    * assigned to the user's NEXT conversion (one forward
    * `first(_, ignoreNulls)` carry — the journey is the touch run
    * between conversions), then within each journey the first and
    * last touch earn 40% each and the middles split the remaining
    * 20% evenly (single touch 100%, two touches 50/50). Credits are
    * integer PARTS-PER-MILLION (middles get floor(200000/(n−2))), so
    * per-channel totals are exact BIGINT sums — no order-dependent
    * double accumulation — with one final /1e6 presentation divide. */
  def positionAttribution(ev: DataFrame, convType: String,
                          userCol: String = "user_id",
                          typeCol: String = "event_type",
                          tsCol: String = "ts",
                          tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wNext = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tagged = ev.select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("conv_id",
        first(when(col(typeCol) === convType, col(tieCol)),
          ignoreNulls = true).over(wNext))
      .filter(col(typeCol) =!= convType && col("conv_id").isNotNull)
    val wJourney = Window.partitionBy(col(userCol), col("conv_id"))
    val positioned = tagged
      .withColumn("pos", row_number().over(
        wJourney.orderBy(col(tsCol), col(tieCol))))
      .withColumn("n", count(lit(1)).over(wJourney))
    positioned
      .withColumn("credit_ppm",
        when(col("n") === 1, 1000000L)
          .when(col("n") === 2, 500000L)
          .when(col("pos") === 1 || col("pos") === col("n"), 400000L)
          .otherwise(expr("200000 div (n - 2)")))
      .groupBy(col(typeCol).as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_ppm")).as("credit_ppm"))
      .withColumn("credit", col("credit_ppm").cast("double") / lit(1e6))
  }

  /** KAPLAN-MEIER TIME-TO-CONVERSION — the survival-analysis readout
    * over user lifecycles: per user, the origin is their FIRST event,
    * the "death" their first `convType` event, and users who never
    * convert are right-censored at their last observed event. For
    * every duration (whole days since origin) with at least one
    * conversion, emits the at-risk count, the conversion count, and
    * the Kaplan-Meier survival estimate S(t) = Π_{t_i ≤ t}
    * (1 − d_i/n_i).
    *
    * Deterministic by construction, not by luck: durations are
    * integer floor-divisions of µs longs; the at-risk counts come
    * from one suffix-sum window over the (bounded: ≤ history days)
    * per-duration relation; and the running product is computed in
    * FIXED-POINT 1e18 integer arithmetic by a sequential left fold
    * over the sorted duration table (`aggregate` HOF) — every step
    * is an exact integer multiply + floor divide, so the result is
    * bit-identical under any partitioning and to a DuckDB
    * recursive-CTE twin. The fold runs on one row of ≤ a few
    * thousand entries (days of history), while the heavy per-user
    * and per-duration aggregations stay fully distributed.
    *
    * @param tsCol event time as µs-since-epoch longs
    */
  def kaplanMeier(ev: DataFrame, convType: String,
                  userCol: String = "user_id",
                  typeCol: String = "event_type",
                  tsCol: String = "ts_us"): DataFrame = {
    val usPerDay = 86400000000L
    val perUser = ev.groupBy(col(userCol)).agg(
      min(col(tsCol)).as("t0"),
      min(when(col(typeCol) === convType, col(tsCol))).as("tp"),
      max(col(tsCol)).as("te"))
    // integer floor-div (durations are nonneg, so `div` = floor) —
    // a double divide + cast would round differently than DuckDB's
    val durations = perUser.selectExpr(
      s"(coalesce(tp, te) - t0) div $usPerDay AS dur",
      "tp IS NOT NULL AS converted")
    val perDur = durations.groupBy(col("dur")).agg(
      count(lit(1)).as("c_all"),
      sum(when(col("converted"), 1L).otherwise(0L)).as("d"))
    // suffix sum: n_risk(t) = users with duration >= t (censored
    // users leave the risk set after their duration, as KM requires)
    val wRisk = org.apache.spark.sql.expressions.Window.orderBy(col("dur"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val risk = perDur
      .withColumn("n_risk", sum(col("c_all")).over(wRisk))
      .filter(col("d") > 0)
      .select(col("dur"), col("n_risk"), col("d"))
    // sequential fixed-point fold: s' = floor(s * (n-d) / n), s0 = 1e18
    risk.agg(sort_array(collect_list(struct(
        col("dur"), col("n_risk"), col("d")))).as("rows"))
      .selectExpr(
        """inline(aggregate(rows,
          |  struct(CAST(1000000000000000000 AS BIGINT) AS s,
          |         CAST(array() AS
          |           ARRAY<STRUCT<t_days: BIGINT, n_risk: BIGINT,
          |                        n_events: BIGINT, s: BIGINT>>) AS out),
          |  (acc, x) -> struct(
          |    CAST((CAST(acc.s AS DECIMAL(38,0)) * (x.n_risk - x.d))
          |         div x.n_risk AS BIGINT),
          |    array_append(acc.out, named_struct(
          |      't_days', x.dur, 'n_risk', x.n_risk, 'n_events', x.d,
          |      's', CAST((CAST(acc.s AS DECIMAL(38,0)) * (x.n_risk - x.d))
          |                div x.n_risk AS BIGINT)))),
          |  acc -> acc.out))""".stripMargin)
      .select(col("t_days"), col("n_risk"), col("n_events"),
        (col("s").cast("double") / lit(1e18)).as("survival"))
  }

  /** EVENT TRANSITION MATRIX — the first-order Markov readout over
    * each user's event sequence: for every (from, to) type pair, how
    * many adjacent transitions occurred and the row-normalized
    * probability P(to | from). The complement of [[firstTouchPaths]]
    * (full sequences, not first touches): one lag window over the
    * user partition with an engine-exact (ts, tie) total order, one
    * bounded (type×type) aggregation, one exact division. */
  def transitionMatrix(ev: DataFrame,
                       userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts",
                       tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = ev
      .select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("next_t", lead(col(typeCol), 1).over(byUser))
      .filter(col("next_t").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("next_t").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    pairs.join(rowTot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("row_n").cast("double")).as("p"))
  }

  /** EVENT SEQUENCE N-GRAM MINING — [[transitionMatrix]]'s higher-order
    * sibling: every run of `n` ADJACENT events in a user's (ts, tie)-
    * ordered sequence, counted corpus-wide with its share of all
    * n-grams. One window pass emits the n−1 leads (no self-joins, no
    * per-user arrays), the rollup is bounded by #types^n, and the
    * share's denominator is a suffix-free window total over that
    * bounded relation — one exact division per row. */
  def sequenceNgrams(ev: DataFrame, n: Int,
                     userCol: String = "user_id",
                     typeCol: String = "event_type",
                     tsCol: String = "ts",
                     tieCol: String = "event_id"): DataFrame = {
    require(n >= 2, s"sequenceNgrams: n must be >= 2, got $n")
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val leads = (1 until n).map(i => lead(col(typeCol), i).over(byUser))
    val gramCols = (col(typeCol) +: leads).zipWithIndex
      .map { case (c, i) => c.as(s"t$i") }
    val grams = ev.select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .select(gramCols: _*)
      .filter((1 until n).map(i => col(s"t$i").isNotNull).reduce(_ && _))
      .groupBy((0 until n).map(i => col(s"t$i")): _*)
      .agg(count(lit(1)).as("cnt"))
    val wTot = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    grams.withColumn("share",
      col("cnt").cast("double") / sum(col("cnt")).over(wTot).cast("double"))
  }

  /** CALENDAR RESAMPLE with gap fill — the time-series alignment op
    * (pandas `asfreq`/`resample` at warehouse scale): per group, a
    * COMPLETE day spine from its first to last observed day, with
    * zero-filled counts on silent days and a 7-day trailing ROWS
    * window over the now-gapless grid (on a complete calendar, the
    * ROWS frame IS the calendar week — the reason resampling comes
    * before any rolling feature). The spine is
    * groups × their day span — explode of a bounded sequence per
    * group, orders of magnitude smaller than the event data. */
  def resampleDaily(ev: DataFrame,
                    groupCol: String = "event_type",
                    tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev
      .select(col(groupCol).as("g"),
        datediff(to_date(col(tsCol)), lit("2020-01-01")).cast("long").as("day"))
      .groupBy(col("g"), col("day"))
      .agg(count(lit(1)).as("n"))
    val spine = daily.groupBy(col("g"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("g"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val filled = spine.join(daily, Seq("g", "day"), "left")
      .select(col("g"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val week = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    filled.withColumn("rolling7", sum(col("n")).over(week))
      .withColumnRenamed("g", groupCol)
  }

  /** CONVERSION-LATENCY DISTRIBUTION — "how long from first
    * `fromType` to the first `toType` after it", summarized as EXACT
    * order statistics (min / lower-median / ceil-rank p90 / max in
    * µs): no fractional-quantile interpolation, so the numbers are
    * bit-identical across engines and partitionings.
    *
    * The per-user gap relation is users-sized, so the rank pass is
    * DISTRIBUTED exact selection — no global sort, no unpartitioned
    * window anywhere in the plan:
    *   1. ONE data pass collapses gaps to staged (value → count)
    *      pairs (distinct-gap-sized; massive ties SHRINK it); every
    *      later step reads this artifact, never the events again;
    *   2. its (n, min, max) give the target ranks r50 = (n+1) div 2
    *      and r90 = (9n+9) div 10 (value-at-rank is well defined
    *      under ties, so any tie order gives the same answer);
    *   3. equal-WIDTH value buckets `b = (gap − min) div w` with
    *      w = ((max − min) div 1024) + 1 (width ≥ 1 ⇒ ≤ 1025 buckets,
    *      pure long arithmetic, no overflow for any µs range);
    *   4. the ≤ 1025 per-bucket totals fold to prefix offsets inside
    *      a single `aggregate` HOF on one collected row (the bounded
    *      driver-free twin of the q85 two-level scan), locating which
    *      bucket holds each target rank;
    *   5. a window partitioned BY BUCKET accumulates in-bucket value
    *      counts over the ≤ 2 target buckets only; the row whose
    *      [lo, hi] rank span covers a target rank carries the answer.
    * Worst-case per-partition work is one bucket's DISTINCT values
    * (~range/1024) — all-equal data degenerates to a single row. */
  def conversionLatency(ev: DataFrame, fromType: String, toType: String,
                        userCol: String = "user_id",
                        typeCol: String = "event_type",
                        tsCol: String = "ts_us"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val from = ev.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("tf"))
    val to = ev.filter(col(typeCol) === toType)
      .select(col(userCol), col(tsCol).as("tt_raw"))
    val gaps = from.join(to, userCol :: Nil)
      .filter(col("tt_raw") > col("tf"))
      .groupBy(col(userCol), col("tf"))
      .agg(min(col("tt_raw")).as("tt"))
      .select((col("tt") - col("tf")).as("gap"))

    // ONE events pass: collapse to (value → multiplicity) and stage it
    // (distinct-gap-sized, ≤ converters) so every downstream pass —
    // stats, bucketing, prefix fold, in-bucket rank — reads the staged
    // artifact, never the events table again (the q199 idiom).
    val valueCounts = gaps.groupBy(col("gap"))
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val stats = valueCounts.agg(
      sum(col("c")).cast("long").as("n"),
      min(col("gap")).as("minv"), max(col("gap")).as("maxv"))
    // bucket by value range; the one-row stats broadcast rides along
    val byValue = valueCounts.crossJoin(broadcast(stats))
      .withColumn("w", expr("((maxv - minv) div 1024L) + 1L"))
      .withColumn("b", expr("(gap - minv) div w"))
    val perBucket = byValue.groupBy(col("b")).agg(sum(col("c")).as("bc"))
    // ≤1025 buckets fold to (bucket → rank offset) in one HOF pass;
    // collect_list over empty input still yields one (empty-array) row,
    // preserving the all-NULL result shape on zero converters.
    val targets = perBucket
      .agg(collect_list(struct(col("b"), col("bc"))).as("bs"))
      .crossJoin(broadcast(stats))
      .withColumn("r50", expr("(n + 1) div 2"))
      .withColumn("r90", expr("(9 * n + 9) div 10"))
      .withColumn("pref", expr(
        """aggregate(array_sort(bs),
          |  struct(cast(0 as bigint) as tot,
          |         cast(array() as
          |           array<struct<b:bigint,off:bigint,cum:bigint>>) as out),
          |  (acc, x) -> named_struct('tot', acc.tot + x.bc,
          |    'out', array_append(acc.out, named_struct(
          |      'b', x.b, 'off', acc.tot, 'cum', acc.tot + x.bc))),
          |  acc -> acc.out)""".stripMargin))
      .select(col("r50"), col("r90"),
        expr("filter(pref, p -> p.off < r50 AND r50 <= p.cum)[0]").as("t50"),
        expr("filter(pref, p -> p.off < r90 AND r90 <= p.cum)[0]").as("t90"))
    val wIn = Window.partitionBy(col("b")).orderBy(col("gap"))
    val sel = byValue.crossJoin(broadcast(targets))
      .filter(col("b") === col("t50.b") || col("b") === col("t90.b"))
      .withColumn("off",
        when(col("b") === col("t50.b"), col("t50.off"))
          .otherwise(col("t90.off")))
      .withColumn("hi", col("off") + sum(col("c")).over(wIn))
      .withColumn("lo", col("hi") - col("c") + lit(1L))
    sel.agg(
      max(col("n")).as("n_converters"),
      max(col("minv")).as("min_us"),
      max(when(col("lo") <= col("r50") && col("r50") <= col("hi"),
        col("gap"))).as("p50_us"),
      max(when(col("lo") <= col("r90") && col("r90") <= col("hi"),
        col("gap"))).as("p90_us"),
      max(col("maxv")).as("max_us"))
  }

  /** COMPLEX-EVENT-PATTERN MATCH — the CEP kernel "A then B within T,
    * with no C between": for every `aType` event, the user's FIRST
    * `bType` event strictly after it; the match stands when that B
    * arrives within `withinSec` AND no `cType` event falls strictly
    * between them (the guard that turns "view then purchase" into
    * "view then purchase with no error in the session"). One forward
    * window pass carries the next-B and next-C (ts, id) structs — no
    * per-user arrays, no self-joins, the same single-shuffle shape as
    * [[funnelSteps]] — and every comparison is on µs longs.
    *
    * Emits one row per MATCHED A event: (user, a_id, b_id, gap_sec).
    * gap_sec is an integer floor division, exact in both engines. */
  def matchPattern(ev: DataFrame, aType: String, bType: String,
                   cType: String, withinSec: Long,
                   userCol: String = "user_id",
                   typeCol: String = "event_type",
                   tsCol: String = "ts_us",
                   tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wFwd = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(1, Window.unboundedFollowing)
    def nextOf(t: String): Column =
      first(when(col(typeCol) === t, struct(col(tsCol).as("ts"),
        col(tieCol).as("id"))), ignoreNulls = true).over(wFwd)
    ev.select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("nb", nextOf(bType))
      .withColumn("nc", nextOf(cType))
      // the guard interval is EXCLUSIVE: a C at B's exact microsecond
      // does not invalidate (nc.ts >= nb.ts passes)
      .filter(col(typeCol) === aType && col("nb").isNotNull &&
        col("nb.ts") - col(tsCol) <= withinSec * 1000000L &&
        (col("nc").isNull || col("nc.ts") >= col("nb.ts")))
      .select(col(userCol), col(tieCol).as("a_id"), col("nb.id").as("b_id"),
        expr(s"(nb.ts - $tsCol) div 1000000").as("gap_sec"))
  }

  /** GENERALIZED CEP STEP PATTERNS (r14) — [[matchPattern]]'s fixed
    * "A then B, no C between" extended to a STEP LIST with per-step
    * quantifiers and per-transition guard sets, the working core of
    * MATCH_RECOGNIZE-style patterns like `A B+ C?`:
    *
    *  - steps: (eventType, quantifier) with quantifier `one` (exactly
    *    one event), `plus` (a maximal alphabet-contiguous run, greedy),
    *    `opt` (one event or skipped), `star` (a run or skipped).
    *  - guards(k): event types that must NOT occur (strictly, by the
    *    same exclusive-timestamp rule as [[matchPattern]]) between the
    *    match of step k and step k+1. A skipped optional step's
    *    transitions merge and their guards union.
    *  - semantics are SKIP-LIBERAL like the fixed operator — events
    *    not named in a transition's guard may freely intervene —
    *    with `contiguous = true` as the MATCH_RECOGNIZE-contiguity
    *    sugar: every transition is auto-guarded with the whole
    *    alphabet except its target, so step k+1 must be the very
    *    next relevant event.
    *  - one row per ANCHOR EVENT (every event matching step 1, the
    *    fixed operator's granularity). When optional steps yield
    *    several viable variants, the GREEDY one wins (include beats
    *    skip, earlier steps first) via a per-anchor priority dedup.
    *
    * Matching is the fixed operator's forward-carry shape, chained:
    * one alphabet-filtered pass computes, per row, the next-(ts, id)
    * of EVERY alphabet type (one user-partitioned window) plus its
    * contiguous-run end (run encoding, a second bounded window); the
    * relation is staged once ([[org.apache.spark.sql.Dataset!.localCheckpoint(eager:Boolean):org.apache.spark.sql.Dataset[T]* localCheckpoint]]),
    * and each pattern transition advances by ONE user+id equi-join
    * into it (+1 for a plus step's run-end hop). Total cost: the
    * filtered scan + O(pattern length) co-keyed hash joins on the
    * staged relation — pattern-bounded, no per-user arrays, no
    * backtracking (quantifier greed is resolved by run ends and
    * variant priority, not search).
    *
    * `steps = [(A,one),(B,one)]`, `guards = {1 → [C]}` reproduces
    * [[matchPattern]] exactly (differential-pinned in R14CepSpec).
    * Adjacent steps in any expanded variant must have distinct types
    * (an `A A`-style pattern needs a quantifier, not repetition).
    *
    * Delegates to [[matchStepsAlt]] with singleton type sets. */
  def matchSteps(ev: DataFrame, steps: Seq[(String, String)],
                 guards: Map[Int, Seq[String]] = Map.empty,
                 withinSec: Long = Long.MaxValue / 2000000L,
                 contiguous: Boolean = false,
                 userCol: String = "user_id",
                 typeCol: String = "event_type",
                 tsCol: String = "ts_us",
                 tieCol: String = "event_id"): DataFrame =
    matchStepsAlt(ev, steps.map { case (t, q) => (Seq(t), q) }, guards,
      withinSec, contiguous, userCol, typeCol, tsCol, tieCol)

  /** CEP ALTERNATION (r15) — [[matchSteps]] with per-step type SETS:
    * the MATCH_RECOGNIZE `(view|click) purchase` shape. A step
    * matches an event of ANY member type; a `plus`/`star` step
    * consumes a maximal contiguous run of IN-SET events (members may
    * interleave inside the run, exactly the `(A|B)+` regex reading).
    *
    * The staged-alphabet design absorbs sets with two local changes
    * and NO new join shape:
    *  - next-event-of-set = `least()` over the member types'
    *    next-(ts, id) carries (struct order = (ts, id) order; `least`
    *    skips nulls) — the carries the single-type operator already
    *    stages;
    *  - run ends for a multi-type set come from one extra run
    *    encoding over set MEMBERSHIP (the single-type encoding is the
    *    degenerate case where membership = type equality), computed
    *    in the same staged pass, one column per distinct multi set.
    *
    * Everything else — variant expansion, greedy priority, guard
    * exclusivity, the per-transition user+id equi-joins — is
    * unchanged, so singleton sets reproduce [[matchSteps]] exactly
    * (differential-pinned in R15CepSpec). Adjacent steps in any
    * expanded variant must have DISJOINT sets (an overlapping
    * adjacency needs a quantifier, not repetition). */
  def matchStepsAlt(ev: DataFrame, steps: Seq[(Seq[String], String)],
                    guards: Map[Int, Seq[String]] = Map.empty,
                    withinSec: Long = Long.MaxValue / 2000000L,
                    contiguous: Boolean = false,
                    userCol: String = "user_id",
                    typeCol: String = "event_type",
                    tsCol: String = "ts_us",
                    tieCol: String = "event_id",
                    withLen: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quants = Set("one", "plus", "opt", "star")
    require(steps.size >= 2, "a pattern needs at least two steps")
    require(steps.forall(s => quants(s._2)),
      s"quantifiers must be one|plus|opt|star: $steps")
    require(steps.forall(_._1.nonEmpty), "every step needs at least one type")
    require(steps.forall(s => s._1.distinct.size == s._1.size),
      s"duplicate types inside a step set: $steps")
    require(steps.head._2 == "one" || steps.head._2 == "plus",
      "the first step anchors the match and cannot be optional")
    require(guards.keys.forall(k => k >= 1 && k < steps.size),
      s"guard transitions must be 1..${steps.size - 1}")
    val alphabet = (steps.flatMap(_._1) ++ guards.values.flatten).distinct.sorted
    // distinct multi-type sets, each getting its own run encoding
    val multiSets: Seq[Seq[String]] =
      steps.map(_._1.sorted).filter(_.size > 1).distinct
    def runEndName(set: Seq[String]): String =
      if (set.size == 1) "rl" else s"rls${multiSets.indexOf(set.sorted)}"

    // one pass: per-row next-(ts,id) of every alphabet type + run end
    val wFwd = Window.partitionBy(col("u")).orderBy(col("ts"), col("id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val wOrd = Window.partitionBy(col("u")).orderBy(col("ts"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val base = ev.filter(col(typeCol).isin(alphabet: _*))
      .select(col(userCol).as("u"), col(typeCol).as("t"),
        col(tsCol).as("ts"), col(tieCol).as("id"))
    val withNext = alphabet.foldLeft(base) { (d, t) =>
      d.withColumn(s"nx_$t",
        first(when(col("t") === t, struct(col("ts"), col("id"))),
          ignoreNulls = true).over(wFwd))
    }
    val wLag = Window.partitionBy(col("u")).orderBy(col("ts"), col("id"))
    val runEnc = withNext
      // rn: the row's position in its user's alphabet-filtered order —
      // carried inside every run-end struct so MEASURES (match_len,
      // the MATCH_RECOGNIZE COUNT(B.*) analog) are rn arithmetic, no
      // extra pass. Same window family as the carries.
      .withColumn("rn", row_number().over(wLag).cast("long"))
      .withColumn("__new", when(lag(col("t"), 1).over(wLag)
        === col("t"), 0L).otherwise(1L))
      .withColumn("__run", sum(col("__new")).over(wOrd))
    val wRun = Window.partitionBy(col("u"), col("__run"))
    // one extra membership run encoding per distinct multi-type set:
    // a (A|B)+ run is contiguous IN-SET events, not same-type events
    val setEnc = multiSets.zipWithIndex.foldLeft(
      runEnc.withColumn("rl",
        max(struct(col("ts"), col("id"), col("rn"))).over(wRun))) {
      case (d, (set, i)) =>
        val inS = col("t").isin(set: _*)
        d.withColumn(s"__snew$i",
            when(lag(inS, 1).over(wLag) === inS, 0L).otherwise(1L))
          .withColumn(s"__srun$i", sum(col(s"__snew$i")).over(wOrd))
          .withColumn(s"rls$i",
            max(struct(col("ts"), col("id"), col("rn"))).over(
              Window.partitionBy(col("u"), col(s"__srun$i"))))
          .drop(s"__snew$i", s"__srun$i")
    }
    val carried = setEnc
      .drop("__new", "__run")
      .localCheckpoint(true) // staged once; every transition joins it

    // fetch the row named by `idc` (same user) and expose it as `pfx`
    def hop(cur: DataFrame, idc: Column, pfx: String): DataFrame = {
      val c = carried.columns.foldLeft(carried)(
        (d, n) => d.withColumnRenamed(n, s"${pfx}_$n"))
      cur.join(c, cur("au") === col(s"${pfx}_u") && idc === col(s"${pfx}_id"))
    }

    // expand optional steps into concrete variants, greedy-first:
    // MATCH_RECOGNIZE greedy backtracking decides the EARLIEST
    // optional step first and prefers include over skip, so the
    // earliest optional step must be the MOST significant priority
    // bit — a variant that includes it outranks every variant that
    // skips it, regardless of later steps. (The raw skip mask gets
    // this backwards for 2+ optionals: `A B? C?` on `A C B` must
    // backtrack C?, not B?, and end at B.)
    val optIdx = steps.zipWithIndex.collect {
      case ((_, q), i) if q == "opt" || q == "star" => i }
    val variants: Seq[(Seq[(Int, Seq[String], Boolean)], Int)] =
      (0 until (1 << optIdx.size)).map { mask =>
        val skipped = optIdx.zipWithIndex.collect {
          case (si, bit) if (mask & (1 << bit)) != 0 => si }.toSet
        val concrete = steps.zipWithIndex.collect {
          case ((t, q), i) if !skipped(i) =>
            (i, t, q == "plus" || q == "star")
        }
        val prio = optIdx.indices
          .filter(bit => (mask & (1 << bit)) != 0)
          .map(bit => 1 << (optIdx.size - 1 - bit)).sum
        (concrete, prio) // prio 0 (nothing skipped) = greediest
      }.filter(_._1.size >= 2)
    variants.foreach { case (c, _) =>
      c.sliding(2).foreach { case Seq((_, s1, _), (_, s2, _)) =>
        require(s1.toSet.intersect(s2.toSet).isEmpty,
          s"adjacent steps share types (${s1.toSet.intersect(s2.toSet)}) " +
            "— use a quantifier instead")
      case _ => }
    }
    def transGuards(c: Seq[(Int, Seq[String], Boolean)], j: Int): Seq[String] = {
      // original transitions spanned between concrete steps j and j+1
      val span = (c(j)._1 + 1) to c(j + 1)._1
      val explicit = span.flatMap(k => guards.getOrElse(k, Nil))
      val auto = if (contiguous) alphabet.filterNot(c(j + 1)._2.contains)
                 else Nil
      (explicit ++ auto).distinct
    }
    // next event whose type is IN the set: least over member carries
    // ((ts, id) struct order; `least` skips nulls)
    def nxOf(cc: String => Column, set: Seq[String]): Column =
      if (set.size == 1) cc(s"nx_${set.head}")
      else least(set.map(t => cc(s"nx_$t")): _*)

    val perVariant: Seq[DataFrame] = variants.map { case (c, prio) =>
      val (_, s1, plus1) = c.head
      val rl1 = runEndName(s1)
      var cur = carried.filter(col("t").isin(s1: _*))
        .withColumnRenamed("u", "au")
        .withColumn("a_id", col("id")).withColumn("a_ts", col("ts"))
      var pfx = "" // "" = anchor row's own columns
      def cc(n: String): Column = if (pfx.isEmpty) col(n) else col(s"${pfx}_$n")
      // MEASURES: events mapped to the match — 1 per `one` step, run
      // length (rn arithmetic over the carried structs) per `plus`
      var lenCol: Column = lit(1L)
      if (plus1) { // greedy: consume to the anchor row's in-set run end
        cur = hop(cur, col(s"$rl1.id"), "p1"); pfx = "p1"
        lenCol = col("p1_rn") - col("rn") + lit(1L)
      }
      for (j <- 1 until c.size) {
        val (_, sj, plusJ) = c(j)
        val rlJ = runEndName(sj)
        val m = nxOf(cc, sj)
        val guarded = transGuards(c, j - 1).foldLeft(m.isNotNull) { (acc, g) =>
          acc && (cc(s"nx_$g").isNull ||
            cc(s"nx_$g").getField("ts") >= m.getField("ts"))
        }
        cur = cur.filter(guarded).withColumn(s"m$j", m)
        val last = j == c.size - 1
        if (last && !plusJ) {
          cur = cur.withColumn("end_ts", col(s"m$j.ts"))
            .withColumn("end_id", col(s"m$j.id"))
          lenCol = lenCol + lit(1L)
        } else {
          cur = hop(cur, col(s"m$j.id"), s"p${j + 1}"); pfx = s"p${j + 1}"
          if (plusJ) {
            if (last) {
              cur = cur.withColumn("end_ts", cc(s"$rlJ.ts"))
                .withColumn("end_id", cc(s"$rlJ.id"))
              lenCol = lenCol + (cc(s"$rlJ.rn") - cc("rn") + lit(1L))
            } else {
              val firstRn = cc("rn")
              cur = hop(cur, cc(s"$rlJ.id"), s"r${j + 1}"); pfx = s"r${j + 1}"
              lenCol = lenCol + (cc("rn") - firstRn + lit(1L))
            }
          } else if (last) {
            cur = cur.withColumn("end_ts", cc("ts"))
              .withColumn("end_id", cc("id"))
            lenCol = lenCol + lit(1L)
          } else {
            lenCol = lenCol + lit(1L)
          }
        }
      }
      val base0 = cur
        .filter(col("end_ts") - col("a_ts") <= withinSec * 1000000L)
        .select(col("au").as(userCol), col("a_id"),
          col("end_id").as("b_id"),
          expr("(end_ts - a_ts) div 1000000").as("gap_sec"),
          lenCol.as("match_len"),
          lit(prio).as("__prio"))
      if (withLen) base0 else base0.drop("match_len")
    }
    val all = perVariant.reduce(_.unionByName(_))
    if (variants.size == 1) all.drop("__prio")
    else {
      val wA = Window.partitionBy(col(userCol), col("a_id"))
        .orderBy(col("__prio"))
      all.withColumn("__rn", row_number().over(wA))
        .filter(col("__rn") === 1).drop("__rn", "__prio")
    }
  }

  /** SINGLE-KEY [[matchStepsAlt]] (r15) — the same set-step semantics
    * as a plain in-memory fold over ONE key's events, for contexts
    * where the data is already per-key resident: the streaming CEP
    * processor ([[graft.streaming.Stateful.streamingSteps]]) re-derives
    * matches from its per-user state history with this, so the drained
    * stream converges to exactly the distributed batch answer.
    * Variant enumeration is genuine MATCH_RECOGNIZE greedy
    * backtracking (include before skip, earliest optional step
    * decided first) — the order the distributed operator's priority
    * bits encode; equivalence is differential-pinned per user in
    * R15CepSpec. Returns (anchor_id, end_id, gap_sec) per matched
    * anchor event. */
  def matchStepsLocal(evs: Seq[(String, Long, Long)],
                      steps: Seq[(Seq[String], String)],
                      guards: Map[Int, Seq[String]] = Map.empty,
                      withinUs: Long = Long.MaxValue / 2,
                      contiguous: Boolean = false): Seq[(Long, Long, Long)] = {
    val alphabet = (steps.flatMap(_._1) ++ guards.values.flatten).distinct.sorted
    val seq = evs.filter(e => alphabet.contains(e._1))
      .sortBy(e => (e._2, e._3)).toVector
    def expand(i: Int): Seq[Seq[(Int, Set[String], Boolean)]] =
      if (i == steps.size) Seq(Vector.empty)
      else {
        val (s, q) = steps(i)
        val incl = expand(i + 1)
          .map(rest => (i, s.toSet, q == "plus" || q == "star") +: rest)
        if (q == "opt" || q == "star") incl ++ expand(i + 1) else incl
      }
    val variants = expand(0).filter(_.size >= 2)
    def transGuards(c: Seq[(Int, Set[String], Boolean)], j: Int): Seq[String] = {
      val span = (c(j)._1 + 1) to c(j + 1)._1
      val explicit = span.flatMap(k => guards.getOrElse(k, Nil))
      val auto = if (contiguous) alphabet.filterNot(c(j + 1)._2.contains) else Nil
      (explicit ++ auto).distinct
    }
    val out = Seq.newBuilder[(Long, Long, Long)]
    for (anchorIdx <- seq.indices) {
      val anchor = seq(anchorIdx)
      var matched = false
      for (c <- variants if !matched) {
        if (c.head._2.contains(anchor._1)) {
          def runEnd(i: Int, set: Set[String]): Int = {
            var j = i
            while (j + 1 < seq.size && set.contains(seq(j + 1)._1)) j += 1
            j
          }
          var pos = if (c.head._3) runEnd(anchorIdx, c.head._2) else anchorIdx
          var ok = true
          for (j <- 1 until c.size if ok) {
            val (_, sj, plusJ) = c(j)
            (pos + 1 until seq.size).find(i => sj.contains(seq(i)._1)) match {
              case None => ok = false
              case Some(mi) =>
                val guardsOk = transGuards(c, j - 1).forall { g =>
                  (pos + 1 until seq.size).find(seq(_)._1 == g) match {
                    case Some(gi) => seq(gi)._2 >= seq(mi)._2
                    case None => true
                  }
                }
                if (!guardsOk) ok = false
                else pos = if (plusJ) runEnd(mi, sj) else mi
            }
          }
          if (ok && seq(pos)._2 - anchor._2 <= withinUs) {
            out += ((anchor._3, seq(pos)._3,
              (seq(pos)._2 - anchor._2) / 1000000L))
            matched = true
          }
        }
      }
    }
    out.result()
  }

  /** LINEAR GAP INTERPOLATION over the daily grid — pandas
    * `interpolate(method="linear")` at warehouse scale: per group,
    * silent days between two observed days get the straight-line
    * value, computed EXACTLY in integer cents — v = prev + (next −
    * prev)·(day − prev_day) div (next_day − prev_day), truncating
    * division identical in both engines — while leading/trailing gaps
    * stay NULL (there is nothing to anchor them to; zero-filling
    * would invent data). The neighbor carries are two
    * `last/first(_, ignoreNulls)` window passes; prev value and prev
    * day may travel as separate carries because they are null on
    * exactly the same rows. Daily totals are exact decimal cent
    * sums. */
  def interpolateDaily(ev: DataFrame,
                       groupCol: String = "event_type",
                       tsCol: String = "ts",
                       valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev
      .select(col(groupCol).as("g"),
        datediff(to_date(col(tsCol)), lit("2020-01-01")).cast("long")
          .as("day"),
        col(valueCol))
      .groupBy(col("g"), col("day"))
      .agg(sum(col(valueCol).cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"))
    val spine = daily.groupBy(col("g"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("g"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val filled = spine.join(daily, Seq("g", "day"), "left")
    val wBack = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wFwd = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(1, Window.unboundedFollowing)
    filled
      .withColumn("pc", last(col("c"), ignoreNulls = true).over(wBack))
      .withColumn("pd", last(when(col("c").isNotNull, col("day")),
        ignoreNulls = true).over(wBack))
      .withColumn("nc", first(col("c"), ignoreNulls = true).over(wFwd))
      .withColumn("nd", first(when(col("c").isNotNull, col("day")),
        ignoreNulls = true).over(wFwd))
      .withColumn("ic", when(col("c").isNotNull, col("c"))
        .otherwise(expr("pc + ((nc - pc) * (day - pd)) div (nd - pd)")))
      .select(col("g").as(groupCol), col("day"),
        col("c").isNotNull.as("observed"),
        (col("ic").cast("double") / lit(100.0)).as(valueCol))
  }

  /** EXPONENTIALLY WEIGHTED MOVING AVERAGE over the gapless daily
    * grid — the smoothing every monitoring/trend pipeline wants after
    * [[resampleDaily]], computed EXACTLY: the classic recursion
    * s_t = s_{t−1} + (x_t − s_{t−1})/α⁻¹ runs in FIXED-POINT 1e6
    * integers with truncating division (Spark `div` ≡ DuckDB `//` on
    * the same operands, negatives included — both truncate toward
    * zero), so the sequential fold is bit-identical to a recursive-CTE
    * oracle under any partitioning. Per group the fold runs over a
    * ≤history-days array (the same bounded-fold stance as
    * [[kaplanMeier]]); the daily aggregation and gap-filled spine
    * stay fully distributed.
    *
    * @param alphaDen α as 1/alphaDen (e.g. 8 → α = 0.125) */
  def ewmaDaily(ev: DataFrame, alphaDen: Int,
                groupCol: String = "event_type",
                tsCol: String = "ts"): DataFrame = {
    require(alphaDen >= 1, s"ewmaDaily: alphaDen must be >= 1, got $alphaDen")
    val grid = resampleDaily(ev, groupCol, tsCol)
      .select(col(groupCol).as("g"), col("day"), col("n"))
    grid.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("rows"))
      .select(col("g").as(groupCol), expr(
        s"""inline(aggregate(rows,
           |  struct(CAST(-1 AS BIGINT) AS s,
           |         CAST(array() AS
           |           ARRAY<STRUCT<day: BIGINT, n: BIGINT,
           |                        s: BIGINT>>) AS out),
           |  (acc, x) -> struct(
           |    CASE WHEN acc.s < 0 THEN x.n * 1000000
           |         ELSE acc.s + (x.n * 1000000 - acc.s) div $alphaDen END,
           |    array_append(acc.out, named_struct(
           |      'day', x.day, 'n', x.n,
           |      's', CASE WHEN acc.s < 0 THEN x.n * 1000000
           |                ELSE acc.s + (x.n * 1000000 - acc.s)
           |                     div $alphaDen END))),
           |  acc -> acc.out))""".stripMargin))
      .select(col(groupCol), col("day"), col("n"),
        (col("s").cast("double") / lit(1e6)).as("ewma"))
  }

  /** AUTOCORRELATION FUNCTION over the gapless daily grid (r14) —
    * the seasonality detector every time-series pipeline runs before
    * choosing windows: r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² for
    * lags 1..maxLag. Computed EXACTLY: with S = Σx and n = #days,
    * dev_t = n·x_t − S is integral, N_k = Σ dev_t·dev_{t+k} and
    * D = Σ dev_t² accumulate in DECIMAL(38,0) (order-independent,
    * overflow-proof to 10³⁸ — the OLS/Gram convention), and the ONLY
    * IEEE operation is the final N_k/D double division, mirrored
    * token-for-token in the oracle. One window pass materializes the
    * maxLag leads; everything else is a per-group aggregate — a
    * single shuffle on the group key over a days-bounded grid. */
  def acfDaily(ev: DataFrame, maxLag: Int,
               groupCol: String = "event_type",
               tsCol: String = "ts"): DataFrame = {
    require(maxLag >= 1, s"acfDaily: maxLag must be >= 1, got $maxLag")
    import org.apache.spark.sql.expressions.Window
    val grid = resampleDaily(ev, groupCol, tsCol)
      .select(col(groupCol).as("g"), col("day"), col("n").as("x"))
    val w = Window.partitionBy(col("g")).orderBy(col("day"))
    val led = (1 to maxLag).foldLeft(grid)((d, k) =>
      d.withColumn(s"x$k", lead(col("x"), k).over(w)))
    val stats = led.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"), sum(col("x")).as("s"))
    def dev(c: Column): Column =
      (c * col("cnt") - col("s")).cast("decimal(19,0)")
    val base = led.join(broadcast(stats), "g")
    val aggs = sum(dev(col("x")) * dev(col("x"))).as("d0") +:
      (1 to maxLag).map(k =>
        sum(dev(col("x")) * dev(col(s"x$k"))).as(s"n$k"))
    val perGroup = base.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
    val stacked = (1 to maxLag).map(k =>
      perGroup.select(col("g").as(groupCol), lit(k.toLong).as("lag"),
        (col(s"n$k").cast("double") / col("d0").cast("double")).as("acf")))
    stacked.reduce(_.unionByName(_))
  }

  /** HOLT LINEAR TREND (double exponential smoothing, r14) — the
    * level+trend forecaster one step up from [[ewmaDaily]]'s flat
    * level: l_t = l_{t−1} + b_{t−1} + (x_t − (l_{t−1}+b_{t−1}))/α⁻¹,
    * b_t = b_{t−1} + ((l_t − l_{t−1}) − b_{t−1})/β⁻¹, seeded
    * l_1 = x_1, b_1 = 0. (With δ = (x_t − (l+b))/α⁻¹ the trend
    * update collapses EXACTLY to b + δ/β⁻¹ — the form the fold and
    * the oracle both use, so the two integer divisions match.) The recursion runs in FIXED-POINT 1e6
    * integers with truncating division (identical in Spark `div` and
    * DuckDB `//`), per group over the ≤history-days array — the
    * [[ewmaDaily]] bounded-fold stance — so the sequential fold is
    * bit-identical to the recursive-CTE oracle under any
    * partitioning. Emits level, trend, and the one-step-ahead
    * forecast l+b per day. */
  def holtDaily(ev: DataFrame, alphaDen: Int, betaDen: Int,
                groupCol: String = "event_type",
                tsCol: String = "ts"): DataFrame = {
    require(alphaDen >= 1 && betaDen >= 1,
      s"holtDaily: denominators must be >= 1, got $alphaDen/$betaDen")
    val grid = resampleDaily(ev, groupCol, tsCol)
      .select(col(groupCol).as("g"), col("day"), col("n"))
    grid.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("rows"))
      .select(col("g").as(groupCol), expr(
        s"""inline(aggregate(rows,
           |  struct(CAST(-1 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
           |         CAST(array() AS
           |           ARRAY<STRUCT<day: BIGINT, n: BIGINT,
           |                        l: BIGINT, b: BIGINT>>) AS out),
           |  (acc, x) -> CASE WHEN acc.l < 0 THEN
           |    named_struct('l', x.n * 1000000, 'b', CAST(0 AS BIGINT),
           |      'out', array_append(acc.out, named_struct(
           |        'day', x.day, 'n', x.n,
           |        'l', x.n * 1000000, 'b', CAST(0 AS BIGINT))))
           |  ELSE
           |    named_struct(
           |      'l', acc.l + acc.b +
           |           (x.n * 1000000 - (acc.l + acc.b)) div $alphaDen,
           |      'b', acc.b +
           |           ((x.n * 1000000 - (acc.l + acc.b)) div $alphaDen)
           |             div $betaDen,
           |      'out', array_append(acc.out, named_struct(
           |        'day', x.day, 'n', x.n,
           |        'l', acc.l + acc.b +
           |             (x.n * 1000000 - (acc.l + acc.b)) div $alphaDen,
           |        'b', acc.b +
           |             ((x.n * 1000000 - (acc.l + acc.b)) div $alphaDen)
           |               div $betaDen)))
           |  END,
           |  acc -> acc.out))""".stripMargin))
      .select(col(groupCol), col("day"), col("n"),
        (col("l").cast("double") / lit(1e6)).as("level"),
        (col("b").cast("double") / lit(1e6)).as("trend"),
        ((col("l") + col("b")).cast("double") / lit(1e6)).as("forecast"))
  }

  /** WEEKLY SEASONAL DECOMPOSITION (r14) — the classical
    * trend/seasonal/remainder additive split (STL's moving-average
    * ancestor) over the gapless daily grid, kept engine-exact:
    *  - trend_t = centered 7-day mean, defined only where the full
    *    window exists (edge days stay NULL, as in classical
    *    decomposition); the integer 7-day sum divides by 7.0 in ONE
    *    IEEE operation;
    *  - the seasonal index per weekday averages the INTEGER
    *    detrended deviation 7·x_t − sum7_t over full-window days —
    *    integers all the way to one final division by 7·count;
    *  - remainder_t = x − trend − seasonal, two IEEE subtractions in
    *    a fixed order, mirrored token-for-token in the oracle.
    * Shapes: one grid window pass + a 7·|groups|-row weekday index
    * broadcast back — the [[resampleDaily]] cost plus a bounded
    * dimension join. */
  def seasonalDecomposeWeekly(ev: DataFrame,
                              groupCol: String = "event_type",
                              tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = resampleDaily(ev, groupCol, tsCol)
      .select(col(groupCol).as("g"), col("day"), col("n").as("x"))
    val w7 = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val t = grid
      .withColumn("sum7", sum(col("x")).over(w7))
      .withColumn("cnt7", count(lit(1)).over(w7))
      .withColumn("dow", pmod(col("day"), lit(7)))
    val idx = t.filter(col("cnt7") === 7)
      .groupBy(col("g"), col("dow"))
      .agg(sum(col("x") * 7 - col("sum7")).as("snum"),
        count(lit(1)).as("scnt"))
    t.join(broadcast(idx), Seq("g", "dow"), "left")
      .withColumn("trend",
        when(col("cnt7") === 7, col("sum7").cast("double") / lit(7.0)))
      .withColumn("seasonal",
        col("snum").cast("double") / (col("scnt") * 7L).cast("double"))
      .select(col("g").as(groupCol), col("day"), col("x").as("n"),
        col("trend"), col("seasonal"),
        (col("x").cast("double") - col("trend") - col("seasonal"))
          .as("remainder"))
  }

  /** PURGED WALK-FORWARD SPLIT (r14) — temporal cross-validation the
    * way leakage-safe ML pipelines do it: the event-time range cuts
    * into `folds` equal spans; fold k (1-based, k ≥ 1 so training is
    * never empty) tests on span k and trains on everything ending at
    * least `embargoSec` BEFORE the test span opens — the embargo
    * purges boundary leakage (features aggregated near the cut would
    * otherwise peek across it). Pure projection against a one-row
    * (min, max) broadcast: every row gets a (fold, role ∈
    * train|test|excluded) pair per fold — deterministic, shuffle-free
    * until the caller aggregates. */
  def walkForwardSplit(ev: DataFrame, folds: Int, embargoSec: Long,
                       tsCol: String = "ts_us"): DataFrame = {
    require(folds >= 2, s"walkForwardSplit: folds must be >= 2, got $folds")
    require(embargoSec >= 0, "embargo must be non-negative")
    val stats = ev.agg(min(col(tsCol)).as("lo"), max(col(tsCol)).as("hi"))
    ev.crossJoin(broadcast(stats))
      .withColumn("span", expr(s"((hi - lo) div $folds) + 1L"))
      .withColumn("fold", explode(sequence(lit(1), lit(folds - 1))))
      .withColumn("test_lo", col("lo") + col("fold") * col("span"))
      .withColumn("test_hi", col("test_lo") + col("span"))
      .withColumn("role",
        when(col(tsCol) >= col("test_lo") && col(tsCol) < col("test_hi"),
          "test")
          .when(col(tsCol) < col("test_lo") - lit(embargoSec * 1000000L),
            "train")
          .otherwise("excluded"))
      .drop("lo", "hi", "span", "test_lo", "test_hi")
  }

  /** SCD TYPE-2 HISTORY BUILD (the warehouse dimension-versioning
    * op): collapse an entity's observation stream into contiguous
    * state intervals — one row per RUN of equal `stateCol` values,
    * with `effective_from` (first observation of the run),
    * `effective_to` (start of the next run, NULL while current),
    * `version` (1-based per entity) and `is_current`.
    *
    * Plan shape: two windows and one groupBy, all partitioned on the
    * entity key — at 100 TB each entity's history sorts inside its
    * own hash partition and no per-entity array is ever built. Run
    * detection is the lag-compare + running-sum idiom (a "gaps and
    * islands" group id); `tieCol` must totally order observations
    * within an entity (same-timestamp ties would otherwise make run
    * boundaries engine-dependent). */
  def scd2History(obs: DataFrame, entityCol: String, stateCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byEntity = Window.partitionBy(entityCol)
      .orderBy(col(tsCol), col(tieCol))
    val runs = obs
      .select(Seq(entityCol, stateCol, tsCol, tieCol).distinct.map(col): _*)
      .withColumn("chg",
        when(lag(col(stateCol), 1).over(byEntity).isNull ||
          lag(col(stateCol), 1).over(byEntity) =!= col(stateCol), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byEntity.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val collapsed = runs
      .groupBy(col(entityCol), col("run_id"), col(stateCol))
      .agg(min(col(tsCol)).as("effective_from"))
    val byRun = Window.partitionBy(entityCol).orderBy("run_id")
    collapsed
      .withColumn("effective_to", lead(col("effective_from"), 1).over(byRun))
      .select(col(entityCol), col(stateCol),
        col("effective_from"), col("effective_to"),
        col("run_id").as("version"),
        col("effective_to").isNull.as("is_current"))
  }

  /** CUSUM CHANGE-POINT DETECTION (r15) — the sequential drift
    * detector a monitoring pipeline runs where [[Stats.rateAnomaly]]'s
    * window z-score misses SLOW shifts: one-sided cumulative sums
    * s⁺_t = max(0, s⁺_{t−1} + (x_t − μ − slack)) and
    * s⁻_t = max(0, s⁻_{t−1} + (μ − x_t − slack)) over the gapless
    * daily grid, alarming when either exceeds h = alarmMult·slack.
    * μ is the series' own integer mean, slack = μ div slackDen —
    * Page's classic parameterization with every quantity in exact
    * 1e6 fixed-point (truncating div, identical in Spark `div` and
    * DuckDB `//`), so the fold is bit-identical to the
    * recursive-CTE oracle under any partitioning.
    *
    * Scale shape: the [[holtDaily]] stance — a sequential recursion
    * folds per group over the ≤history-days daily array (bounded by
    * the calendar, not the corpus); groups parallelize. */
  def cusumDaily(ev: DataFrame, slackDen: Int = 20, alarmMult: Int = 5,
                 groupCol: String = "event_type",
                 tsCol: String = "ts"): DataFrame =
    cusumFromDaily(
      ev.select(col(groupCol).as("g"),
          datediff(to_date(col(tsCol)), lit("2020-01-01")).cast("long")
            .as("day"))
        .groupBy(col("g"), col("day"))
        .agg(count(lit(1)).as("n")),
      slackDen, alarmMult)
      .withColumnRenamed("g", groupCol)

  /** [[cusumDaily]] over PRE-COUNTED (g, day, n) fragments — the
    * incremental face (r15): per-day counts are additive, so
    * streaming batches / lake commits contribute fragments
    * independently (the q149/q286 sketch-commit idiom) and this
    * read-side merge reproduces the batch detector BIT-EXACTLY:
    * duplicate (g, day) rows sum first, the gapless spine is rebuilt
    * from the merged min/max day, and the fold proceeds identically.
    * `cusumDaily` itself delegates here, so the paths cannot
    * drift. */
  def cusumFromDaily(dailyFrags: DataFrame, slackDen: Int = 20,
                     alarmMult: Int = 5): DataFrame = {
    require(slackDen >= 1 && alarmMult >= 1,
      s"cusumFromDaily: slackDen >= 1 and alarmMult >= 1, " +
        s"got $slackDen/$alarmMult")
    val daily = dailyFrags.groupBy(col("g"), col("day"))
      .agg(sum(col("n")).cast("long").as("n"))
    val spine = daily.groupBy(col("g"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("g"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("g", "day"), "left")
      .select(col("g"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val mu = grid.groupBy(col("g"))
      .agg(sum(col("n")).as("sn_"), count(lit(1)).as("cnt_"))
      .withColumn("mu", expr("(sn_ * 1000000) div cnt_"))
      .withColumn("slack", expr(s"mu div $slackDen"))
      .withColumn("h", col("slack") * lit(alarmMult.toLong))
      .drop("sn_", "cnt_")
    grid.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("rows"))
      .join(broadcast(mu), "g")
      .select(col("g"), col("mu"), col("slack"), col("h"),
        expr(
          """inline(aggregate(rows,
            |  struct(CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
            |         CAST(array() AS
            |           ARRAY<STRUCT<day: BIGINT, n: BIGINT,
            |                        sp: BIGINT, sn: BIGINT>>) AS out),
            |  (acc, x) -> named_struct(
            |    'sp', greatest(CAST(0 AS BIGINT),
            |            acc.sp + (x.n * 1000000 - mu - slack)),
            |    'sn', greatest(CAST(0 AS BIGINT),
            |            acc.sn + (mu - x.n * 1000000 - slack)),
            |    'out', array_append(acc.out, named_struct(
            |      'day', x.day, 'n', x.n,
            |      'sp', greatest(CAST(0 AS BIGINT),
            |              acc.sp + (x.n * 1000000 - mu - slack)),
            |      'sn', greatest(CAST(0 AS BIGINT),
            |              acc.sn + (mu - x.n * 1000000 - slack))))),
            |  acc -> acc.out))""".stripMargin))
      .select(col("g"), col("day"), col("n"),
        col("sp"), col("sn"),
        (col("sp") > col("h") || col("sn") > col("h")).as("alarm"))
  }

  /** ITEM-ITEM CO-OCCURRENCE COSINE (r15) — the classic
    * collaborative-filtering similarity matrix ("users who touched i
    * also touched j"): cos(i,j) = |U_i ∩ U_j| / √(|U_i|·|U_j|) over
    * distinct (user, item) interactions.
    *
    * The pair generator is the textbook user-keyed equi self-join —
    * pair space Σ_u d_u², bounded by capping each user's item list
    * at `maxItemsPerUser` (kept deterministically: the
    * lexicographically-first items; the production norm — a user
    * touching everything contributes similarity signal to nothing).
    * All counts are exact integers; the cosine is one IEEE chain
    * (co / √(nᵢ·nⱼ), sqrt is correctly rounded by IEEE so the result
    * is engine-exact). Per-item degrees ride a broadcast (item
    * vocabulary-sized). Pairs under `minCo` co-occurrences are
    * dropped before the degree join — the noise floor AND the output
    * bound. */
  def itemCosine(df: DataFrame, userCol: String, itemCol: String,
                 minCo: Long = 2, maxItemsPerUser: Int = 1000): DataFrame = {
    require(minCo >= 1 && maxItemsPerUser >= 2,
      s"itemCosine: minCo >= 1, maxItemsPerUser >= 2, " +
        s"got $minCo/$maxItemsPerUser")
    val ui0 = df.select(col(userCol).as("u"), col(itemCol).as("i")).distinct()
    val byU = Window.partitionBy(col("u")).orderBy(col("i"))
    val ui = ui0.withColumn("__r", row_number().over(byU))
      .filter(col("__r") <= maxItemsPerUser).drop("__r")
    val deg = ui.groupBy(col("i")).agg(count(lit(1)).as("n"))
    val co = ui.as("a")
      .join(ui.as("b"),
        col("a.u") === col("b.u") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    co.join(broadcast(deg.select(col("i"), col("n").as("ni"))), Seq("i"))
      .join(broadcast(deg.select(col("i").as("j"), col("n").as("nj"))),
        Seq("j"))
      .select(col("i"), col("j"), col("co"), col("ni"), col("nj"),
        (col("co").cast("double") /
          sqrt(col("ni").cast("double") * col("nj").cast("double")))
          .as("cosine"))
  }

  /** JOURNEY CONFORMANCE (r15) — how far each user's early behavior
    * strays from a canonical onboarding/funnel path: the user's first
    * `prefixLen` events (by time, tie-total) become a type-initial
    * string, scored by edit distance against the `canonical` journey
    * — the sequence-level generalization of step funnels (a funnel
    * asks "did A→B→C happen"; this asks "HOW UNLIKE the expected
    * script was the session", tolerating insertions/swaps the way
    * fuzzy name matching tolerates typos).
    *
    * Scale shape: the prefix cut is a user-partitioned
    * `WindowGroupLimit`-prunable rank (state per user bounded at
    * prefixLen); journey assembly is one groupBy with an array_sort
    * over ≤ prefixLen structs (deterministic order without an
    * ordered-aggregation window); the DP cost is prefixLen² per USER,
    * linear in users. Returns every user scored — (user, journey,
    * dist, conforming). */
  def journeyConformance(ev: DataFrame, canonical: String,
                         prefixLen: Int = 12, maxDist: Long = 6,
                         userCol: String = "user_id",
                         typeCol: String = "event_type",
                         tsCol: String = "ts",
                         tieCol: String = "event_id"): DataFrame = {
    require(canonical.nonEmpty, "journeyConformance: canonical is empty")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__ts"), col("__id"))
    ev.select(col(userCol), substring(col(typeCol), 1, 1).as("__c"),
        col(tsCol).as("__ts"), col(tieCol).as("__id"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= prefixLen)
      .groupBy(col(userCol))
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(__ts, __id, __c)))," +
          " s -> s.__c)"), "").as("journey"))
      .withColumn("dist",
        levenshtein(col("journey"), lit(canonical)).cast("long"))
      .withColumn("conforming", col("dist") <= maxDist)
  }

  /** FIRST-OCCURRENCE SEQUENCE SUPPORT (r17) — the PrefixSpan-style
    * 2-step readout: for every ordered event-type pair (a, b), how
    * many users saw BOTH, and in how many did a's FIRST occurrence
    * precede b's (exact (ts, id) lexicographic order, so ties are
    * deterministic). Each user folds to one row per type it has
    * (alphabet-bounded — the per-user relation is |types|-sized, so
    * the type-pair self-join fans out by a CONSTANT, never events²);
    * the share is one mirrored division. */
  def sequenceSupport(ev: DataFrame, userCol: String = "user_id",
                      typeCol: String = "event_type",
                      tsCol: String = "ts_us",
                      tieCol: String = "event_id"): DataFrame = {
    val firsts = ev.groupBy(col(userCol), col(typeCol))
      .agg(min(struct(col(tsCol).as("ts"), col(tieCol).as("id")))
        .as("__first"))
    val a = firsts.select(col(userCol), col(typeCol).as("type_a"),
      col("__first").as("__fa"))
    val b = firsts.select(col(userCol), col(typeCol).as("type_b"),
      col("__first").as("__fb"))
    a.join(b, Seq(userCol))
      .filter(col("type_a") =!= col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users_both"),
        sum(when(col("__fa") < col("__fb"), 1L).otherwise(0L))
          .cast("long").as("n_a_first"))
      .withColumn("support_share",
        col("n_a_first").cast("double") / col("n_users_both").cast("double"))
  }

  /** DAY-OVER-DAY ACTIVE-SET JACCARD (r18) — how stable is the active
    * population across consecutive days: |A_d ∩ A_{d+1}| /
    * |A_d ∪ A_{d+1}| over the distinct per-day active-entity sets, the
    * set-overlap drift number a feed-health dashboard tracks (a sudden
    * dip means the population churned, whatever the volume did). One
    * distinct (day, entity) relation; the intersection is ONE
    * self-equi-join on (entity, day+1) — never a pair space — and the
    * consecutive-day spine comes from the day-size relation joined to
    * itself on day+1, so pairs of days sharing NO entity still emit
    * (inter = 0, the q365/q372 zero-cell rule). Exact integers, one
    * mirrored division. Input: a pre-quantized day column + an entity
    * column. */
  def activeSetJaccard(df: DataFrame, dayC: Column, entityC: Column): DataFrame = {
    val du = df.select(dayC.cast("long").as("d"), entityC.as("u")).distinct()
    val sz = du.groupBy(col("d")).agg(count(lit(1)).as("n"))
    val inter = du.alias("a")
      .join(du.alias("b"),
        col("a.u") === col("b.u") && col("b.d") === col("a.d") + lit(1L))
      .groupBy(col("a.d").as("day_a"))
      .agg(count(lit(1)).as("inter"))
    sz.select(col("d").as("day_a"), col("n").as("na"))
      .join(sz.select((col("d") - lit(1L)).as("day_a"), col("n").as("nb")),
        "day_a")
      .join(inter, Seq("day_a"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .select(col("day_a"), (col("day_a") + lit(1L)).as("day_b"),
        col("na"), col("nb"), col("inter"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
          .as("jaccard"))
  }

}
