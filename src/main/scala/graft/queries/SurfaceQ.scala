package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Qx._
import graft.Tables

/** Additional engine surface beyond the reference inventory: zip join
  * (J4 explicit), order statistics, numerically-deterministic moment
  * aggregates, window frames, ntile, a JSON source round-trip, and
  * partitioned-table writes (static partition overwrite + partition
  * pruning) — the lake-maintenance operations a production pipeline
  * leans on. */
object SurfaceQ {

  val queries: Map[String, Q] = Map(
    // J4 — zip join: positional pairing of two per-row arrays
    "q67_arrays_zip" -> ((s, d) =>
      Tables.events(s, d).filter(col("event_id") < 2000)
        .select(col("event_id"),
          posexplode(arrays_zip(
            sequence(lit(1L), lit(4L)),
            array((col("event_id") % 7).cast("long"), (col("user_id") % 5).cast("long"),
              (col("event_id") % 3).cast("long"), (col("user_id") % 2).cast("long")))))
        .select(col("event_id"), (col("pos") + 1).cast("long").as("idx"),
          col("col.0").as("x"), col("col.1").as("y"))
        .withColumn("prod", col("x") * col("y"))
        .orderBy("event_id", "idx")),

    // order statistic — median over integral doubles ((a+b)/2 is exact)
    "q68_median" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(median(col("l_quantity")).as("med_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // deterministic moments: mean/stddev from exact decimal sums, the
    // final arithmetic a fixed double expression tree on both engines
    // (a plain stddev() is partial-aggregation-order dependent)
    "q69_exact_stats" -> ((s, d) => {
      val dec = DecimalType(18, 2)
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).as("s1"),
          sum(col("value").cast(dec) * col("value").cast(dec)).as("s2"))
        .select(col("event_type"), col("n"),
          (col("s1").cast("double") / col("n")).as("mean"),
          sqrt((col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("n")) /
            (col("n") - 1)).as("sd"))
        .orderBy("event_type")
    }),

    // window frame — running sum (exact cents, < 2^53 so the per-row
    // decimal->double cast is exact in both engines)
    "q70_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double")
            .as("running"))
        .orderBy("user_id", "event_id")
    }),

    // lead/lag — per-user deltas in exact cents
    "q71_lag_delta" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val v = col("value").cast(DecimalType(18, 2))
      Tables.events(s, d).filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          (v - lag(v, 1).over(w)).cast("double").as("delta"))
        .orderBy("user_id", "event_id")
    }),

    // ntile quartiles over a bounded top-k subset (a global ntile is a
    // single-reducer sort by construction — bound it first)
    "q72_ntile" -> ((s, d) => {
      val top = Tables.orders(s, d)
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(1000)
      val w = Window.orderBy(desc("o_totalprice"), asc("o_orderkey"))
      top.withColumn("tile", ntile(4).over(w).cast("long"))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("tile")
    }),

    // JSON-lines source round-trip (engine completeness; doubles
    // round-trip via shortest-repr text)
    "q73_json_scan" -> ((s, d) => {
      val tmp = Qx.tempDir("graft-json").resolve("events").toString
      Tables.events(s, d).select(col("event_id"), col("event_type"), col("value"))
        .write.mode("overwrite").json(tmp)
      s.read.schema("event_id LONG, event_type STRING, value DOUBLE").json(tmp)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("event_type")
    }),

    // events.ts daily rollup — pins the ns→µs floor conversion
    // (Tables.nsToUs) against the oracle: the formatted max(ts) hashes
    // the exact microsecond value, not just the date bucket (ADVICE r2)
    "q74_events_daily" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), col("users"), col("last_ts"))
        .orderBy("day")),

    // z-score outlier flagging (the training-data outlier-removal
    // filter): per-type mean/sd from exact decimal sums (order
    // independent), events beyond 3 sigma flagged; the moments join
    // back as a broadcast scalar-per-group
    "q104_outliers" -> ((s, d) => {
      val dec = DecimalType(18, 2)
      val moments = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).as("s1"),
          sum(col("value").cast(dec) * col("value").cast(dec)).as("s2"))
        .select(col("event_type"),
          (col("s1").cast("double") / col("n")).as("mu"),
          sqrt((col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("n")) /
            (col("n") - 1)).as("sd"))
      Tables.events(s, d)
        .join(broadcast(moments), "event_type")
        .filter(abs(col("value") - col("mu")) > lit(3.0) * col("sd"))
        .select(col("event_type"), col("event_id"), col("value"))
        .orderBy("event_type", "event_id")
    }),

    // exact interpolated quartiles (type-7): Spark's exact `percentile`
    // vs DuckDB's quantile_cont — integer-valued measures make every
    // interpolation dyadic-exact, so the doubles hash-match
    "q100_quantiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // MERGEABLE quantile sketch (VERDICT r7 missing #5, next #6): shard
    // lineitem 4 ways, build one fixed-splitter histogram sketch per
    // shard in a single corpus pass ($500 buckets over exact cents),
    // merge the shards by per-bucket addition, and extract quartile
    // upper edges from the merged sketch — the quantile pipeline q100
    // can't run across shards. The oracle replays the same integer
    // arithmetic unsharded, which IS the point: merging is lossless by
    // construction, so sharded-then-merged equals one global sketch
    // bit-for-bit (associativity property-tested in QuantileSketchSpec;
    // rank-error bound asserted there too)
    "q147_quantile_sketch" -> ((s, d) => {
      val width = 50000L // $500.00 splitters, in cents
      val li = Tables.lineitem(s, d)
        .withColumn("shard", pmod(col("l_orderkey"), lit(4)))
      val perShard = graft.operators.Quantiles.sketch(
        li, Seq("shard", "l_returnflag"), "l_extendedprice", width)
      val merged = graft.operators.Quantiles.mergeAll(perShard, Seq("shard"))
      graft.operators.Quantiles.quantileEdges(
        merged, Seq("l_returnflag"), Seq(25, 50, 75), width)
        .orderBy("l_returnflag")
    }),

    // event-time RANGE frame: per user, how many events (and how much
    // value) landed in the preceding hour — the batch analog of the
    // fraud-style sliding lookback. The frame is a range on epoch
    // micros, so it is value-based (an hour), not row-based.
    "q92_time_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_last_hour"),
          sum(col("value").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("v_last_hour"))
        .orderBy("user_id", "event_id")
    }),

    // gap-based batch sessionization (the classic clickstream op, and
    // q64's batch-side complement): a new session opens after >30 min
    // of per-user silence; ids come from lag + running sum under a
    // TOTAL (ts, event_id) order, windows partitioned per user — no
    // global window anywhere
    "q143_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val cum = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("new_sess",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L, 1L)
            .when(lag(col("ts_us"), 1).over(w).isNull, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("t_start"),
          max(col("ts_us")).as("t_end"),
          dsum(col("value")).as("total"))
        .orderBy("user_id", "session_idx")
    }),

    // partitioned table + static partition overwrite (the lake
    // compaction/backfill primitive)
    "q75_partition_overwrite" -> ((s, d) => {
      s.sql("CREATE DATABASE IF NOT EXISTS graft_lake")
      s.sql("DROP TABLE IF EXISTS graft_lake.part_events")
      val loc = Qx.tempDir("graft-part").resolve("part_events")
      s.sql("CREATE TABLE graft_lake.part_events " +
        "(event_id BIGINT, value DOUBLE, event_type STRING) " +
        s"USING parquet PARTITIONED BY (event_type) LOCATION '$loc'")
      Tables.events(s, d).select(col("event_id"), col("value"), col("event_type"))
        .write.mode("append").insertInto("graft_lake.part_events")
      // backfill one partition from the upstream source (overwriting a
      // table from itself is rejected — correctly — by the analyzer)
      Tables.events(s, d).createOrReplaceTempView("events_src")
      s.sql("""INSERT OVERWRITE TABLE graft_lake.part_events
              |PARTITION (event_type = 'click')
              |SELECT event_id, value FROM events_src
              |WHERE event_type = 'click' AND event_id < 100""".stripMargin)
      s.table("graft_lake.part_events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("event_type")
    }),

    // partitioned write + partition-pruned read (PartitionFilters in
    // the scan; only the matching directory is read)
    "q76_partition_pruning" -> ((s, d) => {
      val tmp = Qx.tempDir("graft-prune").resolve("events").toString
      Tables.events(s, d).select(col("event_id"), col("value"), col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("event_type") === "click")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(col("n"), col("total"))
    }),

    // Distributed OLS trend (r13): per-event-type slope of value vs
    // time from five exact sufficient statistics — one aggregation
    // pass with map-side partials, the shuffle carries one row per
    // type. `operators/Stats.olsTrend`.
    "q218_ols_trend" -> ((s, d) =>
      graft.operators.Stats.olsTrend(
        Tables.events(s, d), "event_type", "ts", "value")
        .orderBy("event_type")),

    // SCD Type-2 history build (r13): each user's event_type
    // observation stream collapsed to contiguous state intervals with
    // effective_from/to and a version counter — the warehouse
    // dimension-versioning op, gaps-and-islands shape, windows all
    // partitioned on the entity key. `operators/EventAnalytics.scd2History`.
    "q219_scd2" -> ((s, d) =>
      graft.operators.EventAnalytics.scd2History(
        Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts"))),
        entityCol = "user_id", stateCol = "event_type",
        tsCol = "ts_us", tieCol = "event_id")
        .orderBy("user_id", "version")),

    // Rank correlation (r13): per-event-type Spearman ρ between value
    // rank and arrival rank with deterministic tie-breaking — "do
    // later events carry higher values?" as Pearson over exact
    // integer ranks. `operators/Stats.rankCorrelation`.
    "q222_rank_corr" -> ((s, d) =>
      graft.operators.Stats.rankCorrelation(
        Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts"))),
        "event_type", col("value"), col("ts_us"), col("event_id"),
        // bucket widths sized to each rank column's domain: cents-ish
        // values bucket at 1.0; the µs timestamp at one hour, so the
        // bucket relation stays range/3.6e9 however large the corpus
        aBucketWidth = 1.0, bBucketWidth = 3.6e9)
        .orderBy("event_type")),

    // Trailing-window rate-anomaly detection (r13): per (type, day),
    // the day's event count z-scored against the prior 7 calendar
    // days (RANGE frame on the integer day index, current day
    // excluded, zero-variance windows NULL-guarded).
    // `operators/Stats.rateAnomaly`.
    "q226_rate_anomaly" -> ((s, d) =>
      graft.operators.Stats.rateAnomaly(
        Tables.events(s, d), "event_type", "ts")
        .orderBy("event_type", "day")),

    // Key-skew diagnostics (r13): Gini coefficient + heaviest-key
    // share of the user_id distribution per event_type — the "is
    // this shuffle key safe at scale" report, computed over the
    // key-count relation (one row per distinct key, not the data).
    // `operators/Stats.keySkew`.
    "q231_key_skew" -> ((s, d) =>
      graft.operators.Stats.keySkew(
        Tables.events(s, d), "event_type", "user_id")
        .orderBy("event_type")),

    // Per-group feature scaling (r13): percent-rank (quantile
    // normalization with deterministic ties), min-max, and z-score
    // for every event value against its type — exact ranks, exact
    // cent-quantized moments, NULL-guarded degenerate groups.
    // `operators/Stats.featureScale`.
    "q236_feature_scale" -> ((s, d) =>
      graft.operators.Stats.featureScale(
        Tables.events(s, d), "event_type", "value", "event_id")
        .orderBy("event_type", "tie")),

    // Point-in-time (backward as-of) join (r13): every purchase joined
    // to the user's latest click at-or-before it — the leakage-free
    // feature-store join, as one union + ordered window carry (single
    // shuffle on the key; no range join). `operators/AsOf`.
    "q238_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      val obs = ev.filter(col("event_type") === "purchase")
      val feat = ev.filter(col("event_type") === "click")
      graft.operators.AsOf.pointInTimeJoin(obs, feat, "user_id", "ts_us",
        "event_id", "event_id", Seq("value"))
        .orderBy("event_id")
    }),

    // Kaplan-Meier time-to-conversion (r13): survival curve from each
    // user's first event to their first purchase, never-converters
    // right-censored at last activity; survival exact in fixed-point
    // 1e18 integers. `operators/EventAnalytics.kaplanMeier`.
    "q239_survival_km" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.EventAnalytics.kaplanMeier(ev, "purchase")
        .orderBy("t_days")
    }),

    // Column profiler (r13): per-column nulls / exact distincts /
    // min-max for the whole events table in ONE aggregation pass.
    // `operators/Profile.profileTable`.
    "q240_profile" -> ((s, d) =>
      graft.operators.Profile.profileTable(Tables.events(s, d),
        numCols = Seq("event_id", "user_id", "value"),
        strCols = Seq("event_type", "props"))
        .orderBy("column_name")),

    // U-shaped multi-touch attribution (r13): 40/20/40 fractional
    // credit across each journey's touches, integer-ppm exact.
    // `operators/EventAnalytics.positionAttribution`.
    "q241_position_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.EventAnalytics
        .positionAttribution(ev, "purchase", tsCol = "ts_us")
        .orderBy("channel")
    }),

    // Referential-integrity check (r13): q240's cross-table sibling —
    // orphan/null-FK counts for the star schema's six FK relations,
    // one broadcastable left join + single-row fold each.
    // `operators/Profile.fkCheck`.
    "q247_fk_check" -> ((s, d) => {
      import graft.operators.Profile.FkRelation
      graft.operators.Profile.fkCheck(Seq(
        FkRelation("customer->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey"),
        FkRelation("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        FkRelation("lineitem->part", Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey"),
        FkRelation("nation->region", Tables.nation(s, d), "n_regionkey",
          Tables.region(s, d), "r_regionkey"),
        FkRelation("orders->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        FkRelation("supplier->nation", Tables.supplier(s, d), "s_nationkey",
          Tables.nation(s, d), "n_nationkey")))
        .orderBy("relation")
    }),

    // Event sequence trigrams (r13): third-order sibling of q235's
    // transition matrix — adjacent (t0,t1,t2) runs with corpus share.
    // `operators/EventAnalytics.sequenceNgrams`.
    "q242_event_trigrams" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.EventAnalytics.sequenceNgrams(ev, 3, tsCol = "ts_us")
        .orderBy("t0", "t1", "t2")
    }),

    // Pivot / cross-tab (r13): day × event_type value matrix — the
    // pandas pivot_table shape via Spark's pivot with an EXPLICIT
    // column list (no values-discovery job, deterministic columns),
    // decimal-exact sums.
    "q248_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("day",
          datediff(to_date(col("ts")), lit("2020-01-01")).cast("long"))
        .groupBy(col("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double"))
        .orderBy("day")),

    // Benford first-digit screen (r13): integer digit extraction,
    // hard-literal law probabilities, zero-filled digit spine.
    // `operators/Stats.benfordDigits`.
    "q249_benford" -> ((s, d) =>
      graft.operators.Stats.benfordDigits(Tables.events(s, d), "value")
        .orderBy("digit")),

    // Linear gap interpolation (r13): pandas interpolate at warehouse
    // scale — interior silent days get the exact integer-cent
    // straight line, edges stay NULL. Gaps are planted by filtering
    // out two of every five calendar days.
    // `operators/EventAnalytics.interpolateDaily`.
    "q250_interpolate_daily" -> ((s, d) =>
      graft.operators.EventAnalytics.interpolateDaily(
        Tables.events(s, d).filter(dayofmonth(col("ts")) % 5 =!= 2))
        .orderBy("event_type", "day")),

    // FEATURE-TABLE BUILD (r13 capstone composition): for every
    // purchase (the label event), leakage-free features computed
    // strictly from the user's PAST — trailing-7d per-type counts via
    // RANGE window frames on µs longs ([ts−7d, ts−1], so nothing
    // simultaneous or future leaks in), the last click value before
    // the label (the q237 carry), and a reproducible md5 train/val
    // split. One window pass over the user partition produces every
    // feature — the offline feature-store deliverable all the r13
    // event operators exist to feed.
    "q266_feature_table" -> ((s, d) => {
      val us7d = 7L * 86400000000L
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"), col("value"))
      val wRange = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-us7d, -1)
      val wRows = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      def cnt7(t: String) = sum(when(col("event_type") === t, 1L)
        .otherwise(0L)).over(wRange)
      ev.withColumn("n_view_7d", cnt7("view"))
        .withColumn("n_click_7d", cnt7("click"))
        .withColumn("n_error_7d", cnt7("error"))
        .withColumn("last_click_value",
          last(when(col("event_type") === "click", col("value")),
            ignoreNulls = true).over(wRows))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("n_view_7d"), col("n_click_7d"), col("n_error_7d"),
          col("last_click_value"),
          when(substring(md5(col("user_id").cast("string")), 1, 2) < "cd",
            "train").otherwise("val").as("split"))
        .orderBy("event_id")
    }),

    // Table diff (r13): exact multiset comparison — the drill-down
    // behind a checksum mismatch. B deletes every id%97==0 row and
    // duplicates every id%89==0 row, so only_a / only_b / common all
    // exercise multiset semantics (the lcm row cancels out).
    // `operators/Profile.tableDiff`.
    "q263_table_diff" -> ((s, d) => {
      val a = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("props"))
      val b = a.filter(col("event_id") % 97 =!= 0)
        .unionByName(a.filter(col("event_id") % 89 === 0))
      graft.operators.Profile.tableDiff(a, b)
    }),

    // Coherent (correlated) subsampling (r13): sample USERS by md5
    // prefix, keep ALL their events via one broadcastable semi-join —
    // the debugging subsample that preserves per-user sequences
    // (row-level sampling would shred funnels and sessions).
    "q264_coherent_sample" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val users = ev.select(col("user_id")).distinct()
        .filter(substring(md5(col("user_id").cast("string")), 1, 2) < "20")
      ev.join(users, Seq("user_id"), "left_semi")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }),

    // Interval union / coverage (r13): per user, 30-min viewing
    // windows merge into maximal islands via the two-window
    // gaps-and-islands derivation — one sort per key partition, no
    // self-joins. `operators/Intervals.coverage`.
    "q261_interval_coverage" -> ((s, d) => {
      val iv = Tables.events(s, d)
        .filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) + lit(1800000000L)).as("e"))
      graft.operators.Intervals.coverage(iv, "user_id")
        .orderBy("user_id", "island")
    }),

    // Conversion-latency order statistics (r13): first view -> first
    // purchase after it, min/p50/p90/max as EXACT rank statistics.
    // `operators/EventAnalytics.conversionLatency`.
    "q262_conversion_latency" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.EventAnalytics.conversionLatency(
        ev, "view", "purchase")
    }),

    // Spark 4 VARIANT (r13): semi-structured props parsed ONCE into
    // the binary variant encoding, then typed extraction — the
    // schema-on-read path that replaces per-query JSON string parsing
    // at scale (parse once, extract many).
    "q258_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy("event_type")),

    // Order-independent table checksum (r13): the replication/
    // migration integrity check — XOR of per-row 60-bit md5 hashes is
    // associative+commutative, so the checksum is partitioning-proof
    // with NO sort at any scale. Only integer/string columns feed the
    // hash (float formatting never crosses an engine boundary); NULLs
    // sentinel-coalesced so ('a',NULL) and ('a','') differ.
    "q259_table_checksum" -> ((s, d) => {
      def sum1(df: org.apache.spark.sql.DataFrame, name: String,
               cols: Seq[String]) = {
        val row = concat_ws("|",
          cols.map(c => coalesce(col(c).cast("string"), lit("∅"))): _*)
        df.agg(count(lit(1)).as("n_rows"),
            bit_xor(conv(substring(md5(row), 1, 15), 16, 10)
              .cast("long")).as("checksum"))
          .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
      }
      sum1(Tables.events(s, d), "events",
        Seq("event_id", "user_id", "event_type", "props"))
        .unionByName(sum1(Tables.orders(s, d), "orders",
          Seq("o_orderkey", "o_custkey", "o_orderstatus")))
        .unionByName(sum1(Tables.customer(s, d), "customer",
          Seq("c_custkey", "c_nationkey", "c_mktsegment")))
        .orderBy("table_name")
    }),

    // CEP pattern match (r13): "view then purchase within 2h, no
    // error between" — one forward window pass carrying next-B/next-C
    // structs. `operators/EventAnalytics.matchPattern`.
    "q257_event_pattern" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.EventAnalytics.matchPattern(
        ev, aType = "view", bType = "purchase", cType = "error",
        withinSec = 7200L)
        .orderBy("user_id", "a_id")
    }),

    // Rank-based winsorization (r13): clip into [v_(k+1), v_(n-k)],
    // k = n div 20 — order statistics, no fractional-quantile
    // interpolation. `operators/Stats.winsorize`.
    "q251_winsorize" -> ((s, d) =>
      graft.operators.Stats.winsorize(
        Tables.events(s, d), "event_type", "value", "event_id")
        .orderBy("event_type", "tie"))
  )

  val oracles: Map[String, String] = Map(
    "q67_arrays_zip" ->
      """SELECT event_id, idx,
        |       CAST(idx AS BIGINT) AS x,
        |       list_value(event_id % 7, user_id % 5, event_id % 3, user_id % 2)[CAST(idx AS INT)] AS y,
        |       CAST(idx AS BIGINT) *
        |       list_value(event_id % 7, user_id % 5, event_id % 3, user_id % 2)[CAST(idx AS INT)] AS prod
        |FROM (
        |  SELECT event_id, user_id, unnest(generate_series(1, 4)) AS idx
        |  FROM events WHERE event_id < 2000
        |) ORDER BY event_id, idx""".stripMargin,

    "q68_median" ->
      """SELECT l_returnflag, median(l_quantity) AS med_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q69_exact_stats" ->
      """SELECT event_type, n,
        |       s1d / n AS mean,
        |       sqrt((s2d - s1d * s1d / n) / (n - 1)) AS sd
        |FROM (
        |  SELECT event_type, COUNT(*) AS n,
        |         CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s1d,
        |         CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s2d
        |  FROM events GROUP BY event_type
        |) ORDER BY event_type""".stripMargin,

    "q70_running_sum" ->
      """SELECT user_id, event_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |         PARTITION BY user_id ORDER BY event_id
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running
        |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,

    "q71_lag_delta" ->
      """SELECT user_id, event_id,
        |       CAST(CAST(value AS DECIMAL(18,2)) -
        |            lag(CAST(value AS DECIMAL(18,2))) OVER (
        |              PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS delta
        |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,

    "q72_ntile" ->
      s"""SELECT tile, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM (
         |  SELECT o_totalprice,
         |         CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS tile
         |  FROM (
         |    SELECT o_orderkey, o_totalprice FROM orders
         |    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000
         |  )
         |) GROUP BY tile ORDER BY tile""".stripMargin,

    "q73_json_scan" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q74_events_daily" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |       COUNT(*) AS n,
        |       COUNT(DISTINCT user_id) AS users,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q104_outliers" ->
      """WITH m AS (
        |  SELECT event_type,
        |         s1d / n AS mu,
        |         sqrt((s2d - s1d * s1d / n) / (n - 1)) AS sd
        |  FROM (
        |    SELECT event_type, COUNT(*) AS n,
        |           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s1d,
        |           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s2d
        |    FROM events GROUP BY event_type
        |  )
        |)
        |SELECT e.event_type AS event_type, e.event_id AS event_id, e.value AS value
        |FROM events e JOIN m ON e.event_type = m.event_type
        |WHERE abs(e.value - m.mu) > 3.0 * m.sd
        |ORDER BY event_type, event_id""".stripMargin,

    "q100_quantiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS q25,
        |       quantile_cont(l_quantity, 0.5)  AS q50,
        |       quantile_cont(l_quantity, 0.75) AS q75,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the unsharded global sketch — equal to the merged shards because
    // per-bucket addition is lossless (no shard column anywhere)
    "q147_quantile_sketch" ->
      """WITH cents AS (
        |  SELECT l_returnflag,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM lineitem
        |),
        |sk AS (
        |  SELECT l_returnflag, c // 50000 AS bucket, COUNT(*) AS cnt
        |  FROM cents GROUP BY 1, 2
        |),
        |cum AS (
        |  SELECT l_returnflag, bucket, cnt,
        |         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
        |         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM sk
        |)
        |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
        |       CAST((MIN(CASE WHEN cum >= (n*25+99)//100 THEN bucket END)+1) * 50000 AS DOUBLE)/100 AS q25_est,
        |       CAST((MIN(CASE WHEN cum >= (n*50+99)//100 THEN bucket END)+1) * 50000 AS DOUBLE)/100 AS q50_est,
        |       CAST((MIN(CASE WHEN cum >= (n*75+99)//100 THEN bucket END)+1) * 50000 AS DOUBLE)/100 AS q75_est
        |FROM cum GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q92_time_range_frame" ->
      """SELECT user_id, event_id,
        |       COUNT(*) OVER w AS n_last_hour,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_last_hour
        |FROM (SELECT user_id, event_id, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |      FROM events WHERE user_id < 20)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q143_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value,
         |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
         |  FROM events
         |),
         |m AS (
         |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
         |                   OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |),
         |s AS (
         |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
         |            ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |            AS session_idx
         |  FROM m
         |)
         |SELECT user_id, session_idx, COUNT(*) AS n_events,
         |       MIN(ts_us) AS t_start, MAX(ts_us) AS t_end,
         |       ${sqlDsum("value")} AS total
         |FROM s GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,

    "q75_partition_overwrite" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total
         |FROM events
         |WHERE event_type <> 'click' OR event_id < 100
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q76_partition_pruning" ->
      s"""SELECT COUNT(*) AS n, ${sqlDsum("value")} AS total
         |FROM events WHERE event_type = 'click'""".stripMargin,

    // mirrors Stats.olsTrend token for token: exact DECIMAL(38,0)
    // sums, one double cast per total, explicitly-ordered IEEE chain
    "q218_ols_trend" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(date_diff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
        |         CAST(FLOOR(value * 100.0) AS BIGINT) AS y2
        |  FROM events
        |), g AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
        |         SUM(CAST(y2 AS DECIMAL(38,0))) AS sy,
        |         SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
        |         SUM(CAST(x AS DECIMAL(19,0)) * CAST(y2 AS DECIMAL(19,0))) AS sxy
        |  FROM e GROUP BY event_type
        |)
        |SELECT event_type, n,
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0 AS slope_per_day,
        |       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_value
        |FROM g ORDER BY event_type""".stripMargin,

    "q219_scd2" ->
      """WITH o AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                OR lag(event_type) OVER w <> event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |), r AS (
        |  SELECT user_id, event_type, ts_us,
        |         CAST(SUM(chg) OVER (PARTITION BY user_id
        |             ORDER BY ts_us, event_id
        |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        |  FROM o
        |), c AS (
        |  SELECT user_id, run_id, event_type, MIN(ts_us) AS effective_from
        |  FROM r GROUP BY user_id, run_id, event_type
        |)
        |SELECT user_id, event_type, effective_from,
        |       lead(effective_from) OVER (PARTITION BY user_id ORDER BY run_id)
        |         AS effective_to,
        |       run_id AS version,
        |       lead(effective_from) OVER (PARTITION BY user_id ORDER BY run_id)
        |         IS NULL AS is_current
        |FROM c ORDER BY user_id, version""".stripMargin,

    // mirrors Stats.rankCorrelation: Pearson over row_number ranks,
    // exact sums, num / (sqrt(d1) * sqrt(d2)) in that order
    "q222_rank_corr" ->
      """WITH rk AS (
        |  SELECT event_type,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |             ORDER BY value, event_id) AS BIGINT) AS ra,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS BIGINT) AS rb
        |  FROM events
        |), g AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         SUM(CAST(ra AS DECIMAL(38,0))) AS sa,
        |         SUM(CAST(rb AS DECIMAL(38,0))) AS sb,
        |         SUM(CAST(ra AS DECIMAL(19,0)) * CAST(ra AS DECIMAL(19,0))) AS saa,
        |         SUM(CAST(rb AS DECIMAL(19,0)) * CAST(rb AS DECIMAL(19,0))) AS sbb,
        |         SUM(CAST(ra AS DECIMAL(19,0)) * CAST(rb AS DECIMAL(19,0))) AS sab
        |  FROM rk GROUP BY event_type
        |)
        |SELECT event_type, n,
        |       (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) -
        |        CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
        |       (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) -
        |             CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
        |        sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) -
        |             CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS rank_corr
        |FROM g ORDER BY event_type""".stripMargin,

    // mirrors Stats.rateAnomaly: RANGE frame over the integer day
    // index, prior-window-only stats, variance>0 + minPrior guards
    "q226_rate_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(date_diff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
        |         COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2
        |), w AS (
        |  SELECT event_type, day, n_events,
        |         COUNT(*) OVER f AS n_prior,
        |         CAST(SUM(n_events) OVER f AS BIGINT) AS s1,
        |         CAST(SUM(n_events * n_events) OVER f AS BIGINT) AS s2
        |  FROM daily
        |  WINDOW f AS (PARTITION BY event_type ORDER BY day
        |               RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, day, n_events, n_prior,
        |       CASE WHEN n_prior >= 3
        |            THEN CAST(s1 AS DOUBLE) / CAST(n_prior AS DOUBLE) END
        |         AS baseline_mean,
        |       CASE WHEN n_prior >= 3 AND
        |                 CAST(n_prior AS DOUBLE) * CAST(s2 AS DOUBLE) -
        |                 CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0.0
        |            THEN (CAST(n_events AS DOUBLE) -
        |                  CAST(s1 AS DOUBLE) / CAST(n_prior AS DOUBLE)) /
        |                 sqrt((CAST(n_prior AS DOUBLE) * CAST(s2 AS DOUBLE) -
        |                       CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
        |                      (CAST(n_prior AS DOUBLE) * CAST(n_prior AS DOUBLE)))
        |       END AS z_score
        |FROM w ORDER BY event_type, day""".stripMargin,

    // mirrors Stats.keySkew; DuckDB's HUGEINT sums are the exact twin
    // of the Spark side's DECIMAL(38,0) accumulation
    "q231_key_skew" ->
      """WITH counts AS (
        |  SELECT event_type, user_id, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), ranked AS (
        |  SELECT event_type, user_id, cnt,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |             ORDER BY cnt, user_id) AS BIGINT) AS rk
        |  FROM counts
        |), g AS (
        |  SELECT event_type, COUNT(*) AS n_keys,
        |         SUM(cnt) AS total,
        |         MAX(cnt) AS max_cnt,
        |         SUM(2 * rk * cnt) AS srw
        |  FROM ranked GROUP BY event_type
        |)
        |SELECT event_type, n_keys,
        |       CAST(total AS BIGINT) AS total, max_cnt,
        |       CAST(max_cnt AS DOUBLE) / CAST(total AS DOUBLE) AS top_share,
        |       CAST(srw - (n_keys + 1) * total AS DOUBLE) /
        |       CAST(n_keys * total AS DOUBLE) AS gini
        |FROM g ORDER BY event_type""".stripMargin,

    // mirrors Stats.featureScale: exact ranks + cent-quantized moments
    "q236_feature_scale" ->
      """WITH base AS (
        |  SELECT event_type, value, event_id AS tie,
        |         CAST(FLOOR(value * 100.0) AS BIGINT) AS y2
        |  FROM events
        |), ranked AS (
        |  SELECT event_type, value, tie, y2,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |             ORDER BY value, tie) AS BIGINT) AS rk
        |  FROM base
        |), m AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         MIN(y2) AS y_min, MAX(y2) AS y_max,
        |         CAST(SUM(y2) AS BIGINT) AS s1,
        |         CAST(SUM(y2 * y2) AS BIGINT) AS s2
        |  FROM base GROUP BY event_type
        |)
        |SELECT r.event_type, r.tie, r.value,
        |       CASE WHEN n > 1
        |            THEN CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
        |       END AS pct_rank,
        |       CASE WHEN y_max > y_min
        |            THEN CAST(y2 - y_min AS DOUBLE) /
        |                 CAST(y_max - y_min AS DOUBLE)
        |       END AS minmax,
        |       CASE WHEN CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) -
        |                 CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0.0
        |            THEN (CAST(y2 AS DOUBLE) -
        |                  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) /
        |                 sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) -
        |                       CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
        |                      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |       END AS z_score
        |FROM ranked r JOIN m USING (event_type)
        |ORDER BY r.event_type, r.tie""".stripMargin,

    // mirrors AsOf.pointInTimeJoin: union + ordered carry of the
    // matched feature ROW id, payload re-joined by id (row semantics,
    // not per-column carries)
    "q238_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |         1 AS side, event_id AS obs_id,
        |         CAST(NULL AS BIGINT) AS f_id
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)),
        |         0, CAST(NULL AS BIGINT), event_id
        |  FROM events WHERE event_type = 'click'
        |), c AS (
        |  SELECT user_id, ts_us, side, obs_id,
        |         last_value(CASE WHEN side = 0 THEN f_id END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts_us, side, f_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS a_id
        |  FROM u
        |)
        |SELECT c.user_id, c.obs_id AS event_id, c.ts_us,
        |       f.value AS asof_value, c.a_id AS asof_event_id
        |FROM c LEFT JOIN (SELECT event_id, value FROM events
        |                  WHERE event_type = 'click') f
        |  ON c.a_id = f.event_id
        |WHERE c.side = 1 ORDER BY event_id""".stripMargin,

    // mirrors EventAnalytics.kaplanMeier: integer day durations,
    // suffix-sum risk sets, fixed-point 1e18 running product as a
    // recursive CTE (HUGEINT multiply + floor divide per step)
    "q239_survival_km" ->
      """WITH RECURSIVE per_user AS (
        |  SELECT user_id,
        |         MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
        |         MIN(CASE WHEN event_type = 'purchase'
        |                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS tp,
        |         MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS te
        |  FROM events GROUP BY user_id
        |), durs AS (
        |  SELECT (COALESCE(tp, te) - t0) // 86400000000 AS dur,
        |         tp IS NOT NULL AS converted
        |  FROM per_user
        |), per_dur AS (
        |  SELECT dur, COUNT(*) AS c_all,
        |         SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS d
        |  FROM durs GROUP BY dur
        |), risk AS (
        |  SELECT dur, d,
        |         SUM(c_all) OVER (ORDER BY dur
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |           AS n_risk
        |  FROM per_dur
        |), evt AS (
        |  SELECT dur, CAST(n_risk AS BIGINT) AS n_risk,
        |         CAST(d AS BIGINT) AS d,
        |         row_number() OVER (ORDER BY dur) AS rn
        |  FROM risk WHERE d > 0
        |), km AS (
        |  SELECT dur, n_risk, d, rn,
        |         CAST((CAST(1000000000000000000 AS HUGEINT) * (n_risk - d))
        |              // n_risk AS BIGINT) AS s
        |  FROM evt WHERE rn = 1
        |  UNION ALL
        |  SELECT e.dur, e.n_risk, e.d, e.rn,
        |         CAST((CAST(k.s AS HUGEINT) * (e.n_risk - e.d))
        |              // e.n_risk AS BIGINT)
        |  FROM km k JOIN evt e ON e.rn = k.rn + 1
        |)
        |SELECT dur AS t_days, n_risk, d AS n_events,
        |       CAST(s AS DOUBLE) / 1e18 AS survival
        |FROM km ORDER BY t_days""".stripMargin,

    // mirrors Profile.profileTable: one aggregation, one row per column
    "q240_profile" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS nn_event_id,
        |    COUNT(DISTINCT event_id) AS nd_event_id,
        |    CAST(MIN(event_id) AS DOUBLE) AS mn_event_id,
        |    CAST(MAX(event_id) AS DOUBLE) AS mx_event_id,
        |    SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nn_user_id,
        |    COUNT(DISTINCT user_id) AS nd_user_id,
        |    CAST(MIN(user_id) AS DOUBLE) AS mn_user_id,
        |    CAST(MAX(user_id) AS DOUBLE) AS mx_user_id,
        |    SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nn_value,
        |    COUNT(DISTINCT value) AS nd_value,
        |    CAST(MIN(value) AS DOUBLE) AS mn_value,
        |    CAST(MAX(value) AS DOUBLE) AS mx_value,
        |    SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS nn_et,
        |    COUNT(DISTINCT event_type) AS nd_et,
        |    MIN(event_type) AS mn_et, MAX(event_type) AS mx_et,
        |    SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nn_props,
        |    COUNT(DISTINCT props) AS nd_props,
        |    MIN(props) AS mn_props, MAX(props) AS mx_props
        |  FROM events
        |)
        |SELECT 'event_id' AS column_name, CAST(n AS BIGINT) AS n_rows,
        |       CAST(nn_event_id AS BIGINT) AS n_null,
        |       CAST(nd_event_id AS BIGINT) AS n_distinct,
        |       mn_event_id AS min_num, mx_event_id AS max_num,
        |       CAST(NULL AS VARCHAR) AS min_str,
        |       CAST(NULL AS VARCHAR) AS max_str FROM a
        |UNION ALL
        |SELECT 'user_id', CAST(n AS BIGINT), CAST(nn_user_id AS BIGINT),
        |       CAST(nd_user_id AS BIGINT), mn_user_id, mx_user_id,
        |       NULL, NULL FROM a
        |UNION ALL
        |SELECT 'value', CAST(n AS BIGINT), CAST(nn_value AS BIGINT),
        |       CAST(nd_value AS BIGINT), mn_value, mx_value,
        |       NULL, NULL FROM a
        |UNION ALL
        |SELECT 'event_type', CAST(n AS BIGINT), CAST(nn_et AS BIGINT),
        |       CAST(nd_et AS BIGINT), CAST(NULL AS DOUBLE),
        |       CAST(NULL AS DOUBLE), mn_et, mx_et FROM a
        |UNION ALL
        |SELECT 'props', CAST(n AS BIGINT), CAST(nn_props AS BIGINT),
        |       CAST(nd_props AS BIGINT), CAST(NULL AS DOUBLE),
        |       CAST(NULL AS DOUBLE), mn_props, mx_props FROM a
        |ORDER BY column_name""".stripMargin,

    // mirrors EventAnalytics.positionAttribution: forward carry to the
    // next conversion, 40/20/40 integer-ppm credits
    "q241_position_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), tagged AS (
        |  SELECT user_id, event_type, ts_us, event_id,
        |         first_value(CASE WHEN event_type = 'purchase'
        |                          THEN event_id END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |           AS conv_id
        |  FROM e
        |), j AS (
        |  SELECT event_type,
        |         row_number() OVER (PARTITION BY user_id, conv_id
        |                            ORDER BY ts_us, event_id) AS pos,
        |         COUNT(*) OVER (PARTITION BY user_id, conv_id) AS n
        |  FROM tagged
        |  WHERE event_type <> 'purchase' AND conv_id IS NOT NULL
        |), c AS (
        |  SELECT event_type,
        |         CASE WHEN n = 1 THEN 1000000
        |              WHEN n = 2 THEN 500000
        |              WHEN pos = 1 OR pos = n THEN 400000
        |              ELSE 200000 // (n - 2) END AS credit_ppm
        |  FROM j
        |)
        |SELECT event_type AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |       CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm,
        |       CAST(CAST(SUM(credit_ppm) AS BIGINT) AS DOUBLE) / 1e6
        |         AS credit
        |FROM c GROUP BY 1 ORDER BY channel""".stripMargin,

    // mirrors Profile.fkCheck: per relation one left join vs distinct
    // parent keys, single-row fold
    "q247_fk_check" -> {
      def rel(name: String, child: String, fk: String,
              parent: String, pk: String): String =
        s"""SELECT '$name' AS relation,
           |  CAST(COUNT(*) AS BIGINT) AS n_child,
           |  CAST(SUM(CASE WHEN c.$fk IS NULL THEN 1 ELSE 0 END)
           |       AS BIGINT) AS n_null_fk,
           |  CAST(SUM(CASE WHEN c.$fk IS NOT NULL AND p.$pk IS NULL
           |           THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           |  CAST(COUNT(DISTINCT CASE WHEN c.$fk IS NOT NULL AND
           |       p.$pk IS NULL THEN c.$fk END) AS BIGINT)
           |    AS n_orphan_keys
           |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
           |  ON c.$fk = p.$pk""".stripMargin
      Seq(
        rel("customer->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        rel("lineitem->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        rel("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        rel("nation->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        rel("orders->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        rel("supplier->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
    },

    // mirrors the q248 pivot: CASE-routed decimal sums per type
    "q248_pivot" ->
      """SELECT CAST(date_diff('day', DATE '2020-01-01', CAST(ts AS DATE))
        |            AS BIGINT) AS day,
        |  CAST(SUM(CASE WHEN event_type = 'click'
        |       THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error'
        |       THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase'
        |       THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup'
        |       THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view'
        |       THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    // mirrors Stats.benfordDigits: integer digit from the cent
    // count's decimal string, hard-literal law constants
    "q249_benford" ->
      """WITH cc AS (
        |  SELECT CAST(FLOOR(value * 100.0) AS BIGINT) AS c FROM events
        |), d AS (
        |  SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
        |           AS digit,
        |         COUNT(*) AS n
        |  FROM cc WHERE c > 0 GROUP BY 1
        |), s AS (
        |  SELECT unnest(generate_series(1, 9)) AS digit
        |), j AS (
        |  SELECT s.digit, CAST(COALESCE(d.n, 0) AS BIGINT) AS n,
        |         CASE s.digit
        |           WHEN 1 THEN 0.3010299956639812::DOUBLE
        |           WHEN 2 THEN 0.17609125905568124::DOUBLE
        |           WHEN 3 THEN 0.12493873660829992::DOUBLE
        |           WHEN 4 THEN 0.09691001300805642::DOUBLE
        |           WHEN 5 THEN 0.07918124604762482::DOUBLE
        |           WHEN 6 THEN 0.06694678963061322::DOUBLE
        |           WHEN 7 THEN 0.05799194697768673::DOUBLE
        |           WHEN 8 THEN 0.05115252244738129::DOUBLE
        |           ELSE 0.04575749056067514::DOUBLE
        |         END AS benford_p
        |  FROM s LEFT JOIN d ON s.digit = d.digit
        |), sh AS (
        |  SELECT digit, n,
        |         CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)
        |           AS share,
        |         benford_p
        |  FROM j
        |)
        |SELECT digit, n, share, benford_p,
        |       (share - benford_p) * (share - benford_p) / benford_p
        |         AS chi2_term
        |FROM sh ORDER BY digit""".stripMargin,

    // mirrors EventAnalytics.interpolateDaily: integer-cent straight
    // line on interior gaps, NULL edges
    "q250_interpolate_daily" ->
      """WITH src AS (
        |  SELECT event_type, CAST(ts AS TIMESTAMP) AS t, value
        |  FROM events
        |  WHERE date_part('day', CAST(ts AS TIMESTAMP)) % 5 <> 2
        |), daily AS (
        |  SELECT event_type AS g,
        |         CAST(date_diff('day', DATE '2020-01-01', CAST(t AS DATE))
        |              AS BIGINT) AS day,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
        |           AS c
        |  FROM src GROUP BY 1, 2
        |), spine AS (
        |  SELECT g, unnest(generate_series(MIN(day), MAX(day))) AS day
        |  FROM daily GROUP BY g
        |), filled AS (
        |  SELECT s.g, s.day, d.c
        |  FROM spine s LEFT JOIN daily d ON s.g = d.g AND s.day = d.day
        |), x AS (
        |  SELECT g, day, c,
        |    last_value(c IGNORE NULLS) OVER wb AS pc,
        |    last_value(CASE WHEN c IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wb AS pd,
        |    first_value(c IGNORE NULLS) OVER wf AS nc,
        |    first_value(CASE WHEN c IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wf AS nd
        |  FROM filled
        |  WINDOW wb AS (PARTITION BY g ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         wf AS (PARTITION BY g ORDER BY day
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT g AS event_type, day, c IS NOT NULL AS observed,
        |       CAST(CASE WHEN c IS NOT NULL THEN c
        |                 ELSE pc + ((nc - pc) * (day - pd)) // (nd - pd)
        |            END AS DOUBLE) / 100.0 AS value
        |FROM x ORDER BY event_type, day""".stripMargin,

    // mirrors q266: identical RANGE/ROWS frames on µs longs
    "q266_feature_table" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, value,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), f AS (
        |  SELECT user_id, event_type, event_id,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      OVER wr AS BIGINT) AS n_view_7d,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER wr AS BIGINT) AS n_click_7d,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      OVER wr AS BIGINT) AS n_error_7d,
        |    last_value(CASE WHEN event_type = 'click' THEN value END
        |      IGNORE NULLS) OVER wo AS last_click_value,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2)
        |              < 'cd' THEN 'train' ELSE 'val' END AS split
        |  FROM e
        |  WINDOW wr AS (PARTITION BY user_id ORDER BY ts_us
        |                RANGE BETWEEN 604800000000 PRECEDING
        |                          AND 1 PRECEDING),
        |         wo AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING
        |                         AND 1 PRECEDING)
        |)
        |SELECT event_id, user_id, n_view_7d, n_click_7d, n_error_7d,
        |       last_click_value, split
        |FROM f WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    // closed form of the q263 mutation: only_a = deleted-but-not-
    // duplicated, only_b = duplicated-but-not-deleted, lcm cancels
    "q263_table_diff" ->
      """SELECT
        |  CAST((SELECT COUNT(*) FROM events) -
        |       (SELECT COUNT(*) FROM events
        |        WHERE event_id % 97 = 0 AND event_id % 89 <> 0)
        |       AS BIGINT) AS n_common,
        |  CAST((SELECT COUNT(*) FROM events
        |        WHERE event_id % 97 = 0 AND event_id % 89 <> 0)
        |       AS BIGINT) AS n_only_a,
        |  CAST((SELECT COUNT(*) FROM events
        |        WHERE event_id % 89 = 0 AND event_id % 97 <> 0)
        |       AS BIGINT) AS n_only_b""".stripMargin,

    // mirrors q264: the same user-hash predicate semi-joined
    "q264_coherent_sample" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events
        |WHERE substring(md5(CAST(user_id AS VARCHAR)), 1, 2) < '20'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // mirrors Intervals.coverage: two-window gaps-and-islands
    "q261_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |         epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
        |  FROM events WHERE event_type = 'view'
        |), marked AS (
        |  SELECT user_id, s, e,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS max_prior_e
        |  FROM iv WHERE s < e
        |), islands AS (
        |  SELECT user_id, s, e,
        |    CAST(SUM(CASE WHEN max_prior_e IS NULL OR s > max_prior_e
        |                  THEN 1 ELSE 0 END)
        |         OVER (PARTITION BY user_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS island
        |  FROM marked
        |)
        |SELECT user_id, island, MIN(s) AS island_s, MAX(e) AS island_e,
        |       CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |       MAX(e) - MIN(s) AS covered
        |FROM islands GROUP BY user_id, island
        |ORDER BY user_id, island""".stripMargin,

    // mirrors EventAnalytics.conversionLatency: exact rank statistics
    "q262_conversion_latency" ->
      """WITH f AS (
        |  SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS tf
        |  FROM events WHERE event_type = 'view' GROUP BY user_id
        |), g AS (
        |  SELECT f.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) - f.tf
        |           AS gap
        |  FROM f JOIN events e ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) > f.tf
        |  GROUP BY f.user_id, f.tf
        |), r AS (
        |  SELECT gap,
        |    CAST(row_number() OVER (ORDER BY gap) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM g
        |)
        |SELECT MAX(n) AS n_converters, MIN(gap) AS min_us,
        |       MAX(CASE WHEN rk = (n + 1) // 2 THEN gap END) AS p50_us,
        |       MAX(CASE WHEN rk = (9 * n + 9) // 10 THEN gap END) AS p90_us,
        |       MAX(gap) AS max_us
        |FROM r""".stripMargin,

    // mirrors q258: typed JSON extraction (DuckDB has no variant
    // type; the VALUES are what the gate checks)
    "q258_variant" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
        |       MIN(CAST(props->>'$.k' AS BIGINT)) AS k_min,
        |       MAX(CAST(props->>'$.k' AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // mirrors q259: xor of 60-bit md5 slices, null-sentinel rows
    "q259_table_checksum" -> {
      def sum1(name: String, table: String, cols: Seq[String]): String = {
        val row = cols.map(c => s"COALESCE(CAST($c AS VARCHAR), '∅')")
          .mkString("concat_ws('|', ", ", ", ")")
        s"""SELECT '$name' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  bit_xor(CAST(('0x' || substring(md5($row), 1, 15)) AS BIGINT))
           |    AS checksum
           |FROM $table""".stripMargin
      }
      Seq(sum1("events", "events",
          Seq("event_id", "user_id", "event_type", "props")),
        sum1("orders", "orders",
          Seq("o_orderkey", "o_custkey", "o_orderstatus")),
        sum1("customer", "customer",
          Seq("c_custkey", "c_nationkey", "c_mktsegment")))
        .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },

    // mirrors EventAnalytics.matchPattern: forward struct carries,
    // exclusive C-guard interval
    "q257_event_pattern" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), x AS (
        |  SELECT user_id, event_type, ts_us, event_id,
        |    first_value(CASE WHEN event_type = 'purchase' THEN ts_us END
        |                IGNORE NULLS) OVER w AS nb_ts,
        |    first_value(CASE WHEN event_type = 'purchase' THEN event_id
        |                END IGNORE NULLS) OVER w AS nb_id,
        |    first_value(CASE WHEN event_type = 'error' THEN ts_us END
        |                IGNORE NULLS) OVER w AS nc_ts
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, event_id AS a_id, nb_id AS b_id,
        |       (nb_ts - ts_us) // 1000000 AS gap_sec
        |FROM x
        |WHERE event_type = 'view' AND nb_ts IS NOT NULL
        |  AND nb_ts - ts_us <= 7200000000
        |  AND (nc_ts IS NULL OR nc_ts >= nb_ts)
        |ORDER BY user_id, a_id""".stripMargin,

    // mirrors Stats.winsorize: order-statistic bounds, k = n div 20
    "q251_winsorize" ->
      """WITH ranked AS (
        |  SELECT event_type, value, event_id AS tie,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |              ORDER BY value, event_id) AS BIGINT) AS rk,
        |         CAST(COUNT(*) OVER (PARTITION BY event_type)
        |              AS BIGINT) AS n
        |  FROM events
        |), b AS (
        |  SELECT event_type,
        |         MAX(CASE WHEN rk <= n // 20 + 1 THEN value END) AS lo,
        |         MIN(CASE WHEN rk >= n - n // 20 THEN value END) AS hi
        |  FROM ranked GROUP BY event_type
        |)
        |SELECT r.event_type, r.tie, r.value,
        |       LEAST(GREATEST(r.value, b.lo), b.hi) AS clipped
        |FROM ranked r JOIN b USING (event_type)
        |ORDER BY r.event_type, r.tie""".stripMargin,

    // mirrors EventAnalytics.sequenceNgrams(n=3)
    "q242_event_trigrams" ->
      """WITH seq AS (
        |  SELECT event_type AS t0,
        |         lead(event_type, 1) OVER w AS t1,
        |         lead(event_type, 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |), g AS (
        |  SELECT t0, t1, t2, COUNT(*) AS cnt FROM seq
        |  WHERE t1 IS NOT NULL AND t2 IS NOT NULL GROUP BY 1, 2, 3
        |)
        |SELECT t0, t1, t2, CAST(cnt AS BIGINT) AS cnt,
        |       CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE)
        |         AS share
        |FROM g ORDER BY t0, t1, t2""".stripMargin
  )
}
