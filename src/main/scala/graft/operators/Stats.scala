package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed statistics via sufficient-statistic aggregation.
  *
  * Both operators here are one-pass groupBy aggregations: every
  * per-group statistic (slope, correlation) is assembled from sums
  * that Spark computes with map-side partial aggregation, so the
  * shuffle carries one row per (group, statistic-tuple), never the
  * data. That is the 100 TB shape — the alternative (collecting the
  * group to fit a model) carries whole groups in executor memory.
  *
  * Determinism discipline (the oracle gate hash-compares against
  * DuckDB): floating-point SUM is order-dependent, so every sum runs
  * over exact integers (quantized inputs, DECIMAL(38,0) accumulators
  * — overflow-proof at any corpus size), and the statistic is formed
  * by a short, explicitly-ordered chain of IEEE ops on the exact
  * totals. IEEE arithmetic is correctly rounded, so identical inputs
  * + identical op order = bit-identical output on any engine.
  */
object Stats {

  /** Ordinary-least-squares trend per group: slope and mean of
    * `valueCol` (a 2-decimal money-ish double, quantized to exact
    * cents) against the day index of `tsCol` (days since 2020-01-01
    * — a small integer, keeping every cross-product far inside
    * DECIMAL(38,0)).
    *
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), the classic
    * sufficient-statistics form: five exact sums per group, one
    * aggregation pass, no second scan for the residuals. Output
    * slope is in value-units per day (the /100 un-quantizes cents).
    */
  def olsTrend(df: DataFrame, groupCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val d19 = DecimalType(19, 0)
    val x = datediff(to_date(col(tsCol)), lit("2020-01-01")).cast("long")
    val y = floor(col(valueCol) * lit(100.0)).cast("long")
    val g = df
      .select(col(groupCol), x.as("x"), y.as("y2"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y2").cast(d38)).as("sy"),
        sum((col("x").cast(d19) * col("x").cast(d19)).cast(d38)).as("sxx"),
        sum((col("x").cast(d19) * col("y2").cast(d19)).cast(d38)).as("sxy"))
    // One cast per exact total, then an explicitly-ordered IEEE chain
    // (mirrored token-for-token in the oracle SQL).
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val sxy = col("sxy").cast("double")
    g.select(
      col(groupCol),
      col("n"),
      ((n * sxy - sx * sy) / (n * sxx - sx * sx) / lit(100.0)).as("slope_per_day"),
      (sy / n / lit(100.0)).as("mean_value"))
  }

  /** Rank correlation per group between two orderings — Spearman's ρ
    * with DETERMINISTIC tie-breaking: ranks are `row_number` over
    * (key, tieCol), a total order, so the statistic is exactly
    * reproducible on any engine (classic Spearman's fractional
    * average ranks need no tie-break but cost a second window pass
    * and a non-integer accumulator; with a unique tie column the two
    * agree whenever the data is tie-free).
    *
    * Pearson on integer ranks, all sums exact in DECIMAL(38,0):
    * ρ = (n·Σab − Σa·Σb) / (√(n·Σa² − (Σa)²) · √(n·Σb² − (Σb)²)).
    * Both rank passes ride the distributed [[rankInGroup]] two-level
    * form (r15) — at scale a corpus-sized group never sorts inside
    * one partition, whatever the group cardinality. */
  def rankCorrelation(df: DataFrame, groupCol: String, aCol: Column,
                      bCol: Column, tieCol: Column,
                      aBucketWidth: Double = 1.0,
                      bBucketWidth: Double = 1.0): DataFrame = {
    val d38 = DecimalType(38, 0)
    val d19 = DecimalType(19, 0)
    val base = df.select(col(groupCol), aCol.as("__a"), bCol.as("__b"),
      tieCol.as("__t"))
    val ranked = rankInGroup(
        rankInGroup(base, groupCol, col("__a"), col("__t"), "ra",
          aBucketWidth),
        groupCol, col("__b"), col("__t"), "rb", bBucketWidth)
      .select(col(groupCol), col("ra"), col("rb"))
    val g = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("ra").cast(d38)).as("sa"),
      sum(col("rb").cast(d38)).as("sb"),
      sum((col("ra").cast(d19) * col("ra").cast(d19)).cast(d38)).as("saa"),
      sum((col("rb").cast(d19) * col("rb").cast(d19)).cast(d38)).as("sbb"),
      sum((col("ra").cast(d19) * col("rb").cast(d19)).cast(d38)).as("sab"))
    val n = col("n").cast("double")
    val sa = col("sa").cast("double")
    val sb = col("sb").cast("double")
    val saa = col("saa").cast("double")
    val sbb = col("sbb").cast("double")
    val sab = col("sab").cast("double")
    g.select(
      col(groupCol),
      col("n"),
      ((n * sab - sa * sb) /
        (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb))).as("rank_corr"))
  }

  /** TRAILING-WINDOW RATE-ANOMALY DETECTION: per (group, day), the
    * z-score of that day's event count against the trailing
    * `lookback`-day window (current day EXCLUDED — a spike must not
    * inflate its own baseline). Days with fewer than `minPrior`
    * baseline days emit a NULL z-score rather than a garbage one.
    *
    * The day grid is the OBSERVED days only (a day with zero events
    * has no row — the monitoring-pipeline convention where absence
    * itself alarms upstream); the RANGE frame on the integer day
    * index still spans calendar gaps correctly.
    *
    * One aggregation to day counts (map-side combinable), one range
    * window per group partition. Counts are integers, so Σx and Σx²
    * are exact; mean/variance/z form a fixed IEEE chain on the exact
    * totals: z = (x − μ) / √((n·Σx² − (Σx)²) / (n·n)). */
  def rateAnomaly(df: DataFrame, groupCol: String, tsCol: String,
                  lookback: Int = 7, minPrior: Int = 3): DataFrame = {
    val daily = df
      .select(col(groupCol),
        datediff(to_date(col(tsCol)), lit("2020-01-01")).cast("long").as("day"))
      .groupBy(col(groupCol), col("day"))
      .agg(count(lit(1)).as("n_events"))
    rateAnomalyFromDaily(daily, groupCol, lookback, minPrior)
  }

  /** [[rateAnomaly]]'s scoring stage over PRE-AGGREGATED day counts
    * (`groupCol`, `day`, `n_events`) — the entry point for
    * incremental pipelines that maintain the daily rollup themselves
    * (e.g. a streaming sink of per-batch partial counts merged at
    * read): the day grid is whatever the caller aggregated, the
    * trailing-window semantics are identical. */
  def rateAnomalyFromDaily(daily: DataFrame, groupCol: String,
                           lookback: Int = 7, minPrior: Int = 3): DataFrame = {
    val frame = Window.partitionBy(col(groupCol)).orderBy(col("day"))
      .rangeBetween(-lookback, -1)
    val withStats = daily
      .withColumn("n_prior", count(lit(1)).over(frame))
      .withColumn("s1", sum(col("n_events")).over(frame))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(frame))
    val np = col("n_prior").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val mean = s1 / np
    val z = (col("n_events").cast("double") - mean) /
      sqrt((np * s2 - s1 * s1) / (np * np))
    // variance > 0 guard: a constant baseline window must yield NULL,
    // not a divide-by-zero artifact (engines disagree on x/0.0 — NaN
    // in DuckDB, ±Inf in the JVM — so the guard IS the portability)
    val varPos = (np * s2 - s1 * s1) > 0.0
    withStats.select(col(groupCol), col("day"), col("n_events"),
      col("n_prior"),
      when(col("n_prior") >= minPrior, mean).as("baseline_mean"),
      when(col("n_prior") >= minPrior && varPos, z).as("z_score"))
  }

  /** DISTRIBUTED IN-GROUP RANK (r15) — `row_number() OVER (PARTITION
    * BY group ORDER BY value, tie)` WITHOUT a group-sized window
    * partition: with few groups (event types, languages, sources) the
    * plain window funnels a corpus-sized group through one partition —
    * the q262 scale-killer class, just keyed. Two-level form instead:
    *
    *  1. bucket rows by `floor(value / bucketWidth)` (monotone, so
    *     bucket order = value order);
    *  2. per-(group, bucket) COUNTS — a map-side-combined aggregate —
    *     give every bucket its exclusive offset via a prefix window
    *     over the AGGREGATE relation (bounded by the value range /
    *     bucketWidth, the [[skyline2D]] rule — never the corpus);
    *  3. the exact (value, tie) order runs (group, bucket)-PARTITIONED;
    *     rank = bucket offset + in-bucket row_number.
    *
    * Identical ranks to the single window at any bucketWidth (pinned
    * in R15cSpec); `bucketWidth` trades bucket-relation size against
    * per-bucket sort width, the skyline2D contract. Values must be
    * NaN-free (NaN sorts after every double but buckets as null). */
  private[graft] def rankInGroup(df: DataFrame, groupCol: String,
                                 valueC: Column, tieC: Column,
                                 outCol: String,
                                 bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"rankInGroup: bucketWidth > 0, got $bucketWidth")
    val withB = df.withColumn("__rv", valueC)
      .withColumn("__rb", floor(col("__rv") / lit(bucketWidth)).cast("long"))
    val per = withB.groupBy(col(groupCol), col("__rb"))
      .agg(count(lit(1)).as("__c"))
    val offW = Window.partitionBy(col(groupCol)).orderBy(col("__rb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = per
      .withColumn("__boff", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .drop("__c")
    val inB = Window.partitionBy(col(groupCol), col("__rb"))
      .orderBy(col("__rv"), tieC)
    withB.join(off, Seq(groupCol, "__rb"))
      .withColumn(outCol,
        (col("__boff") + row_number().over(inB)).cast("long"))
      .drop("__rv", "__rb", "__boff")
  }

  /** PER-GROUP FEATURE SCALING — the ML-prep normalization pass:
    * for every row, its value's PERCENT RANK (CDF position with
    * deterministic (value, tie) ordering — quantile normalization),
    * its min-max scaling, and its z-score against the group, all
    * from exact statistics: ranks and counts are integers,
    * min/max exact, mean/variance from DECIMAL-quantized cent sums,
    * each output one short mirrored IEEE chain. Ranks come from the
    * distributed [[rankInGroup]] two-level form (r15: the plain
    * group-partitioned window funneled a corpus-sized group through
    * one partition when groups are few); moments are one aggregate
    * joined back on the group key. */
  def featureScale(df: DataFrame, groupCol: String, valueCol: String,
                   tieCol: String, rankBucketWidth: Double = 1.0): DataFrame = {
    val d38 = DecimalType(38, 0)
    val y = floor(col(valueCol) * lit(100.0)).cast("long")
    val base = df.select(col(groupCol), col(valueCol).as("value"),
      col(tieCol).as("tie"), y.as("y2"))
    val ranked = rankInGroup(base, groupCol, col("value"), col("tie"),
      "rk", rankBucketWidth)
    val moments = base.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      min(col("y2")).as("y_min"),
      max(col("y2")).as("y_max"),
      sum(col("y2").cast(d38)).as("s1"),
      sum((col("y2").cast(DecimalType(19, 0)) *
        col("y2").cast(DecimalType(19, 0))).cast(d38)).as("s2"))
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val mean = s1 / n
    val varPos = (n * s2 - s1 * s1) > 0.0
    val z = (col("y2").cast("double") - mean) /
      sqrt((n * s2 - s1 * s1) / (n * n))
    val range = (col("y_max") - col("y_min")).cast("double")
    ranked.join(moments, groupCol :: Nil)
      .select(col(groupCol), col("tie"), col("value"),
        when(col("n") > 1,
          (col("rk") - lit(1L)).cast("double") /
            (col("n") - lit(1L)).cast("double")).as("pct_rank"),
        when(col("y_max") > col("y_min"),
          (col("y2") - col("y_min")).cast("double") / range).as("minmax"),
        when(varPos, z).as("z_score"))
  }

  /** RANK-BASED WINSORIZATION — outlier clamping for ML prep, defined
    * on ORDER STATISTICS so it is exact: per group, values are clipped
    * into [v_(k+1), v_(n−k)] with k = n div trimDen (trimDen = 20 →
    * 5% per tail) — no fractional quantile interpolation, whose
    * engine-specific formula order would break bit-equality, and no
    * clipping at all while n < trimDen (k = 0 keeps every value, the
    * honest small-group behavior). Ranks ride the distributed
    * [[rankInGroup]] two-level form and the group size is an
    * aggregate joined back (r15: both the rank window and the
    * count-over-group window funneled corpus-sized groups through one
    * partition when groups are few) — then a bounded bounds rollup +
    * join, the [[featureScale]] plan shape. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                tieCol: String, trimDen: Int = 20,
                rankBucketWidth: Double = 1.0): DataFrame = {
    require(trimDen >= 2, s"winsorize: trimDen must be >= 2, got $trimDen")
    val base = df.select(col(groupCol), col(valueCol).as("value"),
      col(tieCol).as("tie"))
    val sizes = base.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val ranked = rankInGroup(base, groupCol, col("value"), col("tie"),
        "rk", rankBucketWidth)
      .join(sizes, groupCol :: Nil)
      .withColumn("k", expr(s"n div $trimDen"))
    val bounds = ranked.groupBy(col(groupCol)).agg(
      max(when(col("rk") <= col("k") + 1, col("value"))).as("lo"),
      min(when(col("rk") >= col("n") - col("k"), col("value"))).as("hi"))
    ranked.join(bounds.select(col(groupCol), col("lo"), col("hi")),
        groupCol :: Nil)
      .select(col(groupCol), col("tie"), col("value"),
        least(greatest(col("value"), col("lo")), col("hi")).as("clipped"))
  }

  /** BENFORD FIRST-DIGIT TEST — the fraud/corruption screen for any
    * naturally-occurring amount column: observed share of each
    * leading significant digit vs Benford's log10(1+1/d) law, with
    * the per-digit χ² contribution. Digit extraction is INTEGER
    * (first character of the cent count's decimal string — float
    * formatting never crosses an engine boundary), the law's
    * probabilities are hard double literals (identical constants both
    * sides, no libm log), a 9-row digit spine zero-fills unseen
    * digits, and the χ² term is a short mirrored IEEE chain. */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df
      .select(floor(col(valueCol) * lit(100.0)).cast("long").as("c"))
      .filter(col("c") > 0)
      .select(substring(col("c").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10).select(col("id").as("digit"))
    val wTot = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val p = expr(
      """CASE digit WHEN 1 THEN 0.3010299956639812D
        |  WHEN 2 THEN 0.17609125905568124D WHEN 3 THEN 0.12493873660829992D
        |  WHEN 4 THEN 0.09691001300805642D WHEN 5 THEN 0.07918124604762482D
        |  WHEN 6 THEN 0.06694678963061322D WHEN 7 THEN 0.05799194697768673D
        |  WHEN 8 THEN 0.05115252244738129D ELSE 0.04575749056067514D
        |END""".stripMargin)
    spine.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("share",
        col("n").cast("double") / sum(col("n")).over(wTot).cast("double"))
      .withColumn("benford_p", p)
      .withColumn("chi2_term",
        (col("share") - col("benford_p")) * (col("share") - col("benford_p"))
          / col("benford_p"))
  }

  /** KEY-SKEW DIAGNOSTICS per group — the "is this join/shuffle key
    * safe at scale" report a 100 TB pipeline runs BEFORE picking a
    * partitioning: per group, the number of distinct keys, total
    * rows, the heaviest key's share, and the GINI COEFFICIENT of the
    * per-key frequency distribution (0 = uniform, →1 = one key holds
    * everything — the salting/AQE-skew-join trigger).
    *
    * Gini over sorted counts x_(1..n):
    * Σᵢ (2i − n − 1)·x_(i) / (n·Σx) — every term an exact integer
    * (DECIMAL(38,0) accumulation), one IEEE division at the end.
    * Cost shape: the windows and aggregations run over the KEY-COUNT
    * relation (one row per distinct key — orders of magnitude
    * smaller than the data), partitioned by group; ties rank
    * deterministically by key. */
  def keySkew(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val counts = df.groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("cnt"), col(keyCol))
    val ranked = counts.withColumn("rk", row_number().over(w).cast("long"))
    val g = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt").cast(d38)).as("total"),
      max(col("cnt")).as("max_cnt"),
      sum(((lit(2L) * col("rk")).cast(d38) * col("cnt").cast(d38)))
        .as("s_rank_weighted"))
    // Σ(2i−n−1)x_i = Σ2i·x_i − (n+1)·Σx_i — regroup so the weighted
    // sum needs no per-row knowledge of n (one pass, map-side partial)
    val num = col("s_rank_weighted") -
      ((col("n_keys") + lit(1L)).cast(d38) * col("total"))
    val den = col("n_keys").cast(d38) * col("total")
    g.select(col(groupCol), col("n_keys"),
      col("total").cast("long").as("total"),
      col("max_cnt"),
      (col("max_cnt").cast("double") / col("total").cast("double"))
        .as("top_share"),
      (num.cast("double") / den.cast("double")).as("gini"))
  }

  /** DISTRIBUTED GRAM MATRIX over an embedding column — the one-pass
    * building block behind PCA / whitening / covariance-based
    * curation of an embedding corpus. G(i,j) = Σ_rows v_i·v_j,
    * computed as a typed [[Aggregator]] whose buffer is the d×d
    * matrix of exact INTEGER sums over inputs quantized to
    * `scaleBits` fractional bits (a power-of-two scale, so the
    * float→fixed conversion is one exact double multiply + floor on
    * any engine).
    *
    * This is the scale shape that matters: partial aggregation means
    * every partition reduces its rows locally into ONE d²-long
    * buffer and the shuffle carries one buffer per partition —
    * d=64 → 32 KB — never the vectors (the explode-to-(i,j)-pairs
    * alternative shuffles d²× the corpus). Integer addition
    * commutes, so the result is bit-identical under any partitioning.
    * Headroom: |v|<1 at 16 scale bits ⇒ |q_i·q_j| < 2³², leaving
    * 2³¹ rows per cell before Long overflow — raise to a BigInt
    * buffer past that, not the scale. Emits the upper triangle
    * (i ≤ j) with the exact `dot_q` and the de-scaled double. */
  def gramMatrix(df: DataFrame, vecCol: String, d: Int,
                 scaleBits: Int = 16): DataFrame = {
    require(d >= 1 && scaleBits >= 1 && scaleBits <= 24,
      s"need 1 <= d and 1 <= scaleBits <= 24, got d=$d bits=$scaleBits")
    val scale = math.pow(2.0, scaleBits)
    val q = df.select(transform(col(vecCol),
      x => floor(x.cast("double") * lit(scale)).cast("long")).as("qv"))
    val agg = new GramAggregator(d)
    implicit val enc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    val one = q.as[Array[Long]].select(agg.toColumn.name("g")).toDF("g")
    one.select(posexplode(col("g")).as(Seq("k", "dot_q")))
      .select(expr(s"CAST(k DIV $d AS BIGINT)").as("i"),
        expr(s"CAST(k % $d AS BIGINT)").as("j"), col("dot_q"))
      .filter(col("i") <= col("j"))
      .withColumn("gram", col("dot_q").cast("double") / lit(scale * scale))
  }

  /** The [[gramMatrix]] buffer: exact integer outer-product sums,
    * symmetric cells written to both triangles so the merge is a
    * flat elementwise add. */
  private final class GramAggregator(d: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](d * d)
    def reduce(acc: Array[Long], v: Array[Long]): Array[Long] = {
      require(v.length == d,
        s"gramMatrix: expected $d-dim vectors, found ${v.length}")
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val p = v(i) * v(j)
          acc(i * d + j) += p
          if (i != j) acc(j * d + i) += p
          j += 1
        }
        i += 1
      }
      acc
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var k = 0
      while (k < a.length) { a(k) += b(k); k += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** HYPERLOGLOG DISTINCT SKETCH (r14) — Flajolet et al.'s mergeable
    * cardinality estimator, built ENGINE-EXACTLY so the oracle replays
    * the sketch bit-for-bit: the 56-bit hash is the first 14 hex chars
    * of md5 (identical text-level derivation in Spark `conv` and
    * DuckDB's hex cast), the top `b` bits pick the register, and the
    * rank is the first set bit of the suffix FOUND IN THE BINARY
    * STRING (lpad(bin(w)) — string ops, not libm). Register folding is
    * Σ 2^(suffixBits+1−M_j) in exact BIGINT (≤ m·2^51, no overflow,
    * order-independent), and the ONLY IEEE arithmetic is the final
    * α·m²·2^(suffixBits+1)/S division chain, written with identical
    * literal order in both engines. No small-range log correction is
    * applied — the raw estimate is the deterministic artifact (choose
    * b so n ≳ 5/2·m, or apply corrections reader-side); the m-register
    * spine is explicit, so empty registers contribute their 2^0 term
    * exactly as the paper requires. Per key the sketch is m integers —
    * the mergeable shape that unions across partitions, days, and
    * tables for free (max per register). */
  /** [[hllDistinct]]'s per-row register derivation, exposed for
    * incremental/streaming uses: adds (`__bkt`, `__rho`) — a row's
    * register id and rank. MAX of `__rho` per (key, `__bkt`) IS the
    * sketch, and max is monotone-idempotent, so partial register
    * maxes from any batching/partitioning fold to the same sketch —
    * the mergeability that makes HLL the streaming cardinality
    * primitive (q281 drains exactly that). */
  def hllRegisters(df: DataFrame, valueCol: String, b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 14, s"hllRegisters: b must be in [4,14], got $b")
    val suffixBits = 56 - b
    df
      .withColumn("__h", expr(
        s"cast(conv(substring(md5(cast($valueCol as string)), 1, 14), 16, 10) as bigint)"))
      .withColumn("__bkt", expr(s"__h div ${1L << suffixBits}L"))
      .withColumn("__w", expr(s"__h % ${1L << suffixBits}L"))
      .withColumn("__pos", expr(s"instr(lpad(bin(__w), $suffixBits, '0'), '1')"))
      .withColumn("__rho", expr(
        s"CASE WHEN __pos = 0 THEN ${suffixBits + 1} ELSE __pos END"))
      .drop("__h", "__w", "__pos")
  }

  /** Fold PARTIAL registers (`keyCol`, `__bkt`, `mj`) — possibly
    * incomplete and with duplicate buckets from merged batches — into
    * the per-key estimate row: the max-combine, the explicit
    * m-register spine (empty registers contribute their 2^0 term),
    * the exact BIGINT sum, and the literal-order IEEE estimate. */
  def hllFold(partial: DataFrame, keyCol: String, b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 14, s"hllFold: b must be in [4,14], got $b")
    val m = 1 << b
    val suffixBits = 56 - b
    val alpha = if (b == 4) "0.673" else if (b == 5) "0.697"
                else if (b == 6) "0.709" else s"(0.7213 / (1.0 + 1.079 / $m.0))"
    val regs = partial.groupBy(col(keyCol), col("__bkt"))
      .agg(max(col("mj")).as("mj"))
    val spine = partial.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(m - 1))).as("__bkt"))
    spine.join(regs, Seq(keyCol, "__bkt"), "left")
      .withColumn("mj", coalesce(col("mj"), lit(0)))
      .groupBy(col(keyCol))
      .agg(sum(expr(s"shiftleft(1L, ${suffixBits + 1} - mj)")).as("s"),
        count(when(col("mj") === 0, 1)).as("v_zero"))
      .withColumn("estimate", expr(
        s"$alpha * $m.0 * $m.0 * ${1L << (suffixBits + 1)}L / cast(s as double)"))
  }

  def hllDistinct(df: DataFrame, keyCol: String, valueCol: String,
                  b: Int = 6): DataFrame =
    hllFold(
      hllRegisters(df, valueCol, b).groupBy(col(keyCol), col("__bkt"))
        .agg(max(col("__rho")).as("mj")),
      keyCol, b)

  /** FEATURE HASHING (the hashing trick, r14) — the fixed-dimension
    * text featurizer every large-scale linear/embedding-input model
    * uses when a vocabulary is too big or too fluid to hold: each
    * token hashes to one of `dim` buckets with a hash-derived SIGN
    * (Weinberger et al. — the sign makes collisions cancel in
    * expectation instead of biasing upward). md5-derived like
    * [[hllDistinct]], so Spark and the oracle agree token-for-token;
    * emits the sparse (doc, index, value) triples with zero-sum
    * collisions dropped. One explode + one (doc, bucket) aggregate —
    * the shuffle carries at most dim entries per document. */
  def featureHash(docs: DataFrame, dim: Int = 256,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(dim >= 2, s"featureHash: dim must be >= 2, got $dim")
    docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok").rlike("^[a-z0-9]+$"))
      .withColumn("__h", expr(
        "cast(conv(substring(md5(tok), 1, 14), 16, 10) as bigint)"))
      .withColumn("idx", expr(s"__h % $dim"))
      .withColumn("sgn", expr(s"CASE WHEN (__h div $dim) % 2 = 0 THEN 1L ELSE -1L END"))
      .groupBy(col(idCol), col("idx"))
      .agg(sum(col("sgn")).as("v"))
      .filter(col("v") =!= 0)
  }

  /** MAD ANOMALY FLAGS (r14) — the robust outlier rule
    * |x − median| > 3·MAD, immune to the anomalies themselves (the
    * weakness of the z-score family: one huge spike inflates σ and
    * hides the rest). Kept INTEGER-EXACT by doubling: med2 = 2·median
    * (the lower+upper middle order stats summed, so even-length
    * series need no fractional midpoint), dev2_i = |2x_i − med2|,
    * mad4 = 2·median(dev2); the flag 2·dev2 > 3·mad4 is EXACTLY
    * |x − med| > 3·MAD with no float anywhere. Runs per group over
    * the ≤history-days daily series (the bounded-fold stance of
    * [[graft.operators.EventAnalytics.ewmaDaily]]); the oracle
    * replays via rank order statistics. */
  def madAnomalyDaily(ev: DataFrame,
                      groupCol: String = "event_type",
                      tsCol: String = "ts"): DataFrame = {
    val grid = EventAnalytics.resampleDaily(ev, groupCol, tsCol)
      .select(col(groupCol).as("g"), col("day"), col("n").as("x"))
    def med2Of(arrCol: Column, nCol: Column): Column =
      when(nCol % 2 === 1, lit(2L) * element_at(arrCol, ((nCol + 1) / 2).cast("int")))
        .otherwise(element_at(arrCol, (nCol / 2).cast("int")) +
          element_at(arrCol, (nCol / 2 + 1).cast("int")))
    val med = grid.groupBy(col("g"))
      .agg(sort_array(collect_list(col("x"))).as("a"),
        count(lit(1)).as("n"))
      .select(col("g"), med2Of(col("a"), col("n")).as("med2"))
    val dev = grid.join(broadcast(med), Seq("g"))
      .withColumn("dev2", abs(lit(2L) * col("x") - col("med2")))
    val mad = dev.groupBy(col("g"))
      .agg(sort_array(collect_list(col("dev2"))).as("a"),
        count(lit(1)).as("n"))
      .select(col("g"), med2Of(col("a"), col("n")).as("mad4"))
    dev.join(broadcast(mad), Seq("g"))
      .select(col("g").as(groupCol), col("day"), col("x").as("n"),
        col("med2"), col("mad4"),
        (lit(2L) * col("dev2") > lit(3L) * col("mad4")).as("is_anomaly"))
  }

  /** GROUPED EXACT QUANTILES BY DISTRIBUTED SELECTION (r14) — the
    * [[graft.operators.EventAnalytics.conversionLatency]] machinery
    * generalized to ARBITRARY groups: per group, exact
    * (n, min, p25, p50, p75, p90, max) over a LONG value column with
    * no per-group sort, no unpartitioned window, and no driver
    * collect — the op that replaces "sort each group and index" when
    * groups are corpus-sized. Ranks follow the q262 convention
    * rank_p = max(1, (a·(n+1)) div b) for p = a/b (lower-median
    * style), so values are bit-identical across engines under ties.
    *
    * The selection per group: (n, min, max) from one aggregate
    * (groups-sized, broadcast back — a hash join, not a cross join);
    * equal-width value buckets b = (v − min) div w with
    * w = ((max − min) div 1024) + 1; per-(group, bucket, value)
    * counts — the ONE data shuffle, which ties SHRINK; the ≤1025
    * per-bucket totals fold to prefix offsets inside one `aggregate`
    * HOF per group row; each target rank locates its bucket there,
    * and a (group, bucket)-partitioned window ranks only the target
    * buckets' distinct values. conversionLatency keeps its
    * specialized single-group form (its plan is pinned in
    * R14PlanSpec); this is the same algorithm with the group key
    * threaded through every stage. */
  def exactRankStats(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame =
    // a raw row is a weight-1 fragment; the weighted merge's
    // (group, bucket, value) sum IS the original count shuffle, so
    // this delegation costs no extra exchange (plan-pinned via q283)
    exactRankStatsWeighted(
      df.select(col(groupCol), col(valueCol).as("__v"), lit(1L).as("__c")),
      groupCol, "__v", "__c")

  /** [[exactRankStats]] over PRE-COUNTED (group, value, count) rows —
    * the INCREMENTAL face of the selection (r15): per-(group, value)
    * counts are additive, so any partition of the data into batches /
    * commits can contribute count FRAGMENTS independently (kilobytes
    * per group however large the batch — the q149 sketch-commit
    * idiom), and this read-side merge reproduces the batch answer
    * BIT-EXACTLY: duplicate (group, value) rows sum before ranking,
    * n is the count total, and the selection proceeds on the merged
    * weights. `exactRankStats` itself delegates here (a raw row is a
    * weight-1 fragment), so the two paths cannot drift. */
  def exactRankStatsWeighted(counts: DataFrame, groupCol: String,
                             valueCol: String,
                             countCol: String): DataFrame = {
    val pcts: Seq[(String, Int, Int)] =
      Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))
    val frag = counts.select(col(groupCol), col(valueCol).as("v"),
      col(countCol).cast("long").as("fc"))
    val stats = frag.groupBy(col(groupCol))
      .agg(sum(col("fc")).cast("long").as("n"),
        min(col("v")).as("minv"), max(col("v")).as("maxv"))
    val byValue = frag
      .join(broadcast(stats), Seq(groupCol))
      // a group spanning more than half the long range cannot compute
      // a bucket width; under ANSI mode (this engine's default) the
      // subtraction itself raises ARITHMETIC_OVERFLOW — loud, never
      // garbage buckets (values within ±2⁶² are fine; pinned in
      // R14DifferentialSpec)
      .withColumn("w", expr("((maxv - minv) div 1024L) + 1L"))
      .withColumn("b", expr("(v - minv) div w"))
      // the fragment merge: duplicate (group, value) contributions sum
      .groupBy(col(groupCol), col("b"), col("v"))
      .agg(sum(col("fc")).as("c"))
    val perBucket = byValue.groupBy(col(groupCol), col("b"))
      .agg(sum(col("c")).as("bc"))
    val rankRows = pcts.map { case (nm, a, bb) =>
      s"named_struct('p', '$nm', 'rk', greatest(1L, ($a * (n + 1)) div $bb))"
    }.mkString("array(", ", ", ")")
    val targets = perBucket.groupBy(col(groupCol))
      .agg(collect_list(struct(col("b"), col("bc"))).as("bs"))
      .join(broadcast(stats), Seq(groupCol))
      .withColumn("pref", expr(
        """aggregate(array_sort(bs),
          |  struct(cast(0 as bigint) as tot,
          |         cast(array() as
          |           array<struct<b:bigint,off:bigint,cum:bigint>>) as out),
          |  (acc, x) -> named_struct('tot', acc.tot + x.bc,
          |    'out', array_append(acc.out, named_struct(
          |      'b', x.b, 'off', acc.tot, 'cum', acc.tot + x.bc))),
          |  acc -> acc.out)""".stripMargin))
      .select(col(groupCol), col("n"), col("minv"), col("maxv"),
        col("pref"), explode(expr(rankRows)).as("t"))
      .select(col(groupCol), col("n"), col("minv"), col("maxv"),
        col("pref"), col("t.p").as("p"), col("t.rk").as("rk"))
      .withColumn("hit", expr(
        "filter(pref, x -> x.off < rk AND rk <= x.cum)[0]"))
      .select(col(groupCol), col("n"), col("minv"), col("maxv"),
        col("p"), col("rk"), col("hit.b").as("b"), col("hit.off").as("off"))
    // in-bucket cumulative BEFORE the target join: two percentiles
    // sharing a bucket would otherwise duplicate rows under the window
    val wIn = Window.partitionBy(col(groupCol), col("b")).orderBy(col("v"))
    val withCum = byValue.withColumn("cum", sum(col("c")).over(wIn))
    val picked = withCum
      .join(targets, Seq(groupCol, "b"))
      .withColumn("hi", col("off") + col("cum"))
      .withColumn("lo", col("hi") - col("c") + lit(1L))
      .filter(col("lo") <= col("rk") && col("rk") <= col("hi"))
    picked.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        max(col("minv")).as("min_v"),
        max(when(col("p") === "p25", col("v"))).as("p25"),
        max(when(col("p") === "p50", col("v"))).as("p50"),
        max(when(col("p") === "p75", col("v"))).as("p75"),
        max(when(col("p") === "p90", col("v"))).as("p90"),
        max(col("maxv")).as("max_v"))
  }

  /** EQUI-DEPTH QUANTILE BINNING (r14) — the feature-engineering
    * discretizer (decile/percentile bins for monotone models, WoE
    * tables, drift monitors): `ntile(k)` over (value, tie) per group
    * assigns every row its rank-balanced bin — ntile's floor/ceil
    * split of n into k parts is specified identically in Spark and
    * DuckDB, and the tie column makes the assignment total, so bins
    * replay exactly. r15: the rank comes from the distributed
    * [[rankInGroup]] two-level form and ntile's split is re-derived
    * arithmetically from (rank, n) — bit-identical to the window
    * `ntile(k)` (first n%k bins hold ceil(n/k) rows) without the
    * group-sized window partition. */
  def quantileBin(df: DataFrame, k: Int, groupCol: String,
                  valueCol: String, tieCol: String,
                  rankBucketWidth: Double = 1.0): DataFrame = {
    require(k >= 2, s"quantileBin: k must be >= 2, got $k")
    val sizes = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    rankInGroup(df, groupCol, col(valueCol), col(tieCol), "__rk",
        rankBucketWidth)
      .join(sizes, groupCol :: Nil)
      // ntile(k): q = n div k rows per bin, the first rem = n % k
      // bins take one extra. `x div 0` is NULL, and the q = 0 branch
      // is unreachable (rk <= n = rem there), so the guard holds.
      .withColumn("bin", expr(
        s"""CASE WHEN __rk <= (__n % $k) * ((__n div $k) + 1)
           |  THEN (__rk - 1) div ((__n div $k) + 1) + 1
           |  ELSE (__n % $k)
           |    + ((__rk - (__n % $k) * ((__n div $k) + 1) - 1)
           |        div (__n div $k)) + 1
           |END""".stripMargin))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** DISTRIBUTION DRIFT between a reference and a current slice
    * (r15) — the monitor a training-data pipeline runs before
    * admitting a new crawl batch: bin a value column into fixed-width
    * buckets and compare the two bin histograms. The divergence is
    * reported PSI-style per bin but in EXACT integer arithmetic (no
    * ln): with p_b = r_b/R and q_b = c_b/C, the per-bin total
    * variation contribution |p_b − q_b| is emitted multiplied through
    * by the common denominator R·C — `tv_scaled = |r_b·C − c_b·R|` —
    * an exact DECIMAL(38,0) emitted as its canonical digit STRING
    * (bit-identical on any engine; sum/(2·R·C) is the exact
    * total-variation distance). Log-family
    * divergences (PSI/KL) are one `ln` away from the same two count
    * columns; they are left to the caller because libm output is not
    * cross-engine reproducible (the q102 rational-idf rule).
    *
    * Scale shape: ONE pass over each slice (a shared scan when both
    * slices come from one table — the filters are disjoint
    * predicates), partial-aggregated (group, bin) counts, and a
    * bin-count-sized (≤ thousands) merge: nothing downstream of the
    * first aggregate depends on the corpus size. The fragment face
    * [[featureDriftFromCounts]] merges pre-counted (side, bin)
    * fragments — additive, so streaming/batched commits reproduce
    * the one-shot answer bit-exactly (the exactRankStatsWeighted
    * contract). */
  def featureDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"featureDrift: binWidth >= 1, got $binWidth")
    // valueCol must be a non-negative integral column (callers floor
    // doubles to cents first, the q286 idiom): floor(v/w) on a
    // ≤2⁵³ long is exact and equals SQL `v // w` for positives
    def binned(df: DataFrame, side: String) =
      df.select(floor(col(valueCol).cast("long") / lit(binWidth))
          .cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("c"))
        .select(lit(side).as("side"), col("bin"), col("c"))
    featureDriftFromCounts(
      binned(ref, "ref").unionAll(binned(cur, "cur")))
  }

  /** [[featureDrift]] over pre-counted (side, bin, c) fragments with
    * side ∈ {ref, cur}; duplicate (side, bin) rows sum first, so any
    * partition of either slice into batches/commits is invisible. */
  def featureDriftFromCounts(frags: DataFrame): DataFrame = {
    // DECIMAL(18,0) operands: the product is (36,0) and the
    // difference (37,0), inside both engines' 38-digit cap — casting
    // (38,0) operands would overflow the SQL precision rules
    val d18 = DecimalType(18, 0)
    val merged = frags.groupBy(col("side"), col("bin"))
      .agg(sum(col("c")).cast("long").as("c"))
    val bins = merged.groupBy(col("bin"))
      .agg(sum(when(col("side") === "ref", col("c"))
        .otherwise(lit(0L))).cast("long").as("n_ref"),
        sum(when(col("side") === "cur", col("c"))
          .otherwise(lit(0L))).cast("long").as("n_cur"))
    // one-row totals broadcast back: a small-side hash join, the
    // scalar-broadcast idiom every drift denominator needs
    val tot = bins.agg(sum(col("n_ref")).cast("long").as("tot_ref"),
      sum(col("n_cur")).cast("long").as("tot_cur"))
    bins.join(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        col("tot_ref"), col("tot_cur"),
        // the exact value is DECIMAL internally, but the OUTPUT is its
        // canonical digit string: DECIMAL(38,0) final columns are the
        // one type the correctness driver's hash canonicalizes
        // differently from both engines (r15: q292/q297/q300 were the
        // only three DECIMAL(38,0)-emitting queries and exactly the
        // hash-red set, values proven bit-identical) — and scale-0
        // decimal→string is identical plain digits in Spark and DuckDB
        abs(col("n_ref").cast(d18) * col("tot_cur").cast(d18) -
          col("n_cur").cast(d18) * col("tot_ref").cast(d18))
          .cast(DecimalType(38, 0)).cast("string").as("tv_scaled"))
  }

  /** EXACT POWER-ITERATION STEPS on the [[gramMatrix]] (r15) — the
    * dominant-eigenvector estimate behind PCA/spectral curation of an
    * embedding corpus, kept ENGINE-EXACT: two unnormalized Krylov
    * steps v₁ = G·e_s, v₂ = G·v₁ from the largest-diagonal axis e_s
    * (ties → min index), all in integer/decimal arithmetic, so the
    * result is bit-identical on any engine or partitioning. Two steps
    * is the decimal-exact budget: |G| ≤ rows·2^(2·scaleBits) and
    * |v₂| ≤ d·|G|·|v₁| stays under 38 digits for corpora to ~10⁹ rows
    * at d = 64 (the cast overflows FAIL LOUD past that — production
    * continues with the normalized double iteration, where
    * cross-engine bit-identity is no longer required).
    *
    * Scale shape: the ONE corpus-sized pass is gramMatrix's partial
    * aggregation; everything after runs on the d²-row matrix relation
    * (broadcast hash joins on the axis index). */
  def powerIterationExact(df: DataFrame, vecCol: String, d: Int,
                          scaleBits: Int = 16): DataFrame = {
    val d20 = DecimalType(20, 0)
    val d16 = DecimalType(16, 0)
    val g = gramMatrix(df, vecCol, d, scaleBits)
      .select(col("i"), col("j"), col("dot_q"))
    val full = g.unionAll(g.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("dot_q")))
    val s = full.filter(col("i") === col("j"))
      .orderBy(desc("dot_q"), col("i")).limit(1)
      .select(col("i").as("sp"))
    val v1 = full.join(broadcast(s), full("j") === s("sp"))
      .select(col("i").as("p"), col("dot_q").as("v1"))
    val v2 = full.join(broadcast(v1), full("j") === v1("p"))
      .groupBy(full("i").as("p2"))
      // exact DECIMAL(38,0) internally; emitted as the canonical digit
      // string (sign + plain digits, identical in Spark and DuckDB at
      // scale 0) — the featureDriftFromCounts output-representation
      // rule: DECIMAL(38,0) final columns defeat the gate's hash
      .agg(sum(col("dot_q").cast(d20) * col("v1").cast(d16))
        .cast(DecimalType(38, 0)).cast("string").as("v2"))
    v1.join(v2, v1("p") === v2("p2"))
      .select(col("p").as("i"), col("v1"), col("v2"))
  }

  /** Normalized double power iteration — the PRODUCTION continuation
    * of [[powerIterationExact]] once cross-engine bit-identity stops
    * mattering: the d×d Gram matrix (4096 doubles at d = 64 — bounded
    * algorithm state, the kCenterSelect rule) is collected and
    * iterated driver-side with per-step L2 normalization from the
    * largest-diagonal axis. Deterministic given the exact integer
    * matrix. Returns (eigvec: the unit dominant eigenvector estimate,
    * lambda: its Rayleigh quotient). */
  def powerIterationTop(df: DataFrame, vecCol: String, d: Int,
                        iters: Int = 400,
                        scaleBits: Int = 16): (Array[Double], Double) = {
    require(iters >= 1, s"powerIterationTop: iters >= 1, got $iters")
    val tri = gramMatrix(df, vecCol, d, scaleBits)
      .select(col("i"), col("j"), col("gram")).collect()
    val g = Array.ofDim[Double](d, d)
    tri.foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      g(i)(j) = v; g(j)(i) = v
    }
    val s = (0 until d).maxBy(i => (g(i)(i), -i))
    var v = Array.tabulate(d)(i => if (i == s) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val nv = Array.tabulate(d)(i =>
        (0 until d).map(j => g(i)(j) * v(j)).sum)
      val norm = math.sqrt(nv.map(x => x * x).sum)
      v = if (norm == 0.0) nv else nv.map(_ / norm)
    }
    val gv = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
    val lambda = v.zip(gv).map { case (a, b) => a * b }.sum
    (v, lambda)
  }

  /** 2-D SKYLINE (Pareto frontier, r15): rows not dominated under
    * (minimize `xCol`, maximize `yCol`) — dominance q ≻ p iff
    * q.x ≤ p.x ∧ q.y ≥ p.y with one strict. The production question
    * behind "best price for the size" / "cheapest model above the
    * quality bar" curation screens.
    *
    * The sorted-scan textbook algorithm needs a GLOBAL running max —
    * this is the two-level bounded form instead: (1) bucket by
    * x div bucketWidth; (2) the strictly-earlier-bucket max-y prefix
    * runs over the BUCKET-AGGREGATE relation (bounded by the x range,
    * not the corpus — the shardPack scan rule); (3) the within-bucket
    * strictly-smaller-x max-y is a bucket-PARTITIONED range-frame
    * window; (4) equal-x dominance is an x-partitioned window. A row
    * survives iff no strictly-cheaper row ties-or-beats its y and no
    * equal-x row strictly beats it — exact, including all tie cases,
    * with no unpartitioned corpus-sized window anywhere. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"skyline2D: bucketWidth >= 1, got $bucketWidth")
    val b = df.withColumn("__b", floor(col(xCol) / bucketWidth))
    val bMax = b.groupBy(col("__b")).agg(max(col(yCol)).as("__bmax"))
    // prefix max over STRICTLY earlier buckets: a window over the
    // bounded bucket-aggregate relation (x-range / width rows)
    val overB = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = bMax.withColumn("__pmax", max(col("__bmax")).over(overB))
      .select(col("__b"), col("__pmax"))
    val inB = Window.partitionBy("__b").orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val atX = Window.partitionBy(col(xCol))
    b.join(broadcast(pref), Seq("__b"))
      .withColumn("__lmax", max(col(yCol)).over(inB))
      // greatest() skips nulls: null only when NO strictly-cheaper
      // row exists anywhere (first bucket, first x within it)
      .withColumn("__cheapermax", greatest(col("__pmax"), col("__lmax")))
      .withColumn("__xmax", max(col(yCol)).over(atX))
      // dominated by a strictly-cheaper row with y >= mine, or by an
      // equal-x row with y strictly above mine
      .filter(col("__cheapermax").isNull ||
        col("__cheapermax") < col(yCol))
      .filter(col("__xmax") === col(yCol))
      .drop("__b", "__pmax", "__lmax", "__cheapermax", "__xmax")
  }

  /** EXACT ROC AUC per group, tie-corrected (r15) — the
    * Mann-Whitney U form a model-eval stage runs over billions of
    * scored rows: AUC = (#concordant + ½·#tied) / (P·N), where a
    * pair is concordant when the positive outscores the negative.
    *
    * Never materializes pairs: one aggregation to the per-(group,
    * distinct score) (positives, negatives) relation — bounded by
    * the score domain (quantized scores, e.g. cents), not the corpus
    * — then a group-PARTITIONED prefix window over distinct scores
    * gives negatives-strictly-below, and
    * 2·#conc + #tied = Σ_s p_s·(2·negBelow_s + n_s), an exact
    * DECIMAL(38,0) sum (overflow-proof: P·N at 10¹² rows is 10²⁴).
    * One IEEE division at the end. `scoreCol` must already be an
    * exact integer (quantize doubles to cents first — the repo-wide
    * idiom); `labelCol` is 0/1. */
  def rocAuc(df: DataFrame, groupCol: String, labelCol: Column,
             scoreCol: Column): DataFrame = {
    val d38 = DecimalType(38, 0)
    val d19 = DecimalType(19, 0)
    val perScore = df
      .select(col(groupCol), scoreCol.cast("long").as("s"),
        labelCol.cast("long").as("y"))
      .groupBy(col(groupCol), col("s"))
      .agg(sum(col("y")).as("p"),
        (count(lit(1)) - sum(col("y"))).as("m"))
    val below = Window.partitionBy(col(groupCol)).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("nb", coalesce(sum(col("m")).over(below), lit(0L)))
      .groupBy(col(groupCol))
      .agg(
        sum(col("p")).as("pos"),
        sum(col("m")).as("neg"),
        sum((col("p").cast(d19) *
          (lit(2) * col("nb") + col("m")).cast(d19)).cast(d38)).as("num2"))
      .select(col(groupCol), col("pos"), col("neg"),
        // fixed IEEE chain on the exact totals, mirrored in the
        // oracle: num2/2/P/N — no float product wide enough to lose
        // bits before the divides
        (col("num2").cast("double") / lit(2.0d) /
          col("pos").cast("double") / col("neg").cast("double"))
          .as("auc"))
  }

  /** lcm(1..20) — every reciprocal 1/r with r ≤ 20 becomes the exact
    * integer RANK_LCM/r, so AP and reciprocal-rank sums stay in
    * integer space until one final division. */
  val RANK_LCM: Long = 232792560L

  /** INTEGER-EXACT ranking eval per query: AP@k and MRR@k (r15) —
    * the retrieval-eval pass a RAG/search pipeline runs per model
    * checkpoint. Standard AP@k needs Σ (hits@i / i), a float sum
    * whose order engines disagree on; here each reciprocal is scaled
    * by lcm(1..20) into an exact integer, the per-query sum is an
    * integer aggregate, and ONE IEEE division forms the statistic —
    * bit-identical on any engine, any partitioning.
    *
    * ap@k = Σ_{relevant i ≤ k} (hits@i · LCM/i) / (LCM · min(R, k)),
    * mrr@k = (LCM / firstHitRank) / LCM; R = query's total relevant
    * count over ALL its items (not just top-k). Queries with R = 0
    * emit NULL metrics (no relevant item exists — undefined, not
    * zero). Ranks are row_number over (score desc, tieCol), a total
    * order; all windows partition by the query key. Requires
    * 1 ≤ k ≤ 20. */
  def rankingEval(df: DataFrame, queryCol: String, scoreCol: Column,
                  tieCol: Column, relCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"rankingEval: 1 <= k <= 20, got $k")
    val byQ = Window.partitionBy(col(queryCol))
    val ord = byQ.orderBy(col("sc").desc, col("tb"))
    val ranked = df
      .select(col(queryCol), scoreCol.as("sc"), tieCol.as("tb"),
        relCol.cast("long").as("rel"))
      .withColumn("r_total", sum(col("rel")).over(byQ))
      .withColumn("rank", row_number().over(ord).cast("long"))
      .filter(col("rank") <= k)
    val cum = byQ.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked
      .withColumn("hits", sum(col("rel")).over(cum))
      .groupBy(col(queryCol))
      .agg(
        max(col("r_total")).as("r_total"),
        // LCM div rank is EXACT (rank ≤ 20 divides the lcm); the sum
        // is a pure long aggregate — no float until the final division
        sum(when(col("rel") === 1,
          col("hits") * expr(s"$RANK_LCM div rank"))).as("ap_num"),
        min(when(col("rel") === 1, col("rank"))).as("first_hit"))
      .select(col(queryCol), col("r_total"),
        (col("ap_num").cast("double") /
          (lit(RANK_LCM) * least(col("r_total"), lit(k.toLong)))
            .cast("double")).as("ap_k"),
        (expr(s"$RANK_LCM div first_hit").cast("double") /
          lit(RANK_LCM).cast("double")).as("rr_k"))
  }

  /** TWO-SAMPLE KOLMOGOROV-SMIRNOV DISTANCE per group (r15) — "did
    * this feature's distribution shift between populations A and B?"
    * with the exact statistic, not a binned approximation:
    * D = max over observed values v of |F_A(v) − F_B(v)|.
    *
    * One aggregation to per-(group, distinct value) side counts,
    * one group-PARTITIONED prefix window for the two running counts,
    * and the max runs over |cumA·tB − cumB·tA| — an exact integer
    * cross-multiplication (DECIMAL(38,0), overflow-proof), so the
    * max is decided in integer space; ONE IEEE division forms D.
    * `valueCol` must be an exact integer (quantize to cents first);
    * `sideCol` is 0 (population A) / 1 (population B). */
  def ksTest(df: DataFrame, groupCol: String, valueCol: Column,
             sideCol: Column): DataFrame =
    ksFromCounts(
      df.select(col(groupCol).as("g"), valueCol.cast("long").as("v"),
          sideCol.cast("long").as("side"))
        .groupBy(col("g"), col("v"))
        .agg(sum(lit(1L) - col("side")).as("ca"),
          sum(col("side")).as("cb")))
      .withColumnRenamed("g", groupCol)

  /** [[ksTest]] over PRE-COUNTED (g, v, ca, cb) fragments — the
    * incremental face (r15, the cusumFromDaily pattern): per-value
    * side counts are additive, so streaming batches / lake commits
    * contribute fragments independently and this read-side merge
    * reproduces the batch statistic BIT-EXACTLY. `ksTest` itself
    * delegates here, so the paths cannot drift. */
  def ksFromCounts(frags: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    val d19 = DecimalType(19, 0)
    val perV = frags.groupBy(col("g"), col("v"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val run = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col("g"))
    perV
      .withColumn("cumA", sum(col("ca")).over(run))
      .withColumn("cumB", sum(col("cb")).over(run))
      .withColumn("ta", sum(col("ca")).over(tot))
      .withColumn("tb", sum(col("cb")).over(tot))
      .groupBy(col("g"))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        max(abs((col("cumA").cast(d19) * col("tb").cast(d19)).cast(d38) -
          (col("cumB").cast(d19) * col("ta").cast(d19)).cast(d38)))
          .as("dnum"))
      .select(col("g"), col("n_a"), col("n_b"),
        (col("dnum").cast("double") /
          (col("n_a").cast(d19) * col("n_b").cast(d19)).cast(d38)
            .cast("double")).as("ks"))
  }

  /** CALIBRATION / RELIABILITY BINS + Brier score (r15): does a
    * model's predicted probability match the observed rate? Scores
    * arrive as exact permille integers (0..999 — quantize upstream,
    * the cents idiom); rows bucket into `bins` equal-width bins, and
    * each bin reports mean prediction, empirical positive rate,
    * |gap|, and the bin's Brier score Σ(p − y)²/n — all sums exact
    * integers (DECIMAL(38,0)), three IEEE divisions + one subtract
    * at the end. One map-side-combinable aggregation; the shuffle
    * carries `bins` rows. */
  def calibrationBins(df: DataFrame, pPermilleCol: Column,
                      labelCol: Column, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 1000,
      s"calibrationBins: 2 <= bins <= 1000, got $bins")
    val d38 = DecimalType(38, 0)
    val d19 = DecimalType(19, 0)
    df.select(pPermilleCol.cast("long").as("p"),
        labelCol.cast("long").as("y"))
      .withColumn("bin", expr(s"p * $bins div 1000"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("pos"),
        sum(col("p").cast(d38)).as("sp"),
        sum(((col("p") - lit(1000L) * col("y")).cast(d19) *
          (col("p") - lit(1000L) * col("y")).cast(d19)).cast(d38))
          .as("ssq"))
      .select(col("bin"), col("n"), col("pos"),
        (col("sp").cast("double") /
          (col("n") * lit(1000L)).cast("double")).as("mean_pred"),
        (col("pos").cast("double") / col("n").cast("double")).as("rate"),
        abs((col("sp").cast("double") /
            (col("n") * lit(1000L)).cast("double")) -
          (col("pos").cast("double") / col("n").cast("double")))
          .as("gap"),
        (col("ssq").cast("double") /
          (col("n") * lit(1000000L)).cast("double")).as("brier"))
  }

  /** THEIL-SEN ROBUST TREND (r15) — the median-of-pairwise-slopes
    * estimator over the per-group daily series: up to ~29% of the
    * days can be corrupted (spikes, outages, backfill glitches)
    * without moving the fitted trend, where OLS (q258's family) bends
    * to a single bad day. The slope set is every day pair's
    * (x₂−x₁)/(d₂−d₁); the estimate is the LOWER MEDIAN by (slope,
    * d1, d2) order — each slope is ONE exactly-rounded IEEE division
    * of exact integers, so the ordering (and therefore the pick) is
    * engine-identical with no quantization step at all. The intercept
    * is the lower median of x − slope·day (again one mul + one sub,
    * both exactly rounded).
    *
    * Scale shape: pairs live on the DAILY grid — |days|² per group
    * (a year is ~66k pairs), never corpus² — and the rank windows
    * partition by group over that bounded pair relation (the
    * [[madAnomalyDaily]] bounded-series stance). */
  def theilSenDaily(ev: DataFrame, groupCol: String = "event_type",
                    tsCol: String = "ts"): DataFrame = {
    val grid = EventAnalytics.resampleDaily(ev, groupCol, tsCol)
      .select(col(groupCol).as("g"), col("day"), col("n").as("x"))
      .localCheckpoint(true)
    val pairs = grid.alias("a").join(grid.alias("b"),
        col("a.g") === col("b.g") && col("a.day") < col("b.day"))
      .select(col("a.g").as("g"), col("a.day").as("d1"),
        col("b.day").as("d2"),
        ((col("b.x") - col("a.x")).cast("double") /
          (col("b.day") - col("a.day")).cast("double")).as("slope"))
    val wS = Window.partitionBy(col("g"))
      .orderBy(col("slope"), col("d1"), col("d2"))
    val np = pairs.groupBy(col("g")).agg(count(lit(1)).as("n_pairs"))
    val med = pairs.withColumn("rk", row_number().over(wS).cast("long"))
      .join(np, Seq("g"))
      .filter(col("rk") === expr("(n_pairs + 1) div 2"))
      .select(col("g"), col("n_pairs"), col("slope"))
    val nd = grid.groupBy(col("g")).agg(count(lit(1)).as("n_days"))
    val wB = Window.partitionBy(col("g")).orderBy(col("b"), col("day"))
    grid.join(med, Seq("g"))
      .withColumn("b", col("x").cast("double")
        - col("slope") * col("day").cast("double"))
      .withColumn("rkb", row_number().over(wB).cast("long"))
      .join(nd, Seq("g"))
      .filter(col("rkb") === expr("(n_days + 1) div 2"))
      .select(col("g").as(groupCol), col("n_pairs"), col("n_days"),
        col("slope"), col("b").as("intercept"))
  }

  /** TWO-PROPORTION Z-TEST (r15) — the A/B significance gate: did
    * cohort 1 convert at a different rate than cohort 0? Pooled
    * z = (p₁−p₀)/√(p̄(1−p̄)(1/n₀+1/n₁)) over per-cohort distinct
    * users and distinct converters. Every input is an exact integer
    * count; the statistic is a SHORT fixed chain of exactly-rounded
    * IEEE ops (divisions, one sqrt — sqrt is correctly rounded by
    * the standard) mirrored token-for-token in the oracle, so even
    * the z-score itself hash-matches. `cohortCol` must be a pure
    * function of the user id (a user sits in one cohort); a
    * converter is a user with >= `minConvEvents` events of
    * `convType`. Degenerate splits (p̄ ∈ {0, 1} → se = 0) yield a
    * NULL z rather than 0/0 — engines genuinely disagree on x/0.0,
    * the q230 zero-variance rule. */
  def twoProportionZ(ev: DataFrame, cohortCol: Column,
                     userCol: String = "user_id",
                     convType: String = "purchase",
                     typeCol: String = "event_type",
                     minConvEvents: Long = 1L): DataFrame = {
    val users = ev.select(col(userCol).as("u"),
      cohortCol.cast("long").as("c")).distinct()
    val conv = ev.filter(col(typeCol) === convType)
      .groupBy(col(userCol).as("u"))
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") >= minConvEvents)
      .select(col("u")).withColumn("is_c", lit(1L))
    val agg = users.join(conv, Seq("u"), "left")
      .groupBy(col("c"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("is_c"), lit(0L))).as("x"))
    val d = (c: Column) => c.cast("double")
    val r = agg.agg(
      max(when(col("c") === 0, col("n"))).as("n0"),
      max(when(col("c") === 0, col("x"))).as("x0"),
      max(when(col("c") === 1, col("n"))).as("n1"),
      max(when(col("c") === 1, col("x"))).as("x1"))
    val p0 = d(col("x0")) / d(col("n0"))
    val p1 = d(col("x1")) / d(col("n1"))
    val p = d(col("x0") + col("x1")) / d(col("n0") + col("n1"))
    val se = sqrt((p * (lit(1.0d) - p)) *
      (lit(1.0d) / d(col("n0")) + lit(1.0d) / d(col("n1"))))
    val z = when(se > lit(0.0d), (p1 - p0) / se)
    r.select(col("n0"), col("x0"), col("n1"), col("x1"),
      z.as("z"), when(se > lit(0.0d), abs(z) > lit(1.96d)).as("significant"))
  }

  /** DELETE-1 JACKKNIFE STANDARD ERROR for a RATIO metric (r15) —
    * the uncertainty a dashboard needs on Σa/Σb numbers (share of
    * value from a segment, revenue per session, CTR), where the
    * naive binomial SE is wrong because both numerator and
    * denominator are random. Per group: every row's leave-one-out
    * replicate r₍₋ᵢ₎ = (Σa−aᵢ)/(Σb−bᵢ) is ONE exactly-rounded IEEE
    * division of exact integer sums (identical in any engine);
    * replicates are then QUANTIZED at 1e-6 (floor of a deterministic
    * double — no rounding-mode dependence; the widths keep every
    * decimal product inside both engines' 38-digit cap) so their
    * first two moments accumulate in exact decimals, and the
    * jackknife SE √(((n·Σr²−(Σr)²)/n²)·((n−1)/n)) is one short
    * mirrored chain.
    *
    * Scale shape: two passes — a per-group sum aggregate joined back
    * (broadcast; groups are bounded), then one map + the moment
    * aggregate. No windows, no sorting, no replicate materialized
    * beyond its row. Rows where the leave-one-out denominator hits 0
    * yield NULL replicates (excluded, reported via n_eff). The
    * decimal width budget (Σrq² < 10²⁸, n_eff < 10¹⁰) is enforced
    * LOUDLY in-plan — outside it the engines' overflow behaviors
    * diverge (silent NULL vs error), so the bound is a named
    * contract, not an engine artifact. */
  def jackknifeRatio(df: DataFrame, groupCol: String,
                     aCol: Column, bCol: Column): DataFrame = {
    val d38 = DecimalType(38, 0)
    val base = df.select(col(groupCol).as("g"),
      aCol.cast("long").as("a"), bCol.cast("long").as("b"))
    val sums = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("a")).as("sa"),
        sum(col("b")).as("sb"))
    val d19 = DecimalType(19, 0)
    val withR = base.join(broadcast(sums), Seq("g"))
      .withColumn("r", when(col("sb") - col("b") > 0,
        (col("sa") - col("a")).cast("double") /
          (col("sb") - col("b")).cast("double")))
      .withColumn("rq", floor(col("r") * lit(1e6d)).cast(d19))
    val m = withR.groupBy(col("g"))
      .agg(max(col("n")).as("n"), max(col("sa")).as("sa"),
        max(col("sb")).as("sb"),
        count(col("rq")).as("n_eff"),
        sum(col("rq")).as("s1"),
        sum((col("rq") * col("rq")).cast(d38)).as("s2"))
    val nD = col("n_eff").cast("double")
    // Overflow guard (ADVICE r15): the (28,0)×(10,0) product budget
    // needs Σrq² < 10²⁸ and n_eff < 10¹⁰ — past either (|rq| ~ 10⁹ at
    // ratio ~ 10³ quantized 1e-6, or >10¹⁰ rows in one group) the
    // down-cast would overflow, where Spark and DuckDB diverge (silent
    // NULL vs error). Fail LOUDLY with the named contract instead of
    // an engine artifact; callers with wider inputs must rescale the
    // quantization.
    val s2In = when(col("s2") < lit(BigDecimal("1e28")).cast(d38),
        col("s2").cast(DecimalType(28, 0)))
      .otherwise(raise_error(concat(
        lit("jackknifeRatio: sum(rq^2) exceeds the 28-digit budget for group "),
        col("g").cast("string"))))
    val nIn = when(col("n_eff") < lit(10000000000L),
        col("n_eff").cast(DecimalType(10, 0)))
      .otherwise(raise_error(concat(
        lit("jackknifeRatio: n_eff exceeds the 10-digit budget for group "),
        col("g").cast("string"))))
    val num = s2In.multiply(nIn)
      .minus(col("s1").cast(d19).multiply(col("s1").cast(d19)))
    m.select(col("g").as(groupCol), col("n"), col("n_eff"),
      (col("sa").cast("double") / col("sb").cast("double")).as("ratio"),
      when(col("n_eff") > 1,
        sqrt((num.cast("double") / (nD * nD)) *
          ((nD - lit(1.0d)) / nD)) / lit(1e6d)).as("jack_se"))
  }

  /** TOP-K + OTHER ROLLUP (r15) — the cardinality-capped report every
    * dashboard tile runs ("top 8 segments, everything else as
    * OTHER"): per-key counts and exact DECIMAL value totals, the top
    * k keys by (count desc, key asc), and one OTHER row folding the
    * tail EXACTLY (totals stay decimal until the single output cast,
    * so OTHER's sum is order-independent). The per-key relation is
    * key-domain-bounded; the top-k is a TakeOrdered, never a global
    * sort. */
  def topKOther(df: DataFrame, keyCol: Column, valueCol: Column,
                k: Int, labelPrefix: String = "k="): DataFrame = {
    require(k >= 1, s"topKOther: k must be >= 1, got $k")
    val counts = df.select(keyCol.cast("long").as("key"),
        valueCol.cast(DecimalType(18, 2)).as("v"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
    val top = counts.orderBy(desc("n"), col("key")).limit(k)
      .localCheckpoint(true)
    val other = counts.join(top.select(col("key")), Seq("key"), "left_anti")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        sum(col("tot")).as("tot"))
      .select(lit("other").as("key_label"), col("n"),
        coalesce(col("tot").cast("double"), lit(0.0d)).as("total"))
    // lpad TRUNCATES past its length — keys ≥ 100 or ≤ −10 would
    // silently collapse to one 2-char label (ADVICE r15); pad only
    // when the key is shorter than the pad width
    val ks = col("key").cast("string")
    top.select(
        concat(lit(labelPrefix),
          when(length(ks) < 2, lpad(ks, 2, "0")).otherwise(ks))
          .as("key_label"),
        col("n"), col("tot").cast("double").as("total"))
      .unionByName(other.filter(col("n") > 0))
  }

  /** EXACT GINI COEFFICIENT per group (r16) — the inequality /
    * concentration number a data-mix report carries ("how skewed is
    * token volume across sources"), in the rank-sum form
    * G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over non-negative integer
    * values: ranks come from [[rankInGroup]]'s bucketed two-level
    * scan (never a corpus-sized single-key window — the q262 rule),
    * every sum is exact decimal (i ≤ 10¹⁰ as DECIMAL(11,0), x ≤ 10¹⁴
    * cents as DECIMAL(14,0), products (25,0), sums (38,0)), and the
    * statistic is one short mirrored IEEE chain on the exact totals.
    * With duplicate values the (value, tie) total order makes the
    * rank assignment deterministic, and G is tie-order-invariant
    * because equal x share any permutation of their ranks' sum.
    * All-zero groups yield NULL (0/0 is an engine disagreement, the
    * q230 rule). [[keySkew]] is the sibling for KEY-FREQUENCY
    * inequality (it ranks the per-key count relation, already
    * bounded); this one ranks RAW ROWS, hence the bucketed rank. */
  def giniExact(df: DataFrame, groupCol: String, valueC: Column,
                tieC: Column, bucketWidth: Double = 10000.0): DataFrame = {
    val d38 = DecimalType(38, 0)
    val base = df.select(col(groupCol), valueC.cast("long").as("__x"),
      tieC.as("__tie"))
    val ranked = rankInGroup(base, groupCol, col("__x"), col("__tie"),
      "__r", bucketWidth)
    // width budget mirrors the oracle under DuckDB's HARD multiply cap
    // (p1+p2 <= 38, it ERRORS past it — the q292 lesson): the 2·i·x
    // term is built per row ((12,0)×(14,0) = (27,0)) so no (38,0)
    // operand is ever multiplied; Σx is down-cast to (27,0) (loud on
    // overflow) so (n+1)·Σx is (11,0)×(27,0) = exactly the cap
    val g = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__x").cast(DecimalType(14, 0)))
        .cast(DecimalType(27, 0)).as("sx"),
      sum(((col("__r") * lit(2L)).cast(DecimalType(12, 0)) *
        col("__x").cast(DecimalType(14, 0))).cast(d38)).as("srx2"))
    val num = col("srx2").cast(d38) -
      ((col("n") + lit(1L)).cast(DecimalType(11, 0)) * col("sx")).cast(d38)
    val den = col("n").cast(DecimalType(11, 0)) * col("sx")
    g.select(col(groupCol), col("n"),
      col("sx").cast("string").as("sum_x"),
      when(col("sx") > 0,
        num.cast("double") / den.cast("double")).as("gini"))
  }

  /** EXACT TRIMMED MEAN per group (r16) — the robust location number
    * for value columns with heavy tails: drop the lowest and highest
    * ⌊n·num/den⌋ observations BY RANK (deterministic (value, tie)
    * total order) and average the exact remainder. Ranks ride
    * [[rankInGroup]] (bucketed two-level, never a group-sized window
    * partition); the trim count is pure integer arithmetic, the kept
    * sum an exact decimal, the mean one mirrored IEEE division. */
  def trimmedMean(df: DataFrame, groupCol: String, valueC: Column,
                  tieC: Column, trimNum: Int = 1, trimDen: Int = 10,
                  bucketWidth: Double = 10000.0): DataFrame = {
    require(trimNum >= 0 && trimDen > 0 && 2 * trimNum < trimDen,
      s"trimmedMean: trim fraction must be in [0, 1/2): $trimNum/$trimDen")
    val d38 = DecimalType(38, 0)
    val base = df.select(col(groupCol), valueC.cast("long").as("__x"),
      tieC.as("__tie"))
    val ranked = rankInGroup(base, groupCol, col("__x"), col("__tie"),
      "__r", bucketWidth)
    val counts = ranked.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val k = expr(s"(__n * $trimNum) div $trimDen")
    ranked.join(broadcast(counts), Seq(groupCol))
      .withColumn("__k", k)
      .filter(col("__r") > col("__k") && col("__r") <= col("__n") - col("__k"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("__x").cast(d38)).as("__s"))
      .select(col(groupCol), col("n_kept"),
        (col("__s").cast("double") / col("n_kept").cast("double"))
          .as("trimmed_mean"))
  }

  /** EXACT PER-GROUP MODE (r16) — the most frequent value with a
    * deterministic tie rule (highest count, then smallest value): a
    * per-(group, value) count aggregate, then a rank over that
    * AGGREGATE relation (bounded by the distinct-value domain, never
    * the corpus — the R15cSpec window contract). */
  def modeBy(df: DataFrame, groupCol: String, valueC: Column): DataFrame =
    modeFromCounts(
      df.select(col(groupCol), valueC.as("value"))
        .groupBy(col(groupCol), col("value"))
        .agg(count(lit(1)).as("c")),
      groupCol)

  /** NAMED DOMAIN BUDGET for the `FromCounts` histogram folds
    * (VERDICT r16 watch item → r17): these folds window-partition by
    * the group key over the merged VALUE-HISTOGRAM relation, which is
    * scale-safe ONLY while the value domain is bounded (the R15c
    * window contract — cents quantization keeps per-group distinct
    * values ≤ ~10⁷ at any corpus size). A caller feeding an
    * UNQUANTIZED high-cardinality value column would silently funnel
    * a distinct-value-sized partition through one window sort —
    * instead, the merged histogram's per-group distinct-value count
    * is checked against the budget (one group-bounded aggregate +
    * broadcast join, evaluated BEFORE the window stage) and the
    * violation fails loud with this named contract, the
    * [[jackknifeRatio]] `raise_error` pattern. */
  private def guardedHistogram(merged: DataFrame, groupCol: String,
                               domainBudget: Long, who: String): DataFrame = {
    require(domainBudget >= 1, s"$who: domainBudget must be >= 1")
    // NULL value rows would sort FIRST on Spark but LAST in DuckDB —
    // the window prefix sums would silently diverge across engines
    // rather than fail (ADVICE r17); the folds' value column is a
    // quantized measure, so a NULL is an upstream bug, not data
    val nullGuarded = merged.withColumn("value",
      when(col("value").isNotNull, col("value"))
        .otherwise(raise_error(lit(s"$who: NULL value row in the " +
          "histogram — NULL sort order diverges across engines " +
          "(Spark nulls-first, DuckDB nulls-last); filter or " +
          "coalesce the value column upstream"))))
    val dv = nullGuarded.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__dv"))
    nullGuarded.join(broadcast(dv), Seq(groupCol))
      .withColumn("__guard",
        when(col("__dv") <= domainBudget, lit(1))
          .otherwise(raise_error(concat(
            lit(s"$who: per-group distinct-value count exceeds the " +
              s"histogram domain budget ($domainBudget) for group "),
            col(groupCol).cast("string"),
            lit(" — quantize the value column; the FromCounts folds " +
              "rank the HISTOGRAM, so its per-group size must be " +
              "value-domain bounded")))))
      .filter(col("__guard") === 1)
      .drop("__dv", "__guard")
  }

  /** [[modeBy]] over pre-counted (group, value, c) fragments —
    * additive (duplicate (group, value) rows sum first), so per-batch
    * value counts committed by a streaming drain fold to the one-shot
    * mode bit-exactly. Input columns: `value`, `c`. Per-group
    * distinct values must fit `domainBudget` ([[guardedHistogram]] —
    * fails loud otherwise). */
  def modeFromCounts(frags: DataFrame, groupCol: String,
                     domainBudget: Long = 10000000L): DataFrame = {
    val counts = guardedHistogram(
      frags.groupBy(col(groupCol), col("value"))
        .agg(sum(col("c")).cast("long").as("n")),
      groupCol, domainBudget, "modeFromCounts")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(desc("n"), col("value"))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col("value").as("mode"), col("n"))
  }

  /** [[giniExact]] over pre-counted (group, value, c) HISTOGRAM
    * fragments — the additive face: with distinct values sorted per
    * group, a tied block of count c starting after `lo` earlier rows
    * occupies ranks lo+1..lo+c, so its rank-weighted contribution is
    * 2·v·(c·lo + c(c+1)/2) in closed form — the whole Gini reduces to
    * prefix sums over the VALUE-HISTOGRAM relation (aggregate-sized,
    * never the corpus), making per-batch (group, value, c) count
    * commits fold to the one-shot [[giniExact]] BIT-EXACTLY (pinned
    * in R16Spec). Input columns: `value` (non-negative long), `c`.
    * Per-group distinct values must fit `domainBudget`
    * ([[guardedHistogram]] — fails loud otherwise). */
  def giniFromCounts(frags: DataFrame, groupCol: String,
                     domainBudget: Long = 10000000L): DataFrame = {
    val d38 = DecimalType(38, 0)
    val merged = guardedHistogram(
      frags.groupBy(col(groupCol), col("value"))
        .agg(sum(col("c")).cast("long").as("__c")),
      groupCol, domainBudget, "giniFromCounts")
    // prefix count of earlier rows, over the histogram aggregate
    val w = Window.partitionBy(col(groupCol)).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLo = merged
      .withColumn("__lo", coalesce(sum(col("__c")).over(w), lit(0L)))
    // per-block Σ2·i·x = v·(2c·lo + c(c+1)) — division-free integer
    // algebra; widths: the doubled rank sum ≤ 2n² as (22,0), v (14,0)
    // → product (36,0), inside both engines' multiply caps
    val rankSum2 = ((col("__c") * lit(2L)).cast(DecimalType(11, 0)) *
      col("__lo").cast(DecimalType(10, 0))).cast(DecimalType(22, 0)) +
      (col("__c").cast(DecimalType(10, 0)) *
        (col("__c") + lit(1L)).cast(DecimalType(11, 0)))
        .cast(DecimalType(22, 0))
    val g = withLo.groupBy(col(groupCol)).agg(
      sum(col("__c")).cast("long").as("n"),
      sum((col("__c").cast(DecimalType(10, 0)) *
        col("value").cast(DecimalType(14, 0))).cast(DecimalType(24, 0)))
        .cast(DecimalType(27, 0)).as("sx"),
      sum((col("value").cast(DecimalType(14, 0)) * rankSum2)
        .cast(d38)).as("srx2"))
    val num = col("srx2").cast(d38) -
      ((col("n") + lit(1L)).cast(DecimalType(11, 0)) * col("sx")).cast(d38)
    val den = col("n").cast(DecimalType(11, 0)) * col("sx")
    g.select(col(groupCol), col("n"),
      col("sx").cast("string").as("sum_x"),
      when(col("sx") > 0,
        num.cast("double") / den.cast("double")).as("gini"))
  }

  /** DECILE ORDER STATISTICS from additive (group, value, c)
    * HISTOGRAM fragments (r16) — the streaming face of the Q–Q
    * thresholds: the merged histogram's running count locates the
    * value whose tied block covers rank ⌊d(n+1)/10⌋ for d = 1..9,
    * identical to ranking raw rows (an order statistic depends only
    * on the value multiset). The window and the range-residual join
    * run over the HISTOGRAM aggregate (distinct values — bounded by
    * the value domain, e.g. ~10⁷ cents buckets at any corpus size),
    * never raw rows; per-batch count commits fold bit-exactly.
    * Per-group distinct values must fit `domainBudget`
    * ([[guardedHistogram]] — fails loud otherwise). */
  def decilesFromCounts(frags: DataFrame, groupCol: String,
                        domainBudget: Long = 10000000L): DataFrame = {
    val merged = guardedHistogram(
      frags.groupBy(col(groupCol), col("value"))
        .agg(sum(col("c")).cast("long").as("__c")),
      groupCol, domainBudget, "decilesFromCounts")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = merged.withColumn("__cum", sum(col("__c")).over(w).cast("long"))
    val counts = merged.groupBy(col(groupCol))
      .agg(sum(col("__c")).cast("long").as("n"))
    val targets = counts
      .withColumn("decile", explode(array((1 to 9).map(i => lit(i.toLong)): _*)))
      .withColumn("rk", expr("greatest(1L, (decile * (n + 1)) div 10)"))
      .select(col(groupCol).as("__tg"), col("decile"), col("rk"))
    cum.join(targets, col(groupCol) === col("__tg") &&
        col("__cum") - col("__c") < col("rk") && col("rk") <= col("__cum"))
      .select(col(groupCol), col("decile"), col("value").as("q"))
  }

  /** FANO FACTOR (variance-to-mean ratio) per group from (group,
    * value, c) HISTOGRAM fragments (r19) — the DISPERSION scalar next
    * to [[decilesFromCounts]]' shape readout: ≈1 reads Poisson, ≫1
    * reads bursty/clumped. Pure sums over the histogram (no window,
    * so no domain budget needed): n = Σc, sv = Σ v·c, sv2 = Σ v²·c,
    * all decimal-exact, numerator n·sv2 − sv² emitted as digit
    * strings (the q368 vmr chain, generalized to a reusable fold) and
    * ONE mirrored IEEE division at the end. Fragments are ADDITIVE,
    * so streaming folds ride the same path. Width budget, enforced
    * loud: |value| < 10⁷ and Σc ≤ 10¹² per group, so n·sv2 ≤ 10³⁸
    * sits exactly at the DECIMAL(38,0) cap and sv² at DECIMAL(38,0)
    * (sv ≤ 10¹⁹). NULL values fail loud (the guardedHistogram NULL
    * discipline — Spark sorts nulls first, DuckDB last). */
  def fanoFromCounts(frags: DataFrame, groupCol: String): DataFrame = {
    val d12 = DecimalType(12, 0)
    val d14 = DecimalType(14, 0)
    val d19 = DecimalType(19, 0)
    val d26 = DecimalType(26, 0)
    val d38 = DecimalType(38, 0)
    val guarded = frags.withColumn("value",
      when(col("value").isNull, raise_error(lit(
        "fanoFromCounts: NULL value row in the histogram — NULL sort " +
          "order diverges across engines; filter or coalesce the " +
          "value column upstream")))
        // two-sided compare, NOT abs(): abs(Long.MinValue) overflows
        // (ANSI off) back to a negative and would bypass this gate —
        // the row would still die on the null gate below, but with the
        // wrong named error (ADVICE r19)
        .when(col("value") <= -10000000L || col("value") >= 10000000L,
          raise_error(concat(
          lit("fanoFromCounts: |value| exceeds the 10^7 width budget ("),
          col("value").cast("string"),
          lit(") — n·sv2 must fit DECIMAL(38,0); rescale the " +
            "quantization"))))
        .otherwise(col("value")))
    val d7 = DecimalType(7, 0)
    val d20 = DecimalType(20, 0)
    // WIDE first pass (every per-row product and per-group sum fits
    // its width for ANY long-typed c: c ≤ 9.3·10¹⁸ ⇒ v·c < 10²⁶ ⊂ D27,
    // v²·c < 10³³ ⊂ D34), THEN the budget gate — summing in the final
    // widths directly would silently NULL past them (GraftSession runs
    // ANSI off; Spark decimal overflow is a silent NULL while the
    // mirrored DuckDB cast errors — the engine/oracle-divergence class
    // this fold must fail loud on, review finding r19)
    val wide = guarded.groupBy(col(groupCol)).agg(
      sum(col("c").cast(d20)).as("__n0"),
      sum((col("value").cast(d7) * col("c").cast(d20))
        .cast(DecimalType(27, 0))).as("__sv0"),
      sum(((col("value").cast(d7) * col("value").cast(d7)).cast(d14) *
        col("c").cast(d20)).cast(DecimalType(34, 0))).as("__sv20"))
    val inBudget = wide.withColumn("__ok",
      when(col("__n0").isNotNull && col("__sv0").isNotNull &&
          col("__sv20").isNotNull && col("__n0") < lit(1000000000000L),
        lit(1))
        .otherwise(raise_error(concat(
          lit("fanoFromCounts: per-group count exceeds the 10^12 " +
            "width budget (or a wide sum overflowed) for group "),
          col(groupCol).cast("string"),
          lit(" — n·sv2 must fit DECIMAL(38,0); shard the group or " +
            "rescale the quantization")))))
      .filter(col("__ok") === 1)
      // safe downcasts under the gate: n < 10¹², |v| < 10⁷ ⇒
      // |sv| < 10¹⁹ ⊂ D19 and sv2 < 10²⁶ ⊂ D26
      .select(col(groupCol), col("__n0").cast(d12).as("__n"),
        col("__sv0").cast(d19).as("__sv"),
        col("__sv20").cast(d26).as("__sv2"))
    inBudget.select(col(groupCol),
      col("__n").cast("long").as("n"),
      ((col("__n") * col("__sv2")).cast(d38) -
        (col("__sv") * col("__sv")).cast(d38))
        .cast("string").as("vmr_num"),
      when((col("__n") * col("__sv")).cast(DecimalType(31, 0)) > 0,
        ((col("__n") * col("__sv2")).cast(d38) -
          (col("__sv") * col("__sv")).cast(d38)).cast("double") /
          (col("__n") * col("__sv")).cast(DecimalType(31, 0))
            .cast("double"))
        .as("vmr"))
  }

  /** Fail-loud side indicator for the two-sample statistics (r18,
    * ADVICE r17): the documented contract is "1 = side A, 0 = side B"
    * — silently bucketing NULL or any other value into side B shifted
    * counts instead of failing, inconsistent with the named-contract
    * discipline ([[guardedHistogram]], [[jackknifeRatio]]). */
  private def guardedSide(sideC: Column, who: String): Column = {
    val s = sideC.cast("long")
    when(s === 1L, 1L).when(s === 0L, 0L)
      .otherwise(raise_error(concat(
        lit(s"$who: sideC must be 1 (side A) or 0 (side B), got "),
        coalesce(sideC.cast("string"), lit("NULL")))))
  }

  /** MANN–WHITNEY U (Wilcoxon rank-sum) per stratum (r17) — the
    * nonparametric two-sample location test an A/B readout runs when
    * the value distribution is skewed: does side A draw from the same
    * distribution as side B. Midrank (tie-aware) algebra over the
    * merged VALUE HISTOGRAM, never raw rows: with `lo` rows before a
    * tied block of c = ca + cb rows, the block's doubled midrank is
    * 2·lo + c + 1, so 2·R_A = Σ ca·(2lo+c+1) and 2·U_A = 2R_A −
    * na(na+1) stay exact integers (half-integer U values never round).
    * The tie-corrected normal approximation
    * Var = na·nb·[(n+1)n(n−1) − Σ(c³−c)] / (12n(n−1)) is formed from
    * EXACT decimal totals cast to double once, then one fixed IEEE
    * tree (mirrored token-for-token in the oracle); degenerate strata
    * (one side empty, or all values tied) yield NULL z. `sideC` must
    * be 1 (side A) or 0 (side B) — any other value (including NULL)
    * fails loud ([[guardedSide]]) instead of silently bucketing into
    * side B (ADVICE r17). */
  def mannWhitneyU(df: DataFrame, strataCol: String, sideC: Column,
                   valueC: Column): DataFrame =
    mannWhitneyFromCounts(
      df.select(col(strataCol), guardedSide(sideC, "mannWhitneyU").as("__s"),
          valueC.cast("long").as("value"))
        .groupBy(col(strataCol), col("value"))
        .agg(sum(when(col("__s") === 1, 1L).otherwise(0L)).as("ca"),
          sum(when(col("__s") === 1, 0L).otherwise(1L)).as("cb")),
      strataCol)

  /** [[mannWhitneyU]] over pre-counted (stratum, value, ca, cb)
    * HISTOGRAM fragments — additive (duplicate (stratum, value) rows
    * sum first), so per-batch side counts committed by a streaming
    * drain fold to the one-shot statistic bit-exactly. Per-stratum
    * distinct values must fit `domainBudget` ([[guardedHistogram]]). */
  def mannWhitneyFromCounts(frags: DataFrame, strataCol: String,
                            domainBudget: Long = 10000000L): DataFrame = {
    val d11 = DecimalType(11, 0)
    val d12 = DecimalType(12, 0)
    val merged = guardedHistogram(
      frags.groupBy(col(strataCol), col("value"))
        .agg(sum(col("ca")).cast("long").as("__ca"),
          sum(col("cb")).cast("long").as("__cb")),
      strataCol, domainBudget, "mannWhitneyFromCounts")
      .withColumn("__c", col("__ca") + col("__cb"))
    val w = Window.partitionBy(col(strataCol)).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLo = merged
      .withColumn("__lo", coalesce(sum(col("__c")).over(w), lit(0L)))
    val g = withLo.groupBy(col(strataCol)).agg(
      sum(col("__ca")).cast("long").as("na"),
      sum(col("__cb")).cast("long").as("nb"),
      // 2·R_A: block doubled-midrank × side-A count, exact
      sum((col("__ca").cast(d11) *
        (lit(2L) * col("__lo") + col("__c") + lit(1L)).cast(d12))
        .cast(DecimalType(23, 0))).cast(DecimalType(26, 0)).as("r2a"),
      // tie term Σ(c³−c) = Σ c(c−1)(c+1), exact
      sum(((col("__c").cast(d11) * (col("__c") - lit(1L)).cast(d11))
        .cast(DecimalType(22, 0)) * (col("__c") + lit(1L)).cast(d11))
        .cast(DecimalType(33, 0))).cast(DecimalType(36, 0)).as("t"))
    val n = (col("na") + col("nb")).cast("long")
    val u2 = col("r2a") -
      (col("na").cast(d11) * (col("na") + lit(1L)).cast(d12))
        .cast(DecimalType(23, 0))
    val nanb = (col("na").cast(d11) * col("nb").cast(d11))
      .cast(DecimalType(22, 0))
    // B = (n+1)n(n−1) − Σ(c³−c); zero exactly when all values tie
    val bTerm = (((n + lit(1L)).cast(d11) * n.cast(d11))
      .cast(DecimalType(22, 0)) * (n - lit(1L)).cast(d12))
      .cast(DecimalType(34, 0)) - col("t")
    val m12 = (lit(12L).cast(DecimalType(2, 0)) *
      (n.cast(d11) * (n - lit(1L)).cast(d12)).cast(DecimalType(23, 0)))
      .cast(DecimalType(25, 0))
    g.select(col(strataCol), col("na"), col("nb"),
      u2.cast("string").as("u2_a"),
      when(col("na") > 0 && col("nb") > 0 && bTerm > 0,
        (u2 - nanb).cast("double") /
          (lit(2.0d) * sqrt(nanb.cast("double") * bTerm.cast("double") /
            m12.cast("double")))).as("z"))
  }

  /** CLIFF'S DELTA per stratum (r17) — [[mannWhitneyU]]'s effect
    * size: P(a > b) − P(a < b) over all cross pairs, computed WITHOUT
    * the pair space from the same value histogram: with loB = B-rows
    * below a value block, #(a>b) − #(a<b) folds to
    * Σ ca·(2·loB + cb − nb) — exact integers, one mirrored division.
    * δ ∈ [−1, 1]; ±1 means complete separation. */
  def cliffsDelta(df: DataFrame, strataCol: String, sideC: Column,
                  valueC: Column, domainBudget: Long = 10000000L): DataFrame = {
    val d11 = DecimalType(11, 0)
    val merged = guardedHistogram(
      df.select(col(strataCol), guardedSide(sideC, "cliffsDelta").as("__s"),
          valueC.cast("long").as("value"))
        .groupBy(col(strataCol), col("value"))
        .agg(sum(when(col("__s") === 1, 1L).otherwise(0L)).as("__ca"),
          sum(when(col("__s") === 1, 0L).otherwise(1L)).as("__cb")),
      strataCol, domainBudget, "cliffsDelta")
    val w = Window.partitionBy(col(strataCol)).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLo = merged
      .withColumn("__loB", coalesce(sum(col("__cb")).over(w), lit(0L)))
    val g = withLo.groupBy(col(strataCol)).agg(
      sum(col("__ca")).cast("long").as("na"),
      sum(col("__cb")).cast("long").as("nb"),
      sum((col("__ca").cast(d11) *
        (lit(2L) * col("__loB") + col("__cb")).cast(DecimalType(12, 0)))
        .cast(DecimalType(23, 0))).cast(DecimalType(26, 0)).as("gtgt"))
    // Σ ca·(2loB+cb) − na·nb  ==  #(a>b) − #(a<b), exact
    val num = col("gtgt") -
      (col("na").cast(d11) * col("nb").cast(d11)).cast(DecimalType(22, 0))
    g.select(col(strataCol), col("na"), col("nb"),
      num.cast("string").as("delta_num"),
      when(col("na") > 0 && col("nb") > 0,
        num.cast("double") /
          (col("na").cast(d11) * col("nb").cast(d11))
            .cast(DecimalType(22, 0)).cast("double")).as("delta"))
  }

  /** The [[benfordDigits]] audit over pre-counted (digit, c)
    * fragments (r17) — the additive face: per-batch leading-digit
    * counts committed by a streaming drain (or appended to a
    * maintained index) fold to the one-shot audit bit-exactly.
    * Output is the observed-vs-expected SHARE table (share,
    * expected_share, excess per digit) rather than [[benfordDigits]]'s
    * χ² terms — the fragments carry no total, so the read side owns
    * the division. */
  def benfordFromCounts(frags: DataFrame): DataFrame = {
    val expected = Seq(
      1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
      3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
      5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
      7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
      9 -> 0.04575749056067514)
    val counts = frags.groupBy(col("digit"))
      .agg(sum(col("c")).cast("long").as("__c"))
    val all = counts.agg(sum(col("__c")).cast("long").as("n"))
      .withColumn("digit", explode(array((1 to 9).map(lit(_)): _*)))
    val exp = expected.tail.foldLeft(
      when(col("digit") === expected.head._1, lit(expected.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === d, lit(p))
    }
    all.join(counts, Seq("digit"), "left")
      .withColumn("c", coalesce(col("__c"), lit(0L)))
      .withColumn("share", col("c").cast("double") / col("n").cast("double"))
      .withColumn("expected_share", exp)
      .select(col("digit"), col("n"), col("c"), col("share"),
        col("expected_share"),
        (col("share") - col("expected_share")).as("excess"))
  }

  /** ADJUSTED STANDARDIZED RESIDUALS of an r×c contingency table
    * (r18) — WHICH (row, col) cells drive the dependence between two
    * categorical dimensions: resid = (n_ij − E_ij) /
    * √(E_ij·(1−r_i/N)·(1−c_j/N)) with E_ij = r_i·c_j/N, the post-hoc
    * readout a χ² independence test needs to LOCATE an effect
    * (|resid| ≳ 2 flags the cell). The GLOBAL χ² sum is deliberately
    * not emitted — it would sum per-cell IEEE divisions in
    * nondeterministic order, while the per-cell residual is one
    * mirrored IEEE tree over exact integer totals (the repo's
    * exactness bar; the deviation numerator n_ij·N − r_i·c_j is also
    * emitted as an exact decimal string). ALL r×c cells emit,
    * including never-observed ones (n = 0 is evidence too — the
    * q365/q372 zero-cell rule); the grid forms by an equi-join on a
    * constant key (both dimension relations are category-bounded), so
    * the plan stays hash-join only. Degenerate margins (r_i = N or
    * c_j = N — a one-category dimension) yield NULL residuals, the
    * engines-disagree-on-x/0 guard. */
  def contingencyResiduals(df: DataFrame, rowC: Column,
                           colC: Column): DataFrame =
    contingencyFromCounts(
      df.select(rowC.cast("string").as("row_key"),
          colC.cast("string").as("col_key"))
        .groupBy(col("row_key"), col("col_key"))
        .agg(count(lit(1)).as("c")))

  /** [[contingencyResiduals]] over pre-counted (row_key, col_key, c)
    * fragments — the additive face: per-batch cell counts committed
    * by a streaming drain fold to the one-shot residual table
    * bit-exactly. */
  def contingencyFromCounts(frags: DataFrame): DataFrame = {
    val d14 = DecimalType(14, 0)
    val cells = frags.groupBy(col("row_key"), col("col_key"))
      .agg(sum(col("c")).cast("long").as("n"))
    val rows = cells.groupBy(col("row_key"))
      .agg(sum(col("n")).cast("long").as("r_tot"))
    val colsT = cells.groupBy(col("col_key"))
      .agg(sum(col("n")).cast("long").as("c_tot"))
    val tot = cells.agg(sum(col("n")).cast("long").as("nn"))
    // full grid incl. zero cells: category-bounded × category-bounded
    // through a constant equi key (hash join, never a cross product)
    val grid = rows.withColumn("__one", lit(1))
      .join(colsT.withColumn("__one", lit(1)), "__one")
      .drop("__one")
      .join(cells, Seq("row_key", "col_key"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(tot))
    val dev = (col("n").cast(d14) * col("nn").cast(d14))
      .cast(DecimalType(28, 0)) -
      (col("r_tot").cast(d14) * col("c_tot").cast(d14))
        .cast(DecimalType(28, 0))
    val nd = col("nn").cast("double")
    val rd = col("r_tot").cast("double")
    val cd = col("c_tot").cast("double")
    val expected = rd * cd / nd
    val resid = (dev.cast(DecimalType(29, 0)).cast("double") / nd) /
      sqrt(expected * (lit(1.0d) - rd / nd) * (lit(1.0d) - cd / nd))
    grid.select(col("row_key"), col("col_key"), col("n"),
      col("r_tot"), col("c_tot"),
      dev.cast(DecimalType(29, 0)).cast("string").as("dev_num"),
      expected.as("expected"),
      when(col("r_tot") > 0 && col("c_tot") > 0 &&
        col("r_tot") < col("nn") && col("c_tot") < col("nn"), resid)
        .as("residual"))
  }

  /** EXACT CROSS-CORRELATION between two regular (t, x) series at
    * lags −maxLag..maxLag (r17) — "does series A's volume LEAD series
    * B's, and by how many steps": r_k = Σ cxA_t·cxB_{t+k} /
    * √(ΣcxA²·ΣcxB²), positive k meaning A leads B (the
    * [[EventAnalytics.acfDaily]] machinery turned cross-series —
    * autocorrelation is the A = B special case, already covered
    * there). Each series' mean is cleared WITHOUT leaving integers by
    * scaling through its own n (cx_t = n·x_t − Σx, exact decimal), a
    * constant factor that cancels in r; pairs form by one equi-join
    * on t+k; the mirrored IEEE chain is one division by one √ of the
    * two exact energy totals. Built for AGGREGATE-GRAIN series
    * (daily/hourly rollups — time-domain bounded, never raw events);
    * the n·x width budget (|cx| ≤ 9·10¹⁸, keeping cx² inside both
    * engines' 38-digit cap) fails loud via the [[jackknifeRatio]]
    * raise_error pattern. Gaps in t contribute no pair. NOTE the
    * normalization uses the FULL series energies (the standard
    * biased-CCF convention), so partial overlap at large |k| shrinks
    * r toward 0 deterministically. */
  def crossCorrelation(seriesA: DataFrame, seriesB: DataFrame,
                       maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"crossCorrelation: maxLag must be >= 1, got $maxLag")
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    def centered(series: DataFrame, who: String): DataFrame = {
      val tot = series.agg(count(lit(1)).cast(DecimalType(8, 0)).as("__n"),
        sum(col("x").cast(DecimalType(20, 0))).cast(DecimalType(21, 0))
          .as("__s"))
      // n-AWARE budget: the per-element cap must also keep the SUMMED
      // energy Σcx² inside DECIMAL(38,0) — n elements at the bound
      // give n·bound² ≤ 9.8·10³⁷ (margin under the 10³⁸ cap for the
      // double→decimal rounding of the bound), so bound = √(9.8e37/n),
      // capped at 9e18 (the 19-digit element width). Without the n
      // factor, two near-bound elements overflow the sum as a generic
      // engine error instead of this named contract.
      val bound = least(lit(BigDecimal("9e18")).cast(DecimalType(23, 0)),
        sqrt(lit(9.8e37d) / col("__n").cast("double"))
          .cast(DecimalType(23, 0)))
      val cxRaw = (col("__n") * col("x").cast(DecimalType(14, 0)))
        .cast(DecimalType(23, 0)) - col("__s")
      val guarded = when(abs(cxRaw) <= bound, cxRaw.cast(d19))
        .otherwise(raise_error(lit(
          s"crossCorrelation: |n·x − Σx| exceeds the Σcx²-safe budget on " +
            s"the $who series — aggregate to a coarser grain or rescale x")))
      series.crossJoin(broadcast(tot)).select(col("t"), guarded.as("cx"))
    }
    val ca = centered(seriesA, "A")
    val cb = centered(seriesB, "B")
    val da = ca.agg(sum((col("cx") * col("cx")).cast(d38)).cast(d38)
      .as("__da"))
    val db = cb.agg(sum((col("cx") * col("cx")).cast(d38)).cast(d38)
      .as("__db"))
    val bSide = cb.select(col("t").as("__tb"), col("cx").as("__cxb"))
    val pairs = ca
      .withColumn("lag", explode(array(
        (-maxLag to maxLag).map(i => lit(i.toLong)): _*)))
      .withColumn("__probe", col("t") + col("lag"))
      .join(bSide, col("__probe") === col("__tb"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("cx") * col("__cxb")).cast(d38)).cast(d38).as("__num"))
    pairs.crossJoin(broadcast(da)).crossJoin(broadcast(db))
      .select(col("lag"), col("n_pairs"),
        when(col("__da") > 0 && col("__db") > 0,
          col("__num").cast("double") /
            sqrt(col("__da").cast("double") * col("__db").cast("double")))
          .as("ccf"))
  }

  /** LORENZ CURVE POINTS per group (r16) — [[giniExact]]'s visual
    * companion: rows ranked by (value, tie) via [[rankInGroup]],
    * split into k rank-bands by integer arithmetic, each band's exact
    * value sum turned into the CUMULATIVE share of the group total
    * (one mirrored IEEE division per band). The cumulative window
    * runs over the (group, band) AGGREGATE relation. */
  def lorenzPoints(df: DataFrame, groupCol: String, valueC: Column,
                   tieC: Column, k: Int = 10,
                   bucketWidth: Double = 10000.0): DataFrame = {
    require(k >= 1, s"lorenzPoints: k must be >= 1, got $k")
    val base = df.select(col(groupCol), valueC.cast("long").as("__x"),
      tieC.as("__tie"))
    val ranked = rankInGroup(base, groupCol, col("__x"), col("__tie"),
      "__r", bucketWidth)
    val counts = base.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val banded = ranked.join(broadcast(counts), Seq(groupCol))
      .withColumn("band", expr(s"((__r - 1) * $k) div __n") + lit(1L))
      .groupBy(col(groupCol), col("band"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__x").cast(DecimalType(27, 0)))
          .cast(DecimalType(27, 0)).as("__s"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    banded
      .withColumn("__cum", sum(col("__s")).over(w).cast(DecimalType(28, 0)))
      .withColumn("__tot", sum(col("__s")).over(tot).cast(DecimalType(28, 0)))
      .select(col(groupCol), col("band"), col("n_rows"),
        col("__cum").cast("string").as("cum_value"),
        when(col("__tot") > 0,
          col("__cum").cast("double") / col("__tot").cast("double"))
          .as("cum_share"))
  }

  /** φ COEFFICIENT (r16) — the exact-arithmetic association number
    * for two binary flags (feature ↔ label co-occurrence; the 2×2
    * specialization of Pearson, so no means/variances to estimate):
    * φ = (n₁₁n₀₀ − n₁₀n₀₁) / √(r₁·r₀·c₁·c₀) from one aggregate pass,
    * the numerator exact decimal (emitted as a digit string — it
    * exceeds int64 at corpus scale), the denominator a mirrored
    * double chain (margins ≤ 10¹⁴ so each is double-exact; the
    * product is the same IEEE fold on both engines). Any zero margin
    * → NULL (the q230 rule). */
  def phiAssociation(df: DataFrame, aC: Column, bC: Column): DataFrame =
    phiFromCounts(
      df.select(aC.cast("long").as("a"), bC.cast("long").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c")))

  /** [[phiAssociation]] over pre-counted (a, b, c) cell fragments —
    * additive (the four 2×2 cells sum across batches/commits), so a
    * streaming drain committing per-batch cell counts folds to the
    * one-shot coefficient bit-exactly. */
  def phiFromCounts(frags: DataFrame): DataFrame = {
    val d14 = DecimalType(14, 0)
    val g = frags
      .agg(
        sum(when(col("a") === 1 && col("b") === 1, col("c")).otherwise(0L))
          .cast("long").as("n11"),
        sum(when(col("a") === 1 && col("b") === 0, col("c")).otherwise(0L))
          .cast("long").as("n10"),
        sum(when(col("a") === 0 && col("b") === 1, col("c")).otherwise(0L))
          .cast("long").as("n01"),
        sum(when(col("a") === 0 && col("b") === 0, col("c")).otherwise(0L))
          .cast("long").as("n00"))
    val num = (col("n11").cast(d14) * col("n00").cast(d14))
      .cast(DecimalType(29, 0)) -
      (col("n10").cast(d14) * col("n01").cast(d14))
        .cast(DecimalType(29, 0))
    val r1 = (col("n11") + col("n10")).cast("double")
    val r0 = (col("n01") + col("n00")).cast("double")
    val c1 = (col("n11") + col("n01")).cast("double")
    val c0 = (col("n10") + col("n00")).cast("double")
    g.select(col("n11"), col("n10"), col("n01"), col("n00"),
      num.cast("string").as("phi_num"),
      when(r1 > 0.0d && r0 > 0.0d && c1 > 0.0d && c0 > 0.0d,
        num.cast("double") / sqrt(r1 * r0 * c1 * c0)).as("phi"))
  }

  /** [[trendTest]] over pre-aggregated (w, n, x) dose fragments —
    * additive, so per-batch dose counts committed by a streaming
    * drain fold to the one-shot statistic bit-exactly. */
  def trendTestFromCounts(frags: DataFrame): DataFrame = {
    val d14 = DecimalType(14, 0)
    val d17 = DecimalType(17, 0)
    val per = frags.groupBy(col("w")).agg(
      sum(col("n")).cast("long").as("n"),
      sum(col("x")).cast("long").as("x"))
    val g = per.agg(
      sum(col("n")).cast(d14).as("nn"),
      sum(col("x")).cast(d14).as("xx"),
      sum((col("w").cast(DecimalType(3, 0)) * col("x").cast(d14))
        .cast(d17)).cast(d17).as("swx"),
      sum((col("w").cast(DecimalType(3, 0)) * col("n").cast(d14))
        .cast(d17)).cast(d17).as("swn"),
      sum((col("w").cast(DecimalType(3, 0)) * col("w").cast(DecimalType(3, 0)) *
        col("n").cast(d14)).cast(DecimalType(20, 0)))
        .cast(DecimalType(20, 0)).as("sw2n"))
    val tPrime = (col("nn") * col("swx")).cast(DecimalType(38, 0)) -
      (col("xx") * col("swn")).cast(DecimalType(38, 0))
    val b = (col("xx") * (col("nn") - col("xx"))).cast(DecimalType(29, 0))
    val c = (col("nn") * col("sw2n")).cast(DecimalType(38, 0)) -
      (col("swn") * col("swn")).cast(DecimalType(38, 0))
    g.select(col("nn").cast("long").as("n"),
      col("xx").cast("long").as("x"),
      tPrime.cast("string").as("t_scaled"),
      when(b > 0 && c > 0,
        tPrime.cast("double") /
          sqrt((b.cast("double") * c.cast("double")) /
            col("nn").cast("double"))).as("z"))
  }

  /** COCHRAN–ARMITAGE TREND TEST (r16) — "does the success rate move
    * MONOTONICALLY with an ordered dose" (quality band, size decile,
    * price tier), the ordered counterpart of the q336 two-proportion
    * z-test. Input: per-row (dose ∈ 0..k integer, success ∈ 0/1).
    * The statistic is assembled from six exact integer sums (one
    * dose-bounded aggregate pass): with N = Σn, X = Σx over doses,
    * T' = N·Σwx − X·Σwn and z = T' / √(X(N−X)(N·Σw²n − (Σwn)²) / N),
    * every operand exact decimal up to the final mirrored IEEE
    * chain. Zero variance (all one dose, or X ∈ {0, N}) → NULL z
    * (the q230 engine-disagreement rule). T' is emitted as a
    * canonical digit string (it exceeds int64 at corpus scale).
    * Width budget under DuckDB's multiply cap: doses ≤ 999 as (3,0),
    * counts ≤ 10¹⁴ as (14,0)/(17,0), every product ≤ (18,0)+(17,0). */
  def trendTest(df: DataFrame, doseC: Column, successC: Column): DataFrame =
    trendTestFromCounts(
      df.select(doseC.cast("long").as("w"),
          successC.cast("long").as("s"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"),
          sum(col("s")).cast("long").as("x")))

  /** WILSON SCORE INTERVAL per group (r16) — the right confidence
    * interval for small-n / extreme-p conversion rates (the normal
    * interval misbehaves at both): exact integer (n, x) per group,
    * then the textbook chain
    * (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
    * as one mirrored IEEE expression tree — sqrt is correctly
    * rounded, so identical exact inputs give identical doubles on
    * both engines. z defaults to 1.96 (95%). n = 0 yields NULLs. */
  def wilsonInterval(df: DataFrame, groupCol: String, successC: Column,
                     z: Double = 1.96d): DataFrame =
    wilsonFromTotals(
      df.groupBy(col(groupCol)).agg(
        count(lit(1)).as("n"),
        sum(successC.cast("long")).cast("long").as("x")),
      groupCol, z)

  /** [[wilsonInterval]] over pre-aggregated (group, n, x) totals —
    * the additive fragment face: (n, x) count pairs sum across
    * batches/commits, so a streaming drain that commits per-batch
    * totals reproduces the one-shot interval bit-exactly (the
    * featureDriftFromCounts contract). Input columns: `n`, `x`. */
  def wilsonFromTotals(totals: DataFrame, groupCol: String,
                       z: Double = 1.96d): DataFrame = {
    val g = totals.groupBy(col(groupCol)).agg(
      sum(col("n")).cast("long").as("n"),
      sum(col("x")).cast("long").as("x"))
    val nD = col("n").cast("double")
    val p = col("x").cast("double") / nD
    val z2 = lit(z * z)
    val center = p + z2 / (lit(2.0d) * nD)
    val half = lit(z) * sqrt(p * (lit(1.0d) - p) / nD +
      z2 / (lit(4.0d) * nD * nD))
    val denom = lit(1.0d) + z2 / nD
    g.select(col(groupCol), col("n"), col("x"),
      when(col("n") > 0, p).as("p_hat"),
      when(col("n") > 0, (center - half) / denom).as("wilson_lo"),
      when(col("n") > 0, (center + half) / denom).as("wilson_hi"))
  }

  /** GINI–SIMPSON DIVERSITY per group (r16) — the log-free diversity
    * number (1 − Σp²) a corpus mix report can carry EXACTLY (Shannon
    * entropy needs ln, which is not cross-engine reproducible — the
    * q102 rational rule): per-(group, category) counts, then
    * 1 − Σc²/n² evaluated as the exact rational (n² − Σc²) / n² with
    * one IEEE division. Widths: c ≤ n ≤ 10¹⁴ as DECIMAL(14,0)
    * squares (28,0), sums (38,0). */
  def diversityIndex(df: DataFrame, groupCol: String,
                     catC: Column): DataFrame =
    diversityFromCounts(
      df.select(col(groupCol), catC.as("cat"))
        .groupBy(col(groupCol), col("cat"))
        .agg(count(lit(1)).as("c")),
      groupCol)

  /** [[diversityIndex]] over pre-counted (group, cat, c) fragments —
    * additive (duplicate (group, cat) rows sum first), so per-batch
    * category counts committed by a streaming drain fold to the
    * one-shot answer bit-exactly. Input columns: `cat`, `c`. */
  def diversityFromCounts(frags: DataFrame, groupCol: String): DataFrame = {
    val d14 = DecimalType(14, 0)
    val d38 = DecimalType(38, 0)
    val counts = frags.groupBy(col(groupCol), col("cat"))
      .agg(sum(col("c")).cast("long").as("__n"))
    counts.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__n")).cast("long").as("n"),
        sum((col("__n").cast(d14) * col("__n").cast(d14)).cast(d38))
          .as("__s2"))
      .select(col(groupCol), col("n_categories"), col("n"),
        ((col("n").cast(d14) * col("n").cast(d14) - col("__s2"))
          .cast("double") /
          (col("n").cast(d14) * col("n").cast(d14)).cast("double"))
          .as("diversity"))
  }

  /** CUMULATIVE GAINS / LIFT TABLE (r16) — the model-eval decile
    * report (top-scored 10%: how many positives?): rows ranked by
    * (score desc, tie asc) through [[rankInGroup]] on the NEGATED
    * quantized score (single population → the constant group key
    * constant-folds; the rank work is carried by the bucket
    * dimension, the q262 discipline), decile d = ((r−1)·k) div n + 1,
    * per-decile positives and the cumulative precision/recall/lift
    * chains as mirrored IEEE divisions over exact integers. */
  def cumulativeGains(df: DataFrame, scoreC: Column, labelC: Column,
                      tieC: Column, k: Int = 10,
                      bucketWidth: Double = 10000.0): DataFrame = {
    require(k >= 1, s"cumulativeGains: k must be >= 1, got $k")
    val base = df.select(lit(1).as("__g"),
      (-scoreC.cast("long")).as("__negs"),
      labelC.cast("long").as("__y"), tieC.as("__tie"))
    val ranked = rankInGroup(base, "__g", col("__negs"), col("__tie"),
      "__r", bucketWidth)
    val tot = ranked.agg(count(lit(1)).as("__n"),
      sum(col("__y")).cast("long").as("__pos"))
    val dec = ranked.join(broadcast(tot))
      .withColumn("decile", expr(s"((__r - 1) * $k) div __n") + lit(1L))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__y")).cast("long").as("n_pos"),
        max(col("__n")).as("__n"), max(col("__pos")).as("__tot_pos"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // the cumulative window runs over the k-row AGGREGATE relation
    dec
      .withColumn("cum_rows", sum(col("n_rows")).over(w).cast("long"))
      .withColumn("cum_pos", sum(col("n_pos")).over(w).cast("long"))
      .select(col("decile"), col("n_rows"), col("n_pos"),
        col("cum_rows"), col("cum_pos"),
        (col("cum_pos").cast("double") / col("cum_rows").cast("double"))
          .as("cum_precision"),
        when(col("__tot_pos") > 0,
          col("cum_pos").cast("double") / col("__tot_pos").cast("double"))
          .as("cum_recall"),
        when(col("__tot_pos") > 0,
          (col("cum_pos").cast("double") * col("__n").cast("double")) /
            (col("cum_rows").cast("double") * col("__tot_pos").cast("double")))
          .as("cum_lift"))
  }
}
