package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Qx._

/** Core relational surface (SURVEY.md §2.1–2.7): scans, projections,
  * filters, joins, aggregations, sorts/limits, set ops, scalar functions.
  *
  * Design notes for 100 TB scale (tested at sf0.01/sf0.1):
  *  - filters/projections stay declarative so Catalyst pushes them into
  *    the parquet scan (PushedFilters / pruned ReadSchema);
  *  - dimension joins (region/nation/customer) use `broadcast()` —
  *    dimensions stay small while facts grow, so no shuffle on the fact;
  *  - top-k uses orderBy+limit → TakeOrderedAndProject (no global sort);
  *  - aggregations use partial (map-side) aggregation for free via
  *    groupBy; explicit ORDER BY on output keys keeps results
  *    deterministic under any parallelism.
  */
object Relational {

  val queries: Map[String, Q] = Map(
    // P1 — CAST projection (reference: spark_stream/spark_stream.py:213)
    "q01_cast_project" -> ((s, d) =>
      Tables.events(s, d)
        .selectExpr("CAST(event_id AS STRING) AS key", "CAST(props AS STRING) AS value")
        .orderBy("key")),

    // P2/F11 — JSON parse + flatten (spark_stream/spark_stream.py:159-171)
    "q02_json_flatten" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // P3 — case-insensitive containment (dags/get_data/kpis_search.py:48-50)
    "q03_keyword_filter" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(lower(col("text")).contains("spark"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")),

    // P4/O3 — first-match with reverse scan order (kpis_search.py:21-54)
    "q04_first_match_desc" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(lower(col("text")).contains("merge"))
        .orderBy(desc("doc_id")).limit(1)
        .select(col("doc_id"), col("n_chars"))),

    // O3/O5 — top-k (TakeOrderedAndProject; no global sort at scale)
    "q05_topk_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // U1 — union all (dags/get_data/rapport_eco.py:75-82)
    "q06_union_names" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_name").as("name"), lit("customer").as("kind"))
      val p = Tables.supplier(s, d).select(col("s_name").as("name"), lit("supplier").as("kind"))
      c.unionByName(p).orderBy("kind", "name")
    }),

    // A2 — group-by-key collect (texteExtract.py:107-110). Faithful
    // collect_list semantics (duplicates kept); array_sort makes the
    // element order deterministic under any partitioning.
    "q07_group_collect" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .groupBy(col("event_type"))
        .agg(concat_ws(",", array_sort(collect_list(col("user_id").cast("string")))).as("users"))
        .orderBy("event_type")),

    // A3 — argmax per group via window (deterministic tie-break)
    "q08_argmax_window" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy("user_id")
    }),

    // A-agg — pricing summary (TPC-H Q1 shape; map-side partial agg)
    "q09_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // J — broadcast dim join (customer is the small side at any scale vs orders)
    "q10_revenue_by_segment" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")),

    // TPC-H Q3 shape (shipping priority): filtered broadcast dim →
    // fact join with both date predicates pushed to the scans →
    // revenue per open order → top 10 under a TOTAL tie order
    // (revenue desc, then date, then the unique order key)
    "q141_shipping_priority" -> ((s, d) => {
      val cut = lit("1998-06-01").cast("timestamp")
      broadcast(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"))
        .join(Tables.orders(s, d).filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cut),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
          col("o_orderpriority"))
    }),

    // TPC-H Q5 shape (VERDICT r7 next #8) — the join-order stress: 6
    // tables, with the local-supplier condition c_nationkey =
    // s_nationkey making it a genuine multi-way join, not a star. The
    // scale plan: region→nation collapses to a 5-row broadcast dim;
    // customer and supplier are SEMI-JOIN REDUCED by it before
    // touching the fact side (only ASIA rows survive — at 100 TB that
    // reduction is the difference between shuffling 1/5th of customer
    // and all of it); the one big shuffle is lineitem⋈orders on
    // orderkey; the reduced customer/supplier sides broadcast. The
    // equality chain c_nationkey = s_nationkey rides the supplier join
    // as a residual — never a cross product
    "q148_local_supplier_revenue" -> ((s, d) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, d)
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // TPC-H Q18 shape (large-volume customer). The scale plan: the
    // HAVING subquery is ONE map-side-combinable shuffle over lineitem
    // (sum l_quantity by orderkey), and the surviving hot-order set is
    // tiny by construction (the 300-qty threshold sits near the
    // distribution's tail) — so everything downstream of that agg rides
    // broadcasts: hot-orders ⋈ orders is a broadcast hash join, and the
    // reduced orders side (a few hundred rows even at 100 TB SFs)
    // broadcasts into customer instead of shuffling 1.5M×SF customers
    "q163_large_volume_customer" -> ((s, d) => {
      val hot = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      val hotOrders = Tables.orders(s, d)
        .join(broadcast(hot), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
      Tables.customer(s, d)
        .join(broadcast(hotOrders), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q17 shape (small-quantity-order revenue; p_container →
    // p_brand here — the testdata part table carries no container
    // column). The correlated scalar subquery (0.2×avg per part)
    // becomes an aggregate-then-join: filtered part is a broadcast
    // semi-reduction on the lineitem SCAN (only Brand#23 rows survive
    // the join), the per-part cap is one small agg over that reduced
    // slice, and the cap joins back by broadcast. Both sides compute
    // the cap as 0.2×(exact-decimal sum ÷ count) — one IEEE multiply
    // and divide, bit-identical across engines
    "q164_small_qty_revenue" -> ((s, d) => {
      val brandParts = broadcast(
        Tables.part(s, d).filter(col("p_brand") === "Brand#23")
          .select(col("p_partkey")))
      val li = Tables.lineitem(s, d)
        .join(brandParts, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val caps = li.groupBy(col("l_partkey").as("cap_partkey"))
        .agg((lit(0.2) * (sum(col("l_quantity").cast(DecimalType(18, 2)))
          .cast("double") / count(lit(1)))).as("qty_cap"))
      li.join(broadcast(caps), col("l_partkey") === col("cap_partkey"))
        .filter(col("l_quantity") < col("qty_cap"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting; the testdata
    // lineitem has no receipt/commit dates, so "late" is shipdate >
    // orderdate + 90 days). The spec's EXISTS + NOT-EXISTS pair would
    // be TWO self-joins of the biggest table; the scale-correct rewrite
    // is ONE shuffle by orderkey computing per-order supplier counts
    // (distinct suppliers, distinct LATE suppliers), then the waiting
    // condition is just n_supp > 1 AND n_late = 1 AND this supplier is
    // the late one — semantics identical (counting distinct
    // (order,supplier) pairs), shuffle count 3 → 1. Supplier⋈nation is
    // a broadcast dim at any scale
    "q165_suppliers_waiting" -> ((s, d) => {
      val wl = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
            .as("late"))
      val perOrder = wl.groupBy(col("l_orderkey").as("po_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
      val lateSupp = broadcast(
        Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name")))
      wl.filter(col("late")).select(col("l_orderkey"), col("l_suppkey")).distinct()
        .join(perOrder, col("l_orderkey") === col("po_orderkey"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
        .join(lateSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"), col("n_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(100)
    }),

    // TPC-H Q22 shape (global acquaintance; the testdata customer has
    // no phone, so "country code" is c_nationkey, and every customer
    // has SOME order, so the anti-join target is the post-2000 order
    // slice). The scale plan: the scalar AVG subquery collapses to a
    // ONE-ROW broadcast (a cross join against one row is free at any
    // scale); the anti join is the one real shuffle — customer against
    // the date-filtered orders projected to o_custkey, where Spark
    // dedups the build side; the avg itself is exact-decimal sum ÷
    // count, one IEEE division, bit-identical cross-engine
    "q171_global_acquaintance" -> ((s, d) => {
      val codes = Seq(1L, 5L, 9L, 13L, 17L, 21L, 24L)
      val cust = Tables.customer(s, d)
        .filter(col("c_nationkey").isin(codes: _*))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    }),

    // TPC-H Q2 shape (min-cost supplier; the testdata has no partsupp,
    // so the supplier-part offer relation derives from lineitem:
    // cost = MIN extendedprice ever charged by that supplier for that
    // part — exact, no arithmetic). The correlated MIN subquery becomes
    // aggregate-then-rejoin: lineitem is reduced by TWO broadcasts
    // (filtered part, European suppliers) BEFORE its one shuffle on
    // (partkey, suppkey); the per-part min is a second map-side-
    // combinable agg of the already-tiny offers; the rejoin on
    // (partkey, cost = min) keeps ties like the spec query. At 100 TB
    // the only big exchange is the first agg, and both dims stay
    // broadcast-sized (part is filtered, supplier is region-filtered)
    "q172_min_cost_supplier" -> ((s, d) => {
      val parts = broadcast(Tables.part(s, d)
        .filter(col("p_size") <= 15 && col("p_type") === "SMALL")
        .select(col("p_partkey"), col("p_type"), col("p_size")))
      val euroSupp = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
      val offers = Tables.lineitem(s, d)
        .join(broadcast(parts.select(col("p_partkey").as("fp_partkey"))),
          col("l_partkey") === col("fp_partkey"))
        .join(broadcast(euroSupp.select(col("s_suppkey").as("fs_suppkey"))),
          col("l_suppkey") === col("fs_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("cost"))
      val minCost = offers.groupBy(col("l_partkey").as("mc_partkey"))
        .agg(min(col("cost")).as("min_cost"))
      offers
        .join(minCost,
          col("l_partkey") === col("mc_partkey") && col("cost") === col("min_cost"))
        .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_type"), col("cost"))
        .orderBy(desc("s_acctbal"), col("s_name"), col("p_partkey"))
    }),

    // TPC-H Q20 shape (excess stock; no partsupp, so "availability" is
    // the 1995 shipped volume per (part, supplier) and the correlated
    // half-of-shipped threshold comes from the 1996 slice). The scale
    // plan: ONE broadcast of the name-filtered part list reduces
    // lineitem before BOTH aggs; the two aggs share the same
    // (partkey, suppkey) shuffle key, so their join is co-partitioned
    // — no third exchange; the surviving supplier keys ride a LEFT
    // SEMI into the region-filtered supplier dim, which never
    // materializes duplicates. Region filter (not single nation) so
    // every SF keeps survivors
    "q173_excess_stock" -> ((s, d) => {
      val coldParts = broadcast(Tables.part(s, d)
        .filter(col("p_name").startsWith("cold")).select(col("p_partkey")))
      val li = Tables.lineitem(s, d)
        .join(coldParts, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
          col("l_shipdate"))
      def slice(lo: String, hi: String) =
        li.filter(col("l_shipdate") >= lit(lo).cast("timestamp") &&
          col("l_shipdate") < lit(hi).cast("timestamp"))
      val avail = slice("1995-01-01", "1996-01-01")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("avail"))
      val shipped = slice("1996-01-01", "1997-01-01")
        .groupBy(col("l_partkey").as("sh_partkey"), col("l_suppkey").as("sh_suppkey"))
        .agg(dsum(col("l_quantity")).as("shipped"))
      val excess = avail.join(shipped,
          col("l_partkey") === col("sh_partkey") &&
            col("l_suppkey") === col("sh_suppkey"))
        .filter(col("avail") > lit(0.5) * col("shipped"))
        .select(col("l_suppkey"))
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    }),

    // TPC-H Q7 shape (volume shipping; region pairs instead of nation
    // pairs — the sf0.001 fixture has nations with zero suppliers, and
    // the plan is identical). Both direction pairs survive via the
    // inequality residual on the two broadcast-attached region labels.
    // The scale plan: customer and supplier are broadcast-reduced to
    // the two regions BEFORE the fact join; the one big shuffle is
    // lineitem⋈orders on orderkey with the ship-date range pushed to
    // the lineitem scan
    "q174_volume_shipping" -> ((s, d) => {
      val rn = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name").isin("EUROPE", "AMERICA"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("r_name"))
      val supp = broadcast(Tables.supplier(s, d)
        .join(broadcast(rn), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("r_name").as("supp_region")))
      val cust = broadcast(Tables.customer(s, d)
        .join(broadcast(rn), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("r_name").as("cust_region")))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_region") =!= col("cust_region"))
        .groupBy(col("supp_region"), col("cust_region"), col("l_year"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_region", "cust_region", "l_year")
    }),

    // TPC-H Q8 shape (market share): one region's share of a part
    // type's volume in another region's market, by order year. The
    // conditional-sum ÷ total-sum ratio is TWO exact decimal sums and
    // ONE IEEE division per group — bit-identical cross-engine. Scale:
    // lineitem is broadcast-reduced by the type-filtered part before
    // the orderkey shuffle; customer broadcast carries the market
    // filter; the supplier broadcast carries the region label the
    // numerator conditions on
    "q175_market_share" -> ((s, d) => {
      val ecoParts = broadcast(Tables.part(s, d)
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey")))
      val amCust = broadcast(Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey")))
      val suppRegion = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("r_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("r_name").as("supp_region")))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, d)
        .join(ecoParts, col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(amCust, col("o_custkey") === col("c_custkey"))
        .join(suppRegion, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg((dsum6(when(col("supp_region") === "EUROPE", vol).otherwise(lit(0.0)))
          / dsum6(vol)).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    // keep every supplier tying the maximum. The scalar MAX is a
    // one-row broadcast (q171's pattern) filtered against the same agg
    // — never a global sort; the surviving winner set (typically one
    // row) broadcasts into the supplier dim, not the other way around
    "q176_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      val winners = rev.crossJoin(broadcast(maxRev))
        .filter(col("total_revenue") === col("max_revenue"))
      Tables.supplier(s, d)
        .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 shape (supplier counts per part attribute; the offer
    // relation derives from lineitem's distinct (part, supplier)
    // pairs). The NOT-IN excluded-supplier set becomes a LEFT ANTI
    // against a broadcast key list; distinct pairs are ONE shuffle on
    // (partkey, suppkey); the attribute-filtered part broadcasts; the
    // COUNT DISTINCT regroup is the only other exchange
    "q177_parts_supplier_count" -> ((s, d) => {
      val excluded = broadcast(Tables.supplier(s, d)
        .filter(col("s_suppkey") % 4 === 0).select(col("s_suppkey")))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_brand") =!= "Brand#13" && col("p_size") <= 25)
            .select(col("p_partkey"), col("p_brand"), col("p_type"),
              col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"),
          col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q4 shape (order priority checking; no commit/receipt dates
    // in the testdata, so "late" is shipdate > orderdate + 60 days).
    // The EXISTS is a LEFT SEMI from orders into the join-keyed
    // lineitem — one shuffle on orderkey, no duplicate inflation, then
    // a tiny priority rollup
    "q180_order_priority" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val late = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(late,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q6 shape (forecast revenue): the pure scan-aggregate — all
    // three predicates and the two-column projection must reach the
    // parquet scan (PushdownSpec-style PushedFilters), one exchange
    // for the single-row result. Discount bounds are exact decimal
    // literals compared on the raw doubles
    "q181_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dsum6(col("l_extendedprice") * col("l_discount")).as("revenue"))),

    // TPC-H Q10 shape (returned-item reporting): revenue lost to
    // returns per customer in a quarter, top 20. One lineitem⋈orders
    // shuffle with both date and returnflag pushed to the scans; the
    // per-customer agg's survivors broadcast into customer and its
    // nation dim — never a shuffle of the full customer table
    "q182_returned_items" -> ((s, d) => {
      val lost = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(desc("revenue"), col("o_custkey"))
        .limit(20)
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(lost), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(desc("revenue"), col("c_custkey"))
    }),

    // TPC-H Q13 shape (customer order-count distribution, ZEROS
    // INCLUDED — the left outer join is the point): per-customer order
    // counts over a filtered orders slice, then the count-of-counts
    // histogram. Two shuffles by construction (custkey, then the tiny
    // histogram regroup); the orders filter rides the scan
    "q183_customer_distribution" -> ((s, d) => {
      val perCust = Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select(col("o_orderkey"), col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count")) // count skips nulls
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // TPC-H Q14 shape (promotion effect): conditional-sum ratio over
    // one month — q175's arithmetic on a single row. The type label
    // rides the broadcast part dim into the date-filtered lineitem scan
    "q184_promo_effect" -> ((s, d) => {
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          dsum6(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))) /
          dsum6(vol)).as("promo_revenue"))
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    // an OR of three (brand, size-range, quantity-range) conjunctions
    // — the pushdown stress. The part dim broadcasts with the
    // OR-reduced predicate applied BEFORE the join; the residual
    // quantity conjunction evaluates per joined row
    "q185_disjunctive_revenue" -> ((s, d) => {
      val p = broadcast(Tables.part(s, d)
        .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)))
        .select(col("p_partkey"), col("p_brand")))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .filter((col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30)))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
    }),

    // TPC-H Q9 shape (product-type profit; no partsupp supplycost in
    // the testdata, so the cost leg is p_retailprice·quantity·0.1 —
    // same arithmetic shape, sourced from the part dim the join
    // already carries). Scale plan: the name-filtered part broadcast
    // reduces lineitem FIRST, supplier⋈nation broadcasts, the one big
    // shuffle is the orderkey join for the year, then a tiny
    // (nation, year) rollup
    "q186_product_profit" -> ((s, d) => {
      val parts = broadcast(Tables.part(s, d)
        .filter(col("p_name").contains("bolt"))
        .select(col("p_partkey"), col("p_retailprice")))
      val suppNation = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      Tables.lineitem(s, d)
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d)
            .select(col("o_orderkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * lit(0.1)).as("sum_profit"))
        .orderBy(col("n_name"), desc("o_year"))
    }),

    // TPC-H Q11 shape (value concentration; the supplier-part value
    // relation derives from lineitem). The HAVING threshold is a
    // scalar subquery — a ONE-ROW broadcast against the per-nation
    // aggregate (rows = nation count, trivially small), so the only
    // real exchange is the supplier-key rollup of lineitem
    "q187_value_concentration" -> ((s, d) => {
      val suppNation = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      val byNation = Tables.lineitem(s, d)
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name"))
        .agg(dsum6(col("l_extendedprice")).as("total_value"))
      val threshold = byNation
        .agg(((dsum6(col("total_value")) / count(lit(1))) * lit(1.05)).as("cut"))
      byNation.crossJoin(broadcast(threshold))
        .filter(col("total_value") > col("cut"))
        .select(col("n_name"), col("total_value"))
        .orderBy(desc("total_value"), col("n_name"))
    }),

    // J — star join: fact × 4 broadcast dims, one shuffle for the final agg
    "q11_star_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val c  = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val n  = Tables.nation(s, d)
      val r  = Tables.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // left_semi — EXISTS (engine extension; no equi-join in the reference)
    "q12_semi_join" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000).select("o_custkey")
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // left_anti — NOT EXISTS
    "q13_anti_join" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000).select("o_custkey")
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // left outer join + null-fill aggregate
    "q14_left_join_counts" -> ((s, d) => {
      val cnt = Tables.orders(s, d).groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      Tables.customer(s, d)
        .join(cnt, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // window top-n per key (reference first-match generalized)
    "q15_window_topn" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    // distinct
    "q16_distinct" -> ((s, d) =>
      Tables.events(s, d).select(col("event_type")).distinct().orderBy("event_type")),

    // count distinct (exact; HLL variant is non-oracle)
    "q17_count_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // rollup with GROUPING() labels (null-safe across engines)
    "q18_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("g_rf"), grouping(col("l_linestatus")).as("g_ls"))
        .select(
          when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("rf"),
          when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls")),

    // F1–F8 — string functions over documents
    "q19_string_funcs" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          upper(substring(col("text"), 1, 16)).as("head_upper"),
          locate("spark", col("text")).cast("long").as("spark_pos"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          trim(substring(col("text"), 1, 12)).as("head_trim"))
        .orderBy("doc_id")),

    // P9/F5/F6 — European decimal-comma normalization + cast
    // (notePresentation.py:71-75). A genuine comma-formatted string is
    // synthesized first (identically on both engines), then parsed: drop
    // the regexp_replace and `parsed` becomes NULL, so the normalization
    // direction is actually exercised (VERDICT r1 "what's wrong" #1).
    "q20_decimal_comma" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          concat(regexp_replace(col("value").cast("string"), "\\.", ","), lit(" %"))
            .as("raw"))
        .select(
          col("event_id"),
          col("raw"),
          regexp_replace(trim(regexp_replace(col("raw"), "%", "")), ",", ".")
            .cast("double").as("parsed"))
        .orderBy("event_id")),

    // F12 — date parts + aggregation per year
    "q21_year_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("yr")),

    // conditional expression (when/otherwise; ocr.py:42-43 dark-page analog)
    "q22_case_when" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          when(col("value") < 50, lit("low")).otherwise(lit("high")).as("bucket"),
          col("value"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("bucket")),

    // P10 — limit/head preview
    // (l_orderkey, l_linenumber) is NOT unique in this lake (testdata
    // quirk), so the sort must be total or the limit-5 row set is
    // engine-ambiguous under ties — first diverged at sf0.1
    "q23_limit" -> ((s, d) =>
      Tables.lineitem(s, d)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_partkey", "l_suppkey")
        .limit(5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    // U2/J5 — set membership (isin over broadcast-able literal lexicon)
    "q24_isin" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_type").isin("signup", "error"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    // pivot (groupBy().pivot() — grid-assembly shape used by M6)
    "q25_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("l_returnflag")),

    // analytic-function suite rounding out the window surface beyond
    // row_number/rank (q08/q15) and running frames (q70–q72): lag,
    // lead, percent_rank, cume_dist, nth_value in one pass. Cross-
    // engine exactness: the window order is TOTAL (price, then the
    // unique orderkey), and percent_rank/cume_dist are single IEEE
    // divisions of exact integer rank/count — bit-identical anywhere
    "q169_analytic_suite" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          nth_value(col("o_totalprice"), 2).over(wAll).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // cube (engine extension beyond rollup)
    "q26_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).as("g_st"), grouping(col("o_orderpriority")).as("g_pr"))
        .select(
          when(col("g_st") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("st"),
          when(col("g_pr") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("prio"),
          col("n"))
        .orderBy("st", "prio"))
  )

  val oracles: Map[String, String] = Map(
    "q01_cast_project" ->
      "SELECT CAST(event_id AS VARCHAR) AS key, CAST(props AS VARCHAR) AS value FROM events ORDER BY key",
    "q02_json_flatten" ->
      "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events ORDER BY event_id",
    "q03_keyword_filter" ->
      "SELECT doc_id, lang, source, n_chars FROM documents WHERE contains(lower(text), 'spark') ORDER BY doc_id",
    "q04_first_match_desc" ->
      "SELECT doc_id, n_chars FROM documents WHERE contains(lower(text), 'merge') ORDER BY doc_id DESC LIMIT 1",
    "q05_topk_orders" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q06_union_names" ->
      """SELECT name, kind FROM (
        |  SELECT c_name AS name, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_name AS name, 'supplier' AS kind FROM supplier
        |) ORDER BY kind, name""".stripMargin,
    "q07_group_collect" ->
      """SELECT event_type,
        |       array_to_string(list_sort(list(CAST(user_id AS VARCHAR))), ',') AS users
        |FROM events WHERE user_id < 20 GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q08_argmax_window" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q09_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       SUM(l_quantity) AS sum_qty,
         |       ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |       ${sqlDsum6("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |       ${sqlDavg("l_quantity")} AS avg_qty,
         |       COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q10_revenue_by_segment" ->
      s"""SELECT c_mktsegment, ${sqlDsum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q148_local_supplier_revenue" ->
      s"""SELECT n_name,
         |       ${sqlDsum6("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q141_shipping_priority" ->
      s"""SELECT l_orderkey,
         |       ${sqlDsum6("l_extendedprice * (1 - l_discount)")} AS revenue,
         |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |       o_orderpriority
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q163_large_volume_customer" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       o_totalprice, sum_qty
        |FROM customer
        |JOIN (
        |  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, sum_qty
        |  FROM orders
        |  JOIN (
        |    SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        |    FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
        |  ) ON o_orderkey = l_orderkey
        |) ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin,
    "q164_small_qty_revenue" ->
      s"""SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |JOIN (
         |  SELECT l_partkey AS cap_partkey,
         |         0.2 * (${sqlDsum("l_quantity")} / COUNT(*)) AS qty_cap
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_brand = 'Brand#23'
         |  GROUP BY l_partkey
         |) ON l_partkey = cap_partkey
         |WHERE p_brand = 'Brand#23' AND l_quantity < qty_cap""".stripMargin,
    "q165_suppliers_waiting" ->
      """WITH wl AS (
        |  SELECT l_orderkey, l_suppkey,
        |         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |), per_order AS (
        |  SELECT l_orderkey AS po_orderkey,
        |         COUNT(DISTINCT l_suppkey) AS n_supp,
        |         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
        |  FROM wl GROUP BY l_orderkey
        |)
        |SELECT s_name, n_name, COUNT(*) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM wl WHERE late)
        |JOIN per_order ON l_orderkey = po_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_supp > 1 AND n_late = 1
        |GROUP BY s_name, n_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q171_global_acquaintance" ->
      s"""WITH pos AS (
         |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
         |  FROM customer
         |  WHERE c_nationkey IN (1,5,9,13,17,21,24) AND c_acctbal > 0.0
         |)
         |SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
         |       ${sqlDsum("c_acctbal")} AS totacctbal
         |FROM customer, pos
         |WHERE c_nationkey IN (1,5,9,13,17,21,24) AND c_acctbal > avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
         |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin,
    "q172_min_cost_supplier" ->
      """WITH parts AS (
        |  SELECT p_partkey, p_type, p_size FROM part
        |  WHERE p_size <= 15 AND p_type = 'SMALL'
        |), euro AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |), offers AS (
        |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
        |  FROM lineitem
        |  JOIN parts ON l_partkey = p_partkey
        |  JOIN euro ON l_suppkey = s_suppkey
        |  GROUP BY l_partkey, l_suppkey
        |), mc AS (
        |  SELECT l_partkey AS mc_partkey, MIN(cost) AS min_cost
        |  FROM offers GROUP BY l_partkey
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost
        |FROM offers
        |JOIN mc ON l_partkey = mc_partkey AND cost = min_cost
        |JOIN euro ON l_suppkey = s_suppkey
        |JOIN parts ON l_partkey = p_partkey
        |ORDER BY s_acctbal DESC, s_name, p_partkey""".stripMargin,
    "q173_excess_stock" ->
      s"""WITH li AS (
         |  SELECT l_partkey, l_suppkey, l_quantity, l_shipdate
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_name LIKE 'cold%'
         |), avail AS (
         |  SELECT l_partkey, l_suppkey, ${sqlDsum("l_quantity")} AS avail
         |  FROM li
         |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         |    AND l_shipdate <  TIMESTAMP '1996-01-01'
         |  GROUP BY l_partkey, l_suppkey
         |), sh AS (
         |  SELECT l_partkey AS sh_partkey, l_suppkey AS sh_suppkey,
         |         ${sqlDsum("l_quantity")} AS shipped
         |  FROM li
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <  TIMESTAMP '1997-01-01'
         |  GROUP BY l_partkey, l_suppkey
         |)
         |SELECT s_name, s_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'EUROPE'
         |  AND EXISTS (SELECT 1 FROM avail
         |              JOIN sh ON l_partkey = sh_partkey AND l_suppkey = sh_suppkey
         |              WHERE avail > 0.5 * shipped AND l_suppkey = s_suppkey)
         |ORDER BY s_name""".stripMargin,
    "q174_volume_shipping" ->
      s"""SELECT supp_region, cust_region, l_year,
         |       ${sqlDsum6("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM (
         |  SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
         |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |         l_extendedprice, l_discount
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN region cr ON cn.n_regionkey = cr.r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         |  JOIN region sr ON sn.n_regionkey = sr.r_regionkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <  TIMESTAMP '1998-01-01'
         |    AND sr.r_name IN ('EUROPE', 'AMERICA')
         |    AND cr.r_name IN ('EUROPE', 'AMERICA')
         |    AND sr.r_name <> cr.r_name
         |)
         |GROUP BY supp_region, cust_region, l_year
         |ORDER BY supp_region, cust_region, l_year""".stripMargin,
    "q175_market_share" ->
      """SELECT o_year,
        |       CAST(SUM(CAST(CASE WHEN supp_region = 'EUROPE'
        |                          THEN l_extendedprice * (1 - l_discount)
        |                          ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
        |       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                       AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         l_extendedprice, l_discount, sr.r_name AS supp_region
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        |  WHERE p_type = 'ECONOMY' AND cr.r_name = 'AMERICA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01'
        |)
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q176_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |         ${sqlDsum6("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <  TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q177_parts_supplier_count" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_size <= 25
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_suppkey % 4 = 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q180_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q181_forecast_revenue" ->
      s"""SELECT ${sqlDsum6("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate <  TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    "q182_returned_items" ->
      s"""SELECT c_custkey, c_name, revenue, c_acctbal, n_name
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN (
         |  SELECT o_custkey,
         |         ${sqlDsum6("l_extendedprice * (1 - l_discount)")} AS revenue
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate <  TIMESTAMP '1996-04-01'
         |  GROUP BY o_custkey
         |  ORDER BY revenue DESC, o_custkey LIMIT 20
         |) ON c_custkey = o_custkey
         |ORDER BY revenue DESC, c_custkey""".stripMargin,
    "q183_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders
        |             WHERE o_orderpriority <> '1-URGENT')
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q184_promo_effect" ->
      """SELECT 100.0 *
        |       CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |                          THEN l_extendedprice * (1 - l_discount)
        |                          ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
        |       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                       AS DECIMAL(28,6))) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate <  TIMESTAMP '1996-04-01'""".stripMargin,
    "q185_disjunctive_revenue" ->
      s"""SELECT ${sqlDsum6("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q186_product_profit" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |       ${sqlDsum6("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1")} AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%bolt%'
         |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
         |ORDER BY n_name, o_year DESC""".stripMargin,
    "q187_value_concentration" ->
      s"""WITH by_nation AS (
         |  SELECT n_name, ${sqlDsum6("l_extendedprice")} AS total_value
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  GROUP BY n_name
         |)
         |SELECT n_name, total_value
         |FROM by_nation
         |WHERE total_value > (SELECT ${sqlDsum6("total_value")} / COUNT(*) * 1.05
         |                     FROM by_nation)
         |ORDER BY total_value DESC, n_name""".stripMargin,
    "q11_star_join" ->
      s"""SELECT r_name, n_name,
         |       ${sqlDsum6("l_extendedprice * (1 - l_discount)")} AS revenue,
         |       COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q12_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q13_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q14_left_join_counts" ->
      """SELECT c_custkey, COALESCE(cnt, 0) AS n_orders
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
        |) ON c_custkey = o_custkey ORDER BY c_custkey""".stripMargin,
    "q15_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "q16_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q17_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q18_rollup" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        |       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
        |       SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin,
    "q19_string_funcs" ->
      """SELECT doc_id,
        |       upper(substring(text, 1, 16)) AS head_upper,
        |       CAST(strpos(text, 'spark') AS BIGINT) AS spark_pos,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       trim(substring(text, 1, 12)) AS head_trim
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q20_decimal_comma" ->
      """SELECT event_id, raw,
        |       CAST(replace(trim(replace(raw, '%', '')), ',', '.') AS DOUBLE) AS parsed
        |FROM (
        |  SELECT event_id, replace(CAST(value AS VARCHAR), '.', ',') || ' %' AS raw
        |  FROM events
        |) ORDER BY event_id""".stripMargin,
    "q21_year_agg" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, COUNT(*) AS n,
         |       ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,
    "q22_case_when" ->
      s"""SELECT CASE WHEN value < 50 THEN 'low' ELSE 'high' END AS bucket,
         |       COUNT(*) AS n, ${sqlDsum("value")} AS total
         |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q23_limit" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "ORDER BY l_orderkey, l_linenumber, l_quantity, l_partkey, l_suppkey LIMIT 5"),
    "q24_isin" ->
      """SELECT event_type, COUNT(*) AS n FROM events
        |WHERE event_type IN ('signup', 'error') GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q25_pivot" ->
      """SELECT l_returnflag,
        |       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS "F",
        |       COUNT(*) FILTER (WHERE l_linestatus = 'O') AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q169_analytic_suite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       nth_value(o_totalprice, 2) OVER
        |         (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS second_price
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q26_cube" ->
      """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS st,
        |       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS prio,
        |       COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY st, prio""".stripMargin
  )
}
