package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Scale-technique correctness: salting must be a pure plan rewrite
  * (identical results to the plain join), bucketing must remove the
  * join-time shuffle. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join's result") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), graft.queries.Qx.dsum(col("o_totalprice")).as("t"))
        .orderBy("c_mktsegment").collect().toSeq
    val plain = summarize(orders.join(customer, Seq("o_custkey")))
    val salted = summarize(Skew.saltedJoin(orders, customer, Seq("o_custkey"), 8))
    assert(salted === plain)
  }

  test("salted aggregation equals the plain groupBy at every salt count") {
    val ev = Tables.events(spark, sf).select(col("event_type"),
      col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("t"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    Seq(1, 8, 31).foreach { salts =>
      val out = Skew.saltedAgg(ev, "event_type", salts, "n", "v", "t")
        .select(col("event_type"), col("n"), col("t").cast("double").as("t"))
        .orderBy("event_type").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(out === plain, s"salts=$salts")
    }
  }

  test("salted left join preserves unmatched rows once") {
    import spark.implicits._
    val big = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "w")
    val out = Skew.saltedJoin(big, small, Seq("k"), 4, "left")
      .orderBy("k").collect()
    assert(out.length === 3)
    assert(out.count(!_.isNullAt(2)) === 1)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_lake")
    spark.sql("DROP TABLE IF EXISTS graft_lake.orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lake.customer_b")
    // the session catalog is in-memory: physical leftovers from an
    // earlier JVM must be cleared or CREATE sees a stale location
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("orders_b", "customer_b").foreach { t =>
      val p = java.nio.file.Paths.get(wh, "graft_lake.db", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite")
      .format("parquet").saveAsTable("graft_lake.orders_b")
    Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode("overwrite")
      .format("parquet").saveAsTable("graft_lake.customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_lake.orders_b")
        .join(spark.table("graft_lake.customer_b"),
          col("o_custkey") === col("c_custkey"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
