package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Early warning for driver testdata regens (VERDICT r11 missing #2).
  *
  * The r11 round lost 69 queries to a silent physical-encoding change
  * (`events.ts` nanos→timestamp[us]); the engine now ADAPTS per read
  * schema, so this spec pins only the column CLASSES the query surface
  * genuinely assumes — temporal, numeric, string, binary-array — never
  * one physical encoding. A regen that stays within a class keeps the
  * suite green; one that leaves it fails here first, naming the table
  * and the full as-read schema, instead of erroring dozens of queries
  * in the driver's gate.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def col(df: DataFrame, name: String): DataType = {
    assert(df.columns.contains(name),
      s"column $name missing — as-read schema: ${df.schema.toDDL}")
    df.schema(name).dataType
  }
  private def temporal(df: DataFrame, name: String): Unit =
    assert(Set[DataType](TimestampType, TimestampNTZType, DateType)
      .contains(col(df, name)),
      s"$name is ${col(df, name)}, not temporal — ${df.schema.toDDL}")
  private def numeric(df: DataFrame, name: String): Unit =
    assert(col(df, name).isInstanceOf[NumericType],
      s"$name is ${col(df, name)}, not numeric — ${df.schema.toDDL}")
  private def stringy(df: DataFrame, name: String): Unit =
    assert(col(df, name) === StringType,
      s"$name is ${col(df, name)}, not string — ${df.schema.toDDL}")

  test("every testdata table loads with the column classes the queries assume") {
    val region = Tables.region(spark, sf)
    numeric(region, "r_regionkey"); stringy(region, "r_name")

    val orders = Tables.orders(spark, sf)
    numeric(orders, "o_orderkey"); numeric(orders, "o_totalprice")
    temporal(orders, "o_orderdate"); stringy(orders, "o_orderstatus")

    val li = Tables.lineitem(spark, sf)
    numeric(li, "l_quantity"); numeric(li, "l_extendedprice")
    numeric(li, "l_discount"); temporal(li, "l_shipdate")
    stringy(li, "l_returnflag")

    // events goes through the encoding-adaptive read: whatever the
    // driver generated, downstream sees exactly TimestampType
    val ev = Tables.events(spark, sf)
    assert(col(ev, "ts") === TimestampType,
      s"Tables.events must normalize ts — ${ev.schema.toDDL}")
    numeric(ev, "event_id"); numeric(ev, "user_id"); numeric(ev, "value")
    stringy(ev, "event_type"); stringy(ev, "props")

    val docs = Tables.documents(spark, sf)
    numeric(docs, "doc_id"); stringy(docs, "text"); stringy(docs, "lang")
    stringy(docs, "source")

    val emb = Tables.embeddings(spark, sf)
    numeric(emb, "vec_id")
    col(emb, "embedding") match {
      case ArrayType(e, _) => assert(e.isInstanceOf[NumericType],
        s"embedding element is $e, not numeric — ${emb.schema.toDDL}")
      case other => fail(s"embedding is $other, not an array — ${emb.schema.toDDL}")
    }
  }
}
