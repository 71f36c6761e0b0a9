package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so Verify/Bench/tests agree.
  *
  * - `nanosAsLong`: kept so a TIMESTAMP(NANOS) encoding of `events.ts`
  *   (one of the physical types the driver has generated) reads as raw
  *   nanos instead of erroring; `Tables.eventTimeCol` adapts per READ
  *   schema (raw-nanos long vs timestamp[us]/NTZ — VERDICT r11), so
  *   the config is inert when the testdata carries µs timestamps.
  * - AQE on: runtime coalescing + skew-join handling — the behaviors we
  *   rely on at real cluster scale.
  * - shuffle.partitions = local core count (not 200) for local runs; on
  *   a real cluster this would be sized to data volume / AQE target.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
