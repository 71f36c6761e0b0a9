package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark main. Runs every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and emits ONE JSON line with per-query seconds.
  *
  * Harness notes (VERDICT r1 "what's wrong" #2/#3):
  *  - the session is warmed up with one untimed query so the first timed
  *    entry doesn't absorb JVM/codegen/scan-init cost;
  *  - per-query exceptions are recorded in an "errors" field (a crashing
  *    query must not look like a fast success);
  *  - the JSON line is also written to SPARK_GRAFT_BENCH_OUT (default
  *    /root/repo/bench_out.json) because sbt prefixes stdout with
  *    [info]/[error], which broke the driver's parse in round 1.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up: JVM + codegen + parquet footer reads, untimed
    try SparkEntry.queries(names.head)(spark, sfDir).count()
    catch { case _: Throwable => () }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_errors":${errors.size},"errors":$errs,"sf":${jstr(sfDir)}}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    try Files.writeString(Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(",")}")
    spark.stop()
  }
}
