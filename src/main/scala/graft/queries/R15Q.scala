package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Qx._

/** Round-15 additions: N-dimensional z-order layout (q284), CEP
  * alternation (type SETS per step), and incremental grouped
  * quantiles under appends. */
object R15Q {

  val queries: Map[String, Q] = Map(

    // lake — 3-D OPTIMIZE ZORDER (r15, VERDICT r14 next #8): q178
    // proves the 2-D grid; this gates the generalized k-dim Morton
    // chain end-to-end. Three DECORRELATED derived dimensions, one
    // unclustered directory, z-optimized into 64 directories (4
    // strips per dimension); pruning must then work on ALL THREE
    // columns — the property no single- or two-column sort gives the
    // third dimension. The query answers a 3-D range predicate
    // through the pruned scan; the oracle replays the predicate over
    // the raw rows — hash identity proves the rewrite was
    // layout-only AND that pruning lost no matching row.
    "q284_zorder3d" -> ((s, d) => {
      val base = Tables.events(s, d).select(
        col("event_id"), (col("event_id") % 1000).as("a"),
        ((col("user_id") * 48271 + col("event_id")) % 1000).as("b"),
        ((col("event_id") * 40503 + col("user_id")) % 1000).as("c"),
        col("event_type"), col("value"))
      val t = graft.lake.LakeTable.createTemp(s, base, "graft-zo3")
      t.optimizeZOrder(Seq("a", "b", "c"), buckets = 64)
      val (keptA, total) = t.prunedDirs("a", 100, 349)
      val (keptB, _) = t.prunedDirs("b", 100, 349)
      val (keptC, _) = t.prunedDirs("c", 100, 349)
      require(keptA.size < total && keptB.size < total && keptC.size < total,
        s"3-D z-order pruning ineffective: a ${keptA.size}/$total, " +
          s"b ${keptB.size}/$total, c ${keptC.size}/$total")
      t.scanPrunedWhere(Seq(("a", 100, 349), ("b", 100, 349), ("c", 100, 349)))
        .filter(col("a").between(100, 349) && col("b").between(100, 349) &&
          col("c").between(100, 349))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("event_type")
    })
  )

  val oracles: Map[String, String] = Map(

    "q284_zorder3d" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total
         |FROM events
         |WHERE event_id % 1000 BETWEEN 100 AND 349
         |  AND (user_id * 48271 + event_id) % 1000 BETWEEN 100 AND 349
         |  AND (event_id * 40503 + user_id) % 1000 BETWEEN 100 AND 349
         |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
