package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Grid
import Qx._

/** Oracle-checked queries for the M6/J1 grid-reconstruction flagship.
  *
  * There is no OCR model on the JVM, so the ocr_lines relation is
  * derived deterministically from `lineitem`: page = l_orderkey, the
  * line's grid row = l_linenumber (unique per order), its column =
  * l_suppkey % 4, confidence = l_partkey % 97, text = l_quantity. Cell
  * boxes are exact (row strips at y = rid*40+[3,33], column strips at
  * x = cid*100+[5,95]), which makes duplicate detections form exact
  * overlap cliques: same-column lines share an identical vertical
  * strip (IoU 1) while different columns are disjoint (IoU 0). Greedy
  * NMS on such cliques provably keeps exactly the top-confidence
  * member of each clique, so the DuckDB oracle can state the expected
  * survivors relationally (argmax per clique) while the Spark side
  * runs the real greedy algorithm. */
object GridQ {

  /** Synthetic ocr_lines: (page_id, line_id, cid, x1, y1, x2, y2,
    * score, text). `l_linenumber` is not unique per order in this
    * synthetic lake, so one deterministic lineitem is kept per
    * (order, linenumber) to give every page unique line ids — the NMS
    * identity key, like the reference's detection index. */
  def ocrLines(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey", "l_linenumber")
      .orderBy("l_suppkey", "l_partkey", "l_quantity")
    Tables.lineitem(s, d).filter(col("l_orderkey") < 320)
      .withColumn("dedup_rn", row_number().over(w))
      .filter(col("dedup_rn") === 1)
      .select(
      col("l_orderkey").cast("long").as("page_id"),
      col("l_linenumber").cast("long").as("line_id"),
      (col("l_suppkey") % 4).cast("long").as("cid"),
      ((col("l_suppkey") % 4) * 100 + 5).cast("double").as("x1"),
      (col("l_linenumber").cast("long") * 40 + 3).cast("double").as("y1"),
      ((col("l_suppkey") % 4) * 100 + 95).cast("double").as("x2"),
      (col("l_linenumber").cast("long") * 40 + 33).cast("double").as("y2"),
      (col("l_partkey") % 97).cast("double").as("score"),
      col("l_quantity").cast("long").cast("string").as("text"))
  }

  val ocrSql: String =
    """ocr AS (
      |  SELECT l_orderkey AS page_id, CAST(l_linenumber AS BIGINT) AS rid,
      |         l_suppkey % 4 AS cid,
      |         CAST(l_partkey % 97 AS DOUBLE) AS score,
      |         CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS text
      |  FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY l_orderkey, l_linenumber
      |      ORDER BY l_suppkey, l_partkey, l_quantity) AS dedup_rn
      |    FROM lineitem WHERE l_orderkey < 320
      |  ) WHERE dedup_rn = 1
      |)""".stripMargin

  /** Shared expected-grid CTEs (rows survive as singleton cliques;
    * column survivors are the per-clique argmax). */
  val gridSql: String =
    s"""$ocrSql,
       |rows_ AS (
       |  SELECT page_id, rid,
       |         row_number() OVER (PARTITION BY page_id ORDER BY rid) AS row_idx
       |  FROM ocr
       |),
       |cols_ AS (
       |  SELECT page_id, cid,
       |         row_number() OVER (PARTITION BY page_id ORDER BY cid) AS col_idx
       |  FROM (
       |    SELECT page_id, cid, rid,
       |           row_number() OVER (PARTITION BY page_id, cid ORDER BY score DESC, rid) AS rn
       |    FROM ocr
       |  ) WHERE rn = 1
       |),
       |grid AS (
       |  SELECT cl.page_id AS page_id, cl.row_idx AS row_idx,
       |         cl.col_idx AS col_idx, COALESCE(o.text, '') AS text
       |  FROM (
       |    SELECT r.page_id AS page_id, r.row_idx AS row_idx, r.rid AS rid,
       |           c.col_idx AS col_idx, c.cid AS cid
       |    FROM rows_ r JOIN cols_ c ON r.page_id = c.page_id
       |  ) cl
       |  LEFT JOIN ocr o
       |    ON cl.page_id = o.page_id AND cl.rid = o.rid AND cl.cid = o.cid
       |)""".stripMargin

  private val ImgW = 400d
  private val ImgH = 330d

  val queries: Map[String, Q] = Map(
    // O5/M6 step 2 — greedy NMS survivors on the vertical axis
    "q45_nms_columns" -> ((s, d) => {
      val ocr = ocrLines(s, d)
      val vert = ocr.select(col("page_id"), col("line_id"),
        col("x1"), lit(0d).as("y1"), col("x2"), lit(ImgH).as("y2"), col("score"))
      Grid.nmsSurvivors(vert)
        .join(ocr, Seq("page_id", "line_id"))
        .select(col("page_id"), col("cid"), col("line_id"), col("score"))
        .orderBy("page_id", "cid")
    }),

    // M6/J1 — full grid reconstruction, exploded (row_idx, col_idx, text)
    "q46_grid_cells" -> ((s, d) =>
      Grid.reconstruct(ocrLines(s, d), ImgW, ImgH)
        .orderBy("page_id", "row_idx", "col_idx")),

    // M6 step 5 — pivot back to the R x C matrix shape
    "q47_grid_matrix" -> ((s, d) =>
      Grid.toMatrix(Grid.reconstruct(ocrLines(s, d), ImgW, ImgH), 4)
        .orderBy("page_id", "row_idx")),

    // End-to-end extract_table composition (budgetEco.py:72-78 →
    // tableExtract.main with reverse=True): assemble per-page text,
    // reverse-scan for the KPI token (LAST matching page wins), then
    // grid-reconstruct ONLY that page and return its matrix — the
    // table-extraction twin of q106's text journey. Token-boundary
    // containment via space padding, identical in the oracle.
    // Multi-grid pages (VERDICT r5 #6): the reference returns the
    // FIRST keyword-matching crop on a page (tableExtract.py:76-91)
    // while budgetEco.py:76-78 iterates pages — this query proves the
    // two compose at n > 1 grids per page. Each page is split into
    // two spatially independent grids (odd/even line_id); EVERY grid
    // is reconstructed via a composite (page*10 + grid) key — one
    // reconstruction pass over all grids of all pages, not a loop —
    // then per page the FIRST grid (lowest grid_id) whose assembled
    // text contains the KPI token wins (M5 first-crop + P5
    // first-non-empty), and its cells are emitted.
    "q122_multi_grid" -> ((s, d) => {
      val kpi = "17"
      val multi = ocrLines(s, d)
        .withColumn("grid_id", (col("line_id") % 2).cast("long"))
        .withColumn("page_id", col("page_id") * 10 + col("grid_id"))
      val cells = Grid.reconstruct(multi, ImgW, ImgH)
        .select(expr("page_id div 10").as("page_id"),
          (col("page_id") % 10).as("grid_id"),
          col("row_idx"), col("col_idx"), col("text"))
      val gtext = cells.groupBy(col("page_id"), col("grid_id"))
        .agg(array_join(
          expr("transform(array_sort(collect_list(struct(row_idx, col_idx, text))), s -> s.text)"),
          " ").as("blob"))
      val chosen = gtext
        .filter(concat(lit(" "), col("blob"), lit(" ")).contains(s" $kpi "))
        .groupBy(col("page_id")).agg(min(col("grid_id")).as("grid_id"))
      cells.join(chosen, Seq("page_id", "grid_id"))
        .select(col("page_id"), col("grid_id"), col("row_idx"), col("col_idx"), col("text"))
        .orderBy("page_id", "row_idx", "col_idx")
    }),

    "q117_extract_table" -> ((s, d) => {
      val kpi = "17"
      val ocr = ocrLines(s, d)
      val pageText = ocr.groupBy(col("page_id"))
        .agg(array_join(
          expr("transform(array_sort(collect_list(struct(line_id, text))), s -> s.text)"),
          " ").as("page_text"))
      val target = pageText
        .filter(concat(lit(" "), col("page_text"), lit(" ")).contains(s" $kpi "))
        .agg(max(col("page_id")).as("page_id")) // reverse scan: first from the end
      Grid.toMatrix(Grid.reconstruct(ocr.join(target, "page_id"), ImgW, ImgH), 4)
        .orderBy("row_idx")
    })
  )

  val oracles: Map[String, String] = Map(
    "q45_nms_columns" ->
      s"""WITH $ocrSql
         |SELECT page_id, cid, rid AS line_id, score FROM (
         |  SELECT page_id, cid, rid, score,
         |         row_number() OVER (PARTITION BY page_id, cid ORDER BY score DESC, rid) AS rn
         |  FROM ocr
         |) WHERE rn = 1 ORDER BY page_id, cid""".stripMargin,

    "q46_grid_cells" ->
      s"""WITH $gridSql
         |SELECT page_id, row_idx, col_idx, text FROM grid
         |ORDER BY page_id, row_idx, col_idx""".stripMargin,

    "q47_grid_matrix" ->
      s"""WITH $gridSql
         |SELECT page_id, row_idx,
         |       COALESCE(max(text) FILTER (WHERE col_idx = 1), '') AS c1,
         |       COALESCE(max(text) FILTER (WHERE col_idx = 2), '') AS c2,
         |       COALESCE(max(text) FILTER (WHERE col_idx = 3), '') AS c3,
         |       COALESCE(max(text) FILTER (WHERE col_idx = 4), '') AS c4
         |FROM grid GROUP BY page_id, row_idx ORDER BY page_id, row_idx""".stripMargin,

    "q122_multi_grid" ->
      s"""WITH $ocrSql,
         |ocr2 AS (SELECT page_id, rid % 2 AS grid_id, rid, cid, score, text FROM ocr),
         |rows2 AS (
         |  SELECT page_id, grid_id, rid,
         |         row_number() OVER (PARTITION BY page_id, grid_id ORDER BY rid) AS row_idx
         |  FROM ocr2
         |),
         |cols2 AS (
         |  SELECT page_id, grid_id, cid,
         |         row_number() OVER (PARTITION BY page_id, grid_id ORDER BY cid) AS col_idx
         |  FROM (
         |    SELECT page_id, grid_id, cid, rid,
         |           row_number() OVER (PARTITION BY page_id, grid_id, cid
         |                              ORDER BY score DESC, rid) AS rn
         |    FROM ocr2
         |  ) WHERE rn = 1
         |),
         |grid2 AS (
         |  SELECT cl.page_id AS page_id, cl.grid_id AS grid_id, cl.row_idx AS row_idx,
         |         cl.col_idx AS col_idx, COALESCE(o.text, '') AS text
         |  FROM (
         |    SELECT r.page_id AS page_id, r.grid_id AS grid_id, r.row_idx AS row_idx,
         |           r.rid AS rid, c.col_idx AS col_idx, c.cid AS cid
         |    FROM rows2 r JOIN cols2 c
         |      ON r.page_id = c.page_id AND r.grid_id = c.grid_id
         |  ) cl
         |  LEFT JOIN ocr2 o
         |    ON cl.page_id = o.page_id AND cl.grid_id = o.grid_id
         |   AND cl.rid = o.rid AND cl.cid = o.cid
         |),
         |gtext AS (
         |  SELECT page_id, grid_id,
         |         string_agg(text, ' ' ORDER BY row_idx, col_idx) AS blob
         |  FROM grid2 GROUP BY page_id, grid_id
         |),
         |chosen AS (
         |  SELECT page_id, min(grid_id) AS grid_id FROM gtext
         |  WHERE contains(' ' || blob || ' ', ' 17 ')
         |  GROUP BY page_id
         |)
         |SELECT g.page_id AS page_id, g.grid_id AS grid_id,
         |       g.row_idx AS row_idx, g.col_idx AS col_idx, g.text AS text
         |FROM grid2 g JOIN chosen c
         |  ON g.page_id = c.page_id AND g.grid_id = c.grid_id
         |ORDER BY page_id, row_idx, col_idx""".stripMargin,

    "q117_extract_table" ->
      s"""WITH $gridSql,
         |pt AS (
         |  SELECT page_id, string_agg(text, ' ' ORDER BY rid) AS page_text
         |  FROM ocr GROUP BY page_id
         |),
         |target AS (
         |  SELECT max(page_id) AS page_id FROM pt
         |  WHERE contains(' ' || page_text || ' ', ' 17 ')
         |)
         |SELECT g.page_id AS page_id, g.row_idx AS row_idx,
         |       COALESCE(max(g.text) FILTER (WHERE g.col_idx = 1), '') AS c1,
         |       COALESCE(max(g.text) FILTER (WHERE g.col_idx = 2), '') AS c2,
         |       COALESCE(max(g.text) FILTER (WHERE g.col_idx = 3), '') AS c3,
         |       COALESCE(max(g.text) FILTER (WHERE g.col_idx = 4), '') AS c4
         |FROM grid g JOIN target t ON g.page_id = t.page_id
         |GROUP BY g.page_id, g.row_idx ORDER BY row_idx""".stripMargin
  )
}
