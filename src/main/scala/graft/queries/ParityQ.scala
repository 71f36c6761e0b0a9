package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ImageOps
import Qx._

/** Remaining reference-parity surface: CSV round-trip (S6–S8), the
  * rows→Kafka producer projection (S10/F10), the deplot-output parse
  * (M12, total on malformed rows), crop-bound clamps (F13/A4),
  * null-guard filters (P11), first-non-empty selection (P5), the
  * binaryFile directory scan (S13) with byte-plane ops (F16), the
  * doc→pages generator (S12) and the composed find-KPI-page query
  * (M9). */
object ParityQ {

  /** S12 — doc→pages one-to-many generator: fixed 200-char pages. */
  def docPages(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_pages", expr("n_chars div 200") + 1)
      .select(col("doc_id"), col("text"), posexplode(expr("sequence(1, n_pages)")))
      .select(col("doc_id"), col("col").cast("long").as("page_no"),
        expr("substring(text, cast((col - 1) * 200 + 1 AS INT), 200)").as("page_text"))

  val docPagesSql: String =
    """pages AS (
      |  SELECT doc_id, page_no, substring(text, (page_no - 1) * 200 + 1, 200) AS page_text
      |  FROM (
      |    SELECT doc_id, text,
      |           unnest(generate_series(1, CAST(n_chars // 200 + 1 AS BIGINT))) AS page_no
      |    FROM documents
      |  )
      |)""".stripMargin

  val queries: Map[String, Q] = Map(
    // S6/S8 — CSV write + read round-trip with header/quote options
    // (GetData.py:32-35); the round-trip must reproduce the table
    "q48_csv_roundtrip" -> ((s, d) => {
      val tmp = Qx.tempDir("graft-csv").resolve("nation").toString
      Tables.nation(s, d).write.mode("overwrite")
        .option("header", "true").option("quote", "\"").csv(tmp)
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("header", "true").option("quote", "\"").csv(tmp)
        .orderBy("n_nationkey")
    }),

    // S10/F10 — rows→Kafka producer projection: deterministic key +
    // to_json(struct("*")) value (GetData.py:113-126; uuid4 key
    // replaced by a deterministic format_string so it is checkable)
    "q49_to_json_producer" -> ((s, d) =>
      Tables.nation(s, d)
        .select(format_string("msg-%d", col("n_nationkey")).as("key"),
          to_json(struct(col("n_nationkey"), col("n_name"), col("n_regionkey")))
            .as("value"))
        .orderBy("key")),

    // M12 — deplot linearized-table parse: split on <0x0A>, header at
    // line 2, |-separated body, TOTAL on malformed rows (null fields
    // instead of the reference's crash, activity_test.py:99-112,
    // notePresentation.py:67-77)
    "q50_deplot_parse" -> ((s, d) =>
      graft.operators.Deplot.parseYearValue(
        Tables.events(s, d).filter(col("event_id") < 2000)
          .select(col("event_id").as("doc_id"),
            concat(
              lit("TITLE Croissance <0x0A> annee | valeur <0x0A> "),
              (col("event_id") % 30 + 1990).cast("string"), lit(" | "),
              (col("user_id") % 90 + 1).cast("string"), lit(","),
              (col("event_id") % 10).cast("string"), lit(" <0x0A> "),
              (col("event_id") % 5 + 2020).cast("string"), lit(" | "),
              (col("event_id") % 80 + 1).cast("string"),
              lit(",5 <0x0A> badrow")).as("lin")),
        col("lin"), col("doc_id"))
        .orderBy("doc_id", "row_idx")),

    // F13/A4 — detection crop bounds with pad + greatest/least clamps
    // (tableExtract.py:58-72) on synthetic normalized detections
    "q51_box_clamps" -> ((s, d) => {
      val det = Tables.events(s, d).filter(col("event_id") < 2000)
        .select(col("event_id"),
          ((col("event_id") % 100) / lit(100.0)).as("cx"),
          ((col("user_id") % 100) / lit(100.0)).as("cy"),
          ((col("event_id") % 30 + 5) / lit(100.0)).as("w"),
          ((col("user_id") % 25 + 5) / lit(100.0)).as("h"))
      val b = graft.functions.Geometry.cropBounds(
        col("cx"), col("cy"), col("w"), col("h"), lit(640d), lit(480d))
      det.select((col("event_id") +: b): _*).orderBy("event_id")
    }),

    // P11 — null-guard: mask a column, then na.drop (the
    // `if image is None: continue` analog, tableExtract.py:290-291)
    "q52_null_guard" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("masked",
          when(col("event_type") === "error", lit(null)).otherwise(col("value")))
        .na.drop(Seq("masked"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("masked")).as("total"))
        .orderBy("event_type")),

    // P5 — first-non-empty selection (budgetEco.py:76-78): first doc
    // whose extracted hit-list is non-empty
    "q53_first_nonempty" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("hits", filter(split(col("text"), " "), w => w === "spark"))
        .filter(size(col("hits")) > 0)
        .orderBy("doc_id").limit(1)
        .select(col("doc_id"), size(col("hits")).cast("long").as("n_hits"))),

    // S13/F16 — binaryFile directory scan ordered by path + byte-plane
    // ops; files staged from documents, doc_id parsed back from path
    // (real codec decode is q107, functions/ImageOps.decodeMeta)
    "q54_binary_scan" -> ((s, d) => {
      val dir = Qx.tempDir("graft-bin")
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text")).collect()
        .foreach { r =>
          Files.write(dir.resolve(f"doc_${r.getLong(0)}%05d.bin"),
            r.getString(1).getBytes("UTF-8"))
        }
      s.read.format("binaryFile").load(dir.toString)
        .orderBy("path")
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
          length(col("content")).cast("long").as("n_bytes"),
          length(ImageOps.resizeHalfUdf(col("content"))).cast("long").as("n_resized"))
    }),

    // F16 real-codec decode (javax.imageio, VERDICT r4 #6): stage
    // solid-color PNG fixtures with dimensions/colors derived from
    // doc_id, scan them back as binary, decode through the REAL PNG
    // codec, and report dims + channels + exact integer luminance sum +
    // the dimensions after a real decode→scale→re-encode resize. The
    // oracle recomputes every output arithmetically from the generation
    // params — any codec round-trip corruption breaks the hash match.
    "q107_image_decode" -> ((s, d) => {
      val dir = Qx.tempDir("graft-png")
      (0 until 40).foreach { id =>
        Files.write(dir.resolve(f"img_$id%05d.png"),
          ImageOps.solidPng(id % 7 + 2, id % 5 + 2,
            id * 37 % 256, id * 59 % 256, id * 83 % 256))
      }
      val meta = ImageOps.decodeMetaUdf(col("content"))
      val half = ImageOps.decodeMetaUdf(ImageOps.resizeHalfPngUdf(col("content")))
      s.read.format("binaryFile").load(dir.toString)
        .select(
          regexp_extract(col("path"), "img_(\\d+)\\.png", 1).cast("long").as("doc_id"),
          meta.as("m"), half.as("hm"))
        .select(col("doc_id"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.channels").as("channels"), col("m.lumSum").as("lum_sum"),
          col("hm.width").as("half_width"), col("hm.height").as("half_height"))
        .orderBy("doc_id")
    }),

    // multimodal frame-sampling: treat the binary column as fixed-size
    // frame planes (64-byte frames), sample every 4th frame, and
    // feature each sampled frame with md5 — the slice is the BUILT-IN
    // substring on binary (codegen'd, no UDF); the oracle recomputes
    // the same slices from the staged text. The video/audio analog of
    // the reference's page expansion: one row per (asset, frame).
    "q87_frame_sample" -> ((s, d) => {
      val dir = Qx.tempDir("graft-frames")
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text")).collect()
        .foreach { r =>
          val text = r.getString(1)
          // pinned invariant (VERDICT r4 #7): Spark slices BYTES below,
          // the DuckDB oracle slices CHARS (it has no byte-substring
          // primitive) — equal only while the staged text is pure
          // ASCII. Fail loudly if the corpus ever grows a multibyte
          // char rather than letting the gate diverge silently.
          require(text.forall(_ < 0x80),
            s"q87 oracle requires ASCII text; doc ${r.getLong(0)} is not")
          Files.write(dir.resolve(f"doc_${r.getLong(0)}%05d.bin"),
            text.getBytes("UTF-8"))
        }
      val fs = 64
      s.read.format("binaryFile").load(dir.toString)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
          col("content"),
          floor(length(col("content")) / fs).cast("int").as("n_frames"))
        .filter(col("n_frames") > 0)
        .select(col("doc_id"), col("content"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          md5(expr(s"substring(content, frame_idx * $fs + 1, $fs)")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    }),

    // engine extension — HLL approximate distinct, made SELF-VERIFYING
    // (VERDICT r12 next #3): no DuckDB-identical sketch exists, so the
    // HLL registers stay engine-private, but the ERROR BOUND is
    // deterministic — the same aggregation computes the exact distinct
    // and asserts the estimate lands within 5% of it, and THAT boolean
    // plus the exact count is the hash-gated output (rsd = 0.01 keeps
    // the sketch well inside the bound at every SF; its oracle-checked
    // estimator complement remains q89 KMV).
    "q55_approx_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("est"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("est") - col("exact_users")).cast("double") <=
            col("exact_users").cast("double") * 0.05).as("within_5pct"))
        .orderBy("event_type")),

    // S12 — doc→pages generator (ocr.py:26-36 page expansion shape)
    "q56_doc_pages" -> ((s, d) =>
      docPages(s, d).filter(col("doc_id") < 200)
        .orderBy("doc_id", "page_no")),

    // M9/P4/O3 — composed find-KPI-page: reverse page scan, first hit
    // (kpis_search.py:21-54)
    "q57_kpi_page" -> ((s, d) =>
      docPages(s, d)
        .filter(lower(col("page_text")).contains("merge"))
        .orderBy(desc("doc_id"), desc("page_no")).limit(1)
        .select(col("doc_id"), col("page_no"))),

    // image dedup CLUSTERS at scale: CC over DISTINCT fingerprints
    // (exact re-uploads collapse onto one hash vertex before the
    // quadratic candidate stage — the round-8 probe's production
    // lever), labels = component-min fingerprint, mapped back to
    // images by one hash join. Same staged fixture as q145; the
    // oracle computes the transitive closure over distinct hashes
    // with a recursive CTE — proving the checkpointed min-label
    // propagation lands on exactly the true components
    "q152_image_clusters" -> ((s, d) => {
      val dir = Qx.tempDir("graft-phash-cc")
      (0 until 100).foreach { id =>
        Files.write(dir.resolve(f"img_$id%05d.png"), phashFixturePng(id))
      }
      val images = s.read.format("binaryFile").load(dir.toString)
        .select(regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
          .cast("long").as("img_id"), col("content"))
      graft.operators.ImageDedup.imageClusters(images, maxHamming = 4)
        .orderBy("img_id")
    }),

    // temporal asset fingerprint (the audio/video leg of multimodal
    // dedup): 40 staged binary assets + 20 planted twins whose last
    // 200 bytes were rewritten — a tail edit flips only the trailing
    // energy-comparison bits, so each twin pairs with its original
    // through the prefix-bucketed hamming join while unrelated assets
    // (random ~50% bit agreement, and almost never equal frame
    // counts) stay apart. The oracle replays frame slicing, exact
    // byte-sum energies, and the bit string from the staged text —
    // proving the binary substring/HOF path computes exactly the
    // declared arithmetic
    "q150_asset_fingerprint" -> ((s, d) => {
      val dir = Qx.tempDir("graft-assets")
      Tables.documents(s, d).filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text")).collect()
        .foreach { r =>
          val text = r.getString(1)
          require(text.forall(_ < 0x80),
            s"q150 oracle requires ASCII text; doc ${r.getLong(0)} is not")
          Files.write(dir.resolve(f"asset_${r.getLong(0)}%05d.bin"),
            text.getBytes("UTF-8"))
          if (r.getLong(0) < 20 && text.length > 400)
            Files.write(dir.resolve(f"asset_${r.getLong(0) + 1000}%05d.bin"),
              (text.dropRight(200) + "x" * 200).getBytes("UTF-8"))
        }
      val assets = s.read.format("binaryFile").load(dir.toString)
        .select(regexp_extract(col("path"), "asset_(\\d+)\\.bin", 1)
          .cast("long").as("asset_id"), col("content"))
      val fps = graft.operators.AssetFingerprint.temporalFingerprint(assets)
      graft.operators.AssetFingerprint.nearDupPairs(fps, maxHamming = 8)
        .orderBy("asset_a", "asset_b")
    }),

    // perceptual image dedup (VERDICT r7 next #2): 100 real PNGs — 40
    // base patterns, 40 twins perturbed only BETWEEN dHash sample
    // points (hash-identical), 20 twins perturbed at exactly two
    // sampled cells (<= 4 bit flips) — staged to disk, decoded through
    // the real javax.imageio codec, dHashed, and paired by the
    // exact-recall pigeonhole block join. The oracle replays the hash
    // arithmetic closed-form from the fixture's pixel formula and
    // brute-forces ALL pairs, so the hash gate proves (a) the codec
    // path preserves pixels bit-exactly and (b) the block join misses
    // nothing
    "q145_image_neardup" -> ((s, d) => {
      val dir = Qx.tempDir("graft-phash")
      (0 until 100).foreach { id =>
        Files.write(dir.resolve(f"img_$id%05d.png"), phashFixturePng(id))
      }
      val hashed = graft.operators.ImageDedup.dHashes(
        s.read.format("binaryFile").load(dir.toString)
          .select(regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
            .cast("long").as("img_id"), col("content")))
      graft.operators.ImageDedup.nearDupPairs(hashed, maxHamming = 4)
        .orderBy("img_a", "img_b")
    }),

    // canonical image selection — the q128 keep-best DAG on the
    // multimodal leg (VERDICT r8 next #6): the q152 fixture plus 20
    // TWO-X UPSCALES of bases 0-19 (ids 200-219; nearest-neighbor 2×
    // preserves every dHash sample point, so each upscale joins its
    // base's cluster with an IDENTICAL hash), clustered, then one
    // image kept per cluster by highest decoded resolution with ties
    // to the smallest id — upscaled members win their clusters, pure
    // 18×16 clusters keep their min id. The oracle replays clusters
    // by recursive closure and the keep-best window from the fixture's
    // closed-form resolution, so the hash gate proves the decode →
    // cluster → select DAG end to end
    "q159_canonical_images" -> ((s, d) => {
      val dir = Qx.tempDir("graft-phash-canon")
      (0 until 100).foreach { id =>
        Files.write(dir.resolve(f"img_$id%05d.png"), phashFixturePng(id))
      }
      (0 until 20).foreach { k =>
        Files.write(dir.resolve(f"img_${200 + k}%05d.png"), phashFixtureUpscalePng(k))
      }
      val images = s.read.format("binaryFile").load(dir.toString)
        .select(regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
          .cast("long").as("img_id"), col("content"))
      graft.operators.ImageDedup.canonicalImages(images, maxHamming = 4)
        .orderBy("cluster")
    })
  )

  /** q145 fixture pixel formula (closed-form so the DuckDB oracle can
    * replay the hash from arithmetic alone): 18×16 grayscale PNG.
    * Bases (img 0-39): v = (base·131 + x·7 + y·13) mod 251. Variant 1
    * (img 40-79, base = img-40): +50 at odd coordinates only — dHash
    * samples even coordinates, so the hash is IDENTICAL. Variant 2
    * (img 80-99, base = img-80): +100 at sampled cells (6,4) and
    * (10,12) — each flips at most 2 adjacent comparison bits, so
    * hamming(base, variant2) <= 4 by construction. */
  private[graft] def phashFixtureV(img: Int, x: Int, y: Int): Int = {
    val core = ((img % 40) * 131 + x * 7 + y * 13) % 251
    if (img >= 40 && img < 80 && (x % 2 == 1 || y % 2 == 1)) (core + 50) % 251
    else if (img >= 80 && ((x == 6 && y == 4) || (x == 10 && y == 12))) (core + 100) % 251
    else core
  }

  /** q159 fixture: nearest-neighbor 2× upscale of base pattern `k`
    * (36×32, pixel (x,y) = base value at (x/2, y/2)). dHash samples
    * (gx·36/9, gy·32/8) = (4gx, 4gy) → base pixel (2gx, 2gy) — the
    * exact cells the 18×16 original samples — so the upscale's hash is
    * IDENTICAL to its base's and it joins the base's cluster. */
  private[graft] def phashFixtureUpscalePng(k: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 36) {
        val v = phashFixtureV(k, x / 2, y / 2)
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    ImageOps.encodePng(im)
  }

  private[graft] def phashFixturePng(img: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        val v = phashFixtureV(img, x, y)
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    ImageOps.encodePng(im)
  }

  val oracles: Map[String, String] = Map(
    "q48_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "q49_to_json_producer" ->
      """SELECT printf('msg-%d', n_nationkey) AS key,
        |       CAST(to_json(struct_pack(n_nationkey := n_nationkey,
        |                                n_name := n_name,
        |                                n_regionkey := n_regionkey)) AS VARCHAR) AS value
        |FROM nation ORDER BY key""".stripMargin,

    "q50_deplot_parse" ->
      """WITH src AS (
        |  SELECT event_id AS doc_id,
        |         'TITLE Croissance <0x0A> annee | valeur <0x0A> ' ||
        |         CAST(event_id % 30 + 1990 AS VARCHAR) || ' | ' ||
        |         CAST(user_id % 90 + 1 AS VARCHAR) || ',' ||
        |         CAST(event_id % 10 AS VARCHAR) || ' <0x0A> ' ||
        |         CAST(event_id % 5 + 2020 AS VARCHAR) || ' | ' ||
        |         CAST(event_id % 80 + 1 AS VARCHAR) || ',5 <0x0A> badrow' AS lin
        |  FROM events WHERE event_id < 2000
        |),
        |l AS (SELECT doc_id, string_split(lin, ' <0x0A> ') AS lines FROM src),
        |body AS (
        |  SELECT doc_id, lines, unnest(generate_series(3, len(lines))) AS i FROM l
        |),
        |rows_ AS (
        |  SELECT doc_id, i - 2 AS row_idx, string_split(lines[i], ' | ') AS fields
        |  FROM body
        |)
        |SELECT doc_id, row_idx,
        |       CASE WHEN len(fields) = 2 THEN trim(fields[1]) END AS annee,
        |       CASE WHEN len(fields) = 2
        |            THEN CAST(replace(trim(fields[2]), ',', '.') AS DOUBLE) END AS valeur
        |FROM rows_ ORDER BY doc_id, row_idx""".stripMargin,

    "q51_box_clamps" ->
      """SELECT event_id,
        |       CAST(floor(greatest((cx - w/2 - 0.02) * 640, 0)) AS BIGINT) AS x1,
        |       CAST(floor(greatest((cy - h/2 - 0.02) * 480, 0)) AS BIGINT) AS y1,
        |       CAST(floor(least((cx + w/2 + 0.02) * 640, 640)) AS BIGINT) AS x2,
        |       CAST(floor(least((cy + h/2 + 0.02) * 480, 480)) AS BIGINT) AS y2
        |FROM (
        |  SELECT event_id,
        |         (event_id % 100) / 100.0 AS cx,
        |         (user_id % 100) / 100.0 AS cy,
        |         (event_id % 30 + 5) / 100.0 AS w,
        |         (user_id % 25 + 5) / 100.0 AS h
        |  FROM events WHERE event_id < 2000
        |) ORDER BY event_id""".stripMargin,

    "q52_null_guard" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("masked")} AS total
         |FROM (
         |  SELECT event_type,
         |         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS masked
         |  FROM events
         |) WHERE masked IS NOT NULL
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q53_first_nonempty" ->
      """SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits FROM (
        |  SELECT doc_id,
        |         len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS n_hits
        |  FROM documents
        |) WHERE n_hits > 0 ORDER BY doc_id LIMIT 1""".stripMargin,

    "q54_binary_scan" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       CAST((strlen(text) + 1) // 2 AS BIGINT) AS n_resized
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,

    "q107_image_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CAST(doc_id % 7 + 2 AS INT) AS width,
        |       CAST(doc_id % 5 + 2 AS INT) AS height,
        |       CAST(3 AS INT) AS channels,
        |       CAST((299 * (doc_id * 37 % 256) + 587 * (doc_id * 59 % 256)
        |             + 114 * (doc_id * 83 % 256))
        |            * (doc_id % 7 + 2) * (doc_id % 5 + 2) AS BIGINT) AS lum_sum,
        |       CAST(greatest((doc_id % 7 + 2) // 2, 1) AS INT) AS half_width,
        |       CAST(greatest((doc_id % 5 + 2) // 2, 1) AS INT) AS half_height
        |FROM range(40) t(doc_id) ORDER BY doc_id""".stripMargin,

    "q87_frame_sample" ->
      """WITH assets AS (
        |  SELECT doc_id, text, CAST(strlen(text) // 64 AS INT) AS n_frames
        |  FROM documents WHERE doc_id < 50
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |       md5(substring(text, i * 64 + 1, 64)) AS frame_md5
        |FROM (SELECT doc_id, text, unnest(generate_series(0, n_frames - 1, 4)) AS i
        |      FROM assets WHERE n_frames > 0)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // q55: the HLL registers are engine-private, but the exact count
    // and the 5%-bound boolean are deterministic — DuckDB returns the
    // exact distinct and TRUE, pinning Spark's estimate error.
    "q55_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |       COUNT(*) AS n, true AS within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q56_doc_pages" ->
      s"""WITH $docPagesSql
         |SELECT doc_id, page_no, page_text FROM pages
         |WHERE doc_id < 200 ORDER BY doc_id, page_no""".stripMargin,

    "q57_kpi_page" ->
      s"""WITH $docPagesSql
         |SELECT doc_id, page_no FROM pages
         |WHERE contains(lower(page_text), 'merge')
         |ORDER BY doc_id DESC, page_no DESC LIMIT 1""".stripMargin,

    // frame slicing, exact byte-sum energies, comparison bits, and the
    // brute-force pair join replayed from the staged text (unicode() =
    // byte value under the pinned ASCII invariant)
    "q150_asset_fingerprint" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, text FROM documents WHERE doc_id < 40
        |  UNION ALL
        |  SELECT doc_id + 1000 AS asset_id,
        |         substring(text, 1, strlen(text) - 200) || repeat('x', 200) AS text
        |  FROM documents WHERE doc_id < 20 AND strlen(text) > 400
        |),
        |fr AS (
        |  SELECT asset_id, CAST(strlen(text) // 64 AS INT) AS n_frames, text
        |  FROM assets WHERE strlen(text) // 64 >= 2
        |),
        |frames AS (
        |  SELECT asset_id, n_frames, i, substring(text, i * 64 + 1, 64) AS f
        |  FROM (SELECT asset_id, n_frames, text,
        |               unnest(generate_series(0, CAST(n_frames AS BIGINT) - 1)) AS i
        |        FROM fr)
        |),
        |chars AS (
        |  SELECT asset_id, n_frames, i, f, unnest(generate_series(1, strlen(f))) AS j
        |  FROM frames
        |),
        |en AS (
        |  SELECT asset_id, n_frames, i, SUM(unicode(substring(f, j, 1))) AS e
        |  FROM chars GROUP BY asset_id, n_frames, i
        |),
        |bits AS (
        |  SELECT a.asset_id, a.n_frames, a.i,
        |         CASE WHEN b.e > a.e THEN '1' ELSE '0' END AS bit
        |  FROM en a JOIN en b ON b.asset_id = a.asset_id AND b.i = a.i + 1
        |),
        |fp AS (
        |  SELECT asset_id, MAX(n_frames) AS n_frames,
        |         string_agg(bit, '' ORDER BY i) AS fp
        |  FROM bits GROUP BY asset_id
        |)
        |SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
        |       hamming(a.fp, b.fp) AS hamming, CAST(a.n_frames AS INT) AS n_frames
        |FROM fp a JOIN fp b
        |  ON a.asset_id < b.asset_id AND a.n_frames = b.n_frames
        | AND substring(a.fp, 1, 8) = substring(b.fp, 1, 8)
        | AND hamming(a.fp, b.fp) <= 8
        |ORDER BY asset_a, asset_b""".stripMargin,

    // true components by recursive transitive closure over distinct
    // hashes — deliberately NOT mirroring the iterative min-label
    // propagation (the oracle is the semantic spec)
    "q152_image_clusters" ->
      """WITH RECURSIVE grid AS (
        |  SELECT i.img_id, a.gx, b.gy,
        |         CASE WHEN i.img_id >= 80
        |                   AND ((a.gx = 3 AND b.gy = 2) OR (a.gx = 5 AND b.gy = 6))
        |              THEN ((i.img_id % 40) * 131 + (2*a.gx) * 7 + (2*b.gy) * 13 + 100) % 251
        |              ELSE ((i.img_id % 40) * 131 + (2*a.gx) * 7 + (2*b.gy) * 13) % 251
        |         END AS v
        |  FROM range(100) i(img_id), range(9) a(gx), range(8) b(gy)
        |),
        |bits AS (
        |  SELECT g1.img_id, g1.gy, g1.gx,
        |         CASE WHEN g2.v > g1.v THEN '1' ELSE '0' END AS bit
        |  FROM grid g1
        |  JOIN grid g2 ON g2.img_id = g1.img_id AND g2.gy = g1.gy AND g2.gx = g1.gx + 1
        |  WHERE g1.gx < 8
        |),
        |hashes AS (
        |  SELECT img_id, string_agg(bit, '' ORDER BY gy, gx) AS dhash
        |  FROM bits GROUP BY img_id
        |),
        |dh AS (SELECT DISTINCT dhash FROM hashes),
        |e AS (
        |  SELECT a.dhash AS u, b.dhash AS v FROM dh a JOIN dh b
        |  ON a.dhash <> b.dhash AND hamming(a.dhash, b.dhash) <= 4
        |),
        |reach(u, v) AS (
        |  SELECT dhash, dhash FROM dh
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
        |),
        |cl AS (SELECT u AS dhash, MIN(v) AS cluster FROM reach GROUP BY u)
        |SELECT h.img_id, c.cluster FROM hashes h JOIN cl c ON h.dhash = c.dhash
        |ORDER BY img_id""".stripMargin,

    // brute-force all-pairs from the closed-form pixel formula —
    // deliberately NOT mirroring the block join (same discipline as the
    // q109 oracle): dHash samples pixel (2gx, 2gy), where the fixture
    // value is core = (base*131 + x*7 + y*13) % 251 (variant 1's odd-
    // coordinate perturbation never lands on a sampled pixel; variant
    // 2 adds 100 at sampled cells (3,2) and (5,6))
    // q159: the q152 closure extended with the 20 upscaled twins
    // (whose hashes equal their bases by the sample-point argument in
    // phashFixtureUpscalePng) plus the keep-best window — resolution
    // is closed-form from the id (>=200 → 36×32, else 18×16)
    "q159_canonical_images" ->
      """WITH RECURSIVE imgs AS (
        |  SELECT i AS img_id FROM range(100) t(i)
        |  UNION ALL
        |  SELECT i AS img_id FROM range(200, 220) t(i)
        |),
        |grid AS (
        |  SELECT i.img_id, a.gx, b.gy,
        |         CASE WHEN i.img_id >= 80 AND i.img_id < 100
        |                   AND ((a.gx = 3 AND b.gy = 2) OR (a.gx = 5 AND b.gy = 6))
        |              THEN ((i.img_id % 40) * 131 + (2*a.gx) * 7 + (2*b.gy) * 13 + 100) % 251
        |              ELSE ((i.img_id % 40) * 131 + (2*a.gx) * 7 + (2*b.gy) * 13) % 251
        |         END AS v
        |  FROM imgs i, range(9) a(gx), range(8) b(gy)
        |),
        |bits AS (
        |  SELECT g1.img_id, g1.gy, g1.gx,
        |         CASE WHEN g2.v > g1.v THEN '1' ELSE '0' END AS bit
        |  FROM grid g1
        |  JOIN grid g2 ON g2.img_id = g1.img_id AND g2.gy = g1.gy AND g2.gx = g1.gx + 1
        |  WHERE g1.gx < 8
        |),
        |hashes AS (
        |  SELECT img_id, string_agg(bit, '' ORDER BY gy, gx) AS dhash
        |  FROM bits GROUP BY img_id
        |),
        |dh AS (SELECT DISTINCT dhash FROM hashes),
        |e AS (
        |  SELECT a.dhash AS u, b.dhash AS v FROM dh a JOIN dh b
        |  ON a.dhash <> b.dhash AND hamming(a.dhash, b.dhash) <= 4
        |),
        |reach(u, v) AS (
        |  SELECT dhash, dhash FROM dh
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
        |),
        |cl AS (SELECT u AS dhash, MIN(v) AS cluster FROM reach GROUP BY u),
        |sel AS (
        |  SELECT c.cluster, h.img_id,
        |         CASE WHEN h.img_id >= 200 THEN 36 ELSE 18 END AS width,
        |         CASE WHEN h.img_id >= 200 THEN 32 ELSE 16 END AS height,
        |         COUNT(*) OVER (PARTITION BY c.cluster) AS n_members,
        |         ROW_NUMBER() OVER (PARTITION BY c.cluster
        |           ORDER BY CASE WHEN h.img_id >= 200 THEN 1152 ELSE 288 END DESC,
        |                    h.img_id) AS rn
        |  FROM hashes h JOIN cl c ON h.dhash = c.dhash
        |)
        |SELECT cluster, img_id AS canonical_img, width, height, n_members
        |FROM sel WHERE rn = 1 ORDER BY cluster""".stripMargin,

    "q145_image_neardup" ->
      """WITH grid AS (
        |  SELECT i.img_id, a.gx, b.gy,
        |         CASE WHEN i.img_id >= 80
        |                   AND ((a.gx = 3 AND b.gy = 2) OR (a.gx = 5 AND b.gy = 6))
        |              THEN ((i.img_id % 40) * 131 + (2*a.gx) * 7 + (2*b.gy) * 13 + 100) % 251
        |              ELSE ((i.img_id % 40) * 131 + (2*a.gx) * 7 + (2*b.gy) * 13) % 251
        |         END AS v
        |  FROM range(100) i(img_id), range(9) a(gx), range(8) b(gy)
        |),
        |bits AS (
        |  SELECT g1.img_id, g1.gy, g1.gx,
        |         CASE WHEN g2.v > g1.v THEN '1' ELSE '0' END AS bit
        |  FROM grid g1
        |  JOIN grid g2 ON g2.img_id = g1.img_id AND g2.gy = g1.gy AND g2.gx = g1.gx + 1
        |  WHERE g1.gx < 8
        |),
        |hashes AS (
        |  SELECT img_id, string_agg(bit, '' ORDER BY gy, gx) AS dhash
        |  FROM bits GROUP BY img_id
        |)
        |SELECT a.img_id AS img_a, b.img_id AS img_b,
        |       hamming(a.dhash, b.dhash) AS hamming
        |FROM hashes a JOIN hashes b ON a.img_id < b.img_id
        |WHERE hamming(a.dhash, b.dhash) <= 4
        |ORDER BY img_a, img_b""".stripMargin
  )
}
