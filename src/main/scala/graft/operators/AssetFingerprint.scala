package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal fingerprinting for frame-structured binary assets — the
  * audio/video leg of the multimodal dedup stack. Images got a SPATIAL
  * difference hash (`ImageOps.dHash64` over the luminance grid); a
  * time-series asset gets the same idea along the TIME axis: slice the
  * binary into fixed-size frames (the q87 frame model), reduce each
  * frame to its exact integer energy (byte sum), and emit bit i =
  * energy(frame i+1) > energy(frame i). Re-encoding, gain-preserving
  * noise within a frame, and container differences leave the bit
  * string intact; edits flip only the bits whose frames they touch —
  * a tail edit leaves the prefix bits identical, which is what the
  * near-dup join keys on.
  *
  * Everything is built-ins and codegen'd HOFs (binary `substring`
  * slicing, `aggregate`/`transform` for the energy sum — no UDF), so
  * fingerprints are exactly reproducible by any engine from the raw
  * bytes (the q150 oracle replays them in SQL).
  *
  * Scale shape: fingerprinting is per-row work where the bytes live —
  * only the bit string (one bit per frame) ever shuffles. Pairing is
  * a prefix-bucketed equi-join + codegen'd `hamming_distance` verify,
  * the `simhashNearDups` table trick; candidates additionally require
  * equal frame counts (variable-length fingerprints only compare
  * meaningfully at equal length).
  */
object AssetFingerprint {

  /** (asset_id, n_frames, fp): the temporal energy fingerprint.
    * Assets shorter than two full frames carry no comparison and drop
    * out. `frameBytes` is the fixed frame size (the q87 frame model).
    * Frames are decoded as ASCII for the codegen'd `ascii` energy sum
    * — the staged-corpus invariant q87 also pins. */
  def temporalFingerprint(assets: DataFrame, frameBytes: Int = 64,
                          idCol: String = "asset_id",
                          bytesCol: String = "content"): DataFrame = {
    val frames = assets
      .select(col(idCol).as("asset_id"), col(bytesCol).as("content"))
      .withColumn("n_frames", expr(s"cast(length(content) div $frameBytes as int)"))
      .filter(col("n_frames") >= 2)
      .select(col("asset_id"), col("n_frames"), col("content"),
        posexplode(expr("sequence(0, n_frames - 1)")))
      .select(col("asset_id"), col("n_frames"), col("col").as("i"),
        expr(s"cast(substring(content, col * $frameBytes + 1, $frameBytes) as string)")
          .as("f"))
    val w = Window.partitionBy("asset_id").orderBy("i")
    frames
      .withColumn("e", expr(
        "aggregate(transform(sequence(1, length(f)), j -> ascii(substring(f, j, 1))), " +
          "0, (acc, x) -> acc + x)"))
      .withColumn("ne", lead(col("e"), 1).over(w))
      .filter(col("ne").isNotNull)
      .withColumn("bit", when(col("ne") > col("e"), lit("1")).otherwise(lit("0")))
      .groupBy(col("asset_id"), col("n_frames"))
      .agg(expr("concat_ws('', transform(array_sort(collect_list(struct(i, bit))), " +
        "p -> p.bit))").as("fp"))
  }

  /** Near-dup asset pairs over fingerprints: equal frame count, shared
    * `prefixBits` bucket, hamming within `maxHamming` — emits
    * (asset_a, asset_b, hamming, n_frames) with asset_a < asset_b. */
  def nearDupPairs(fps: DataFrame, maxHamming: Int,
                   prefixBits: Int = 8): DataFrame = {
    val b = fps.withColumn("bucket", substring(col("fp"), 1, prefixBits))
    b.alias("a")
      .join(b.alias("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.n_frames") === col("b.n_frames") &&
          col("a.asset_id") < col("b.asset_id") &&
          expr(s"hamming_distance(a.fp, b.fp) <= $maxHamming"))
      .select(col("a.asset_id").as("asset_a"), col("b.asset_id").as("asset_b"),
        expr("hamming_distance(a.fp, b.fp)").as("hamming"),
        col("a.n_frames").as("n_frames"))
  }
}
