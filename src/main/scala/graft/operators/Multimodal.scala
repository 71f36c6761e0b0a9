package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal plumbing over OPAQUE BINARY columns (builder north
  * star): clips/images/audio live in the lake as `binary` cells with
  * typed metadata, and the engine's job is byte-exact, deterministic
  * slicing/sampling/fingerprinting — decode stays behind the
  * [[Models]] contracts ([[graft.functions.ImageOps]] holds the real
  * javax.imageio path for images).
  */
object Multimodal {

  /** FIXED-STRIDE FRAME SAMPLING (r15) — the "every k-th frame"
    * pre-processing cut a video/audio training pipeline runs before
    * any decode: a clip's payload is a packed sequence of
    * `frameBytes`-sized frames; emit every `every`-th FULL frame as
    * its own row with a content fingerprint. Pure byte arithmetic on
    * the binary column — `substring` on BinaryType is byte-addressed
    * and codegen'd, `md5` hashes the raw bytes — so the expansion is
    * a map-side explode with no decode, no UDF, no shuffle.
    *
    * Returns (idCol, frame_idx, frame [binary], frame_md5,
    * frame_len). Trailing partial frames are dropped (the standard
    * fixed-frame contract); clips shorter than one frame vanish. */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
                  frameBytes: Int, every: Int): DataFrame = {
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    require(every >= 1, s"every must be >= 1, got $every")
    df.select(col(idCol), col(binCol).as("__bin"))
      .withColumn("__nf",
        expr(s"CAST(length(__bin) AS BIGINT) div $frameBytes"))
      .filter(col("__nf") >= 1) // sequence(0, -1) would count DOWN
      .withColumn("frame_idx",
        explode(expr("sequence(0L, __nf - 1L)")))
      .filter(col("frame_idx") % every === 0)
      .withColumn("frame",
        expr(s"substring(__bin, CAST(frame_idx * $frameBytes + 1 AS INT)," +
          s" $frameBytes)"))
      .select(col(idCol), col("frame_idx"), col("frame"),
        md5(col("frame")).as("frame_md5"),
        length(col("frame")).cast("long").as("frame_len"))
  }
}
