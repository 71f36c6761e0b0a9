package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ImageOps

/** Perceptual image near-duplicate detection — the multimodal leg of
  * the dedup stack (VERDICT r7 next #2). Text dedup fingerprints tokens
  * (SimHash, [[Dedup.simhashNearDupsExact]]); images fingerprint the
  * decoded luminance plane with dHash ([[ImageOps.dHash64]]). Both land
  * in the same 64-char '0'/'1' fingerprint alphabet, so the same
  * codegen'd `hamming_distance` verify and the same Manku pigeonhole
  * completeness argument carry over unchanged.
  *
  * Scale shape: hashing is a per-row decode (embarrassingly parallel,
  * runs where the bytes live — never ship 100 TB of pixels to a
  * shuffle; the 8-byte fingerprint is the only thing that moves).
  * Candidate generation is the exact-recall block equi-join: split the
  * 64-bit fingerprint into maxHamming+1 contiguous blocks — two images
  * within the radius must agree exactly on at least one block
  * (pigeonhole), so the union of per-block equi-joins is a COMPLETE
  * candidate set, verified per pair by the codegen'd hamming filter.
  * Candidate count is sum-of-bucket² per block, never all-pairs.
  */
object ImageDedup {

  /** (id, dhash) for every decodable image; undecodable rows drop out
    * (the quarantine decision belongs to the caller's scrub pass). */
  def dHashes(images: DataFrame, idCol: String = "img_id",
              bytesCol: String = "content"): DataFrame =
    images
      .select(col(idCol).as("img_id"), ImageOps.dHash64Udf(col(bytesCol)).as("dhash"))
      .filter(col("dhash").isNotNull)

  /** Exact-recall near-dup pairs over a hashed relation (img_id, dhash):
    * every pair within `maxHamming` bit flips, found by the pigeonhole
    * block join + codegen'd hamming verify. Emits
    * (img_a, img_b, hamming) with img_a < img_b. */
  def nearDupPairs(hashed: DataFrame, maxHamming: Int = 4,
                   bits: Int = 64): DataFrame = {
    val nBlocks = maxHamming + 1
    require(nBlocks <= bits, s"need at least 1 bit per block ($nBlocks blocks, $bits bits)")
    val blockCols = (0 until nBlocks).map { i =>
      val start = i * bits / nBlocks
      val len = (i + 1) * bits / nBlocks - start
      substring(col("dhash"), start + 1, len)
    }
    val blocks = hashed
      .select(col("img_id"), col("dhash"), posexplode(array(blockCols: _*)))
      .select(col("img_id"), col("dhash"),
        col("pos").as("blk"), col("col").as("blk_bits"))
    blocks.alias("a")
      .join(blocks.alias("b"),
        col("a.blk") === col("b.blk") && col("a.blk_bits") === col("b.blk_bits") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("img_a"), col("b.img_id").as("img_b"),
        col("a.dhash").as("dh_a"), col("b.dhash").as("dh_b"))
      .distinct()
      .filter(expr(s"hamming_distance(dh_a, dh_b) <= $maxHamming"))
      .select(col("img_a"), col("img_b"),
        expr("hamming_distance(dh_a, dh_b)").as("hamming"))
  }

  /** End-to-end: decode → dHash → exact-recall pairs. */
  def imageNearDups(images: DataFrame, maxHamming: Int = 4,
                    idCol: String = "img_id", bytesCol: String = "content"): DataFrame =
    nearDupPairs(dHashes(images, idCol, bytesCol), maxHamming)

  /** The block join over DISTINCT fingerprints: (dh_a, dh_b, hamming)
    * with dh_a < dh_b. This is the scale lever the round-8 probe
    * measured (PERF.md): per-bucket occupancy — and with it the
    * quadratic candidate term — tracks DISTINCT hashes, not images,
    * and exact re-uploads (identical bytes → identical fingerprint)
    * are the dominant duplicate mode in a web image corpus. */
  def hashNearDupPairs(hashed: DataFrame, maxHamming: Int = 4,
                       bits: Int = 64): DataFrame = {
    val nBlocks = maxHamming + 1
    require(nBlocks <= bits, s"need at least 1 bit per block ($nBlocks blocks, $bits bits)")
    val blockCols = (0 until nBlocks).map { i =>
      val start = i * bits / nBlocks
      val len = (i + 1) * bits / nBlocks - start
      substring(col("dhash"), start + 1, len)
    }
    val blocks = hashed.select(col("dhash")).distinct()
      .select(col("dhash"), posexplode(array(blockCols: _*)))
      .select(col("dhash"), col("pos").as("blk"), col("col").as("blk_bits"))
    blocks.alias("a")
      .join(blocks.alias("b"),
        col("a.blk") === col("b.blk") && col("a.blk_bits") === col("b.blk_bits") &&
          col("a.dhash") < col("b.dhash"))
      .select(col("a.dhash").as("dh_a"), col("b.dhash").as("dh_b"))
      .distinct()
      .filter(expr(s"hamming_distance(dh_a, dh_b) <= $maxHamming"))
      .select(col("dh_a"), col("dh_b"),
        expr("hamming_distance(dh_a, dh_b)").as("hamming"))
  }

  /** Image dedup CLUSTERS at scale: connected components over distinct
    * fingerprints (labels are the component-min fingerprint), mapped
    * back to images by one hash-keyed join. Exact-duplicate images
    * collapse onto one hash vertex before the quadratic candidate
    * stage ever sees them; images whose hash pairs with nothing keep
    * their own hash as a singleton cluster. Emits (img_id, cluster). */
  def imageClusters(images: DataFrame, maxHamming: Int = 4, iterations: Int = 8,
                    idCol: String = "img_id", bytesCol: String = "content"): DataFrame = {
    val h = dHashes(images, idCol, bytesCol)
    val pairs = hashNearDupPairs(h, maxHamming)
    val hashClusters = Dedup.dedupClusters(
      pairs.select(col("dh_a").as("doc_a"), col("dh_b").as("doc_b")), iterations)
      .withColumnRenamed("doc_id", "dhash")
    h.join(hashClusters, Seq("dhash"), "left")
      .select(col("img_id"), coalesce(col("cluster"), col("dhash")).as("cluster"))
  }

  /** Canonical image per cluster — [[Dedup.canonicalDocs]]'s keep-best
    * applied to the multimodal leg (VERDICT r8 next #6): within each
    * near-dup cluster keep the highest-RESOLUTION member (decoded
    * width×height, the quality signal a web image corpus actually
    * stores), ties to the smallest img_id; singleton images pass
    * through as their own canonical. One decode already paid by the
    * hash pass shape, one cluster-keyed shuffle; both windows share
    * the cluster partitioning (the canonicalDocs single-exchange
    * plan). Emits (cluster, canonical_img, width, height, n_members). */
  def canonicalImages(images: DataFrame, maxHamming: Int = 4, iterations: Int = 8,
                      idCol: String = "img_id", bytesCol: String = "content"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = imageClusters(images, maxHamming, iterations, idCol, bytesCol)
    val meta = images
      .select(col(idCol).as("img_id"),
        graft.functions.ImageOps.decodeMetaUdf(col(bytesCol)).as("m"))
      .filter(col("m").isNotNull)
      .select(col("img_id"), col("m.width").as("width"), col("m.height").as("height"))
    val stats = clusters.join(meta, "img_id")
    val members = Window.partitionBy("cluster")
    val rank = Window.partitionBy("cluster")
      .orderBy(desc("px"), asc("img_id"))
    stats
      .withColumn("px", col("width").cast("long") * col("height"))
      .withColumn("n_members", count(lit(1)).over(members))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("img_id").as("canonical_img"),
        col("width"), col("height"), col("n_members"))
  }
}
