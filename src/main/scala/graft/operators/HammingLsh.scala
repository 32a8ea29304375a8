package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded LSH for Hamming space over 64-bit fingerprints — the
  * candidate generator shared by the perceptual dedup family
  * (mm_image_dedup's dHash, mm_audio_dedup's energy-envelope
  * fingerprint, and any future 64-bit sketch).
  *
  * Recall guarantee by pigeonhole: with the hash split into `bands`
  * disjoint equal bit-slices, any pair within Hamming distance
  * `bands − 1` differs in at most `bands − 1` slices, so at least one
  * slice matches EXACTLY — banded equi-join candidates miss nothing
  * at or under that distance (the bit-sampling LSH of Indyk & Motwani
  * '98, specialized to exact band collisions).
  *
  * Scale shape: candidates come from a bucketed equi-join on
  * (band, value) — never an all-pairs comparison — and verification
  * is ONE codegen'd bit_count(XOR) per candidate. Band fan-out is
  * data-dependent (near-constant regions of a fingerprint space
  * collapse band values); every false candidate costs a single
  * integer op, and a skewed band value is a standard hot-key salting
  * candidate if a real corpus ever concentrates one. */
object HammingLsh {

  /** Verified near-pairs from (idCol, hashCol) rows: all (a, b) with
    * a < b and Hamming(hash_a, hash_b) <= maxDist, where maxDist <=
    * bands − 1 keeps the recall guarantee. Output: (doc_a, doc_b,
    * hamming), sorted. */
  private def checkParams(bands: Int, maxDist: Int): Unit = {
    // bands > 64 would make bandBits = 0 and mask = 0 (every row
    // collides in every band — an all-pairs join blowup), and a
    // non-divisor would silently drop the top 64 % bands bits from
    // every band, voiding the pigeonhole recall guarantee
    require(bands >= 1 && bands <= 64 && 64 % bands == 0,
      s"bands $bands must divide 64 (1..64)")
    require(maxDist <= bands - 1,
      s"maxDist $maxDist needs ${maxDist + 1} bands for guaranteed recall")
  }

  private def banded(hashes: DataFrame, idCol: String, hashCol: String,
      bands: Int): DataFrame = {
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    hashes.select(col(idCol).as("id"), col(hashCol).as("h"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("v", expr(s"shiftrightunsigned(h, band * $bandBits)")
        .bitwiseAND(lit(mask)))
  }

  private def verified(cand: DataFrame, maxDist: Int): DataFrame =
    cand.distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))

  def pairs(hashes: DataFrame, idCol: String, hashCol: String,
      bands: Int = 4, maxDist: Int = 3): DataFrame = {
    checkParams(bands, maxDist)
    val b = banded(hashes, idCol, hashCol, bands)
    verified(
      b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.v") === col("b.v")
            && col("a.id") < col("b.id"))
        .select(col("a.id").as("doc_a"), col("a.h").as("ha"),
          col("b.id").as("doc_b"), col("b.h").as("hb")),
      maxDist)
  }

  /** Batch-involved near-pairs — the incremental/ingest twin of
    * [[pairs]] (dedup_incremental's shape for Hamming space): the
    * NEW side drives both joins, new-vs-index (disjoint id sets
    * assumed — the ingest splits by batch membership) and
    * new-vs-new; per-ingest cost O(batch bands × bucket occupancy),
    * never an index self-join. */
  def batchPairs(newHashes: DataFrame, idxHashes: DataFrame,
      idCol: String, hashCol: String,
      bands: Int = 4, maxDist: Int = 3): DataFrame = {
    checkParams(bands, maxDist)
    val bn = banded(newHashes, idCol, hashCol, bands)
    val bo = banded(idxHashes, idCol, hashCol, bands)
    val newOld = bn.as("a").join(bo.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v"))
      .select(least(col("a.id"), col("b.id")).as("doc_a"),
        greatest(col("a.id"), col("b.id")).as("doc_b"),
        col("a.h").as("ha"), col("b.h").as("hb"))
    val newNew = bn.as("a").join(bn.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.h").as("ha"), col("b.h").as("hb"))
    verified(newOld.unionByName(newNew), maxDist)
  }
}
