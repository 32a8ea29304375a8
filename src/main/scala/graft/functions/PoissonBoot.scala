package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Poisson-bootstrap weight primitive shared by q_bootstrap_ci
  * and the streaming CI monitor (StreamOps.bootCiIngest): w(key, b) =
  * inverse Poisson(1) CDF over u = md5-slot(key, b) — both engines
  * compare the same u against the same LITERAL CDF thresholds
  * (Σ e⁻¹/j! as correctly-rounded doubles; the tail P(X>8) ≈ 1.1e-6
  * maps to weight 9 — the distribution truncates AT 9, disclosed),
  * so any engine, cluster size, or replay draws the SAME weight. Kept in one place for the Slots reason: the Column
  * and the SQL the oracle embeds must never drift apart. */
object PoissonBoot {

  /** Replicates per interval — order statistics 2 and B−1 of B=64
    * replicate means bracket the central 95%. */
  val B: Int = 64

  /** Poisson(1) CDF at k = 0..8 (cumulative e⁻¹Σ1/j!). */
  val Cdf: Seq[String] = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238462", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712", "0.9999897508033253", "0.999998874797402")

  /** Weight column: #thresholds below u, truncated at 9. */
  def weight(u: Column): Column =
    Cdf.map(_.toDouble).zipWithIndex.reverse
      .foldLeft(lit(9L): Column) { case (acc, (c, i)) =>
        when(u < c, i.toLong).otherwise(acc)
      }

  /** The identical CASE for the DuckDB oracle. */
  def weightSql(u: String): String =
    "CASE " + Cdf.zipWithIndex
      .map { case (c, i) => s"WHEN $u < $c THEN $i" }
      .mkString(" ") + " ELSE 9 END"

  /** Seeded uniform for replicate `b` of row key `k` (column + SQL —
    * the Slots pairing). Hash-lane packing: one md5 digest holds 128
    * bits and a draw needs 40, so replicates share digests three to a
    * hash — replicate b reads the 40-bit window at lane b mod 3 of
    * md5(salt : key _ b div 3). Cuts the dominant cost (B·n digests →
    * B·n/3) with draws still independent (disjoint bit windows of a
    * uniform digest) and still engine/cluster/replay-deterministic. */
  def uniform(salt: String, k: Column, b: Column): Column = {
    val digest = md5(concat(lit(salt + ":"), k.cast("string"), lit("_"),
      (b.cast("long") - pmod(b.cast("long"), lit(3L))).cast("string")))
    val lane = pmod(b.cast("long"), lit(3L))
    conv(digest.substr((lit(1L) + lane * 10).cast("int"), lit(10)), 16, 10)
      .cast("long") / Slots.Space
  }

  def uniformSql(salt: String, kExpr: String, bExpr: String): String = {
    val grp = s"(($bExpr) - (($bExpr) % 3))"
    val lane = s"(($bExpr) % 3)"
    s"((('0x' || substr(md5('$salt:' || CAST($kExpr AS VARCHAR) || '_' " +
      s"|| CAST($grp AS VARCHAR)), (1 + $lane * 10)::INT, 10))::BIGINT) " +
      s"/ ${Slots.Space})"
  }
}
