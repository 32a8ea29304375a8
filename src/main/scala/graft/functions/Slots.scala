package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The portable seeded-determinism primitive every "no rand()" site
  * shares: a 40-bit slot from the md5 of (salt, key), identical on
  * Spark and DuckDB — so samples, noise draws, shuffles, and derived
  * coordinates reproduce on any engine at any parallelism, and the
  * salt is the seed knob. Each form exists as a Column AND the SQL
  * string its oracle embeds; keeping both in ONE place is what stops
  * a future tweak from drifting one of the paired gates. */
object Slots {

  /** 2^40 — the slot space. */
  val Space = 1099511627776.0

  /** 40-bit slot of (salt, key) as a BIGINT in [0, 2^40). */
  def slot(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))),
      1, 10), 16, 10).cast("long")

  def slotSql(salt: String, keyExpr: String): String =
    s"(('0x' || substr(md5('$salt:' || CAST($keyExpr AS VARCHAR)), " +
      "1, 10))::BIGINT)"

  /** Uniform in [0, 1). */
  def uniform(salt: String, key: Column): Column =
    slot(salt, key) / Space

  def uniformSql(salt: String, keyExpr: String): String =
    s"(${slotSql(salt, keyExpr)} / $Space)"

  /** OPEN-interval uniform in (0, 1) — (slot + 0.5)/2^40, so ln/log
    * of it or of (1 − 2|u − ½|) can never see 0. */
  def uniformOpen(salt: String, key: Column): Column =
    (slot(salt, key) + 0.5) / Space

  def uniformOpenSql(salt: String, keyExpr: String): String =
    s"((${slotSql(salt, keyExpr)} + 0.5) / $Space)"
}
