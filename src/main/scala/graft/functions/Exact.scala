package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Decimal-exact arithmetic helpers.
  *
  * Money columns in the lake are doubles holding 2-decimal values.
  * Summing doubles is partition-order dependent — results would
  * differ run-to-run on a cluster and never hash-match an oracle.
  * Casting to decimal first makes every aggregate exact and
  * order-independent; the final cast back to double is then
  * deterministic. This is the 100 TB-safe way to aggregate money.
  */
object Exact {
  /** 2-dp money value as an exact decimal. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Small 2-dp factor (discount/tax adjustments). */
  def factor(c: Column): Column = c.cast(DecimalType(8, 2))

  /** Exact sum of a 2-dp money column, emitted as double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Exact mean of a 2-dp money column, emitted as double
    * (exact decimal sum, then one deterministic double division). */
  def avgMoney(c: Column): Column =
    sum(money(c)).cast(DoubleType) / count(lit(1))
}
