package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("salted count equals plain count per key") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy(col("event_type").as("k"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(ev, col("event_type"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = ev.join(cust, ev("user_id") === cust("c_custkey"))
      .select("event_id", "c_mktsegment")
      .collect().map(_.mkString("|")).sorted
    val salted = Skew.saltedJoin(ev, cust, "user_id", "c_custkey", 4)
      .select("event_id", "c_mktsegment")
      .collect().map(_.mkString("|")).sorted
    assert(salted.toSeq == plain.toSeq)
  }
}
