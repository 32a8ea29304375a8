package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Quality

/** Pins the planted-branch semantics of the Gopher/C4 rule filters:
  * each planted doc was authored to trip EXACTLY one rule (or none),
  * so a rule-expression regression flips a named flag here before it
  * reaches the oracle gate. */
class QualitySpec extends AnyFunSuite {
  private val sf = TestSpark.sf

  test("gopher planted docs trip exactly their designed rule") {
    val s = TestSpark.spark
    val rows = Quality.gopher.run(s, sf)
      .filter("doc_id >= 9100000000")
      .collect().map(r => r.getLong(0) -> r).toMap
    s.catalog.clearCache()
    def flag(id: Long, name: String): Boolean =
      rows(id).getBoolean(rows(id).fieldIndex(name))
    // 9100000001: passes every rule
    assert(flag(9100000001L, "keep"))
    // each failure doc fails its designed rule...
    assert(!flag(9100000002L, "bullet_ok"))
    assert(!flag(9100000003L, "ellipsis_ok"))
    assert(!flag(9100000004L, "symbol_ok"))
    assert(!flag(9100000005L, "mwl_ok"))
    assert(!flag(9100000006L, "alpha_ok"))
    assert(!flag(9100000007L, "words_ok"))
    // ...and the designed rule is the ONLY one the bullet/ellipsis/
    // symbol docs fail (the word-shape docs legitimately cascade)
    for ((id, bad) <- Seq(9100000002L -> "bullet_ok",
        9100000003L -> "ellipsis_ok", 9100000004L -> "symbol_ok");
        f <- Seq("words_ok", "mwl_ok", "symbol_ok", "bullet_ok",
          "ellipsis_ok", "alpha_ok", "stops_ok") if f != bad)
      assert(flag(id, f), s"$id unexpectedly fails $f")
  }

  test("c4 planted docs keep/drop as designed, cleaned_text filtered") {
    val s = TestSpark.spark
    val rows = Quality.c4.run(s, sf)
      .filter("doc_id >= 9200000000")
      .collect().map(r => r.getLong(0) -> r).toMap
    s.catalog.clearCache()
    def keep(id: Long): Boolean =
      rows(id).getBoolean(rows(id).fieldIndex("keep"))
    assert(keep(9200000001L))
    assert(keep(9200000002L))
    assert(!keep(9200000003L)) // brace
    assert(!keep(9200000004L)) // lorem ipsum
    assert(!keep(9200000005L)) // two sentences
    assert(!keep(9200000006L)) // no kept lines
    // the mixed doc's reconstruction keeps exactly the 3 surviving
    // sentences and drops tiny/unterminated/javascript lines
    val cleaned = rows(9200000002L)
      .getString(rows(9200000002L).fieldIndex("cleaned_text"))
    assert(cleaned.split("\n").length == 3)
    assert(cleaned.split("\n").forall(_.startsWith("the surviving")))
  }
}
