package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("minhash-LSH finds exactly the exact-Jaccard pairs") {
    val exact = Dedup.ngramJaccard.run(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh.run(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
    assert(exact.nonEmpty)
  }

  test("simhash candidates: hamming <= 3 and high verified cosine") {
    val rows = Dedup.simhash.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("hamming") <= 3)
      assert(r.getAs[Double]("cos_sim") > 0.75) // hamming<=3 implies high, not perfect, cosine
    }
    // the bulk of the candidates are true near-dups
    assert(rows.count(_.getAs[Double]("cos_sim") > 0.95) * 2 > rows.length)
  }

  test("simhash finds the near-identical pairs (jaccard >= 0.95)") {
    val strong = Dedup.ngramJaccard.run(spark, sf)
      .filter("jaccard >= 0.95")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhash.run(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = strong -- sh
    // near-identical token multisets have hamming ~0; allow a stray miss
    assert(missed.size <= math.max(1, strong.size / 5), s"missed $missed")
  }

  test("exact dedup marks no false duplicates on a corpus without any") {
    val d = Dedup.exact.run(spark, sf)
    assert(d.filter("is_dup").count() == 0)
    assert(d.count() == 500)
  }
}
