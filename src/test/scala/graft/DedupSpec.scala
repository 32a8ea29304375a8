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
      // hamming<=3 over the 60 live bits implies high, not perfect,
      // cosine (min observed 0.7665 at sf0.001)
      assert(r.getAs[Double]("cos_sim") > 0.75)
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

  test("stop-shingle cap kills the hot-shingle quadratic fan-out") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 100 docs all share one boilerplate shingle (df = 100 > n/2);
    // docs 0 and 1 also share a rare shingle. Without the cap the hot
    // shingle fans out 100*99/2 = 4950 candidate rows; with it, only
    // the rare-shingle pair survives candidate generation.
    val sh = (0L until 100L).map(_ -> 777L) ++ Seq(0L -> 1L, 1L -> 1L)
    val cand = Dedup.candidatePairs(sh.toDF("doc_id", "s"))
    assert(cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1L)))
  }

  test("exact dedup marks no false duplicates on a corpus without any") {
    val d = Dedup.exact.run(spark, sf)
    assert(d.filter("is_dup").count() == 0)
    assert(d.count() == 500)
  }
}
