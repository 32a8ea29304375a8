package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the interpolated Kneser-Ney trigram model (text_kneser_ney):
  * the proper-distribution law every layer must satisfy (the law
  * mis-derived KN variants break — discount/type-count mismatches
  * leak or double-count probability mass), and the registered query's
  * per-doc accounting against independently-computed token counts. */
class KneserNeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("every KN layer sums to exactly 1 over the vocabulary") {
    val docs = Seq("a b a b c", "b c a a b", "a b b c a")
      .map(_.split(" ").toSeq)
    val D = 0.75

    val trigrams = docs.flatMap(_.sliding(3).filter(_.length == 3))
      .map { case Seq(a, b, c) => (a, b, c) }
    val bigrams = docs.flatMap(_.sliding(2).filter(_.length == 2))
      .map { case Seq(a, b) => (a, b) }

    val c3 = trigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = c3.groupBy { case ((a, b, _), _) => (a, b) }
      .view.mapValues(_.values.sum).toMap
    val t12 = c3.keys.groupBy { case (a, b, _) => (a, b) }
      .view.mapValues(_.size.toLong).toMap
    val n23 = c3.keys.groupBy { case (_, b, c) => (b, c) }
      .view.mapValues(_.size.toLong).toMap
    val t2 = n23.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m2 = n23.groupBy { case ((b, _), _) => b }
      .view.mapValues(_.values.sum).toMap
    val btyp = bigrams.toSet
    val n1w3 = btyp.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nbt = btyp.size.toLong
    val vocab = n1w3.keySet // every word that ends some bigram

    def pcont(w3: String) = n1w3.getOrElse(w3, 0L).toDouble / nbt
    def mid(w2: String, w3: String) =
      (math.max(n23.getOrElse((w2, w3), 0L) - D, 0.0) +
        D * t2(w2) * pcont(w3)) / m2(w2)
    def top(w1: String, w2: String, w3: String) =
      (math.max(c3.getOrElse((w1, w2, w3), 0L) - D, 0.0) +
        D * t12((w1, w2)) * mid(w2, w3)) / c2((w1, w2))

    assert(math.abs(vocab.toSeq.map(pcont).sum - 1.0) < 1e-12)
    for (w2 <- m2.keys) {
      val s = vocab.toSeq.map(w3 => mid(w2, w3)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"mid($w2) sums to $s")
    }
    for ((w1, w2) <- c2.keys) {
      val s = vocab.toSeq.map(w3 => top(w1, w2, w3)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"top($w1,$w2) sums to $s")
    }
  }

  test("registered query: trigram accounting and ppl/avg_nll coherence") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("text_kneser_ney")(spark, sf).collect()
    val nTok = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.TextExprs.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.length == nTok.size)
    got.foreach { r =>
      val (id, nTri) = (r.getLong(0), r.getLong(1))
      assert(nTri == math.max(nTok(id) - 2, 0).toLong, s"doc $id")
      if (nTri > 0) {
        val (nll, ppl) = (r.getDouble(2), r.getDouble(3))
        assert(nll > 0.0 && ppl > 1.0, s"doc $id: $nll $ppl")
        // both are 4dp roundings of the same mean
        assert(math.abs(ppl - math.exp(nll)) / ppl < 1e-3, s"doc $id")
      } else assert(r.isNullAt(2) && r.isNullAt(3))
    }
    spark.catalog.clearCache()
  }
}
